"""Test configuration: virtual 8-device CPU mesh (the idiomatic JAX "fake
backend" for distributed tests -- SURVEY.md §4)."""

import os

# force CPU: the environment presets JAX_PLATFORMS to the tunneled TPU
# plugin, which would route every test compile over the network
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the axon sitecustomize's register() stomps jax_platforms to "axon,cpu"
# AFTER the env var is read, silently routing every test op over the TPU
# tunnel (bf16 matmuls, minutes-long remote compiles).  Re-pin it here --
# this must run before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the test host is a single slow core, so
# recompiling the tiny models every run dominates test time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_pipeline_dir(tmp_path_factory):
    """A saved diffusers-layout pipeline directory with tiny random models
    plus a minimal CLIP tokenizer."""
    import jax
    import jax.numpy as jnp
    from text_to_video_finetuning_tpu.models import (
        AutoencoderKL, CLIPTextModel, UNet3DConditionModel,
        micro_unet_config, tiny_clip_config, tiny_vae_config)
    from text_to_video_finetuning_tpu.schedulers.ddpm import SchedulerConfig
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt
    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)

    out = tmp_path_factory.mktemp("pipeline")
    key = jax.random.PRNGKey(0)

    ucfg = micro_unet_config()
    unet = UNet3DConditionModel(config=ucfg)
    uparams = jax.jit(unet.init)(key, jnp.ones((1, 4, 2, 16, 16)),
                        jnp.array([1]),
                        jnp.ones((1, 77, ucfg.cross_attention_dim)))["params"]

    vcfg = tiny_vae_config()
    vae = AutoencoderKL(config=vcfg)
    vparams = jax.jit(vae.init)({"params": key, "gaussian": key},
                       jnp.ones((1, 3, 32, 32)))["params"]

    vocab_floor = 512
    ccfg = tiny_clip_config(vocab_size=vocab_floor,
                            hidden_size=ucfg.cross_attention_dim,
                            intermediate_size=ucfg.cross_attention_dim * 2)
    clip = CLIPTextModel(config=ccfg)
    cparams = jax.jit(clip.init)(key, jnp.ones((1, 77), jnp.int32))["params"]

    tok_dir = str(out / "tokenizer")
    write_minimal_clip_tokenizer(tok_dir, vocab_size_floor=vocab_floor)

    ckpt.save_pipeline(
        str(out), unet=(ucfg, uparams), vae=(vcfg, vparams),
        text_encoder=(ccfg, cparams),
        scheduler_config=SchedulerConfig(),
        tokenizer_dir=tok_dir)
    return str(out)


@pytest.fixture(scope="session")
def tiny_video(tmp_path_factory):
    """A small synthetic mp4 + caption."""
    import cv2
    d = tmp_path_factory.mktemp("videos")
    path = str(d / "clip.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8,
                             (64, 64))
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    for i in range(24):
        frame = np.roll(base, shift=i * 2, axis=1)
        writer.write(frame)
    writer.release()
    with open(str(d / "clip.txt"), "w") as f:
        f.write("a test video of moving noise")
    return path
