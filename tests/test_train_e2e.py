"""End-to-end training: tiny config through the full engine.

Mirrors SURVEY.md §4 integration strategy: loss is finite and decreases on a
single-video overfit, cached-latent path equivalence, LoRA save/load/resume,
multi-device DP gradient equivalence.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# torch-golden / e2e-compile heavy: excluded by the fast
# profile `pytest -m "not slow"` (see pytest.ini)
pytestmark = pytest.mark.slow

def _base_config(pipeline_dir, video_path, tmp_path, **overrides):
    cfg = dict(
        pretrained_model_path=pipeline_dir,
        output_dir=str(tmp_path / "out"),
        dataset_types=("single_video",),
        train_data=dict(
            single_video_path=video_path,
            single_video_prompt="a test video",
            n_sample_frames=4,
            width=32, height=32,
            fps=8,
        ),
        validation_data=dict(sample_preview=False),
        train_batch_size=1,
        max_train_steps=3,
        learning_rate=1e-4,
        trainable_modules=("attn1", "attn2"),
        mixed_precision=None,
        seed=7,
        checkpointing_steps=1000,
        validation_steps=1000,
        gradient_checkpointing=False,
    )
    cfg.update(overrides)
    return cfg


def test_full_finetune_runs_and_loss_finite(tiny_pipeline_dir, tiny_video,
                                            tmp_path):
    from text_to_video_finetuning_tpu.training.engine import main
    out_dir = main(**_base_config(tiny_pipeline_dir, tiny_video, tmp_path))
    # final pipeline saved in diffusers layout
    assert os.path.exists(os.path.join(out_dir, "model_index.json"))
    assert os.path.exists(os.path.join(
        out_dir, "unet", "diffusion_pytorch_model.safetensors"))
    assert os.path.exists(os.path.join(out_dir, "config.yaml"))


def test_lora_training_and_sidecar_files(tiny_pipeline_dir, tiny_video,
                                         tmp_path):
    from text_to_video_finetuning_tpu.training.engine import main
    out_dir = main(**_base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        trainable_modules=None,
        use_unet_lora=True, use_text_lora=True, train_text_encoder=False,
        lora_version="cloneofsimo", lora_rank=4,
        unet_lora_modules=("Transformer2DModel",),
        text_encoder_lora_modules=("CLIPEncoderLayer",),
        lora_unet_dropout=0.0, lora_text_dropout=0.0))
    loras = glob.glob(os.path.join(out_dir, "lora", "*.pt"))
    assert len(loras) == 2, loras  # unet + text encoder


def test_stable_lora_training_engine_e2e(tiny_pipeline_dir, tiny_video,
                                         tmp_path):
    """stable_lora (loralib) trains through the full engine on the branch
    path (train_step.py _effective_params; the conv branch is
    models/lora_layers.py::_stable_conv_branch) and writes its sidecar
    files, including the webui safetensors export."""
    from text_to_video_finetuning_tpu.training.engine import main
    out_dir = main(**_base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        trainable_modules=None,
        use_unet_lora=True, use_text_lora=True, train_text_encoder=False,
        lora_version="stable_lora", lora_rank=4,
        unet_lora_modules=("Transformer2DModel", "ResnetBlock2D"),
        text_encoder_lora_modules=("CLIPAttention",),
        save_lora_for_webui=True))
    full = glob.glob(os.path.join(out_dir, "lora", "full_weights",
                                  "*.safetensors"))
    assert len(full) == 2, full  # _unet + _text_encoder
    webui = glob.glob(os.path.join(out_dir, "lora", "webui_*.safetensors"))
    assert webui, os.listdir(os.path.join(out_dir, "lora"))


def test_stable_lora_branch_trajectory_matches_overlay(tiny_pipeline_dir):
    """Whole-step equivalence for stable_lora: N fused train steps with
    lora_branch=True vs False from identical inits produce the same
    parameter trajectory (the branch is a pure execution-form change)."""
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)
    from text_to_video_finetuning_tpu.lora.handler import LoraHandler

    (sched_cfg, _, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)

    handler = LoraHandler(version="stable_lora", use_unet_lora=True,
                          unet_replace_modules=["Transformer2DModel",
                                                "ResnetBlock2D"])
    rng = jax.random.PRNGKey(3)
    lora, sites, _ = handler.add_lora_to_model(True, "unet", ucfg, r=4,
                                               rng=rng)
    # nonzero 'up' so conv branches contribute from step 1
    leaves, treedef = jax.tree_util.tree_flatten(lora)
    keys = jax.random.split(rng, len(leaves))
    lora = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape) * 0.02
                  for k, l in zip(keys, leaves)])

    frozen = {"unet": unet_params, "text": text_params}
    batch = {
        "pixel_values": jax.random.uniform(rng, (1, 4, 2, 8, 8),
                                           minval=-1, maxval=1),
        "prompt_ids": jnp.ones((1, 77), jnp.int32),
    }

    finals = []
    for branch in (True, False):
        optimizer = get_optimizer(get_lr_schedule("constant", 1e-3, 0, 50),
                                  max_grad_norm=1.0)
        cfg = TrainStepConfig(
            unet=unet, text_encoder=clip, vae=vae,
            scheduler=DDPMScheduler(sched_cfg), cache_latents=True,
            unet_sites=tuple(sites), lora_version="stable_lora",
            lora_branch=branch, eval_train=True)
        step = jax.jit(make_train_step(cfg, optimizer))
        trainable = {"unet_lora": lora}
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           trainable=trainable,
                           opt_state=optimizer.init(trainable),
                           rng=jax.random.PRNGKey(11))
        for _ in range(3):
            state, metrics = step(state, frozen, vae_params, batch)
            assert np.isfinite(float(metrics["loss"]))
        finals.append(state.trainable)
    for a, b in zip(jax.tree_util.tree_leaves(finals[0]),
                    jax.tree_util.tree_leaves(finals[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_cached_latents_path(tiny_pipeline_dir, tiny_video, tmp_path):
    from text_to_video_finetuning_tpu.training.engine import main
    out_dir = main(**_base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        cache_latents=True, max_train_steps=2))
    cache = glob.glob(os.path.join(out_dir, "cached_latents", "*.t2vc"))
    assert len(cache) > 0


def test_single_video_overfit_loss_decreases(tiny_pipeline_dir, tiny_video,
                                             tmp_path):
    """README.md:156 behavior: single-video overfit converges. Uses the
    train step directly with a fixed batch to keep it fast."""
    from transformers import CLIPTokenizer
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    (sched_cfg, tokenizer, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)

    trainable_u, frozen_u = select_trainable(unet_params, "unet", ("all",))
    trainable = {"unet": trainable_u}
    frozen = {"unet": frozen_u, "text": text_params}

    optimizer = get_optimizer(get_lr_schedule("constant", 3e-4, 0, 50),
                              max_grad_norm=1.0)
    step_cfg = TrainStepConfig(
        unet=unet, text_encoder=clip, vae=vae,
        scheduler=DDPMScheduler(sched_cfg), cache_latents=False)
    train_step = make_train_step(step_cfg, optimizer)

    rng = jax.random.PRNGKey(0)
    batch = {
        "pixel_values": jax.random.uniform(rng, (1, 2, 3, 32, 32),
                                           minval=-1, maxval=1),
        "prompt_ids": jnp.ones((1, 77), jnp.int32),
    }
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng)
    jit_step = jax.jit(train_step)
    losses = []
    for _ in range(12):
        state, metrics = jit_step(state, frozen, vae_params, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_dp_grad_equals_large_batch(tiny_pipeline_dir):
    """SPMD DP semantics: the 8-way-sharded step must equal the single-
    device step on the same global batch (SURVEY.md §4 distributed test)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.parallel import (batch_sharding,
                                                       make_mesh, MeshConfig,
                                                       replicate)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"

    (sched_cfg, _tok, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)

    trainable_u, frozen_u = select_trainable(unet_params, "unet",
                                             ("attn1",))
    trainable = {"unet": trainable_u}
    frozen = {"unet": frozen_u, "text": text_params}

    optimizer = get_optimizer(get_lr_schedule("constant", 1e-3, 0, 10),
                              max_grad_norm=0.0)
    step_cfg = TrainStepConfig(
        unet=unet, text_encoder=clip, vae=vae,
        scheduler=DDPMScheduler(sched_cfg), cache_latents=True)
    train_step = make_train_step(step_cfg, optimizer)

    rng = jax.random.PRNGKey(0)
    batch = {
        "pixel_values": jax.random.normal(rng, (8, 4, 2, 4, 4)),
        "prompt_ids": jnp.ones((8, 77), jnp.int32),
    }
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng)

    # single device
    s1, m1 = jax.jit(train_step)(state, frozen, vae_params, batch)

    # 8-way dp
    mesh = make_mesh(MeshConfig(dp=8, fsdp=1, tp=1))
    with mesh:
        rep = replicate(mesh)
        state_d = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state)
        frozen_d = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), frozen)
        vae_d = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), vae_params)
        ds = batch_sharding(mesh)
        batch_d = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, ds), batch)
        s8, m8 = jax.jit(train_step)(state_d, frozen_d, vae_d, batch_d)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.trainable),
                    jax.tree_util.tree_leaves(s8.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_train_state_save_resume_bit_exact(tiny_pipeline_dir, tiny_video,
                                           tmp_path):
    """Full-state resume: train 2 steps + save, resume + 1 step must equal
    an uninterrupted 3-step run (step counter, Adam moments, RNG stream)."""
    import glob as globmod
    from text_to_video_finetuning_tpu.training.engine import main
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt

    base = _base_config(tiny_pipeline_dir, tiny_video, tmp_path,
                        max_train_steps=3, checkpointing_steps=3,
                        shuffle=False)
    out_a = main(**base)
    unet_a = ckpt.load_unet(os.path.join(out_a, "unet"))[1]

    base2 = _base_config(tiny_pipeline_dir, tiny_video, tmp_path,
                         output_dir=str(tmp_path / "out2"),
                         max_train_steps=2, checkpointing_steps=2,
                         shuffle=False)
    out_b = main(**base2)
    ckpt_dir = globmod.glob(os.path.join(out_b, "checkpoint-2"))[0]
    assert os.path.isdir(os.path.join(ckpt_dir, "train_state"))

    base3 = _base_config(tiny_pipeline_dir, tiny_video, tmp_path,
                         output_dir=str(tmp_path / "out3"),
                         max_train_steps=3, checkpointing_steps=1000,
                         shuffle=False, resume_from_checkpoint=ckpt_dir)
    out_c = main(**base3)
    unet_c = ckpt.load_unet(os.path.join(out_c, "unet"))[1]

    for a, c in zip(jax.tree_util.tree_leaves(unet_a),
                    jax.tree_util.tree_leaves(unet_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_sp_sharded_step_equals_replicated(tiny_pipeline_dir):
    """Sequence parallelism (frames over 'sp'): the sharded step must be
    numerically identical to the unsharded one -- XLA inserts all-to-alls
    at the spatial<->temporal boundaries without changing math."""
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.parallel import (batch_sharding,
                                                       make_mesh, MeshConfig,
                                                       replicate)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    (sched_cfg, _tok, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)

    trainable_u, frozen_u = select_trainable(unet_params, "unet", ("attn1",))
    trainable = {"unet": trainable_u}
    frozen = {"unet": frozen_u, "text": text_params}
    optimizer = get_optimizer(get_lr_schedule("constant", 1e-3, 0, 10),
                              max_grad_norm=0.0)
    step_cfg = TrainStepConfig(unet=unet, text_encoder=clip, vae=vae,
                               scheduler=DDPMScheduler(sched_cfg),
                               cache_latents=True)
    train_step = make_train_step(step_cfg, optimizer)

    rng = jax.random.PRNGKey(0)
    batch = {
        "pixel_values": jax.random.normal(rng, (2, 4, 4, 4, 4)),
        "prompt_ids": jnp.ones((2, 77), jnp.int32),
    }
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng)

    s1, m1 = jax.jit(train_step)(state, frozen, vae_params, batch)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, sp=4))
    with mesh:
        rep = replicate(mesh)
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), t)
        ds = batch_sharding(mesh, frame_axis=2)   # cached layout (B,4,F,h,w)
        batch_d = {
            "pixel_values": jax.device_put(batch["pixel_values"], ds),
            "prompt_ids": jax.device_put(batch["prompt_ids"],
                                         batch_sharding(mesh)),
        }
        s8, m8 = jax.jit(train_step)(put(state), put(frozen),
                                     put(vae_params), batch_d)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.trainable),
                    jax.tree_util.tree_leaves(s8.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_single_pass_knob_halves_unet_work(tiny_pipeline_dir):
    """two_pass_loss=False with a frozen text path: loss == 2 * loss0 (the
    expectation-preserving rescale of the skipped redundant pass)."""
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    (sched_cfg, _tok, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)
    trainable_u, frozen_u = select_trainable(unet_params, "unet", ("attn1",))
    trainable = {"unet": trainable_u}
    frozen = {"unet": frozen_u, "text": text_params}
    optimizer = get_optimizer(get_lr_schedule("constant", 1e-3, 0, 10))
    base = dict(unet=unet, text_encoder=clip, vae=vae,
                scheduler=DDPMScheduler(sched_cfg), cache_latents=True,
                eval_train=True)   # no dropout => losses comparable exactly
    rng = jax.random.PRNGKey(0)
    batch = {"pixel_values": jax.random.normal(rng, (1, 4, 4, 4, 4)),
             "prompt_ids": jnp.ones((1, 77), jnp.int32)}
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng)

    step1 = make_train_step(TrainStepConfig(**base, two_pass=False),
                            optimizer)
    _, m1 = jax.jit(step1)(state, frozen, vae_params, batch)
    step2 = make_train_step(TrainStepConfig(**base, two_pass=True),
                            optimizer)
    _, m2 = jax.jit(step2)(state, frozen, vae_params, batch)

    # single pass: loss == 2 * loss0; with dropout off, the reference-style
    # second pass computes the identical loss, so both modes agree exactly
    np.testing.assert_allclose(float(m1["loss"]), 2 * float(m1["loss0"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)


def test_hybrid_text_encoder_two_pass_gradients(tiny_pipeline_dir):
    """The reference's signature hybrid behavior (train.py:806-834): with a
    trainable text path, text gradients flow ONLY through the frame-1
    pass-1 -- pass 0 sees DETACHED embeddings.  Asserts (i) text-side grads
    are nonzero through the full loss, (ii) grads of the pass-0 term alone
    are exactly zero (the stop_gradient works), (iii) grads of the pass-1
    term alone are nonzero."""
    from text_to_video_finetuning_tpu.lora.handler import LoraHandler
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import TrainStepConfig
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.training.train_step import make_loss_fn

    (sched_cfg, _tok, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)
    rng = jax.random.PRNGKey(3)
    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True,
                          use_text_lora=True)
    unet_lora, unet_sites, _ = handler.add_lora_to_model(
        True, "unet", ucfg, r=4, rng=rng)
    text_lora, text_sites, _ = handler.add_lora_to_model(
        True, "text_encoder", ccfg, r=4, rng=rng)
    # non-zero 'up' so lora grads can flow (up=0 at init blocks the down
    # gradient path)
    bump = lambda t: jax.tree_util.tree_map(
        lambda x: x + 0.02 if x.ndim >= 2 else x, t)
    unet_lora, text_lora = bump(unet_lora), bump(text_lora)
    trainable = {"unet_lora": unet_lora, "text_lora": text_lora}
    frozen = {"unet": unet_params, "text": text_params}

    for lora_branch in (True, False):
        cfg = TrainStepConfig(
            unet=unet, text_encoder=clip, vae=vae,
            scheduler=DDPMScheduler(sched_cfg),
            unet_sites=tuple(unet_sites), text_sites=tuple(text_sites),
            cache_latents=True, eval_train=True, lora_branch=lora_branch)
        loss_fn = make_loss_fn(cfg)
        batch = {"pixel_values": jax.random.normal(rng, (1, 4, 4, 4, 4)),
                 "prompt_ids": jnp.ones((1, 77), jnp.int32)}

        def term(which):
            def f(t):
                loss, aux = loss_fn(t, frozen, vae_params, batch, rng)
                return {"total": loss, "loss0": aux["loss0"],
                        "loss1": aux["loss1"]}[which]
            return jax.jit(jax.grad(f))(trainable)

        g_total = term("total")
        text_norm = float(optax_global_norm(g_total["text_lora"]))
        assert text_norm > 0.0, "text grads must flow through the full loss"
        assert float(optax_global_norm(g_total["unet_lora"])) > 0.0

        # pass 0 is detached for text: gradient of loss0 wrt text == 0
        g0 = term("loss0")
        np.testing.assert_allclose(
            float(optax_global_norm(g0["text_lora"])), 0.0, atol=0.0,
            err_msg=f"pass-0 text detach broken (lora_branch={lora_branch})")
        assert float(optax_global_norm(g0["unet_lora"])) > 0.0

        # pass 1 (frame-1, trainable text) carries the text gradient
        g1 = term("loss1")
        assert float(optax_global_norm(g1["text_lora"])) > 0.0


def test_split_two_pass_step_matches_fused(tiny_pipeline_dir):
    """make_split_train_step compiles the two loss passes as separate XLA
    programs; grad linearity + shared rng splits make its trajectory match
    the fused step.  Covers both second-pass shapes: the hybrid frame-1
    trainable-text pass (reference train.py:807-820) and the full-clip
    redundant pass with a frozen text path (train.py:813-829)."""
    from text_to_video_finetuning_tpu.lora.handler import LoraHandler
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_split_train_step,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    (sched_cfg, _tok, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)
    rng = jax.random.PRNGKey(7)
    optimizer = get_optimizer(get_lr_schedule("constant", 1e-3, 0, 10),
                              max_grad_norm=1.0)
    batch = {"pixel_values": jax.random.normal(rng, (1, 4, 4, 4, 4)),
             "prompt_ids": jnp.ones((1, 77), jnp.int32)}

    # scenario A: hybrid unet+text LoRA -> pass 1 is the frame-1
    # trainable-text pass.  scenario B: frozen text, base params trainable,
    # two_pass=True -> pass 1 is the full-clip redundant pass.
    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True,
                          use_text_lora=True)
    unet_lora, unet_sites, _ = handler.add_lora_to_model(
        True, "unet", ucfg, r=4, rng=rng)
    text_lora, text_sites, _ = handler.add_lora_to_model(
        True, "text_encoder", ccfg, r=4, rng=rng)
    bump = lambda t: jax.tree_util.tree_map(
        lambda x: x + 0.02 if x.ndim >= 2 else x, t)
    trainable_u, frozen_u = select_trainable(unet_params, "unet", ("attn1",))
    scenarios = [
        ({"unet_lora": bump(unet_lora), "text_lora": bump(text_lora)},
         {"unet": unet_params, "text": text_params},
         dict(unet_sites=tuple(unet_sites), text_sites=tuple(text_sites))),
        ({"unet": trainable_u},
         {"unet": frozen_u, "text": text_params},
         dict()),
    ]
    for trainable, frozen, extra in scenarios:
        cfg = TrainStepConfig(
            unet=unet, text_encoder=clip, vae=vae,
            scheduler=DDPMScheduler(sched_cfg), cache_latents=True,
            two_pass=True, **extra)
        state0 = TrainState(step=jnp.zeros((), jnp.int32),
                            trainable=trainable,
                            opt_state=optimizer.init(trainable), rng=rng)
        fused = jax.jit(make_train_step(cfg, optimizer))
        split = make_split_train_step(cfg, optimizer)   # pre-jitted
        # the multi-host compile-barrier hook must lower both gradient
        # programs without executing a step (engine._aot_compile_and_barrier
        # falls back to this when the step closure has no .lower())
        split.aot_lower(state0, frozen, vae_params, batch)

        sf, ss = state0, state0
        for _ in range(2):
            sf, mf = fused(sf, frozen, vae_params, batch)
            ss, ms = split(ss, frozen, vae_params, batch)
            for k in ("loss", "loss0", "loss1", "grad_norm"):
                np.testing.assert_allclose(float(mf[k]), float(ms[k]),
                                           rtol=1e-5, atol=1e-7, err_msg=k)
        assert float(ms["loss1"]) > 0.0  # a second pass actually ran
        for a, b in zip(jax.tree_util.tree_leaves(sf.trainable),
                        jax.tree_util.tree_leaves(ss.trainable)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_aot_barrier_dispatches_to_aot_lower():
    """The multi-host compile barrier must use a split step's aot_lower
    hook instead of crashing on the closure's missing .lower()."""
    from text_to_video_finetuning_tpu.training.engine import (
        _aot_compile_and_barrier)
    calls = []

    def step(*a):                                   # pragma: no cover
        raise AssertionError("barrier must not execute the step")

    step.aot_lower = lambda *a: calls.append(a)
    _aot_compile_and_barrier(step, "state", "frozen", "vae", "batch")
    assert calls == [("state", "frozen", "vae", "batch")]


def optax_global_norm(tree):
    import optax
    return optax.global_norm(tree)


def test_hybrid_text_lora_engine_saves_sidecar(tiny_pipeline_dir, tiny_video,
                                               tmp_path):
    """Engine run with use_text_lora=True + train_text_encoder=True: loss
    finite and the text-encoder LoRA sidecar is written (reference
    utils/lora_handler.py:279-303 naming)."""
    from text_to_video_finetuning_tpu.training.engine import main
    cfg = _base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        max_train_steps=2,
        trainable_modules=None,
        train_text_encoder=True,
        use_unet_lora=True, use_text_lora=True,
        lora_version="cloneofsimo", lora_rank=4,
        unet_lora_modules=("Transformer2DModel",),
        text_encoder_lora_modules=("CLIPEncoderLayer",))
    out_dir = main(**cfg)
    lora_files = glob.glob(os.path.join(out_dir, "lora", "*text_encoder*"))
    assert lora_files, "text-encoder LoRA sidecar missing"
    assert glob.glob(os.path.join(out_dir, "lora", "*unet*"))


def test_grad_accumulation_counts_optimizer_updates(tiny_pipeline_dir,
                                                    tiny_video, tmp_path):
    """max_train_steps is in OPTIMIZER updates (reference sync_gradients
    counting): with accumulation k the run consumes k micro-batches per
    counted step and the final checkpoint name reflects update count."""
    from text_to_video_finetuning_tpu.training.engine import main
    out_dir = main(**_base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        gradient_accumulation_steps=2, max_train_steps=2,
        checkpointing_steps=2, shuffle=False))
    # checkpoint saved at optimizer update 2 (4 micro-batches in)
    assert os.path.isdir(os.path.join(out_dir, "checkpoint-2"))


def test_tp_sharded_step_equals_replicated(tiny_pipeline_dir):
    """Tensor parallelism (Megatron split of attention/MLP weights over
    'tp'): the sharded step must match the replicated one numerically."""
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.parallel import (batch_sharding,
                                                       make_mesh, MeshConfig,
                                                       replicate,
                                                       shard_params)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    (sched_cfg, _tok, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)

    trainable_u, frozen_u = select_trainable(unet_params, "unet", ("attn1",))
    trainable = {"unet": trainable_u}
    frozen = {"unet": frozen_u, "text": text_params}
    optimizer = get_optimizer(get_lr_schedule("constant", 1e-3, 0, 10),
                              max_grad_norm=0.0)
    step_cfg = TrainStepConfig(unet=unet, text_encoder=clip, vae=vae,
                               scheduler=DDPMScheduler(sched_cfg),
                               cache_latents=True)
    train_step = make_train_step(step_cfg, optimizer)

    rng = jax.random.PRNGKey(0)
    batch = {"pixel_values": jax.random.normal(rng, (2, 4, 2, 4, 4)),
             "prompt_ids": jnp.ones((2, 77), jnp.int32)}
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng)

    s1, m1 = jax.jit(train_step)(state, frozen, vae_params, batch)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=4, sp=1))
    with mesh:
        rep = replicate(mesh)
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), t)
        frozen_d = shard_params(frozen, mesh, use_fsdp=False, use_tp=True)
        batch_d = {
            "pixel_values": jax.device_put(batch["pixel_values"],
                                           batch_sharding(mesh)),
            "prompt_ids": jax.device_put(batch["prompt_ids"],
                                         batch_sharding(mesh)),
        }
        s8, m8 = jax.jit(train_step)(put(state), frozen_d,
                                     put(vae_params), batch_d)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.trainable),
                    jax.tree_util.tree_leaves(s8.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_train_loss_logged_as_accumulation_window_mean(
        tiny_pipeline_dir, tiny_video, tmp_path, monkeypatch):
    """Reference train.py:855-890: the logged train_loss is the mean of the
    per-micro-batch losses over each gradient-accumulation window, logged
    once per optimizer step.  Spy on the jitted step's metrics and on the
    tensorboard writer to pin the logged values."""
    import sys
    import types
    from text_to_video_finetuning_tpu.training.engine import main

    micro_losses = []
    real_jit = jax.jit

    def spy_jit(fn, **kw):
        compiled = real_jit(fn, **kw)

        def wrapper(*a, **k):
            out = compiled(*a, **k)
            if (isinstance(out, tuple) and len(out) == 2
                    and isinstance(out[1], dict) and "loss" in out[1]):
                micro_losses.append(float(jax.device_get(out[1]["loss"])))
            return out
        return wrapper
    monkeypatch.setattr(jax, "jit", spy_jit)

    logged = []

    class FakeWriter:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, tag, value, step):
            if tag == "train_loss":
                logged.append((step, value))

        def close(self):
            pass

    fake_tbx = types.ModuleType("tensorboardX")
    fake_tbx.SummaryWriter = FakeWriter
    monkeypatch.setitem(sys.modules, "tensorboardX", fake_tbx)

    accum = 2
    main(**_base_config(tiny_pipeline_dir, tiny_video, tmp_path,
                        gradient_accumulation_steps=accum,
                        max_train_steps=3, logger_type="tensorboard"))

    assert len(logged) == 3              # one per optimizer step
    assert len(micro_losses) >= 3 * accum
    for i, (step, value) in enumerate(logged):
        assert step == i + 1
        window = micro_losses[i * accum:(i + 1) * accum]
        np.testing.assert_allclose(value, np.mean(window), rtol=1e-5)


def test_bucketing_bounded_compiles(tiny_pipeline_dir, tmp_path, monkeypatch):
    """use_bucketing through the full engine: mixed-aspect videos resolve to
    a small set of bucket shapes (reference utils/bucketing.py:22-32), the
    loader groups batches by shape, and the jitted step sees at most one
    distinct input shape per bucket (bounded recompilation, SURVEY §7)."""
    import cv2
    import functools
    from text_to_video_finetuning_tpu.data import datasets as ds_mod
    from text_to_video_finetuning_tpu.training.engine import main

    # the real bucket table floors at 192px (reference utils/bucketing.py
    # min 192), which is a multi-minute compile on this 1-core CI host;
    # lower the floor so the bucket SHAPES are small while the entire
    # bucketing -> grouping -> recompile path stays real
    real_buckets = ds_mod.sensible_buckets
    monkeypatch.setattr(ds_mod, "sensible_buckets",
                        functools.partial(real_buckets, min_size=48))

    vid_dir = tmp_path / "vids"
    vid_dir.mkdir()
    rng_np = np.random.RandomState(0)
    for name, (w, h) in (("sq", (64, 64)), ("wide", (128, 64)),
                         ("wide2", (128, 64))):
        writer = cv2.VideoWriter(str(vid_dir / f"{name}.mp4"),
                                 cv2.VideoWriter_fourcc(*"mp4v"), 8, (w, h))
        for _ in range(8):
            writer.write(rng_np.randint(0, 255, (h, w, 3), np.uint8))
        writer.release()

    shapes = []
    real_jit = jax.jit

    def spy_jit(fn, **kw):
        compiled = real_jit(fn, **kw)

        def wrapper(*a, **k):
            for arg in a:
                if isinstance(arg, dict) and "pixel_values" in arg:
                    shapes.append(tuple(arg["pixel_values"].shape))
            return compiled(*a, **k)
        return wrapper
    monkeypatch.setattr(jax, "jit", spy_jit)

    cfg = _base_config(tiny_pipeline_dir, str(vid_dir / "sq.mp4"), tmp_path,
                       max_train_steps=4)
    cfg["dataset_types"] = ("folder",)
    cfg["train_data"] = dict(path=str(vid_dir), n_sample_frames=2,
                             width=32, height=32, fps=8,
                             use_bucketing=True,
                             fallback_prompt="a test video")
    main(**cfg)

    distinct = set(shapes)
    assert len(shapes) >= 4
    assert 1 < len(distinct) <= 2, distinct   # one shape per bucket


def test_sample_noise_offset_semantics():
    """reference train.py:349-358: offset noise adds strength * randn over
    (b, c, f, 1, 1) -- constant across the spatial plane -- and is a no-op
    when use_offset_noise is False."""
    from text_to_video_finetuning_tpu.training.train_step import sample_noise
    rng = jax.random.PRNGKey(3)
    latents = jnp.zeros((2, 4, 3, 8, 8), jnp.float32)

    plain = sample_noise(rng, latents, 0.1, use_offset_noise=False)
    offset = sample_noise(rng, latents, 0.1, use_offset_noise=True)
    # same rng => the base gaussian is shared; the difference IS the offset
    diff = np.asarray(offset - plain)
    assert not np.allclose(diff, 0.0)
    # constant across (h, w) per (b, c, f)
    np.testing.assert_allclose(
        diff, np.broadcast_to(diff[..., :1, :1], diff.shape), atol=1e-6)
    # scales linearly with noise_strength
    offset2 = sample_noise(rng, latents, 0.2, use_offset_noise=True)
    np.testing.assert_allclose(np.asarray(offset2 - plain), 2.0 * diff,
                               atol=1e-5)
    # statistics: base noise is ~N(0,1)
    assert abs(float(jnp.mean(plain))) < 0.05
    assert abs(float(jnp.std(plain)) - 1.0) < 0.05


def test_extra_train_data_concatenates(tiny_pipeline_dir, tiny_video,
                                       tmp_path, caplog):
    """extra_train_data (reference train.py:664-676): additional dataset
    specs are built and concatenated with the primary dataset; the combined
    example count doubles when the same single_video source is added."""
    import logging
    from text_to_video_finetuning_tpu.training.engine import main
    cfg = _base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        extra_train_data=[dict(
            dataset_types=("single_video",),
            train_data=dict(single_video_path=tiny_video,
                            single_video_prompt="a second view",
                            n_sample_frames=4, width=32, height=32, fps=8),
        )])
    with caplog.at_level(logging.INFO, logger="t2v_tpu"):
        out_dir = main(**cfg)
    assert os.path.exists(os.path.join(out_dir, "model_index.json"))
    n_with_extra = None
    for rec in caplog.records:
        if "Num examples" in rec.message:
            n_with_extra = int(rec.message.split("=")[-1])
    assert n_with_extra is not None
    # the same source alone yields half the examples
    from text_to_video_finetuning_tpu.data.datasets import get_train_dataset
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    tok = load_primary_models(tiny_pipeline_dir)[1]
    solo = get_train_dataset(cfg["dataset_types"], cfg["train_data"], tok)
    assert n_with_extra == 2 * len(solo[0])


def test_resume_step_skip_predicate():
    """reference train.py:843: `resume_step` skips only the first epoch's
    leading batches, and only when resume_from_checkpoint is set."""
    from text_to_video_finetuning_tpu.config import TrainConfig
    from text_to_video_finetuning_tpu.training.engine import (
        should_skip_resume_step)
    cfg = TrainConfig(pretrained_model_path="x", output_dir="y",
                      resume_from_checkpoint="ckpt-dir", resume_step=3)
    assert [should_skip_resume_step(cfg, 0, s) for s in range(5)] == \
        [True, True, True, False, False]
    # later epochs run in full
    assert not any(should_skip_resume_step(cfg, 1, s) for s in range(5))
    # no checkpoint => no skipping even with resume_step set
    cfg2 = TrainConfig(pretrained_model_path="x", output_dir="y",
                       resume_from_checkpoint=None, resume_step=3)
    assert not any(should_skip_resume_step(cfg2, 0, s) for s in range(5))


def test_ema_shadow_tracks_optimizer_updates(tiny_pipeline_dir):
    """use_ema semantics (training/train_step.py::_ema_update): the EMA
    shadow blends toward the post-update params once per OPTIMIZER update
    (ema_every = accumulation window), stays untouched mid-window, and
    matches the hand-computed blend of the parameter trajectory."""
    import optax
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    (sched_cfg, _tok, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)

    trainable_u, frozen_u = select_trainable(unet_params, "unet", ("attn1",))
    trainable = {"unet": trainable_u}
    frozen = {"unet": frozen_u, "text": text_params}

    k, decay = 2, 0.5
    optimizer = get_optimizer(get_lr_schedule("constant", 3e-4, 0, 50),
                              max_grad_norm=1.0)
    optimizer = optax.MultiSteps(optimizer, every_k_schedule=k)
    step_cfg = TrainStepConfig(
        unet=unet, text_encoder=clip, vae=vae,
        scheduler=DDPMScheduler(sched_cfg), cache_latents=False,
        ema_decay=decay, ema_every=k)
    jit_step = jax.jit(make_train_step(step_cfg, optimizer))

    rng = jax.random.PRNGKey(0)
    batch = {
        "pixel_values": jax.random.uniform(rng, (1, 2, 3, 32, 32),
                                           minval=-1, maxval=1),
        "prompt_ids": jnp.ones((1, 77), jnp.int32),
    }
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng,
                       ema=jax.tree_util.tree_map(jnp.copy, trainable))

    expected_ema = jax.device_get(trainable)
    for micro in range(1, 2 * k + 1):
        state, _ = jit_step(state, frozen, vae_params, batch)
        if micro % k == 0:   # optimizer update boundary: blend
            p = jax.device_get(state.trainable)
            expected_ema = jax.tree_util.tree_map(
                lambda e, q: e * decay + q * (1 - decay), expected_ema, p)
        else:                # mid-window: shadow must be untouched
            for g, w in zip(jax.tree_util.tree_leaves(
                                jax.device_get(state.ema)),
                            jax.tree_util.tree_leaves(expected_ema)):
                np.testing.assert_array_equal(g, w)

    got = jax.device_get(state.ema)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(expected_ema)):
        np.testing.assert_allclose(g, w, rtol=0, atol=1e-7)
    # the shadow lags the live params (decay < 1, params moved)
    diffs = [np.abs(a - b).max() for a, b in zip(
        jax.tree_util.tree_leaves(got),
        jax.tree_util.tree_leaves(jax.device_get(state.trainable)))]
    assert max(diffs) > 0


def test_ema_stays_aligned_through_nonfinite_drop(tiny_pipeline_dir):
    """EMA boundary alignment under skip_nonfinite_updates (ADVICE r3):
    _update_applied reads the POST-update optimizer state (apply_if_finite
    last_finite AND MultiSteps mini_step wrap), so a dropped NaN micro-batch
    -- which defers the accumulation window by one -- does NOT shift the EMA
    blend off real optimizer updates.  A step-counter gate would blend at
    micro-step 2 here (the fake boundary) and skip micro-step 3 (the real
    update); this pins the truth-reading behavior."""
    import optax
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    (sched_cfg, _tok, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)

    trainable_u, frozen_u = select_trainable(unet_params, "unet", ("attn1",))
    trainable = {"unet": trainable_u}
    frozen = {"unet": frozen_u, "text": text_params}

    k, decay = 2, 0.5
    optimizer = get_optimizer(get_lr_schedule("constant", 3e-4, 0, 50),
                              max_grad_norm=1.0)
    optimizer = optax.MultiSteps(optimizer, every_k_schedule=k)
    optimizer = optax.apply_if_finite(optimizer, max_consecutive_errors=4)
    step_cfg = TrainStepConfig(
        unet=unet, text_encoder=clip, vae=vae,
        scheduler=DDPMScheduler(sched_cfg), cache_latents=False,
        ema_decay=decay, ema_every=k)
    jit_step = jax.jit(make_train_step(step_cfg, optimizer))

    rng = jax.random.PRNGKey(0)
    batch_ok = {
        "pixel_values": jax.random.uniform(rng, (1, 2, 3, 32, 32),
                                           minval=-1, maxval=1),
        "prompt_ids": jnp.ones((1, 77), jnp.int32),
    }
    # NaN pixels -> NaN latents -> NaN loss/grads -> apply_if_finite rejects
    batch_bad = dict(batch_ok,
                     pixel_values=jnp.full((1, 2, 3, 32, 32), jnp.nan))
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng,
                       ema=jax.tree_util.tree_map(jnp.copy, trainable))

    def ema_equals(expected):
        for g, w in zip(
                jax.tree_util.tree_leaves(jax.device_get(state.ema)),
                jax.tree_util.tree_leaves(expected)):
            np.testing.assert_allclose(g, w, rtol=0, atol=1e-7)

    expected_ema = jax.device_get(trainable)

    def blend(ema, params):
        return jax.tree_util.tree_map(
            lambda e, q: e * decay + q * (1 - decay), ema,
            jax.device_get(params))

    # micro 1 (ok): mid-window, no update, no blend
    state, m = jit_step(state, frozen, vae_params, batch_ok)
    assert int(m["notfinite_drops"]) == 0
    ema_equals(expected_ema)

    # micro 2 (NaN): dropped whole -- params unchanged, window deferred,
    # EMA untouched (the step-counter gate would blend HERE)
    params_before = jax.device_get(state.trainable)
    state, m = jit_step(state, frozen, vae_params, batch_bad)
    assert int(m["notfinite_drops"]) == 1
    for g, w in zip(jax.tree_util.tree_leaves(
                        jax.device_get(state.trainable)),
                    jax.tree_util.tree_leaves(params_before)):
        np.testing.assert_array_equal(g, w)
    ema_equals(expected_ema)

    # micro 3 (ok): window completes -> REAL optimizer update -> blend
    state, m = jit_step(state, frozen, vae_params, batch_ok)
    expected_ema = blend(expected_ema, state.trainable)
    ema_equals(expected_ema)

    # micro 4 (ok): mid-window again, no blend
    state, _ = jit_step(state, frozen, vae_params, batch_ok)
    ema_equals(expected_ema)

    # micro 5 (ok): next real update, blend again
    state, _ = jit_step(state, frozen, vae_params, batch_ok)
    expected_ema = blend(expected_ema, state.trainable)
    ema_equals(expected_ema)
    # the shadow is finite throughout
    assert all(np.isfinite(g).all() for g in
               jax.tree_util.tree_leaves(jax.device_get(state.ema)))


def test_engine_skips_nonfinite_microbatch(tiny_pipeline_dir, tiny_video,
                                           tmp_path):
    """skip_nonfinite_updates through the REAL engine loop (VERDICT r3
    weak#2): one cached-latent sample is all-NaN; the apply_if_finite guard
    drops that micro-batch whole, the run completes, and the saved weights
    are finite and trained (without the guard the NaN would poison the
    MultiSteps accumulator and every later update)."""
    from safetensors.numpy import load_file

    from text_to_video_finetuning_tpu.data import native
    from text_to_video_finetuning_tpu.training.engine import main

    cache = tmp_path / "lat"
    cache.mkdir()
    rng = np.random.RandomState(0)
    # 32 items = 4 global batches of 8 (dp=8 on the virtual mesh); exactly
    # ONE item is NaN, so exactly one micro-batch is dropped -- more NaN
    # batches than max_consecutive_errors would make optax give up and let
    # the NaN through by design
    for i in range(32):
        lat = (rng.randn(4, 4, 16, 16) * 0.2).astype(np.float32)
        if i == 1:
            lat[:] = np.nan
        ids = np.full((77,), 3, np.int32)
        assert native.cache_write_item(
            str(cache / f"cached_{i}{native.CACHE_EXT}"), lat, ids, f"p{i}")

    out_dir = main(**_base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        cache_latents=True, cached_latent_dir=str(cache),
        gradient_accumulation_steps=2, max_train_steps=2,
        skip_nonfinite_updates=3, use_ema=True, ema_decay=0.5))
    st_path = os.path.join(out_dir, "unet",
                           "diffusion_pytorch_model.safetensors")
    tensors = load_file(st_path)
    initial = load_file(os.path.join(
        tiny_pipeline_dir, "unet", "diffusion_pytorch_model.safetensors"))
    changed = False
    for k, v in tensors.items():
        assert np.isfinite(v).all(), f"non-finite weights in {k}"
        if not np.array_equal(v, initial[k]):
            changed = True
    assert changed, "guard dropped every update; training never progressed"


def test_per_sample_prompts_at_batch_size_2(tiny_pipeline_dir):
    """Documented deviation (PARITY.md): reference train.py:788 collapses
    the stacked prompt ids with token_ids[0], so at train_batch_size>1
    every sample trains against the FIRST sample's prompt.  We keep
    per-sample prompts (train_step.py token_ids[:, 0] keeps the batch
    dim).  Pin OUR semantics: changing only sample 2's prompt changes the
    loss; under the reference's collapse it could not."""
    from text_to_video_finetuning_tpu.training.engine import (
        load_primary_models)
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.schedulers.ddpm import DDPMScheduler
    from text_to_video_finetuning_tpu.training import TrainStepConfig
    from text_to_video_finetuning_tpu.training.train_step import make_loss_fn
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    (sched_cfg, _tok, (ccfg, text_params), (vcfg, vae_params),
     (ucfg, unet_params)) = load_primary_models(tiny_pipeline_dir)
    unet = UNet3DConditionModel(config=ucfg)
    clip = CLIPTextModel(config=ccfg)
    vae = AutoencoderKL(config=vcfg)
    trainable_u, frozen_u = select_trainable(unet_params, "unet", ("attn1",))
    trainable = {"unet": trainable_u}
    frozen = {"unet": frozen_u, "text": text_params}

    cfg = TrainStepConfig(unet=unet, text_encoder=clip, vae=vae,
                          scheduler=DDPMScheduler(sched_cfg),
                          cache_latents=False, eval_train=True)
    loss_fn = jax.jit(make_loss_fn(cfg))

    rng = jax.random.PRNGKey(0)
    pixels = jax.random.uniform(rng, (2, 2, 3, 32, 32), minval=-1, maxval=1)
    # stacked ids (B, n_prompts=1, 77) -- the shape the collapse acts on
    ids_a = jnp.ones((2, 1, 77), jnp.int32)
    ids_b = ids_a.at[1].set(7)   # only sample 2's prompt differs
    key = jax.random.PRNGKey(1)
    loss_a, _ = loss_fn(trainable, frozen, vae_params,
                        {"pixel_values": pixels, "prompt_ids": ids_a}, key)
    loss_b, _ = loss_fn(trainable, frozen, vae_params,
                        {"pixel_values": pixels, "prompt_ids": ids_b}, key)
    assert not np.allclose(float(loss_a), float(loss_b)), (
        "sample 2's prompt was ignored -- the reference's token_ids[0] "
        "batch-collapse semantics leaked in")


def test_sigterm_preemption_checkpoints_and_resumes(tiny_pipeline_dir,
                                                    tiny_video, tmp_path):
    """save_on_preemption (beyond the reference, which dies unsaved): a
    SIGTERM mid-run must finish the in-flight step, write a resumable
    checkpoint-<step>, and return cleanly WITHOUT the end-of-training
    pipeline export (a second synchronous multi-GB write would burn the
    preemption grace window and could be SIGKILLed mid-write, leaving a
    torn pipeline dir at the run root); resume_from_checkpoint must accept
    the written checkpoint.  The signal is raised from the engine's own
    'step 1' log record so the trigger lands deterministically after the
    first optimizer update."""
    import logging
    import signal as signalmod

    from text_to_video_finetuning_tpu.training.engine import main

    fired = []

    class _KillOnStep1(logging.Handler):
        def emit(self, record):
            if record.getMessage().startswith("step 1 ") and not fired:
                fired.append(True)
                os.kill(os.getpid(), signalmod.SIGTERM)

    t2v_logger = logging.getLogger("t2v_tpu")
    handler = _KillOnStep1()
    t2v_logger.addHandler(handler)
    prev_level = t2v_logger.level
    t2v_logger.setLevel(logging.INFO)   # pytest may leave root at WARNING
    try:
        out_dir = main(**_base_config(
            tiny_pipeline_dir, tiny_video, tmp_path,
            max_train_steps=40, checkpointing_steps=1000, shuffle=False))
    finally:
        t2v_logger.removeHandler(handler)
        t2v_logger.setLevel(prev_level)
    assert fired, "the 'step 1' log record never appeared"
    # stopped early, wrote a resumable checkpoint at the stop step
    ckpts = sorted(glob.glob(os.path.join(out_dir, "checkpoint-*")))
    assert len(ckpts) == 1, ckpts
    step = int(os.path.basename(ckpts[0]).split("-")[1])
    assert 1 <= step < 40
    assert os.path.isdir(os.path.join(ckpts[0], "train_state"))
    # the end-of-training export is SKIPPED on preemption: the resumable
    # checkpoint above is the durable artifact; nothing half-written sits
    # at the run root
    assert not os.path.exists(os.path.join(out_dir, "model_index.json"))
    # the handler was restored (no stale reference into the finished run)
    assert signalmod.getsignal(signalmod.SIGTERM) in (
        signalmod.SIG_DFL, signalmod.default_int_handler)
    # and the checkpoint actually resumes
    out2 = main(**_base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        output_dir=str(tmp_path / "out_resume"),
        max_train_steps=step + 1, checkpointing_steps=1000,
        shuffle=False, resume_from_checkpoint=ckpts[0]))
    assert os.path.exists(os.path.join(out2, "model_index.json"))
