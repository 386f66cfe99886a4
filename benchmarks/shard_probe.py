"""Sharded FULL-geometry compile probe (VERDICT r2 item 7).

AOT-lowers and compiles the dp2 x fsdp2 x sp2 sharded two-pass LoRA train
step at the REAL ms-1.7b geometry (256px latents, 16 frames, bf16,
conv_attn_dense+skiplow3 remat) on a virtual 8-device mesh -- no execution
(a full-size step doesn't fit/run sensibly on the CPU host), but the
compile proves the multi-chip sharding of the full-size model partitions:
every collective, reshard, and remat decision is made at this geometry, so
"multi-chip correctness evidence" is no longer micro-geometry-only.

Run: python benchmarks/shard_probe.py            (defaults: 8 devices)
Outputs one JSON line with compile wall time + HLO module stats.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # axon gotcha: must re-pin
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402


def main(n_devices: int = 8):
    from text_to_video_finetuning_tpu.lora.handler import LoraHandler
    from text_to_video_finetuning_tpu.models import (
        CLIPTextModel, CLIP_MS_TEXT_CONFIG, UNET3D_MS_1_7B_CONFIG,
        UNet3DConditionModel)
    from text_to_video_finetuning_tpu.parallel import (
        batch_sharding, make_mesh, MeshConfig, params_sharding, replicate)
    from text_to_video_finetuning_tpu.schedulers.ddpm import (
        DDPMScheduler, SchedulerConfig)
    from text_to_video_finetuning_tpu.training import (
        TrainState, TrainStepConfig, make_train_step)
    from text_to_video_finetuning_tpu.training.optim import (
        get_lr_schedule, get_optimizer)

    devices = jax.devices("cpu")[:n_devices]
    assert len(devices) == n_devices
    mesh = make_mesh(MeshConfig(dp=n_devices // 4, fsdp=2, tp=1, sp=2),
                     devices=devices)

    ucfg = UNET3D_MS_1_7B_CONFIG
    unet = UNet3DConditionModel(config=ucfg, dtype=jnp.bfloat16,
                                gradient_checkpointing=True,
                                remat_policy="conv_attn_dense+skiplow3",
                                attention_backend="xla")
    clip = CLIPTextModel(config=CLIP_MS_TEXT_CONFIG, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    batch, frames, lat = 2, 16, 32     # dp=2 -> per-device batch 1, 256px

    unet_shapes = jax.eval_shape(
        lambda r: unet.init(
            r, jnp.zeros((1, 4, frames, lat, lat), jnp.bfloat16),
            jnp.array([1]),
            jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.bfloat16)
        )["params"], rng)
    text_shapes = jax.eval_shape(
        lambda r: clip.init(r, jnp.zeros((1, 77), jnp.int32))["params"], rng)

    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True,
                          unet_replace_modules=["Transformer2DModel",
                                                "TransformerTemporalModel",
                                                "ResnetBlock2D"])
    unet_lora, unet_sites, _ = handler.add_lora_to_model(
        True, "unet", ucfg, r=16, rng=rng)
    lora_shapes = jax.eval_shape(lambda: unet_lora)

    optimizer = get_optimizer(get_lr_schedule("constant", 5e-6, 0, 100))
    step_cfg = TrainStepConfig(
        unet=unet, text_encoder=clip, vae=None,
        scheduler=DDPMScheduler(SchedulerConfig()),
        unet_sites=tuple(unet_sites), lora_version="cloneofsimo",
        cache_latents=True, two_pass=True)
    train_step = make_train_step(step_cfg, optimizer)

    with mesh:
        trainable_shapes = {"unet_lora": lora_shapes}
        opt_shapes = jax.eval_shape(optimizer.init, trainable_shapes)
        state_shapes = TrainState(
            step=jax.ShapeDtypeStruct((), jnp.int32),
            trainable=trainable_shapes, opt_state=opt_shapes,
            rng=jax.ShapeDtypeStruct((2,), jnp.uint32))
        frozen_shapes = {
            "unet": jax.tree_util.tree_map(
                lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
                unet_shapes),
            "text": jax.tree_util.tree_map(
                lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
                text_shapes),
        }
        batch_shapes = {
            "pixel_values": jax.ShapeDtypeStruct(
                (batch, 4, frames, lat, lat), jnp.bfloat16),
            "prompt_ids": jax.ShapeDtypeStruct((batch, 77), jnp.int32),
        }

        rep = replicate(mesh)
        state_sh = jax.tree_util.tree_map(lambda _: rep, state_shapes)
        frozen_sh = params_sharding(frozen_shapes, mesh, use_fsdp=True,
                                    use_tp=False)
        batch_sh = {
            "pixel_values": batch_sharding(mesh, frame_axis=2),
            "prompt_ids": batch_sharding(mesh),
        }

        jitted = jax.jit(train_step,
                         in_shardings=(state_sh, frozen_sh, None, batch_sh),
                         donate_argnums=(0,))
        t0 = time.perf_counter()
        lowered = jitted.lower(state_shapes, frozen_shapes, None,
                               batch_shapes)
        t_lower = time.perf_counter() - t0
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0 - t_lower
        mem = compiled.memory_analysis()
        out = {
            "probe": "full-geometry dp2xfsdp2xsp2 train step (256px, 16f, "
                     "bf16, conv_attn_dense+skiplow3, LoRA r16)",
            "n_devices": n_devices,
            "mesh": dict(mesh.shape),
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "ok": True,
        }
        if mem is not None:
            out["per_device_temp_bytes"] = int(
                getattr(mem, "temp_size_in_bytes", 0))
            out["per_device_arg_bytes"] = int(
                getattr(mem, "argument_size_in_bytes", 0))
        print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
