"""Per-preset quantitative suite (SURVEY §6: "(b) steps/sec for each of
the 4 config presets, (c) peak memory").

Drives each shipped YAML preset (configs/v2/*.yaml) through the ENGINE's
own setup path — `load_train_config` → `select_trainable` →
`LoraHandler.add_lora_to_model` → `get_optimizer` (incl. the 8-bit-Adam
branch) → `TrainStepConfig` mirroring engine.py:561-578 — at full
ms-1.7b geometry with synthetic weights (no pretrained pipeline dir
exists in this environment; geometry, dtype policy, trainable selection,
optimizer and loss structure are the real code path, so steps/s and the
HBM envelope are the production numbers).

Peak HBM is a process-lifetime high-water mark (`device.memory_stats()`
has no reset), so ONE preset runs per invocation:

  PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/preset_bench.py --preset train
  for p in train lora low_vram low_vram_fp32adam stable; do ...; done

`low_vram_fp32adam` is the A/B: the low-VRAM preset with
use_8bit_adam forced off (reference low_vram_config_example.yaml's whole
point is the memory envelope; the delta isolates ops/quantized_adam.py).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

PRESETS = {
    "train": ("configs/v2/train_config.yaml", {}),
    # the workload where quantized Adam's HBM saving matters: 468M fp32
    # trainable -> 3.7 GiB of fp32 moments, peak 14.9/16 GiB
    "train_8bitadam": ("configs/v2/train_config.yaml",
                       {"use_8bit_adam": True}),
    "lora": ("configs/v2/lora_training_config.yaml", {}),
    "low_vram": ("configs/v2/low_vram_config_example.yaml", {}),
    "low_vram_fp32adam": ("configs/v2/low_vram_config_example.yaml",
                          {"use_8bit_adam": False}),
    "stable": ("configs/v2/stable_lora_config.yaml", {}),
}


def tree_bytes(tree):
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def tree_count(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def build(cfg):
    from text_to_video_finetuning_tpu.lora.handler import LoraHandler
    from text_to_video_finetuning_tpu.models import (
        CLIP_MS_TEXT_CONFIG, CLIPTextModel, UNET3D_MS_1_7B_CONFIG,
        UNet3DConditionModel)
    from text_to_video_finetuning_tpu.schedulers.ddpm import (
        DDPMScheduler, SchedulerConfig)
    from text_to_video_finetuning_tpu.training import (
        TrainState, TrainStepConfig, make_train_step)
    from text_to_video_finetuning_tpu.training.optim import (
        get_lr_schedule, get_optimizer)
    from text_to_video_finetuning_tpu.training.trainable import (
        select_trainable)

    td = cfg.train_data or {}
    frames = int(td.get("n_sample_frames", 8))
    lh = int(td.get("height", 256)) // 8
    lw = int(td.get("width", 256)) // 8
    batch = int(cfg.train_batch_size)

    ucfg = UNET3D_MS_1_7B_CONFIG
    unet = UNet3DConditionModel(
        config=ucfg, dtype=jnp.bfloat16,
        gradient_checkpointing=cfg.gradient_checkpointing,
        remat_policy=cfg.remat_policy,
        fused_groupnorm=cfg.fused_groupnorm,
        attention_backend=cfg.attention_backend)
    clip = CLIPTextModel(
        config=CLIP_MS_TEXT_CONFIG, dtype=jnp.bfloat16,
        gradient_checkpointing=cfg.text_encoder_gradient_checkpointing)
    rng = jax.random.PRNGKey(0)

    def zeros_like_shape(tree):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), tree)

    unet_params = zeros_like_shape(jax.eval_shape(
        lambda r: unet.init(
            r, jnp.zeros((1, 4, frames, lh, lw), jnp.bfloat16),
            jnp.array([1]),
            jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.bfloat16)
        )["params"], rng))
    text_params = zeros_like_shape(jax.eval_shape(
        lambda r: clip.init(r, jnp.zeros((1, 77), jnp.int32))["params"],
        rng))

    # LoRA + trainable selection: the engine's own calls (engine.py:413-439)
    handler = LoraHandler(
        version=cfg.lora_version, use_unet_lora=cfg.use_unet_lora,
        use_text_lora=cfg.use_text_lora,
        unet_replace_modules=cfg.unet_lora_modules,
        text_encoder_replace_modules=cfg.text_encoder_lora_modules,
        lora_bias=cfg.lora_bias)
    rng, k1, k2 = jax.random.split(rng, 3)
    unet_lora, unet_sites, unet_negation = handler.add_lora_to_model(
        cfg.use_unet_lora, "unet", ucfg, dropout=cfg.lora_unet_dropout,
        r=cfg.lora_rank, rng=k1)
    text_lora, text_sites, text_negation = handler.add_lora_to_model(
        cfg.use_text_lora, "text_encoder", CLIP_MS_TEXT_CONFIG,
        dropout=cfg.lora_text_dropout, r=cfg.lora_rank, rng=k2)
    unet_trainable, unet_frozen = select_trainable(
        unet_params, "unet", cfg.trainable_modules, unet_negation)
    text_modules = (cfg.trainable_text_modules
                    if cfg.train_text_encoder else None)
    text_trainable, text_frozen = select_trainable(
        text_params, "text_encoder", text_modules, text_negation)

    # frozen trees in bf16 (engine.py:441-451)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t)
    frozen = {"unet": cast(unet_frozen), "text": cast(text_frozen)}
    trainable = {}
    if unet_trainable:
        trainable["unet"] = unet_trainable
    if text_trainable:
        trainable["text"] = text_trainable
    if unet_lora is not None:
        trainable["unet_lora"] = unet_lora
    if text_lora is not None:
        trainable["text_lora"] = text_lora
    assert trainable, "preset selects nothing to train"

    schedule = get_lr_schedule(cfg.lr_scheduler, cfg.learning_rate,
                               cfg.lr_warmup_steps, cfg.max_train_steps)
    optimizer = get_optimizer(
        schedule, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_weight_decay,
        cfg.adam_epsilon, cfg.max_grad_norm, cfg.use_8bit_adam)
    if cfg.gradient_accumulation_steps > 1:
        import optax
        optimizer = optax.MultiSteps(
            optimizer, every_k_schedule=cfg.gradient_accumulation_steps)

    step_cfg = TrainStepConfig(
        unet=unet, text_encoder=clip, vae=None,
        scheduler=DDPMScheduler(SchedulerConfig()),
        unet_sites=tuple(unet_sites), text_sites=tuple(text_sites),
        lora_version=cfg.lora_version, lora_branch=cfg.lora_branch,
        lora_unet_dropout=cfg.lora_unet_dropout,
        lora_text_dropout=cfg.lora_text_dropout,
        cache_latents=True,  # every shipped preset caches latents
        use_offset_noise=cfg.use_offset_noise,
        rescale_schedule=cfg.rescale_schedule,
        offset_noise_strength=cfg.offset_noise_strength,
        mixed_precision=cfg.mixed_precision,
        two_pass=cfg.two_pass_loss)
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng)
    batch_tree = {
        "pixel_values": jnp.zeros((batch, 4, frames, lh, lw),
                                  jnp.bfloat16),
        "prompt_ids": jnp.zeros((batch, 77), jnp.int32),
    }
    jit_step = jax.jit(make_train_step(step_cfg, optimizer),
                       donate_argnums=(0,))
    info = {
        "frames": frames, "latent_hw": [lh, lw], "batch": batch,
        "trainable_params": tree_count(trainable),
        "trainable_bytes": tree_bytes(trainable),
        "opt_state_bytes": tree_bytes(state.opt_state),
        "frozen_bytes": tree_bytes(frozen),
        "use_8bit_adam": bool(cfg.use_8bit_adam),
        "remat_policy": cfg.remat_policy,
    }
    return jit_step, state, frozen, batch_tree, info


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", required=True, choices=sorted(PRESETS))
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--dry", action="store_true",
                   help="trace/shape-check only (no compile/execute); "
                        "works on CPU")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="ad-hoc config override on top of the preset "
                        "(VALUE parsed as JSON, else kept as string); "
                        "e.g. --set gradient_checkpointing=false "
                        "--set train_batch_size=2")
    args = p.parse_args()

    from text_to_video_finetuning_tpu.config import load_train_config
    from text_to_video_finetuning_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()
    path, overrides = PRESETS[args.preset]
    cfg = load_train_config(path)
    for k, v in overrides.items():
        setattr(cfg, k, v)
    for spec in args.overrides:
        key, sep, raw = spec.partition("=")
        if not sep or not key:
            p.error(f"--set expects KEY=VALUE, got {spec!r}")
        if not hasattr(cfg, key):
            p.error(f"--set: unknown config key {key!r}")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw   # bare strings (e.g. remat policies) pass through
        setattr(cfg, key, val)

    dev = jax.devices()[0]
    print(f"backend: {jax.default_backend()} {dev.device_kind}")
    jit_step, state, frozen, batch_tree, info = build(cfg)

    if args.dry:
        out = jax.eval_shape(jit_step, state, frozen, None, batch_tree)
        print(json.dumps({"preset": args.preset, "dry": True,
                          "loss_shape": list(out[1]["loss"].shape), **info}))
        return

    # warmup (compile) + timed loop; float() readback drains the tunnel
    state, metrics = jit_step(state, frozen, None, batch_tree)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = jit_step(state, frozen, None, batch_tree)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    row = {"preset": args.preset, "config": path,
           "step_ms": round(dt * 1e3, 1),
           "steps_per_s": round(1.0 / dt, 3), **info}
    try:
        stats = dev.memory_stats() or {}
        for k in ("peak_bytes_in_use", "bytes_in_use", "bytes_limit"):
            if k in stats:
                row[k] = int(stats[k])
        if "peak_bytes_in_use" in row:
            row["peak_gib"] = round(row["peak_bytes_in_use"] / 2**30, 2)
    except Exception as e:  # tunnel backends may not expose stats
        row["memory_stats_error"] = str(e)[:120]
    if "peak_bytes_in_use" not in row:
        # the axon tunnel's PJRT plugin does not implement memory_stats;
        # fall back to the COMPILER's own executable memory analysis
        # (XLA's figure for argument + output + temp/scratch HBM — the
        # step's true envelope, since the args hold all params/opt state)
        try:
            # robust to any invocation shape (python -m, cwd elsewhere):
            # put this file's own directory on sys.path before importing
            # the sibling module (profile_step.py uses the same pattern)
            import os as _os
            import sys as _sys
            _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
            from step_bench import mem_dict
            mem = (jit_step.lower(state, frozen, None, batch_tree)
                   .compile().memory_analysis())
            row.update(mem_dict(mem))
        except Exception as e:
            row["memory_analysis_error"] = str(e)[:120]
    print(json.dumps(row))


if __name__ == "__main__":
    main()
