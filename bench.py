"""Benchmark: train steps/sec/chip at the BASELINE.md north-star workload.

Measures the full jitted two-pass LoRA finetune step (UNet fwd x2 + bwd,
offset noise, AdamW) on the ms-1.7b-geometry UNet at 256x256x16 frames with
cached latents, bf16 compute -- the reference's headline configuration
(BASELINE.md: "train steps/sec/chip at 256x256x16f LoRA finetune").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the RTX 3090 + xformers reference estimate
(~1.0 steps/s at this workload; the reference publishes no numbers --
BASELINE.json "published": {} -- so this is the recorded proxy target).
"""

import json
import os
import time

# keep bench runs deterministic-ish and quiet
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

BASELINE_STEPS_PER_SEC = 1.0   # RTX 3090 + xformers proxy (BASELINE.md)


def build():
    import jax
    import jax.numpy as jnp
    from text_to_video_finetuning_tpu.lora.handler import LoraHandler
    from text_to_video_finetuning_tpu.models import (
        CLIPTextModel, UNET3D_MS_1_7B_CONFIG, UNet3DConditionModel,
        CLIP_MS_TEXT_CONFIG)
    from text_to_video_finetuning_tpu.schedulers.ddpm import (
        DDPMScheduler, SchedulerConfig)
    from text_to_video_finetuning_tpu.training import (TrainState,
                                                       TrainStepConfig,
                                                       make_train_step)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)

    ucfg = UNET3D_MS_1_7B_CONFIG
    ccfg = CLIP_MS_TEXT_CONFIG
    unet = UNet3DConditionModel(config=ucfg, dtype=jnp.bfloat16,
                                gradient_checkpointing=True,
                                attention_backend="auto")
    clip = CLIPTextModel(config=ccfg, dtype=jnp.bfloat16)

    batch, frames, latent = 1, 16, 32   # 256x256 px -> 32x32 latents
    rng = jax.random.PRNGKey(0)

    def zeros_like_shape(tree):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), tree)

    unet_params = zeros_like_shape(jax.eval_shape(
        lambda r: unet.init(
            r, jnp.zeros((1, 4, frames, latent, latent), jnp.bfloat16),
            jnp.array([1]),
            jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.bfloat16)
        )["params"], rng))
    text_params = zeros_like_shape(jax.eval_shape(
        lambda r: clip.init(r, jnp.zeros((1, 77), jnp.int32))["params"],
        rng))

    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True,
                          unet_replace_modules=["Transformer2DModel",
                                                "TransformerTemporalModel",
                                                "ResnetBlock2D"])
    unet_lora, unet_sites, _ = handler.add_lora_to_model(
        True, "unet", ucfg, r=16, rng=rng)

    trainable = {"unet_lora": unet_lora}
    # frozen params in bf16 (reference casts frozen models to half,
    # train.py:680-686): halves their HBM read traffic per UNet pass
    frozen = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        {"unet": unet_params, "text": text_params})

    scheduler = DDPMScheduler(SchedulerConfig())
    optimizer = get_optimizer(get_lr_schedule("constant", 5e-6, 0, 100))
    step_cfg = TrainStepConfig(
        unet=unet, text_encoder=clip, vae=None, scheduler=scheduler,
        unet_sites=tuple(unet_sites), lora_version="cloneofsimo",
        cache_latents=True, use_offset_noise=False)
    train_step = make_train_step(step_cfg, optimizer)

    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng)
    batch_tree = {
        # cached-latents path: pixel_values ARE latents (B, 4, F, h, w)
        "pixel_values": jnp.zeros((batch, 4, frames, latent, latent),
                                  jnp.bfloat16),
        "prompt_ids": jnp.zeros((batch, 77), jnp.int32),
    }
    jit_step = jax.jit(train_step, donate_argnums=(0,))
    return jit_step, state, frozen, batch_tree


def main():
    import jax
    jit_step, state, frozen, batch_tree = build()

    # warmup/compile (float() forces a host readback: block_until_ready on
    # the tunneled TPU can return before the queue drains)
    state, metrics = jit_step(state, frozen, None, batch_tree)
    float(metrics["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = jit_step(state, frozen, None, batch_tree)
    float(metrics["loss"])   # drain the dispatch queue
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    print(json.dumps({
        "metric": "train steps/sec/chip (256x256x16f LoRA finetune, "
                  "bf16, grad ckpt, cached latents)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
