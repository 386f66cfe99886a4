"""BASELINE.md quantitative suite: UNet fwd / fwd+bwd wall-time at
256x256x{8,16}f, inference sec/frame at 25 steps, device memory.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/full_bench.py
"""

import json
import time

import jax
import jax.numpy as jnp


def _unet(frames: int):
    from text_to_video_finetuning_tpu.models import (UNET3D_MS_1_7B_CONFIG,
                                                     UNet3DConditionModel)
    ucfg = UNET3D_MS_1_7B_CONFIG
    unet = UNet3DConditionModel(config=ucfg, dtype=jnp.bfloat16,
                                gradient_checkpointing=True,
                                attention_backend="auto")
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 4, frames, 32, 32), jnp.bfloat16)
    text = jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.bfloat16)
    t = jnp.array([500])
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda r: unet.init(r, sample, t, text)["params"],
                       rng))
    return unet, params, sample, t, text


def bench_ms(fn, args, n=10):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    results = {}
    for frames in (8, 16):
        unet, params, sample, t, text = _unet(frames)
        fwd = jax.jit(lambda p, s, t, e: unet.apply({"params": p}, s, t, e))
        results[f"unet_fwd_ms_{frames}f"] = round(
            bench_ms(fwd, (params, sample, t, text)), 1)

        def loss(p, s, tt, e):
            return jnp.mean(jnp.square(
                unet.apply({"params": p}, s, tt, e).astype(jnp.float32)))
        g = jax.jit(jax.grad(loss))
        def gsum(p, s, tt, e):
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(g(p, s, tt, e)))
        gj = jax.jit(gsum)
        out = gj(params, sample, t, text)
        _ = float(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = gj(params, sample, t, text)
        _ = float(out)
        results[f"unet_fwd_bwd_ms_{frames}f"] = round(
            (time.perf_counter() - t0) / 5 * 1e3, 1)
        print(json.dumps(results))

    # inference sec/frame: 25 steps, CFG, 16 frames, full window, 256px
    unet, params, sample, t, text = _unet(16)
    from text_to_video_finetuning_tpu.schedulers.ddpm import SchedulerConfig
    from text_to_video_finetuning_tpu.schedulers.dpmsolver import (
        DPMSolverMultistepScheduler)
    sched = DPMSolverMultistepScheduler(SchedulerConfig())
    timesteps = sched.set_timesteps(25)
    embeds = jnp.zeros((2, 77, 1024), jnp.bfloat16)
    fwd = jax.jit(lambda p, s, t, e: unet.apply({"params": p}, s, t, e))

    def sample_video():
        latents = jnp.zeros((1, 4, 16, 32, 32), jnp.float32)
        state = sched.init_state(latents.shape)
        for i, tt in enumerate(timesteps):
            latent_in = jnp.concatenate([latents] * 2).astype(jnp.bfloat16)
            pred = fwd(params, latent_in, jnp.full((2,), tt), embeds)
            u, c = jnp.split(pred.astype(jnp.float32), 2, axis=0)
            pred = u + 9.0 * (c - u)
            latents, state = sched.step(pred, i, latents, state)
        return latents

    out = sample_video()
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    out = sample_video()
    _ = float(jnp.sum(out))
    dt = time.perf_counter() - t0
    results["inference_sec_per_frame_25steps"] = round(dt / 16, 3)
    results["inference_sec_per_video_16f"] = round(dt, 2)

    try:
        stats = jax.devices()[0].memory_stats() or {}
        results["peak_bytes_in_use_gb"] = round(
            stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass
    print(json.dumps(results))


if __name__ == "__main__":
    main()
