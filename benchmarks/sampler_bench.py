"""Scan sampler vs host-loop sampler at the full model size (25 steps, CFG,
16 frames, 256px). Run:
PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/sampler_bench.py

--hires runs the scan sampler only, at the reference's suggested ZeroScope
regime (576x320, 24 frames -- reference README "Suggested Settings"):
2880-token spatial attention, where the Pallas flash kernel carries the
step.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from text_to_video_finetuning_tpu.models import (UNET3D_MS_1_7B_CONFIG,
                                                 UNet3DConditionModel)
from text_to_video_finetuning_tpu.pipelines.text_to_video import _scan_denoise
from text_to_video_finetuning_tpu.schedulers.ddpm import SchedulerConfig
from text_to_video_finetuning_tpu.schedulers.dpmsolver import (
    DPMSolverMultistepScheduler)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hires", action="store_true",
                   help="576x320 24f scan-sampler-only run")
    args = p.parse_args()
    frames, lh, lw = (24, 40, 72) if args.hires else (16, 32, 32)

    ucfg = UNET3D_MS_1_7B_CONFIG
    unet = UNet3DConditionModel(config=ucfg, dtype=jnp.bfloat16,
                                attention_backend="auto")
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 4, frames, lh, lw), jnp.bfloat16)
    text = jnp.zeros((2, 77, ucfg.cross_attention_dim), jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda r: unet.init(r, sample, jnp.array([1, 1]),
                                           text)["params"], rng))

    sched = DPMSolverMultistepScheduler(SchedulerConfig())
    ts = sched.set_timesteps(25)
    coeffs = sched.scan_coeffs()
    latents = jnp.zeros((1, 4, frames, lh, lw), jnp.float32)
    state = sched.init_state(latents.shape)

    def scan_once():
        return _scan_denoise(params, latents, state, text,
                             jnp.float32(9.0), jnp.asarray(ts, jnp.int32),
                             coeffs, unet=unet, prediction_type="epsilon",
                             solver_order=2, cfg=True)

    out = scan_once()
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    out = scan_once()
    _ = float(jnp.sum(out))
    scan_s = time.perf_counter() - t0

    if args.hires:
        print(json.dumps({
            "geometry": "576x320x24f (ZeroScope suggested settings)",
            "scan_sampler_s_per_video": round(scan_s, 2),
            "scan_sampler_s_per_frame": round(scan_s / frames, 3),
        }))
        return

    fwd = jax.jit(lambda p, s, t, e: unet.apply({"params": p}, s, t, e))

    def loop_once():
        lat, st = latents, state
        for i, t in enumerate(ts):
            latent_in = jnp.concatenate([lat] * 2).astype(jnp.bfloat16)
            pred = fwd(params, latent_in, jnp.full((2,), t), text)
            u, c = jnp.split(pred.astype(jnp.float32), 2, axis=0)
            pred = u + 9.0 * (c - u)
            lat, st = sched.step(pred, i, lat, st)
        return lat

    out = loop_once()
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    out = loop_once()
    _ = float(jnp.sum(out))
    loop_s = time.perf_counter() - t0

    print(json.dumps({
        "scan_sampler_s_per_video": round(scan_s, 2),
        "scan_sampler_s_per_frame": round(scan_s / frames, 3),
        "host_loop_s_per_video": round(loop_s, 2),
        "host_loop_s_per_frame": round(loop_s / frames, 3),
        "speedup": round(loop_s / scan_s, 2),
    }))


if __name__ == "__main__":
    main()
