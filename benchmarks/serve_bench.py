"""Serving batch-throughput: the scan sampler at full model size, request
batch B=1 vs B=4 (the t2v-serve coalescing win). Run:
PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/serve_bench.py

Rationale: t2v-serve coalesces same-signature requests into one batched
`diffuse` dispatch (serving/server.py). The UNet step is batch-parallel on
the MXU, so per-request cost should fall well below the singleton cost;
this measures by how much at the headline 256x256x16f / 25-step / CFG
signature (reference inference.py defaults via cli.py).
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


def bench_batch(unet, params, batch: int, frames: int, lh: int, lw: int,
                steps: int, reps: int = 3) -> float:
    """Seconds per sampler dispatch at request-batch `batch` (CFG doubles
    the UNet batch internally via the 2B embeds/latent concat)."""
    cfg = UNET3D_MS_1_7B_CONFIG
    text = jnp.zeros((2 * batch, 77, cfg.cross_attention_dim), jnp.bfloat16)
    sched = DPMSolverMultistepScheduler(SchedulerConfig())
    ts = sched.set_timesteps(steps)
    coeffs = sched.scan_coeffs()
    latents = jnp.zeros((batch, 4, frames, lh, lw), jnp.float32)
    state = sched.init_state(latents.shape)

    def once():
        out = _scan_denoise(params, latents, state, text, jnp.float32(9.0),
                            jnp.asarray(ts, jnp.int32), coeffs, unet=unet,
                            prediction_type="epsilon", solver_order=2,
                            cfg=True)
        return float(jnp.sum(out))

    t0 = time.perf_counter()
    once()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"B={batch}: compile+first {compile_s:.1f}s, "
          f"steady {best:.3f}s/dispatch = {best / batch:.3f}s/request")
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 4])
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args()
    lh, lw = args.height // 8, args.width // 8

    ucfg = UNET3D_MS_1_7B_CONFIG
    unet = UNet3DConditionModel(config=ucfg, dtype=jnp.bfloat16,
                                attention_backend="auto")
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 4, args.frames, lh, lw), jnp.bfloat16)
    text = jnp.zeros((2, 77, ucfg.cross_attention_dim), jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda r: unet.init(r, sample,
                                           jnp.array([1, 1]), text)["params"],
                       rng))

    results = {}
    for b in args.batches:
        results[b] = bench_batch(unet, params, b, args.frames, lh, lw,
                                 args.steps)
    if len(results) > 1:
        b0 = min(results)
        for b, t in sorted(results.items()):
            speedup = (results[b0] * b / b0) / t
            print(f"B={b}: per-request throughput x{speedup:.2f} vs B={b0}")
    print(json.dumps({f"seconds_per_dispatch_B{b}": round(t, 3)
                      for b, t in results.items()}))


if __name__ == "__main__":
    main()
