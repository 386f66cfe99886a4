"""Benchmark: train steps/sec/chip at the BASELINE.md north-star workload.

Measures the full jitted two-pass LoRA finetune step (UNet fwd x2 + bwd,
AdamW) on the ms-1.7b-geometry UNet at 256x256x16 frames with cached
latents, bf16 compute -- the reference's headline configuration
(BASELINE.md: "train steps/sec/chip at 256x256x16f LoRA finetune").
Workload construction is shared with benchmarks/step_bench.py.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the RTX 3090 + xformers reference estimate
of 1.0 steps/s at this workload (the reference publishes no numbers --
BASELINE.json "published": {}).  The figure is DERIVED, not measured: 20.7
TFLOPs/step (15.5 TF two-pass fwd+bwd + grad-ckpt recompute) at 30% of the
3090's 71 TFLOP/s fp16 peak; full derivation in BASELINE.md.
"""

import json
import os
import sys
import time

# keep bench runs deterministic-ish and quiet
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "benchmarks"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_STEPS_PER_SEC = 1.0   # RTX 3090 + xformers proxy (BASELINE.md)


def main():
    from step_bench import build

    # conv_attn_dense+skiplow3: save tagged conv + attention + transformer
    # dense outputs under remat, remat only the highest-resolution UNet
    # level -- measured fastest policy on v5e (benchmarks/RESULTS.md
    # remat-policy table)
    jit_step, state, frozen, batch_tree = build(
        grad_ckpt=True, backend="auto",
        remat_policy="conv_attn_dense+skiplow3")

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
