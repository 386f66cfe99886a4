"""Capture a jax.profiler trace of the headline train step and print the
top HLO ops by self-time (uses tensorboard_plugin_profile's xplane parser).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/profile_step.py [trace_dir]
With an existing trace dir argument, skips capture and just summarizes.
"""

import glob
import json
import os
import sys


def summarize(trace_dir: str, top: int = 30):
    """Aggregate device-track op durations from the chrome trace json."""
    import gzip
    import re
    from collections import defaultdict

    traces = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print(f"no trace.json.gz under {trace_dir}")
        return
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f).get("traceEvents", [])

    # identify device process ids (TPU/TensorCore tracks)
    device_pids = set()
    all_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            all_pids.add(e["pid"])
            pname = e.get("args", {}).get("name", "")
            if any(s in pname for s in ("TPU", "Device", "/device:")):
                device_pids.add(e["pid"])
    if not device_pids:
        device_pids = all_pids   # CPU runs: the host track IS the device

    by_op = defaultdict(float)
    bytes_by_op = defaultdict(float)
    total = 0.0
    total_bytes = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0)
        name = e.get("name", "?")
        # strip instance suffixes: fusion.123 -> fusion
        base = re.sub(r"[.\d]+$", "", name)
        by_op[base] += dur
        total += dur
        # XLA op events carry HBM traffic in args: the headline
        # "bytes accessed" plus per-operand breakdowns ("bytes accessed
        # operandN{}" etc).  Sum ONLY the headline figure -- dict order is
        # not guaranteed, so pick the exact key, falling back to the
        # SHORTEST matching key (breakdown keys are strictly longer).
        args = e.get("args", {}) or {}
        cands = [k for k in args
                 if "bytes" in k.lower() and "accessed" in k.lower()]
        if cands:
            key = ("bytes accessed" if "bytes accessed" in args
                   else min(cands, key=len))
            try:
                b = float(str(args[key]).replace(",", ""))
                bytes_by_op[base] += b
                total_bytes += b
            except ValueError:
                pass

    print(f"== device op self-time from {os.path.basename(path)} "
          f"(total {total / 1e3:.1f} ms across traced steps) ==")
    if total_bytes:
        print(f"== HBM bytes accessed: {total_bytes / 1e9:.1f} GB total "
              f"across traced steps ==")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        gb = bytes_by_op.get(name, 0.0) / 1e9
        suffix = f"  {gb:7.1f} GB" if total_bytes else ""
        print(f"{dur / 1e3:10.2f} ms  {100 * dur / max(total, 1):5.1f}%  "
              f"{name}{suffix}")


def capture_and_summarize():
    import time
    import jax
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from benchmarks.step_bench import build, run

    jit_step, state, frozen, vae_params, batch_tree = build(
        grad_ckpt=True, backend="auto",
        remat_policy=os.environ.get("T2V_PROFILE_REMAT", "conv_attn+skiplow"))
    # compile + warm
    state, metrics = jit_step(state, frozen, vae_params, batch_tree)
    jax.block_until_ready(metrics["loss"])

    trace_dir = "/tmp/t2v_step_trace"
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, metrics = jit_step(state, frozen, vae_params, batch_tree)
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir}")
    summarize(trace_dir)


def capture_sampler(hires: bool = False):
    """Trace ONE scan-sampler video (25 DPM-Solver++ steps, CFG) at the
    full ms-1.7b geometry -- the inference counterpart of the train-step
    roofline.  Divide the reported totals by 25 for per-denoise-step
    figures."""
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from text_to_video_finetuning_tpu.models import (UNET3D_MS_1_7B_CONFIG,
                                                     UNet3DConditionModel)
    from text_to_video_finetuning_tpu.pipelines.text_to_video import (
        _scan_denoise)
    from text_to_video_finetuning_tpu.schedulers.ddpm import SchedulerConfig
    from text_to_video_finetuning_tpu.schedulers.dpmsolver import (
        DPMSolverMultistepScheduler)
    from text_to_video_finetuning_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()
    frames, lh, lw = (24, 40, 72) if hires else (16, 32, 32)
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
    jax.block_until_ready(out)
    trace_dir = "/tmp/t2v_sampler_trace"
    jax.profiler.start_trace(trace_dir)
    out = scan_once()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir} "
          f"(1 video = 25 denoise steps, {frames} frames, "
          f"{'576x320' if hires else '256x256'})")
    summarize(trace_dir)


if __name__ == "__main__":
    if "--sampler" in sys.argv:
        capture_sampler(hires="--hires" in sys.argv)
    elif len(sys.argv) > 1 and not sys.argv[1].startswith("-"):
        summarize(sys.argv[1])
    else:
        capture_and_summarize()
