"""Serving batch-throughput: the scan sampler at full model size, request
batch B=1 vs B=4 (the t2v-serve coalescing win). Run:
PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/serve_bench.py

Rationale: t2v-serve coalesces same-signature requests into one batched
`diffuse` dispatch (serving/server.py). The UNet step is batch-parallel on
the MXU, so per-request cost should fall well below the singleton cost;
this measures by how much at the headline 256x256x16f / 25-step / CFG
signature (reference inference.py defaults via cli.py).

`--http` measures the WHOLE serving path instead: a real T2VServer (HTTP
front end, batching worker, VAE decode, mp4 export) on full-size
random-weight models, driven by concurrent clients at concurrency 1/2/4,
coalesced vs per-request `no_batch`, with the cold-start compile recorded.
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


def _build_full_pipe(use_fused_attention: bool = True):
    """Full ms-1.7b-geometry pipeline on random/zero bf16 weights (no real
    checkpoint in this environment): identical compute/memory shape to a
    real deployment, only the pixels are meaningless."""
    import tempfile

    from transformers import CLIPTokenizer

    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     CLIPTextModel)
    from text_to_video_finetuning_tpu.models.clip_text import (
        CLIP_MS_TEXT_CONFIG)
    from text_to_video_finetuning_tpu.models.vae import VAEConfig
    from text_to_video_finetuning_tpu.pipelines.text_to_video import (
        TextToVideoSDPipeline)
    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)

    rng = jax.random.PRNGKey(0)
    zeros_bf16 = lambda shapes: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)

    ucfg = UNET3D_MS_1_7B_CONFIG
    unet = UNet3DConditionModel(
        config=ucfg, dtype=jnp.bfloat16,
        attention_backend="auto" if use_fused_attention else "xla")
    unet_params = zeros_bf16(jax.eval_shape(
        lambda r: unet.init(r, jnp.zeros((2, 4, 8, 32, 32), jnp.bfloat16),
                            jnp.array([1, 1]),
                            jnp.zeros((2, 77, ucfg.cross_attention_dim),
                                      jnp.bfloat16))["params"], rng))
    vcfg = VAEConfig()
    vae = AutoencoderKL(config=vcfg, dtype=jnp.bfloat16)
    vae_params = zeros_bf16(jax.eval_shape(
        lambda r: vae.init({"params": r, "gaussian": r},
                           jnp.zeros((1, 3, 64, 64), jnp.bfloat16))["params"],
        rng))
    ccfg = CLIP_MS_TEXT_CONFIG
    clip = CLIPTextModel(config=ccfg, dtype=jnp.bfloat16)
    text_params = zeros_bf16(jax.eval_shape(
        lambda r: clip.init(r, jnp.zeros((1, 77), jnp.int32))["params"],
        rng))
    tok_dir = tempfile.mkdtemp(prefix="t2v_serve_bench_tok_")
    write_minimal_clip_tokenizer(tok_dir, vocab_size_floor=ccfg.vocab_size)
    tokenizer = CLIPTokenizer.from_pretrained(tok_dir)
    return TextToVideoSDPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=clip, text_params=text_params, tokenizer=tokenizer,
        scheduler_config=SchedulerConfig())


def http_mode(args):
    """Drive a real warm t2v-serve over HTTP (VERDICT r3 #3): latency and
    videos/min at concurrency 1/2/4, coalesced vs no_batch, cold vs warm."""
    import tempfile
    import threading
    import urllib.request

    from text_to_video_finetuning_tpu.serving.server import (
        GenerationRequest, T2VServer)
    from text_to_video_finetuning_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()

    out_dir = tempfile.mkdtemp(prefix="t2v_serve_bench_out_")
    server = T2VServer(model="<in-memory ms-1.7b-geometry random>",
                       host="127.0.0.1", port=0, output_dir=out_dir,
                       max_batch=max(args.concurrency),
                       batch_window_ms=100.0, pipe=_build_full_pipe())
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://{server.host}:{server.port}"
    sig = dict(width=args.width, height=args.height, num_frames=args.frames,
               num_steps=args.steps, guidance_scale=9.0, seed=3)

    def post(payload):
        req = urllib.request.Request(
            f"{base}/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=7200) as r:
            return json.loads(r.read())

    # cold start: first request pays the full-model sampler compile
    t0 = time.perf_counter()
    post(dict(sig, prompt="cold start"))
    cold_s = time.perf_counter() - t0
    print(f"cold start (compile + first video): {cold_s:.1f}s")

    results = {"cold_start_s": round(cold_s, 1)}

    # warm every coalesced batch shape the measurement will form — each
    # batch size is its own XLA program, and an unwarmed shape's compile
    # lands on the first coalesced wave and dominates the numbers (the
    # production server does this via --warmup-batch-sizes)
    warm_req = GenerationRequest(
        prompt="warmup", width=args.width, height=args.height,
        num_frames=args.frames, num_steps=args.steps, guidance_scale=9.0)
    for b in sorted({c for c in args.concurrency if c > 1}):
        t0 = time.perf_counter()
        server.warmup(warm_req, batch_sizes=[b])
        dt = time.perf_counter() - t0
        results[f"warm_shape_B{b}_s"] = round(dt, 1)
        print(f"warm batch shape B={b}: {dt:.1f}s")
    if args.closed_loop:
        # Steady-state: each client re-posts the moment its previous
        # request returns, for a fixed duration — no wave barrier, so the
        # worker's two-stage pipeline (dispatch N+1 before N's readback)
        # is measured rather than inter-wave idle.  Throughput counts
        # only requests COMPLETED inside the window.
        for conc in args.concurrency:
            for no_batch in (False, True):
                if no_batch and conc == 1:
                    continue
                label = (f"loop_conc{conc}"
                         + ("_no_batch" if no_batch else ""))
                latencies, done = [], []
                deadline = time.perf_counter() + args.closed_loop
                t_all = time.perf_counter()

                def client(i):
                    n = 0
                    while time.perf_counter() < deadline:
                        t = time.perf_counter()
                        post(dict(sig, prompt=f"loop client {i} req {n}",
                                  no_batch=no_batch))
                        latencies.append(time.perf_counter() - t)
                        n += 1
                    done.append(n)

                threads = [threading.Thread(target=client, args=(i,))
                           for i in range(conc)]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                wall = time.perf_counter() - t_all
                total = sum(done)
                results[label] = {
                    "mean_latency_s": round(
                        sum(latencies) / max(1, len(latencies)), 2),
                    "videos_per_min": round(total / wall * 60.0, 2),
                    "completed": total,
                }
                print(f"{label}: {total} videos in {wall:.1f}s = "
                      f"{results[label]['videos_per_min']} videos/min, "
                      f"mean latency {results[label]['mean_latency_s']}s")
        server.shutdown()
        print(json.dumps(results))
        return

    waves = 3
    for conc in args.concurrency:
        for no_batch in (False, True):
            if no_batch and conc == 1:
                continue   # identical to the coalesced singleton
            label = f"conc{conc}" + ("_no_batch" if no_batch else "")
            latencies, coalesced, errors = [], [], []
            t_all = time.perf_counter()
            for wave in range(waves):
                bodies = [None] * conc
                def call(i):
                    t = time.perf_counter()
                    try:
                        bodies[i] = post(dict(
                            sig, prompt=f"wave {wave} client {i}",
                            no_batch=no_batch))
                    except Exception as e:  # surface the real HTTP failure
                        errors.append(f"wave {wave} client {i}: {e}")
                        return
                    latencies.append(time.perf_counter() - t)
                threads = [threading.Thread(target=call, args=(i,))
                           for i in range(conc)]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                if errors:
                    raise RuntimeError(
                        f"{label}: request failures: {errors}")
                coalesced += [b["coalesced"] for b in bodies]
            wall = time.perf_counter() - t_all
            vids_per_min = waves * conc / wall * 60.0
            results[label] = {
                "mean_latency_s": round(sum(latencies) / len(latencies), 2),
                "videos_per_min": round(vids_per_min, 2),
                "max_coalesced": max(coalesced),
            }
            print(f"{label}: mean latency "
                  f"{results[label]['mean_latency_s']}s, "
                  f"{results[label]['videos_per_min']} videos/min, "
                  f"max coalesced {max(coalesced)}")
    server.shutdown()
    print(json.dumps(results))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 4])
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--http", action="store_true",
                   help="bench the full HTTP serving path (T2VServer)")
    p.add_argument("--concurrency", type=int, nargs="+", default=[1, 2, 4],
                   help="client concurrency levels for --http")
    p.add_argument("--closed-loop", type=float, default=0.0, metavar="SECS",
                   help="with --http: closed-loop steady-state mode — each "
                        "client re-posts immediately for SECS seconds (no "
                        "wave barrier), measuring the worker pipeline's "
                        "sustained videos/min instead of wave throughput")
    args = p.parse_args()
    if args.http:
        http_mode(args)
        return
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
