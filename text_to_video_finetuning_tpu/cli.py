"""Installable console entry points (`t2v-train`, `t2v-inference`).

The repo-root `train.py` / `inference.py` scripts are thin wrappers over
these so the reference-style invocation (`python train.py --config ...`,
reference train.py:986-991; `python inference.py -m ... -p ...`, reference
inference.py:336-435) and the pip-installed console scripts share one
implementation.
"""

import argparse
import os
import platform
import re
from pathlib import Path
from uuid import uuid4

import numpy as np


def _mesh_arg(spec: str):
    """'dp=2,sp=4' -> a jax Mesh (None for empty spec) — shared by the
    inference and serve CLIs' --mesh flag."""
    if not (spec or "").strip():
        return None
    from text_to_video_finetuning_tpu.parallel import mesh_from_string
    return mesh_from_string(spec)


def train_main(argv=None):
    """`python train.py --config <yaml>` (reference train.py:986-991: the
    YAML's keys are the engine's kwargs)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="./configs/v2/train_config.yaml")
    args = parser.parse_args(argv)

    from text_to_video_finetuning_tpu.config import load_train_config
    # warm-start: reuse compiled executables across runs (a cold full-model
    # TPU compile is ~15 min; warm is seconds)
    from text_to_video_finetuning_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()
    from text_to_video_finetuning_tpu.training.engine import (
        main as engine_main)
    cfg = load_train_config(args.config)
    engine_main(config=cfg)


def merge_lora_main(argv=None):
    """Merge several LoRA files into one (`t2v-merge-lora`) -- the
    capability the reference lists under "What you cannot do" (reference
    README.md:141-145).  Exact via rank concatenation (lora/merge.py);
    --rank compresses the result back down with per-site SVD."""
    parser = argparse.ArgumentParser(
        description="Merge LoRA files (weighted) into a single LoRA file")
    parser.add_argument("inputs", nargs="+",
                        help="LoRA files (.pt / .safetensors), same model "
                             "and target set")
    parser.add_argument("-o", "--output", type=str, required=True,
                        help="merged LoRA path (.pt or .safetensors)")
    parser.add_argument("-m", "--model", type=str, required=True,
                        help="pipeline directory (site enumeration needs "
                             "the model config)")
    parser.add_argument("-k", "--kind", choices=["unet", "text_encoder"],
                        default="unet")
    parser.add_argument("-v", "--version",
                        choices=["cloneofsimo", "stable_lora"],
                        default="cloneofsimo")
    parser.add_argument("-w", "--weights", type=float, nargs="+",
                        default=None,
                        help="per-input weights (default: all 1.0)")
    parser.add_argument("-r", "--rank", type=int, default=0,
                        help="SVD-compress the merged LoRA to this rank "
                             "(0 = keep the exact concatenated rank; "
                             "cloneofsimo only)")
    parser.add_argument("--targets", type=str, nargs="+", default=None,
                        help="target_replace_module set the inputs were "
                             "trained with (default: the full-model set)")
    args = parser.parse_args(argv)

    from text_to_video_finetuning_tpu.lora.handler import LoraHandler
    from text_to_video_finetuning_tpu.lora.merge import (merge_lora_trees,
                                                         truncate_lora_rank)
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt

    targets = args.targets or (["UNet3DConditionModel"]
                               if args.kind == "unet"
                               else ["CLIPEncoderLayer"])
    handler = LoraHandler(version=args.version, use_unet_lora=True,
                          use_text_lora=True,
                          unet_replace_modules=targets,
                          text_encoder_replace_modules=targets)
    if args.kind == "unet":
        cfg = ckpt.load_unet_config(f"{args.model}/unet")
        sites = handler.unet_sites(cfg)
    else:
        cfg = ckpt.load_clip_config(f"{args.model}/text_encoder")
        sites = handler.text_encoder_sites(cfg)

    trees = [handler.load_lora_file(p, sites) for p in args.inputs]
    merged = merge_lora_trees(trees, args.weights)
    if args.rank:
        if args.version != "cloneofsimo":
            parser.error("--rank SVD compression is cloneofsimo-only")
        merged = truncate_lora_rank(merged, sites, args.rank)

    from text_to_video_finetuning_tpu.lora import formats
    if args.output.endswith(".pt"):
        formats.save_lora_pt(merged, sites, args.output)
    elif args.output.endswith(".safetensors"):
        if args.version == "cloneofsimo":
            formats.save_safeloras(
                {args.kind: (merged, sites, set(targets))}, args.output)
        else:
            from safetensors.numpy import save_file
            save_file(formats.stable_lora_state_dict(merged, sites),
                      args.output)
    else:
        parser.error("output must end in .pt or .safetensors")
    print(f"Merged {len(args.inputs)} LoRAs -> {args.output}")


def bake_lora_main(argv=None):
    """Bake LoRA file(s) into a pipeline's base weights and save the merged
    pipeline (`t2v-bake-lora`): ship a single standalone model instead of
    base + sidecar.  Uses the exact conv-composition overlay
    (lora/overlay.py collapse_lora, reference utils/lora.py:781-816)."""
    parser = argparse.ArgumentParser(
        description="Bake LoRA weights into a pipeline directory")
    parser.add_argument("-m", "--model", type=str, required=True,
                        help="input pipeline directory")
    parser.add_argument("-lP", "--lora_path", type=str, required=True,
                        help="LoRA file or directory (`_unet` / "
                             "`_text_encoder` name match)")
    parser.add_argument("-lR", "--lora_rank", type=int, default=64)
    parser.add_argument("-lS", "--lora_scale", type=float, default=1.0)
    parser.add_argument("-o", "--output", type=str, required=True,
                        help="output pipeline directory")
    parser.add_argument("--fp16", action="store_true",
                        help="save merged weights in fp16")
    args = parser.parse_args(argv)

    from text_to_video_finetuning_tpu.pipelines.inference import (
        initialize_pipeline)
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt

    pipe = initialize_pipeline(args.model, use_fused_attention=False,
                               lora_path=args.lora_path,
                               lora_rank=args.lora_rank, half=False,
                               lora_scale=args.lora_scale)
    os.makedirs(args.output, exist_ok=True)
    # save the (possibly textual-inversion-extended) tokenizer first, then
    # let save_pipeline index that directory
    tok_dir = os.path.join(args.output, "tokenizer")
    pipe.tokenizer.save_pretrained(tok_dir)
    ckpt.save_pipeline(
        args.output,
        unet=(pipe.unet.config, pipe.unet_params),
        vae=(pipe.vae.config, pipe.vae_params),
        text_encoder=(pipe.text_encoder.config, pipe.text_params),
        scheduler_config=pipe.scheduler_config,
        tokenizer_dir=tok_dir, fp16=args.fp16)
    print(f"Baked {args.lora_path} (scale {args.lora_scale}) into "
          f"{args.output}")


def serve_main(argv=None):
    """`t2v-serve`: resident pipeline + dynamic-batching HTTP server
    (beyond the reference's one-shot CLI; see serving/server.py)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", type=str, required=True,
                        help="Path to model checkpoint directory")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("-o", "--output-dir", type=str,
                        default="./serve_output")
    parser.add_argument("--max-batch", type=int, default=4,
                        help="coalesce up to N same-signature requests "
                             "into one batched dispatch")
    parser.add_argument("--batch-window-ms", type=float, default=50.0,
                        help="how long to hold a request open for "
                             "batch-mates before dispatching")
    parser.add_argument("--request-timeout-s", type=float, default=3600.0)
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip the startup compile of the default "
                             "sampler signature")
    parser.add_argument("--warmup-batch-sizes", type=int, nargs="+",
                        default=[1],
                        help="batch shapes to precompile at startup; the "
                             "sampler is one XLA program per batch size, so "
                             "coalesced sizes not warmed here compile on "
                             "their first unlucky request (pass e.g. 1 2 4 "
                             "to match --max-batch)")
    parser.add_argument("--max-queue", type=int, default=0,
                        help="reject new requests with 503 once this many "
                             "are in flight (queued + running); 0 = "
                             "unbounded. Size it from the measured "
                             "s/request at your signature x your clients' "
                             "timeout (docs/serving.md)")
    parser.add_argument("--warmup-width", type=int, default=256)
    parser.add_argument("--warmup-height", type=int, default=256)
    parser.add_argument("--warmup-frames", type=int, default=16)
    parser.add_argument("--warmup-steps", type=int, default=25)
    parser.add_argument("-lP", "--lora_path", type=str, default="")
    parser.add_argument("-lR", "--lora_rank", type=int, default=64)
    parser.add_argument("-lS", "--lora_scale", type=float, default=1.0)
    parser.add_argument("--no-fused-attention", action="store_true")
    parser.add_argument("--mesh", type=str, default="",
                        help="multi-chip sampling mesh, e.g. 'sp=4' or "
                             "'dp=2,sp=4' (see t2v-inference --mesh)")
    parser.add_argument("--no-trim-to-warm", action="store_true",
                        help="allow the worker to dispatch batch sizes "
                             "with no compiled program (default: trim "
                             "ragged batches to a warmed size so traffic "
                             "never waits on a mid-flight XLA compile)")
    args = parser.parse_args(argv)
    if args.max_queue < 0:
        # a negative bound would make `inflight >= max_queue` always true
        # and 503 every request — fail loudly at the parser instead
        parser.error(f"--max-queue must be >= 0, got {args.max_queue}")

    from text_to_video_finetuning_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()

    from text_to_video_finetuning_tpu.serving import T2VServer
    server = T2VServer(
        model=args.model, host=args.host, port=args.port,
        output_dir=args.output_dir, max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms,
        use_fused_attention=not args.no_fused_attention,
        lora_path=args.lora_path, lora_rank=args.lora_rank,
        lora_scale=args.lora_scale,
        request_timeout_s=args.request_timeout_s,
        mesh=_mesh_arg(args.mesh),
        max_queue=args.max_queue or None,
        trim_to_warm=not args.no_trim_to_warm)
    # graceful drain on SIGTERM (the serving side of training's
    # save_on_preemption): finish accepted requests, 503 new ones, exit.
    # Installed BEFORE warmup so a preemption notice arriving during the
    # multi-minute warmup compiles still exits cleanly (the in-flight
    # warmup sample finishes, the remaining warmups are skipped, and
    # serve_forever is never entered).
    import signal as _signal
    import threading as _threading
    drain_requested = _threading.Event()

    def _on_sigterm(*_):
        print("SIGTERM: draining (new requests get 503, in-flight "
              "finish)...")
        drain_requested.set()
        server.request_drain(args.request_timeout_s)

    if _threading.current_thread() is _threading.main_thread():
        _signal.signal(_signal.SIGTERM, _on_sigterm)
    if not args.no_warmup:
        import time as _time

        from text_to_video_finetuning_tpu.serving.server import (
            GenerationRequest)
        print("Warming up the sampler (first TPU compile is slow; the "
              "persistent compile cache makes restarts fast)...")
        req = GenerationRequest(
            prompt="warmup", width=args.warmup_width,
            height=args.warmup_height, num_frames=args.warmup_frames,
            num_steps=args.warmup_steps)
        # clamp to --max-batch BEFORE dedup: warmup() clamps internally, so
        # warming [4, 8] one call at a time with max_batch=4 would compile
        # (and pay a full sample for) batch 4 twice
        for b in sorted({min(max(1, b), server.worker.max_batch)
                         for b in args.warmup_batch_sizes}):
            # warmup() calls _run_batch directly (never queued, so it
            # cannot be drain-rejected); an in-flight warmup sample always
            # finishes, and this check skips the REMAINING sizes on SIGTERM
            if drain_requested.is_set():
                break
            t0 = _time.perf_counter()
            server.warmup(req, batch_sizes=[b])
            print(f"Warm at {req.width}x{req.height}x{req.num_frames}f "
                  f"{req.num_steps} steps, batch {b} "
                  f"({_time.perf_counter() - t0:.1f}s).")
    try:
        if not drain_requested.is_set():
            server.serve_forever()
    except KeyboardInterrupt:
        pass
    except OSError:
        # the SIGTERM drain thread closes the listening socket; if that
        # lands between the drain check above and serve_forever entering
        # its accept loop, serve_forever raises on the closed socket —
        # that IS the graceful-drain exit, not a crash
        if not drain_requested.is_set():
            raise
    finally:
        # also runs when serve_forever raises (e.g. socket OSError): close
        # the HTTP socket and join the batching worker so in-flight clients
        # get an orderly close, not an abrupt reset
        server.shutdown()


def build_inference_parser():
    """Flag-for-flag with reference inference.py:336-435 (+ --lora_scale)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", type=str, required=True,
                        help="Path to model checkpoint directory")
    parser.add_argument("-p", "--prompt", type=str, required=True)
    parser.add_argument("-n", "--negative-prompt", type=str, default=None)
    parser.add_argument("-o", "--output-dir", type=str, default="./output")
    parser.add_argument("-B", "--batch-size", type=int, default=1)
    parser.add_argument("-W", "--width", type=int, default=256)
    parser.add_argument("-H", "--height", type=int, default=256)
    parser.add_argument("-T", "--num-frames", type=int, default=16)
    parser.add_argument("-WS", "--window-size", type=int, default=None)
    parser.add_argument("-VB", "--vae-batch-size", type=int, default=8)
    parser.add_argument("-s", "--num-steps", type=int, default=25)
    parser.add_argument("-g", "--guidance-scale", type=float, default=25)
    parser.add_argument("-i", "--init-video", type=str, default=None)
    parser.add_argument("-iw", "--init-weight", type=float, default=0.5)
    parser.add_argument("-f", "--fps", type=int, default=12)
    parser.add_argument("-d", "--device", type=str, default="tpu")
    parser.add_argument("-x", "--xformers", action="store_true",
                        help="(parity flag) use the fused Pallas attention")
    parser.add_argument("-S", "--sdp", action="store_true",
                        help="(parity flag) use the fused Pallas attention")
    parser.add_argument("-lP", "--lora_path", type=str, default="")
    parser.add_argument("-lR", "--lora_rank", type=int, default=64)
    parser.add_argument("-lS", "--lora_scale", type=float, default=1.0,
                        help="runtime LoRA strength (tune_lora_scale parity:"
                             " 0 = base model, 1 = trained strength)")
    parser.add_argument("-rw", "--remove-watermark", action="store_true")
    parser.add_argument("-l", "--loop", action="store_true")
    parser.add_argument("-r", "--seed", type=int, default=None)
    parser.add_argument("--mesh", type=str, default="",
                        help="multi-chip sampling mesh, e.g. 'dp=2,sp=4' "
                             "(CFG pair over dp, frames over sp, params "
                             "over tp/fsdp; beyond the reference's "
                             "single-GPU inference)")
    return parser


def inference_main(argv=None):
    args = build_inference_parser().parse_args(argv)

    from text_to_video_finetuning_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()

    from text_to_video_finetuning_tpu.pipelines.inference import (
        inference, load_init_video)
    from text_to_video_finetuning_tpu.data.video import export_to_video

    out_name = f"{args.output_dir}/"
    if args.init_video is not None:
        out_name += f"[({Path(args.init_video).stem}) x {args.init_weight}] "
    prompt = (re.sub(r'[<>:"/\\|?*\x00-\x1F]', "_", args.prompt)
              if platform.system() == "Windows" else args.prompt)
    out_name += f"{prompt}"

    prompts = [prompt] * args.batch_size
    negative = ([args.negative_prompt] * args.batch_size
                if args.negative_prompt is not None else None)
    window_size = args.window_size or args.num_frames

    init_video = None
    if args.init_video is not None:
        init_video = load_init_video(args.init_video, args.height,
                                     args.width, args.num_frames)

    videos = inference(
        model=args.model, prompt=prompts, negative_prompt=negative,
        width=args.width, height=args.height, num_frames=args.num_frames,
        window_size=window_size, vae_batch_size=args.vae_batch_size,
        num_steps=args.num_steps, guidance_scale=args.guidance_scale,
        init_video=init_video, init_weight=args.init_weight,
        use_fused_attention=args.xformers or args.sdp,
        lora_path=args.lora_path, lora_rank=args.lora_rank,
        lora_scale=args.lora_scale, loop=args.loop,
        seed=args.seed, mesh=_mesh_arg(args.mesh))

    os.makedirs(args.output_dir, exist_ok=True)
    for video in videos:                                # (C, F, H, W) [-1,1]
        if args.remove_watermark:
            print("Inpainting watermarks...")
            from text_to_video_finetuning_tpu.models.lama import (
                inpaint_watermark)
            frames = (np.transpose(video, (1, 0, 2, 3)) + 1.0) / 2.0
            frames = inpaint_watermark(frames)
            frames = np.clip(np.transpose(frames, (0, 2, 3, 1)), 0, 1) * 255
        else:
            frames = np.transpose(np.clip(video, -1, 1), (1, 2, 3, 0))
            frames = (frames + 1.0) * 127.5
        frames = frames.astype(np.uint8)
        export_to_video(frames, f"{out_name} {str(uuid4())[:8]}.mp4",
                        args.fps)
