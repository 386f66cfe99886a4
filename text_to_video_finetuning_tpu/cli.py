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
    return parser


def inference_main(argv=None):
    args = build_inference_parser().parse_args(argv)

    from text_to_video_finetuning_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()

    from text_to_video_finetuning_tpu.pipelines.inference import inference
    from text_to_video_finetuning_tpu.data.video import (VideoReader,
                                                         export_to_video,
                                                         resize_video)

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
        vr = VideoReader(args.init_video)
        frames = vr[:]                                  # (F, H, W, C) uint8
        video = frames.transpose(0, 3, 1, 2).astype(np.float32)
        video = video / 127.5 - 1.0
        # trilinear resize to (num_frames, H, W): spatial bilinear per frame
        # then linear interpolation over time
        video = resize_video(video, args.height, args.width)
        f_in = video.shape[0]
        if f_in != args.num_frames:
            src = np.linspace(0, f_in - 1, args.num_frames)
            lo = np.floor(src).astype(int)
            hi = np.minimum(lo + 1, f_in - 1)
            w = (src - lo)[:, None, None, None].astype(np.float32)
            video = video[lo] * (1 - w) + video[hi] * w
        init_video = video.transpose(1, 0, 2, 3)[None]  # (1, C, F, H, W)

    videos = inference(
        model=args.model, prompt=prompts, negative_prompt=negative,
        width=args.width, height=args.height, num_frames=args.num_frames,
        window_size=window_size, vae_batch_size=args.vae_batch_size,
        num_steps=args.num_steps, guidance_scale=args.guidance_scale,
        init_video=init_video, init_weight=args.init_weight,
        use_fused_attention=args.xformers or args.sdp,
        lora_path=args.lora_path, lora_rank=args.lora_rank,
        lora_scale=args.lora_scale, loop=args.loop,
        seed=args.seed)

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
