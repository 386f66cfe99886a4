"""CLIP-score generation-quality metric for text-to-video.

score(clip) = mean over frames of max(0, 100 * cos(image_emb, text_emb))
-- the standard CLIP-score definition (Hessel et al. 2021, and the
torchmetrics convention), extended to video by frame-averaging, the common
practice in T2V evals.

The reference has no quality metric; its validation loop only writes
sample mp4s for eyeballing (reference train.py:908-958).  This module
gives the framework a measurable quality axis: the `t2v-eval` CLI scores
a directory of generated clips, and `validation_data.compute_clip_score`
logs the score next to each in-training sample.

TPU mapping: all frames of a clip are embedded as ONE batch through the
jitted ViT (a stack of MXU matmuls); the text embedding is computed once
per prompt and reused across frames.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .clip_vision import (CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, CLIPDualEncoder,
                          load_clip_model)


def preprocess_frames(frames: np.ndarray, image_size: int) -> jnp.ndarray:
    """CLIP image preprocessing: resize shortest side to `image_size`
    (bicubic), center crop, scale to [0,1], normalize with the CLIP
    mean/std.  `frames` is (F, H, W, C) uint8 or float in [0, 255]."""
    frames = jnp.asarray(frames, jnp.float32)
    f, h, w, c = frames.shape
    scale = image_size / min(h, w)
    nh, nw = max(image_size, round(h * scale)), max(image_size,
                                                    round(w * scale))
    if (nh, nw) != (h, w):
        frames = jax.image.resize(frames, (f, nh, nw, c), method="bicubic")
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    frames = frames[:, top:top + image_size, left:left + image_size, :]
    frames = frames / 255.0
    return (frames - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


class CLIPScorer:
    """Loads a local transformers CLIPModel dir and scores video frames
    against prompts.  One jit-compiled embed per (frame-count, size)."""

    def __init__(self, model_dir: str, dtype=jnp.float32):
        self.model, self.params = load_clip_model(model_dir)
        self.model = CLIPDualEncoder(
            vision_config=self.model.vision_config,
            text_config=self.model.text_config, dtype=dtype)
        self.image_size = self.model.vision_config.image_size
        from transformers import CLIPTokenizer
        self.tokenizer = CLIPTokenizer.from_pretrained(model_dir)
        self._embed_image = jax.jit(lambda p, x: self.model.apply(
            {"params": p}, x, method=CLIPDualEncoder.encode_image))
        self._embed_text = jax.jit(lambda p, ids: self.model.apply(
            {"params": p}, ids, method=CLIPDualEncoder.encode_text))

    def tokenize(self, prompts: Sequence[str]) -> np.ndarray:
        out = self.tokenizer(list(prompts), padding="max_length",
                             max_length=77, truncation=True,
                             return_tensors="np")
        return out["input_ids"].astype(np.int32)

    def score_frames(self, frames: np.ndarray, prompt: str) -> float:
        """frames (F, H, W, C) uint8/[0,255] float -> frame-mean CLIP score."""
        pixels = preprocess_frames(np.asarray(frames), self.image_size)
        img = self._embed_image(self.params, pixels)          # (F, D)
        txt = self._embed_text(self.params,
                               jnp.asarray(self.tokenize([prompt])))  # (1, D)
        per_frame = 100.0 * (img @ txt.T)[:, 0]
        per_frame = jnp.maximum(per_frame, 0.0)
        return float(jnp.mean(per_frame))

    def score_video(self, video_path: str, prompt: str,
                    max_frames: Optional[int] = None) -> float:
        from ..data.video import VideoReader
        vr = VideoReader(video_path)
        n = len(vr)
        idx = np.arange(n)
        if max_frames and n > max_frames:
            idx = np.linspace(0, n - 1, max_frames).round().astype(int)
        frames = vr.get_batch(idx)     # (F, H, W, C) uint8
        return self.score_frames(np.asarray(frames), prompt)


def _prompt_for(path: str, prompts: Dict[str, str]) -> Optional[str]:
    """Resolve the prompt for a clip: explicit map entry (basename or full
    path), a sidecar .txt, or the engine's sample filename convention
    `{step}_dataset-{name}_{prompt}.mp4`."""
    base = os.path.basename(path)
    if base in prompts:
        return prompts[base]
    if path in prompts:
        return prompts[path]
    sidecar = os.path.splitext(path)[0] + ".txt"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return f.read().strip()
    stem = os.path.splitext(base)[0]
    if "_dataset-" in stem:     # engine sample naming (training/engine.py):
        # {step}_dataset-{name}_{prompt}; dataset names may themselves
        # contain underscores, so strip the known names explicitly
        tail = stem.split("_dataset-", 1)[1]
        for ds in ("single_video", "folder", "json", "image", "cached"):
            if tail.startswith(ds + "_"):
                return tail[len(ds) + 1:]
        if "_" in tail:
            return tail.split("_", 1)[1]
    return None


def evaluate_directory(model_dir: str, videos: Sequence[str],
                       prompts: Optional[Dict[str, str]] = None,
                       default_prompt: Optional[str] = None,
                       max_frames: Optional[int] = 16,
                       ) -> Tuple[List[Dict], float]:
    """Score every clip; returns (per-clip records, mean score)."""
    scorer = CLIPScorer(model_dir)
    prompts = prompts or {}
    records = []
    for path in videos:
        prompt = _prompt_for(path, prompts) or default_prompt
        if prompt is None:
            records.append({"video": path, "error": "no prompt resolved"})
            continue
        try:
            score = scorer.score_video(path, prompt, max_frames=max_frames)
        except Exception as e:   # one unreadable clip must not void the run
            records.append({"video": path, "prompt": prompt,
                            "error": f"{type(e).__name__}: {e}"})
            continue
        records.append({"video": path, "prompt": prompt,
                        "clip_score": round(score, 4)})
    scored = [r["clip_score"] for r in records if "clip_score" in r]
    mean = float(np.mean(scored)) if scored else float("nan")
    return records, mean


def run(argv: Optional[Sequence[str]] = None) -> Tuple[List[Dict], float]:
    """t2v-eval: CLIP-score a set of generated clips.

    Examples:
      t2v-eval --clip_model ./clip-vit-base-patch32 outputs/*.mp4
      t2v-eval --clip_model ./clip --video_dir outputs/train_x/samples \\
               --json_out scores.json
    """
    import argparse
    p = argparse.ArgumentParser(
        prog="t2v-eval",
        description="CLIP-score generated videos against their prompts")
    p.add_argument("videos", nargs="*", help="video files to score")
    p.add_argument("--video_dir", type=str, default=None,
                   help="score every *.mp4 under this directory")
    p.add_argument("--clip_model", type=str, required=True,
                   help="local transformers CLIPModel dir "
                        "(e.g. a download of openai/clip-vit-base-patch32)")
    p.add_argument("--prompt", type=str, default=None,
                   help="prompt applied to clips with no resolved prompt")
    p.add_argument("--prompts_file", type=str, default=None,
                   help="json file mapping video basename -> prompt")
    p.add_argument("--max_frames", type=int, default=16,
                   help="uniformly sample at most this many frames per clip")
    p.add_argument("--json_out", type=str, default=None,
                   help="write per-clip records + mean to this json file")
    args = p.parse_args(argv)

    videos = list(args.videos)
    if args.video_dir:
        videos += sorted(glob.glob(os.path.join(args.video_dir, "*.mp4")))
    if not videos:
        p.error("no videos given (positional paths or --video_dir)")
    prompts = {}
    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = json.load(f)

    records, mean = evaluate_directory(
        args.clip_model, videos, prompts=prompts,
        default_prompt=args.prompt, max_frames=args.max_frames)
    for r in records:
        if "clip_score" in r:
            print(f"{r['clip_score']:8.3f}  {r['video']}  ({r['prompt']})")
        else:
            print(f"   ERROR  {r['video']}  ({r['error']})")
    print(f"mean clip_score over {sum('clip_score' in r for r in records)} "
          f"clips: {mean:.4f}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"mean_clip_score": mean, "clips": records}, f,
                      indent=2)
    return records, mean


def main(argv: Optional[Sequence[str]] = None) -> int:
    """Console-script entry (pyproject `t2v-eval`): setuptools wraps this in
    `sys.exit(main())`, so it must return a process status, not data --
    0 when every clip scored, 1 when any clip errored."""
    records, _ = run(argv)
    return 0 if all("clip_score" in r for r in records) else 1


if __name__ == "__main__":
    import sys
    sys.exit(main())
