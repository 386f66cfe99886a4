"""Host input-pipeline sustained throughput (SURVEY §2.3 decord row: the
native reader "must not starve the TPU"; §3.2 hot-loop ranking).

Synthesizes a folder of real mp4 clips, then measures the full host path
— cv2-C++ indexed batch decode → resize/bucket → C++ normalize/repack →
collated numpy batch — through `VideoFolderDataset` + `DataLoader`
(the engine's own classes), as sustained SAMPLES/SEC per worker count.

The consumer to beat is the measured train step (~2.75 steps/s at the
256px/16f headline with batch 1): any row above that means the loader
keeps the TPU fed from raw video with no latent cache.

Runs entirely on host (no TPU needed):
  PYTHONPATH=/root/repo python benchmarks/data_bench.py
"""

import argparse
import json
import os
import tempfile
import time

import numpy as np


def make_videos(dirpath: str, n_clips: int, w: int = 448, h: int = 256,
                frames: int = 72, fps: int = 24):
    import cv2
    rng = np.random.RandomState(0)
    for i in range(n_clips):
        path = os.path.join(dirpath, f"clip{i:03d}.mp4")
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        base = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        for f in range(frames):
            writer.write(np.roll(base, shift=f * 3, axis=1))
        writer.release()
        with open(path[:-4] + ".txt", "w") as fh:
            fh.write(f"synthetic clip {i}")


class _IdTokenizer:
    """Minimal tokenizer stand-in (bench measures the video path; real
    tokenization is microseconds per prompt)."""
    model_max_length = 77

    def __call__(self, prompt, **kw):
        class R:
            input_ids = np.ones((1, 77), np.int64)
        return R()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=16)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--workers", type=int, nargs="*", default=[0, 1, 2, 4])
    p.add_argument("--bucketing", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-bucketing A/Bs the bucket-resize cost")
    args = p.parse_args()

    from text_to_video_finetuning_tpu.data.datasets import (
        VideoFolderDataset)
    from text_to_video_finetuning_tpu.data.loader import DataLoader

    tmp = tempfile.mkdtemp(prefix="t2v_databench_")
    make_videos(tmp, args.clips)
    ds = VideoFolderDataset(tokenizer=_IdTokenizer(), width=args.size,
                            height=args.size,
                            n_sample_frames=args.frames, fps=8, path=tmp,
                            fallback_prompt="a video",
                            use_bucketing=args.bucketing)

    for nw in args.workers:
        loader = DataLoader(ds, batch_size=args.batch, shuffle=True,
                            num_workers=nw, seed=0, pad_last=True)
        # warm one epoch (page cache, lazy native-lib build)
        for _ in loader:
            pass
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.epochs):
            for batch in loader:
                n += batch["pixel_values"].shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "workers": nw, "samples_per_s": round(n / dt, 3),
            "batches": n // args.batch, "seconds": round(dt, 2),
            "frames": args.frames, "size": args.size,
            "bucketing": bool(args.bucketing),
        }))


if __name__ == "__main__":
    main()
