"""Training CLI: `python train.py --config configs/v2/train_config.yaml`.

Mirrors the reference entry point (reference train.py:986-991); the logic
lives in text_to_video_finetuning_tpu/cli.py (shared with the installed
`t2v-train` console script).
"""

from text_to_video_finetuning_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
