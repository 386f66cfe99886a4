"""Training CLI: `python train.py --config configs/v2/train_config.yaml`.

Mirrors the reference entry point (reference train.py:986-991): the YAML's
keys are the engine's kwargs.
"""

import argparse

from text_to_video_finetuning_tpu.config import load_train_config
from text_to_video_finetuning_tpu.training.engine import main as train_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="./configs/v2/train_config.yaml")
    args = parser.parse_args()
    cfg = load_train_config(args.config)
    # warm-start: reuse compiled executables across runs (a cold full-model
    # TPU compile is ~15 min; warm is seconds)
    from text_to_video_finetuning_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()
    train_main(config=cfg)
