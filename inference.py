"""Inference CLI.

Behavioral spec: reference inference.py:336-435 -- same flags, windowed
round-robin long-video generation, init-video img2img, LoRA injection,
optional LaMa watermark inpainting, mp4 export.  The logic lives in
text_to_video_finetuning_tpu/cli.py (shared with the installed
`t2v-inference` console script).
"""

from text_to_video_finetuning_tpu.cli import (build_inference_parser,  # noqa: F401
                                              inference_main as main)

if __name__ == "__main__":
    main()
