"""Generation-quality evaluation: flax CLIP dual encoder + CLIP score.

The reference's only quality loop is eyeballing validation mp4s
(reference train.py:908-958); this package adds a measurable metric
(the BASELINE north star's "CLIP-score parity" clause)."""

from .clip_score import CLIPScorer, evaluate_directory, preprocess_frames
from .clip_vision import (CLIPDualEncoder, CLIPVisionConfig, CLIPVisionModel,
                          load_clip_model, tiny_clip_vision_config)

__all__ = [
    "CLIPScorer", "evaluate_directory", "preprocess_frames",
    "CLIPDualEncoder", "CLIPVisionConfig", "CLIPVisionModel",
    "load_clip_model", "tiny_clip_vision_config",
]
