from .text_to_video import TextToVideoSDPipeline

__all__ = ["TextToVideoSDPipeline"]
