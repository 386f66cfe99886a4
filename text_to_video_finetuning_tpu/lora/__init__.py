from .sites import LoraSite, enumerate_unet_sites, enumerate_text_encoder_sites, select_sites
from .overlay import init_lora_params, apply_lora, collapse_lora, LORA_VERSIONS
from .handler import LoraHandler

__all__ = [
    "LoraSite", "enumerate_unet_sites", "enumerate_text_encoder_sites",
    "select_sites", "init_lora_params", "apply_lora", "collapse_lora",
    "LoraHandler", "LORA_VERSIONS",
]
