from .unet3d import (UNet3DConditionModel, UNET3D_MS_1_7B_CONFIG, tiny_unet_config, micro_unet_config)
from .vae import AutoencoderKL, VAE_SD_CONFIG, tiny_vae_config
from .clip_text import CLIPTextModel, CLIP_MS_TEXT_CONFIG, tiny_clip_config

__all__ = [
    "UNet3DConditionModel", "UNET3D_MS_1_7B_CONFIG", "tiny_unet_config", "micro_unet_config",
    "AutoencoderKL", "VAE_SD_CONFIG", "tiny_vae_config",
    "CLIPTextModel", "CLIP_MS_TEXT_CONFIG", "tiny_clip_config",
]
