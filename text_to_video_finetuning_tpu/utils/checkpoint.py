"""Diffusers pipeline-layout checkpoint import/export.

Behavioral spec: the reference loads `text-to-video-ms-1.7b` as a diffusers
pipeline directory (`load_primary_models`, reference train.py:118-125:
scheduler/, tokenizer/, text_encoder/, vae/, unet/) and saves the same layout
(`save_pipe` -> `pipeline.save_pretrained`, reference train.py:426-436).
This module reads/writes that layout with flax param pytrees, converting
tensor layouts via utils/torch_names.py, so checkpoints interoperate in both
directions with torch diffusers.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

from ..models.clip_text import CLIPTextConfig
from ..models.unet3d import UNet3DConfig
from ..models.vae import VAEConfig
from ..schedulers.ddpm import SchedulerConfig
from .torch_names import (flax_tensor_to_torch, flax_to_torch_key,
                          torch_key_to_flax)

# flax paths whose 2D 'weight' is an embedding table (no transpose)
_EMBEDDING_MODULES = ("token_embedding", "position_embedding")

# old diffusers VAE attention key names -> new
_VAE_ATTN_RENAMES = {
    "query": "to_q", "key": "to_k", "value": "to_v", "proj_attn": "to_out_0",
    # even older ckpts: q/k/v/proj_out
    "q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out_0",
}


def _read_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read a diffusers/transformers model dir's weights as numpy."""
    for fn in ("diffusion_pytorch_model.safetensors", "model.safetensors"):
        p = os.path.join(model_dir, fn)
        if os.path.exists(p):
            from safetensors import safe_open
            out = {}
            with safe_open(p, framework="numpy") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
            return out
    for fn in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
        p = os.path.join(model_dir, fn)
        if os.path.exists(p):
            import torch
            sd = torch.load(p, map_location="cpu", weights_only=True)
            return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights found under {model_dir}")


def _is_norm_weight(torch_key: str, arr: np.ndarray) -> bool:
    return arr.ndim == 1


def state_dict_to_flax(sd: Dict[str, np.ndarray], model_kind: str) -> Dict:
    """torch state dict -> flax params tree."""
    flat = {}
    for key, arr in sd.items():
        if key.endswith("position_ids"):
            continue  # transformers buffer, not a param
        module_name, leaf = key.rsplit(".", 1)
        # VAE old attention names
        parts = module_name.split(".")
        if model_kind == "vae" and parts[-1] in _VAE_ATTN_RENAMES and (
                "attentions" in module_name or "attn" in parts[-1]):
            parts[-1] = _VAE_ATTN_RENAMES[parts[-1]]
            module_name = ".".join(parts)
        fpath = torch_key_to_flax(module_name, model_kind)
        is_embedding = fpath[-1] in _EMBEDDING_MODULES
        if leaf == "weight":
            if is_embedding:
                flat[fpath + ("embedding",)] = arr
                continue
            if arr.ndim == 1:
                flat[fpath + ("scale",)] = arr
                continue
            if arr.ndim == 2:
                flat[fpath + ("kernel",)] = arr.T
            elif arr.ndim == 4:
                flat[fpath + ("kernel",)] = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 5:
                flat[fpath + ("kernel",)] = arr.transpose(2, 3, 4, 1, 0)
            else:
                raise ValueError(f"bad weight ndim for {key}: {arr.ndim}")
        elif leaf == "bias":
            flat[fpath + ("bias",)] = arr
        else:
            continue  # running stats etc. -- none in these models
    return unflatten_dict(flat)


def flax_to_state_dict(params: Dict, model_kind: str) -> Dict[str, np.ndarray]:
    """flax params tree -> torch state dict (numpy, torch layouts)."""
    sd = {}
    for path, arr in flatten_dict(params).items():
        module_path, leaf = path[:-1], path[-1]
        torch_name = flax_to_torch_key(module_path, model_kind)
        arr = np.asarray(arr)
        tleaf, tarr = flax_tensor_to_torch(leaf, arr)
        sd[f"{torch_name}.{tleaf}"] = tarr
    return sd


# -- config (de)serialization ----------------------------------------------

def load_unet_config(model_dir: str) -> UNet3DConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    return UNet3DConfig(
        sample_size=cfg.get("sample_size") or 32,
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        down_block_types=tuple(cfg.get("down_block_types")),
        up_block_types=tuple(cfg.get("up_block_types")),
        block_out_channels=tuple(cfg.get("block_out_channels")),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        norm_eps=cfg.get("norm_eps", 1e-5),
        cross_attention_dim=cfg.get("cross_attention_dim", 1024),
        attention_head_dim=cfg.get("attention_head_dim", 64),
    )


def save_unet_config(config: UNet3DConfig, model_dir: str):
    cfg = dict(dataclasses.asdict(config))
    cfg["_class_name"] = "UNet3DConditionModel"
    cfg["down_block_types"] = list(config.down_block_types)
    cfg["up_block_types"] = list(config.up_block_types)
    cfg["block_out_channels"] = list(config.block_out_channels)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def load_vae_config(model_dir: str) -> VAEConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels",
                                         (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        sample_size=cfg.get("sample_size", 256),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def save_vae_config(config: VAEConfig, model_dir: str):
    cfg = dict(dataclasses.asdict(config))
    cfg["_class_name"] = "AutoencoderKL"
    cfg["block_out_channels"] = list(config.block_out_channels)
    cfg["down_block_types"] = ["DownEncoderBlock2D"] * len(
        config.block_out_channels)
    cfg["up_block_types"] = ["UpDecoderBlock2D"] * len(
        config.block_out_channels)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def load_clip_config(model_dir: str) -> CLIPTextConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 1024),
        intermediate_size=cfg.get("intermediate_size", 4096),
        num_hidden_layers=cfg.get("num_hidden_layers", 23),
        num_attention_heads=cfg.get("num_attention_heads", 16),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "gelu"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        eos_token_id=cfg.get("eos_token_id", 49407),
    )


def save_clip_config(config: CLIPTextConfig, model_dir: str):
    cfg = dict(dataclasses.asdict(config))
    cfg["architectures"] = ["CLIPTextModel"]
    cfg["model_type"] = "clip_text_model"
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def load_scheduler_config(model_dir: str) -> SchedulerConfig:
    with open(os.path.join(model_dir, "scheduler_config.json")) as f:
        cfg = json.load(f)
    return SchedulerConfig(
        num_train_timesteps=cfg.get("num_train_timesteps", 1000),
        beta_start=cfg.get("beta_start", 0.00085),
        beta_end=cfg.get("beta_end", 0.012),
        beta_schedule=cfg.get("beta_schedule", "scaled_linear"),
        prediction_type=cfg.get("prediction_type", "epsilon"),
        steps_offset=cfg.get("steps_offset", 1),
    )


def save_scheduler_config(config: SchedulerConfig, model_dir: str):
    cfg = dict(dataclasses.asdict(config))
    cfg["_class_name"] = "DDPMScheduler"
    with open(os.path.join(model_dir, "scheduler_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


# -- model-level save/load ---------------------------------------------------

def _save_safetensors(sd: Dict[str, np.ndarray], path: str, fp16: bool):
    from safetensors.numpy import save_file
    if fp16:
        sd = {k: v.astype(np.float16) for k, v in sd.items()}
    else:
        sd = {k: v.astype(np.float32) for k, v in sd.items()}
    save_file(sd, path)


def load_unet(model_dir: str) -> Tuple[UNet3DConfig, Dict]:
    config = load_unet_config(model_dir)
    params = state_dict_to_flax(_read_state_dict(model_dir), "unet")
    return config, params


def save_unet(config: UNet3DConfig, params: Dict, model_dir: str,
              fp16: bool = False):
    os.makedirs(model_dir, exist_ok=True)
    save_unet_config(config, model_dir)
    _save_safetensors(flax_to_state_dict(params, "unet"),
                      os.path.join(model_dir,
                                   "diffusion_pytorch_model.safetensors"),
                      fp16)


def load_vae(model_dir: str) -> Tuple[VAEConfig, Dict]:
    config = load_vae_config(model_dir)
    params = state_dict_to_flax(_read_state_dict(model_dir), "vae")
    return config, params


def save_vae(config: VAEConfig, params: Dict, model_dir: str,
             fp16: bool = False):
    os.makedirs(model_dir, exist_ok=True)
    save_vae_config(config, model_dir)
    _save_safetensors(flax_to_state_dict(params, "vae"),
                      os.path.join(model_dir,
                                   "diffusion_pytorch_model.safetensors"),
                      fp16)


def load_text_encoder(model_dir: str) -> Tuple[CLIPTextConfig, Dict]:
    config = load_clip_config(model_dir)
    params = state_dict_to_flax(_read_state_dict(model_dir), "text_encoder")
    return config, params


def save_text_encoder(config: CLIPTextConfig, params: Dict, model_dir: str,
                      fp16: bool = False):
    os.makedirs(model_dir, exist_ok=True)
    save_clip_config(config, model_dir)
    _save_safetensors(flax_to_state_dict(params, "text_encoder"),
                      os.path.join(model_dir, "model.safetensors"), fp16)


def save_pipeline(pipeline_dir: str, unet=None, vae=None, text_encoder=None,
                  scheduler_config: Optional[SchedulerConfig] = None,
                  tokenizer_dir: Optional[str] = None, fp16: bool = False):
    """Write a diffusers TextToVideoSDPipeline-layout directory.
    unet/vae/text_encoder are (config, params) tuples."""
    os.makedirs(pipeline_dir, exist_ok=True)
    index = {"_class_name": "TextToVideoSDPipeline",
             "_diffusers_version": "0.15.0"}
    if unet is not None:
        save_unet(unet[0], unet[1], os.path.join(pipeline_dir, "unet"), fp16)
        index["unet"] = ["diffusers", "UNet3DConditionModel"]
    if vae is not None:
        save_vae(vae[0], vae[1], os.path.join(pipeline_dir, "vae"), fp16)
        index["vae"] = ["diffusers", "AutoencoderKL"]
    if text_encoder is not None:
        save_text_encoder(text_encoder[0], text_encoder[1],
                          os.path.join(pipeline_dir, "text_encoder"), fp16)
        index["text_encoder"] = ["transformers", "CLIPTextModel"]
    if scheduler_config is not None:
        sdir = os.path.join(pipeline_dir, "scheduler")
        os.makedirs(sdir, exist_ok=True)
        save_scheduler_config(scheduler_config, sdir)
        index["scheduler"] = ["diffusers", "DDPMScheduler"]
    if tokenizer_dir is not None and os.path.isdir(tokenizer_dir):
        import shutil
        dst = os.path.join(pipeline_dir, "tokenizer")
        if os.path.abspath(tokenizer_dir) != os.path.abspath(dst):
            shutil.copytree(tokenizer_dir, dst, dirs_exist_ok=True)
        index["tokenizer"] = ["transformers", "CLIPTokenizer"]
    with open(os.path.join(pipeline_dir, "model_index.json"), "w") as f:
        json.dump(index, f, indent=2)
