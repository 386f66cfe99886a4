"""Programmatic inference API.

Behavioral spec: reference inference.py:47-333 -- `initialize_pipeline`
(model load, half precision, DPM-Solver swap, attention backend, LoRA
injection), `prepare_input_latents` (randn or encoded init video), and
`inference` (prompt weighting, windowed `diffuse`, decode).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..lora.handler import LoraHandler
from ..lora.overlay import collapse_lora
from ..models.clip_text import CLIPTextModel
from ..models.unet3d import UNet3DConditionModel
from ..models.vae import AutoencoderKL
from ..utils import checkpoint as ckpt
from ..utils.prompt_weighting import encode_weighted_prompt
from .diffuse import diffuse
from .text_to_video import TextToVideoSDPipeline


def initialize_pipeline(model: str, use_fused_attention: bool = True,
                        lora_path: str = "", lora_rank: int = 64,
                        half: bool = True, lora_scale: float = 1.0,
                        mesh=None) -> TextToVideoSDPipeline:
    """reference inference.py:47-78.  `lora_scale` is the runtime alpha of
    `tune_lora_scale` (reference utils/lora.py:1077-1081): 0 disables the
    LoRA entirely, 1 applies it at trained strength.  `mesh` (a jax Mesh,
    e.g. `parallel.mesh_from_string("dp=2,sp=4")`) turns on multi-chip
    sampling — beyond the reference, whose inference is single-GPU."""
    from transformers import CLIPTokenizer
    scheduler_config = ckpt.load_scheduler_config(
        os.path.join(model, "scheduler"))
    tokenizer = CLIPTokenizer.from_pretrained(
        os.path.join(model, "tokenizer"))
    clip_config, text_params = ckpt.load_text_encoder(
        os.path.join(model, "text_encoder"))
    vae_config, vae_params = ckpt.load_vae(os.path.join(model, "vae"))
    unet_config, unet_params = ckpt.load_unet(os.path.join(model, "unet"))

    dtype = jnp.bfloat16 if half else jnp.float32
    backend = "auto" if use_fused_attention else "xla"
    unet = UNet3DConditionModel(config=unet_config, dtype=dtype,
                                attention_backend=backend)
    text_encoder = CLIPTextModel(config=clip_config, dtype=dtype)
    vae = AutoencoderKL(config=vae_config, dtype=dtype)

    # inject_inferable_lora (reference utils/lora.py:483-527): merge LoRA
    # files found under lora_path into the base weights
    if lora_path:
        handler = LoraHandler(version="cloneofsimo", use_unet_lora=True,
                              use_text_lora=True,
                              unet_replace_modules=["UNet3DConditionModel"],
                              text_encoder_replace_modules=[
                                  "CLIPEncoderLayer"])
        for kind, cfg_, params_name in (
                ("unet", unet_config, "unet"),
                ("text_encoder", clip_config, "text")):
            f = handler.get_lora_file_path(lora_path, kind)
            if f is None:
                continue
            sites = (handler.unet_sites(cfg_) if kind == "unet"
                     else handler.text_encoder_sites(cfg_))
            try:
                lora = handler.load_lora_file(f, sites)
            except ValueError:
                # rank/site mismatch: retry with attention-only targets
                # (the common lora_rank=64 webui checkpoints)
                alt = LoraHandler(
                    version=handler.version, use_unet_lora=True,
                    unet_replace_modules=["CrossAttention", "Attention",
                                          "GEGLU"],
                    text_encoder_replace_modules=["CLIPAttention"])
                sites = (alt.unet_sites(cfg_) if kind == "unet"
                         else alt.text_encoder_sites(cfg_))
                lora = alt.load_lora_file(f, sites)
            if kind == "unet":
                unet_params = collapse_lora(unet_params, lora, sites,
                                            handler.version,
                                            alpha=lora_scale)
            else:
                text_params = collapse_lora(text_params, lora, sites,
                                            handler.version,
                                            alpha=lora_scale)
            print(f"Successfully loaded LoRA from: {f}")

        # textual-inversion embeds: safeloras `<embed>` entries or `.ti.pt`
        # sidecars under lora_path (reference utils/lora.py:1139-1156 and
        # patch_pipe's *.ti.pt convention, utils/lora.py:1190-1222)
        embed_files = []
        if os.path.isdir(lora_path):
            for fn in sorted(os.listdir(lora_path)):
                if fn.endswith(".ti.pt") or fn.endswith(".safetensors"):
                    embed_files.append(os.path.join(lora_path, fn))
        elif lora_path.endswith((".ti.pt", ".safetensors")):
            embed_files.append(lora_path)
        for f in embed_files:
            from ..lora.embeds import (apply_learned_embeds_in_clip,
                                       load_learned_embeds)
            embeds = load_learned_embeds(f)
            if embeds:
                text_params, applied = apply_learned_embeds_in_clip(
                    embeds, text_params, tokenizer, idempotent=True)
                print(f"Loaded learned embeds {applied} from: {f}")
        if embed_files:
            # the flax module validates the embedding-table shape, so the
            # config must grow with the tokenizer (the reference's
            # resize_token_embeddings, utils/lora.py:1128)
            import dataclasses
            clip_config = dataclasses.replace(clip_config,
                                              vocab_size=len(tokenizer))
            text_encoder = CLIPTextModel(config=clip_config, dtype=dtype)

    return TextToVideoSDPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=text_encoder, text_params=text_params,
        tokenizer=tokenizer, scheduler_config=scheduler_config, mesh=mesh)


def load_init_video(path: str, height: int, width: int,
                    num_frames: int) -> np.ndarray:
    """Read + preprocess an init video for img2img: [-1, 1] floats,
    spatial bilinear resize then linear interpolation over time to
    num_frames (reference inference.py:354-372's trilinear resize).
    Returns (1, C, F, H, W)."""
    from ..data.video import VideoReader, resize_video
    vr = VideoReader(path)
    frames = vr[:]                                      # (F, H, W, C) uint8
    video = frames.transpose(0, 3, 1, 2).astype(np.float32)
    video = video / 127.5 - 1.0
    video = resize_video(video, height, width)
    f_in = video.shape[0]
    if f_in != num_frames:
        src = np.linspace(0, f_in - 1, num_frames)
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, f_in - 1)
        w = (src - lo)[:, None, None, None].astype(np.float32)
        video = video[lo] * (1 - w) + video[hi] * w
    return video.transpose(1, 0, 2, 3)[None]            # (1, C, F, H, W)


def prepare_input_latents(pipe: TextToVideoSDPipeline, batch_size: int,
                          num_frames: int, height: int, width: int,
                          init_video: Optional[np.ndarray],
                          vae_batch_size: int, rng) -> jnp.ndarray:
    """reference inference.py:81-102."""
    if init_video is None:
        scale = pipe.vae_scale_factor
        shape = (batch_size, pipe.unet.config.in_channels, num_frames,
                 height // scale, width // scale)
        return jax.random.normal(rng, shape, dtype=jnp.float32)
    latents = pipe.encode_video(jnp.asarray(init_video), rng,
                                batch_size=vae_batch_size)
    if latents.shape[0] != batch_size:
        latents = jnp.tile(latents, (batch_size, 1, 1, 1, 1))
    return latents


def generate(pipe: TextToVideoSDPipeline, prompt, negative_prompt=None,
             width: int = 256, height: int = 256, num_frames: int = 24,
             window_size: Optional[int] = None, vae_batch_size: int = 8,
             num_steps: int = 50, guidance_scale: float = 15,
             init_video: Optional[np.ndarray] = None,
             init_weight: float = 0.5, loop: bool = False,
             seed: Optional[int] = None, block: bool = True) -> np.ndarray:
    """Generation body of reference inference.py:270-333, split from model
    load so a warm pipeline can serve many requests (repeated calls at the
    same geometry reuse the jit cache).  Returns (B, C, F, H, W) float.

    `block=False` returns the decoded video still as a DEVICE array: all
    sampler/decode work is dispatched (async) but no host readback happens.
    The serving worker uses this to overlap batch N's readback + host tail
    with batch N+1's device execution (serving/server.py::BatchingWorker)."""
    seed = seed if seed is not None else 0
    rng = jax.random.PRNGKey(seed)
    window_size = window_size or num_frames

    # compel-equivalent weighted prompt embeddings
    prompts = [prompt] if isinstance(prompt, str) else list(prompt)
    prompt_embeds = encode_weighted_prompt(pipe, prompts)
    negative_prompt_embeds = None
    if negative_prompt:
        negs = ([negative_prompt] if isinstance(negative_prompt, str)
                else list(negative_prompt))
        negative_prompt_embeds = encode_weighted_prompt(pipe, negs)

    rng, key = jax.random.split(rng)
    init_latents = prepare_input_latents(
        pipe, batch_size=len(prompts), num_frames=num_frames, height=height,
        width=width, init_video=init_video, vae_batch_size=vae_batch_size,
        rng=key)
    init_weight = init_weight if init_video is not None else 0

    latents = diffuse(
        pipe=pipe, latents=init_latents, init_weight=init_weight,
        prompt=prompts, negative_prompt=negative_prompt,
        prompt_embeds=prompt_embeds,
        negative_prompt_embeds=negative_prompt_embeds,
        num_inference_steps=num_steps, guidance_scale=guidance_scale,
        window_size=window_size, rotate=loop or window_size < num_frames,
        seed=seed)

    videos = pipe.decode_latents(latents, batch_size=vae_batch_size)
    return np.asarray(videos) if block else videos


def inference(model: str, prompt, negative_prompt=None, width: int = 256,
              height: int = 256, num_frames: int = 24,
              window_size: Optional[int] = None, vae_batch_size: int = 8,
              num_steps: int = 50, guidance_scale: float = 15,
              init_video: Optional[np.ndarray] = None,
              init_weight: float = 0.5, use_fused_attention: bool = True,
              lora_path: str = "", lora_rank: int = 64,
              lora_scale: float = 1.0, loop: bool = False,
              seed: Optional[int] = None, mesh=None) -> np.ndarray:
    """reference inference.py:270-333. Returns (B, C, F, H, W) float."""
    pipe = initialize_pipeline(model, use_fused_attention, lora_path,
                               lora_rank, lora_scale=lora_scale, mesh=mesh)
    return generate(pipe, prompt, negative_prompt=negative_prompt,
                    width=width, height=height, num_frames=num_frames,
                    window_size=window_size, vae_batch_size=vae_batch_size,
                    num_steps=num_steps, guidance_scale=guidance_scale,
                    init_video=init_video, init_weight=init_weight,
                    loop=loop, seed=seed)
