"""ModelScope 3D spatio-temporal UNet, TPU-native.

Behavioral spec: reference models/unet_3d_condition.py:53-500 --
conv_in -> temporal transformer_in -> 4 down blocks -> mid -> 4 up blocks ->
GroupNorm/SiLU/conv_out, with frames folded into the batch axis for all
spatial modules and unfolded for temporal modules, and per-frame
repeat_interleave of the time/text embeddings
(reference models/unet_3d_condition.py:400-401).

Public API keeps the reference layout: sample (B, C, F, H, W), timesteps
(B,) or scalar, encoder_hidden_states (B, S, D); internally everything is
channel-last NHWC for the TPU conv/matmul units.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Tuple

import flax.linen as nn

from .lora_layers import LoraConv
import jax.numpy as jnp

from .embeddings import TimestepEmbedding, get_timestep_embedding
from .transformers import TransformerTemporalModel
from .unet3d_blocks import (
    CrossAttnDownBlock3D,
    CrossAttnUpBlock3D,
    DownBlock3D,
    UNetMidBlock3DCrossAttn,
    UpBlock3D,
)


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    """Geometry of the UNet (reference models/unet_3d_condition.py:86-107)."""
    sample_size: int = 32
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock3D", "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D", "DownBlock3D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock3D", "CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D")
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    downsample_padding: int = 1
    mid_block_scale_factor: float = 1.0
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64


UNET3D_MS_1_7B_CONFIG = UNet3DConfig()


def tiny_unet_config(**overrides) -> UNet3DConfig:
    """A miniature geometry for fast tests: same topology, tiny widths."""
    base = dict(
        sample_size=8,
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        norm_num_groups=8,
        cross_attention_dim=32,
        attention_head_dim=8,
    )
    base.update(overrides)
    return UNet3DConfig(**base)


def micro_unet_config(**overrides) -> UNet3DConfig:
    """2-level geometry for compile-bound tests (gradients, end-to-end):
    one cross-attention level + one plain level, every module type present."""
    base = dict(
        sample_size=8,
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        block_out_channels=(32, 32),
        layers_per_block=1,
        norm_num_groups=8,
        cross_attention_dim=32,
        attention_head_dim=8,
    )
    base.update(overrides)
    return UNet3DConfig(**base)


class UNet3DConditionModel(nn.Module):
    config: UNet3DConfig = UNET3D_MS_1_7B_CONFIG
    dtype: jnp.dtype = jnp.float32
    gradient_checkpointing: bool = False
    # remat saveable-set (models/unet3d_blocks.py REMAT_POLICIES):
    # "nothing" (reference-equivalent save-nothing), "dots", "conv_outs",
    # "conv_attn", "conv_dots".  A "+skiplow" suffix (e.g.
    # "conv_outs+skiplow") disables remat entirely on the two deepest
    # down/up levels and the mid block -- their activations are small
    # (<= 1/16th the spatial extent) so saving everything there costs
    # little HBM and removes their recompute from the backward pass.
    remat_policy: str = "nothing"
    attention_backend: str = "auto"
    # lower spatial GroupNorm+SiLU chains to the one-pass Pallas kernel
    fused_groupnorm: bool = False

    def setup(self):
        cfg = self.config
        time_embed_dim = cfg.block_out_channels[0] * 4

        self.conv_in = LoraConv(cfg.block_out_channels[0], (3, 3),
                               padding=((1, 1), (1, 1)), dtype=self.dtype,
                               name="conv_in")
        self.time_embedding = TimestepEmbedding(time_embed_dim,
                                                dtype=self.dtype)
        self.transformer_in = TransformerTemporalModel(
            num_attention_heads=8,
            attention_head_dim=cfg.attention_head_dim,
            in_channels=cfg.block_out_channels[0], num_layers=1,
            dtype=self.dtype, attention_backend=self.attention_backend)

        base_policy = self.remat_policy
        n_levels = len(cfg.block_out_channels)
        skip_from = n_levels  # no level skipped
        m = re.search(r"\+skiplow(\d*)$", base_policy)
        if m:
            n_skip = int(m.group(1)) if m.group(1) else 2
            base_policy = base_policy[:m.start()]
            skip_from = max(n_levels - n_skip, 1)

        def _remat_kwargs(level: int) -> dict:
            # level: 0 = highest spatial resolution (first down / last up)
            if level >= skip_from:
                return dict(gradient_checkpointing=False,
                            remat_policy="nothing")
            return dict(gradient_checkpointing=self.gradient_checkpointing,
                        remat_policy=base_policy)

        common = dict(dropout=0.0,
                      fused_groupnorm=self.fused_groupnorm,
                      dtype=self.dtype,
                      attention_backend=self.attention_backend)

        # down
        down_blocks = []
        output_channel = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            input_channel = output_channel
            output_channel = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            if block_type == "CrossAttnDownBlock3D":
                down_blocks.append(CrossAttnDownBlock3D(
                    num_layers=cfg.layers_per_block,
                    in_channels=input_channel, out_channels=output_channel,
                    temb_channels=time_embed_dim,
                    add_downsample=not is_final, resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups,
                    cross_attention_dim=cfg.cross_attention_dim,
                    attn_num_head_channels=cfg.attention_head_dim,
                    downsample_padding=cfg.downsample_padding, **common,
                    **_remat_kwargs(i)))
            elif block_type == "DownBlock3D":
                down_blocks.append(DownBlock3D(
                    num_layers=cfg.layers_per_block,
                    in_channels=input_channel, out_channels=output_channel,
                    temb_channels=time_embed_dim,
                    add_downsample=not is_final, resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups,
                    downsample_padding=cfg.downsample_padding, **common,
                    **_remat_kwargs(i)))
            else:
                raise ValueError(f"unknown down block {block_type}")
        self.down_blocks = down_blocks

        # mid
        self.mid_block = UNetMidBlock3DCrossAttn(
            in_channels=cfg.block_out_channels[-1],
            temb_channels=time_embed_dim, resnet_eps=cfg.norm_eps,
            output_scale_factor=cfg.mid_block_scale_factor,
            cross_attention_dim=cfg.cross_attention_dim,
            attn_num_head_channels=cfg.attention_head_dim,
            resnet_groups=cfg.norm_num_groups, **common,
            **_remat_kwargs(n_levels - 1))

        # up
        up_blocks = []
        reversed_channels = list(reversed(cfg.block_out_channels))
        output_channel = reversed_channels[0]
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == len(cfg.block_out_channels) - 1
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            input_channel = reversed_channels[
                min(i + 1, len(cfg.block_out_channels) - 1)]
            if block_type == "CrossAttnUpBlock3D":
                up_blocks.append(CrossAttnUpBlock3D(
                    num_layers=cfg.layers_per_block + 1,
                    in_channels=input_channel, out_channels=output_channel,
                    prev_output_channel=prev_output_channel,
                    temb_channels=time_embed_dim,
                    add_upsample=not is_final, resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups,
                    cross_attention_dim=cfg.cross_attention_dim,
                    attn_num_head_channels=cfg.attention_head_dim, **common,
                    **_remat_kwargs(n_levels - 1 - i)))
            elif block_type == "UpBlock3D":
                up_blocks.append(UpBlock3D(
                    num_layers=cfg.layers_per_block + 1,
                    in_channels=input_channel, out_channels=output_channel,
                    prev_output_channel=prev_output_channel,
                    temb_channels=time_embed_dim,
                    add_upsample=not is_final, resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups, **common,
                    **_remat_kwargs(n_levels - 1 - i)))
            else:
                raise ValueError(f"unknown up block {block_type}")
        self.up_blocks = up_blocks
        self.num_upsamplers = sum(
            1 for i in range(len(cfg.up_block_types))
            if i != len(cfg.block_out_channels) - 1)

        self.conv_norm_out = nn.GroupNorm(num_groups=cfg.norm_num_groups,
                                          epsilon=cfg.norm_eps,
                                          dtype=self.dtype,
                                          name="conv_norm_out")
        self.conv_out = LoraConv(cfg.out_channels, (3, 3),
                                padding=((1, 1), (1, 1)), dtype=self.dtype,
                                name="conv_out")

    def set_attention_slice(self, slice_size):
        """Reference API parity (reference models/unet_3d_condition.py:
        253-316).  Attention slicing trades memory for serial steps on CUDA;
        on TPU the Pallas flash backend already streams KV in blocks with
        O(seq) memory (ops/flash_attention.py), so slicing is unnecessary --
        the call is validated and ignored."""
        if slice_size is not None and not isinstance(slice_size,
                                                     (int, str, list)):
            raise ValueError(f"invalid slice_size {slice_size!r}")

    def __call__(self, sample, timesteps, encoder_hidden_states,
                 deterministic: bool = True):
        """sample: (B, C, F, H, W); timesteps: scalar or (B,);
        encoder_hidden_states: (B, S, D). Returns (B, C, F, H, W)."""
        cfg = self.config
        batch, _, num_frames, height, width = sample.shape

        default_overall_up_factor = 2 ** self.num_upsamplers
        forward_upsample_size = (height % default_overall_up_factor != 0
                                 or width % default_overall_up_factor != 0)

        # 1. time
        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (batch,))
        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0])
        emb = self.time_embedding(t_emb.astype(self.dtype))
        # per-frame repeat (reference models/unet_3d_condition.py:400-401)
        emb = jnp.repeat(emb, num_frames, axis=0)
        encoder_hidden_states = jnp.repeat(
            encoder_hidden_states.astype(self.dtype), num_frames, axis=0)

        # 2. pre-process: (B, C, F, H, W) -> (B*F, H, W, C)
        sample = sample.astype(self.dtype)
        sample = sample.transpose(0, 2, 3, 4, 1).reshape(
            batch * num_frames, height, width, cfg.in_channels)
        sample = self.conv_in(sample)
        if num_frames > 1:
            sample = self.transformer_in(sample, num_frames, None,
                                         deterministic)

        # 3. down
        down_block_res_samples = (sample,)
        for block in self.down_blocks:
            if block.has_cross_attention:
                sample, res_samples = block(
                    sample, temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    num_frames=num_frames, deterministic=deterministic)
            else:
                sample, res_samples = block(sample, temb=emb,
                                            num_frames=num_frames,
                                            deterministic=deterministic)
            down_block_res_samples += res_samples

        # 4. mid
        sample = self.mid_block(sample, temb=emb,
                                encoder_hidden_states=encoder_hidden_states,
                                num_frames=num_frames,
                                deterministic=deterministic)

        # 5. up
        for i, block in enumerate(self.up_blocks):
            is_final_block = i == len(self.up_blocks) - 1
            res_samples = down_block_res_samples[-len(block.resnets):]
            down_block_res_samples = down_block_res_samples[
                :-len(block.resnets)]
            upsample_size = None
            if not is_final_block and forward_upsample_size:
                upsample_size = down_block_res_samples[-1].shape[1:3]
            if block.has_cross_attention:
                sample = block(
                    sample, res_samples, temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    upsample_size=upsample_size, num_frames=num_frames,
                    deterministic=deterministic)
            else:
                sample = block(sample, res_samples, temb=emb,
                               upsample_size=upsample_size,
                               num_frames=num_frames,
                               deterministic=deterministic)

        # 6. post-process
        sample = self.conv_norm_out(sample)
        sample = nn.silu(sample)
        sample = self.conv_out(sample)

        # (B*F, H, W, C) -> (B, C, F, H, W)
        out_h, out_w = sample.shape[1], sample.shape[2]
        sample = sample.reshape(batch, num_frames, out_h, out_w,
                                cfg.out_channels)
        return sample.transpose(0, 4, 1, 2, 3)
