"""Spatial and temporal transformer wrappers.

Behavioral spec:

* `Transformer2DModel` (continuous input, use_linear_projection=True, as the
  reference constructs it at reference models/unet_3d_blocks.py:478-489):
  GroupNorm -> flatten HW -> Linear proj_in -> BasicTransformerBlock(s) with
  text cross-attention -> Linear proj_out -> unflatten -> residual.
* `TransformerTemporalModel` (diffusers transformer_temporal, constructed at
  reference models/unet_3d_blocks.py:491-499 and called per-frame-sequence):
  attention runs over the frame axis with batch = B*H*W; its transformer
  blocks use double self-attention (attn2 never sees text states).

Layout: spatial tensors are (B*F, H, W, C) channel-last.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from .attention import BasicTransformerBlock
from .lora_layers import LoraDense


class Transformer2DModel(nn.Module):
    num_attention_heads: int
    attention_head_dim: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 32
    only_cross_attention: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None,
                 deterministic: bool = True):
        inner_dim = self.num_attention_heads * self.attention_head_dim
        bf, height, width, channels = hidden_states.shape
        residual = hidden_states

        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(hidden_states)
        h = h.reshape(bf, height * width, channels)
        h = LoraDense(inner_dim, dtype=self.dtype, name="proj_in")(h)
        h = checkpoint_name(h, "dense_out")

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                dim=inner_dim, heads=self.num_attention_heads,
                dim_head=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                only_cross_attention=self.only_cross_attention,
                dropout=self.dropout, dtype=self.dtype,
                attention_backend=self.attention_backend,
                name=f"transformer_blocks_{i}",
            )(h, encoder_hidden_states, deterministic=deterministic)

        h = LoraDense(self.in_channels, dtype=self.dtype, name="proj_out")(h)
        h = checkpoint_name(h, "dense_out")
        h = h.reshape(bf, height, width, self.in_channels)
        return h + residual


class TransformerTemporalModel(nn.Module):
    """Attention over frames; batch = B*H*W.

    Input (B*F, H, W, C); `num_frames` unfolds frames. The GroupNorm
    normalizes per-video over (F, H, W, C/G) exactly like the torch
    (B, C, F, H, W) GroupNorm in diffusers.
    """
    num_attention_heads: int
    attention_head_dim: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None  # kept for parity; attn2 is self
    norm_num_groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, num_frames: int = 1,
                 encoder_hidden_states=None, deterministic: bool = True):
        inner_dim = self.num_attention_heads * self.attention_head_dim
        bf, height, width, channels = hidden_states.shape
        batch = bf // num_frames
        residual = hidden_states

        h = hidden_states.reshape(batch, num_frames, height, width, channels)
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(h)
        # (B, F, H, W, C) -> (B*H*W, F, C)
        h = h.transpose(0, 2, 3, 1, 4).reshape(batch * height * width,
                                               num_frames, channels)
        h = LoraDense(inner_dim, dtype=self.dtype, name="proj_in")(h)
        h = checkpoint_name(h, "dense_out")

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                dim=inner_dim, heads=self.num_attention_heads,
                dim_head=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                double_self_attention=True,
                dropout=self.dropout, dtype=self.dtype,
                attention_backend=self.attention_backend,
                name=f"transformer_blocks_{i}",
            )(h, encoder_hidden_states, deterministic=deterministic)

        h = LoraDense(self.in_channels, dtype=self.dtype, name="proj_out")(h)
        h = checkpoint_name(h, "dense_out")
        h = h.reshape(batch, height, width, num_frames, self.in_channels)
        h = h.transpose(0, 3, 1, 2, 4).reshape(bf, height, width,
                                               self.in_channels)
        return h + residual
