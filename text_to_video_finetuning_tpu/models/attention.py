"""Transformer building blocks for the 3D UNet.

Behavioral spec (diffusers modules the reference imports at
reference models/unet_3d_blocks.py:18-20):

* `CrossAttention`: to_q/to_k/to_v (no bias), to_out.0 Linear + dropout,
  scale = head_dim**-0.5.
* `FeedForward` with GEGLU: proj Linear(dim, 2*inner) split into
  (value, gate), value * gelu(gate), then Linear(inner, dim).
* `BasicTransformerBlock`: pre-LayerNorm; attn1 (self) -> attn2
  (cross, or a second self-attention when `double_self_attention`, as in
  diffusers TransformerTemporalModel) -> GEGLU FF; all residual.

Tensors are (batch, seq, channels). Compute dtype is configurable; softmax
always runs in fp32 (see ops/attention.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import dot_product_attention
from .lora_layers import LoraDense


class CrossAttention(nn.Module):
    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None  # None => self-attention kv dim
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None,
                 deterministic: bool = True):
        inner_dim = self.heads * self.dim_head
        context = (hidden_states if encoder_hidden_states is None
                   else encoder_hidden_states)

        q = LoraDense(inner_dim, use_bias=False, dtype=self.dtype,
                     name="to_q")(hidden_states)
        k = LoraDense(inner_dim, use_bias=False, dtype=self.dtype,
                     name="to_k")(context)
        v = LoraDense(inner_dim, use_bias=False, dtype=self.dtype,
                     name="to_v")(context)

        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)

        out = dot_product_attention(q, k, v, scale=self.dim_head ** -0.5,
                                    backend=self.attention_backend)
        # tagged for the "conv_attn" remat policy (models/unet3d_blocks.py
        # REMAT_POLICIES): saving this point means the backward pass never
        # re-runs the attention kernel forward
        out = checkpoint_name(out, "attn_out")
        out = out.reshape(b, sq, inner_dim)

        out = LoraDense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)
        out = checkpoint_name(out, "dense_out")
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        h = LoraDense(self.dim_out * 2, dtype=self.dtype, name="proj")(
            hidden_states)
        value, gate = jnp.split(h, 2, axis=-1)
        return value * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True):
        inner_dim = self.dim * self.mult
        h = GEGLU(inner_dim, dtype=self.dtype, name="net_0")(hidden_states)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = LoraDense(self.dim, dtype=self.dtype, name="net_2")(h)
        return checkpoint_name(h, "dense_out")


class BasicTransformerBlock(nn.Module):
    """attn1 (self) -> attn2 (cross or second self) -> GEGLU FF, pre-LN."""
    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    double_self_attention: bool = False
    dropout: float = 0.0
    only_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None,
                 deterministic: bool = True):
        # 1. Self-attention (or cross when only_cross_attention)
        norm_hidden = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                   name="norm1")(hidden_states)
        attn1_context = (encoder_hidden_states if self.only_cross_attention
                         else None)
        attn_out = CrossAttention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            cross_attention_dim=(self.cross_attention_dim
                                 if self.only_cross_attention else None),
            dropout=self.dropout, dtype=self.dtype,
            attention_backend=self.attention_backend, name="attn1",
        )(norm_hidden, attn1_context, deterministic=deterministic)
        hidden_states = attn_out + hidden_states

        # 2. Cross-attention (self when double_self_attention, as in the
        # temporal transformer -- diffusers TransformerTemporalModel defaults
        # double_self_attention=True so attn2 never sees text states)
        has_attn2 = (self.cross_attention_dim is not None
                     or self.double_self_attention)
        if has_attn2:
            norm_hidden = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name="norm2")(hidden_states)
            context = (None if self.double_self_attention
                       else encoder_hidden_states)
            attn_out = CrossAttention(
                query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                cross_attention_dim=(None if self.double_self_attention
                                     else self.cross_attention_dim),
                dropout=self.dropout, dtype=self.dtype,
                attention_backend=self.attention_backend, name="attn2",
            )(norm_hidden, context, deterministic=deterministic)
            hidden_states = attn_out + hidden_states

        # 3. Feed-forward
        norm_hidden = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                   name="norm3")(hidden_states)
        ff_out = FeedForward(self.dim, dropout=self.dropout, dtype=self.dtype,
                             name="ff")(norm_hidden,
                                        deterministic=deterministic)
        hidden_states = ff_out + hidden_states
        return hidden_states
