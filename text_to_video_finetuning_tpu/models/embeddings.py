"""Timestep embeddings.

Behavioral spec: diffusers `Timesteps` / `TimestepEmbedding` as instantiated by
the reference UNet (reference models/unet_3d_condition.py:137-145):
`Timesteps(block_out_channels[0], flip_sin_to_cos=True, downscale_freq_shift=0)`
followed by a 2-layer SiLU MLP to 4*channels.
"""

from __future__ import annotations

import math

import flax.linen as nn

from .lora_layers import LoraDense
import jax.numpy as jnp


def get_timestep_embedding(timesteps, embedding_dim: int,
                           flip_sin_to_cos: bool = True,
                           downscale_freq_shift: float = 0.0,
                           max_period: int = 10000):
    """Sinusoidal timestep embedding, fp32.

    timesteps: (B,) int or float array. Returns (B, embedding_dim) float32.
    """
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> SiLU -> linear_2 MLP over the sinusoidal embedding."""
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        sample = LoraDense(self.time_embed_dim, dtype=self.dtype,
                          name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = LoraDense(self.time_embed_dim, dtype=self.dtype,
                          name="linear_2")(sample)
        return sample
