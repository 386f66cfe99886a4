"""AutoencoderKL (Stable-Diffusion VAE), TPU-native NHWC.

Behavioral spec: the diffusers `AutoencoderKL` the reference loads from the
pretrained checkpoint (reference train.py:122) and drives per-frame:
encode (B*F,3,H,W) -> DiagonalGaussian latents (B*F,4,H/8,W/8) sampled then
scaled by 0.18215 (reference train.py:339-347), decode the inverse
(reference inference.py:124-140).

Public API is channel-first (B, 3, H, W) / (B, 4, h, w) to mirror the
reference call sites; internals are NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import Downsample2D, ResnetBlock2D, Upsample2D


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    sample_size: int = 256
    scaling_factor: float = 0.18215


VAE_SD_CONFIG = VAEConfig()


def tiny_vae_config(**overrides) -> VAEConfig:
    base = dict(block_out_channels=(16, 32), layers_per_block=1,
                norm_num_groups=8, sample_size=32)
    base.update(overrides)
    return VAEConfig(**base)


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens (diffusers VAE
    mid-block Attention with one head)."""
    channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        b, h, w, c = hidden_states.shape
        residual = hidden_states
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="group_norm")(hidden_states)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        scale = c ** -0.5
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", weights.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + residual


class DownEncoderBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    norm_num_groups: int = 32
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = ResnetBlock2D(
                in_channels=in_ch, out_channels=self.out_channels,
                temb_channels=0, groups=self.norm_num_groups, eps=1e-6,
                dtype=self.dtype, name=f"resnets_{i}")(hidden_states, None)
        if self.add_downsample:
            # SD VAE downsampler uses padding=0 with asymmetric (0,1,0,1) pad
            hidden_states = Downsample2D(
                out_channels=self.out_channels, padding=0, dtype=self.dtype,
                name="downsamplers_0")(hidden_states)
        return hidden_states


class UpDecoderBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 3
    norm_num_groups: int = 32
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = ResnetBlock2D(
                in_channels=in_ch, out_channels=self.out_channels,
                temb_channels=0, groups=self.norm_num_groups, eps=1e-6,
                dtype=self.dtype, name=f"resnets_{i}")(hidden_states, None)
        if self.add_upsample:
            hidden_states = Upsample2D(out_channels=self.out_channels,
                                       dtype=self.dtype,
                                       name="upsamplers_0")(hidden_states)
        return hidden_states


class MidBlock2D(nn.Module):
    channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        hidden_states = ResnetBlock2D(
            in_channels=self.channels, out_channels=self.channels,
            temb_channels=0, groups=self.norm_num_groups, eps=1e-6,
            dtype=self.dtype, name="resnets_0")(hidden_states, None)
        hidden_states = VAEAttention(
            self.channels, norm_num_groups=self.norm_num_groups,
            dtype=self.dtype, name="attentions_0")(hidden_states)
        hidden_states = ResnetBlock2D(
            in_channels=self.channels, out_channels=self.channels,
            temb_channels=0, groups=self.norm_num_groups, eps=1e-6,
            dtype=self.dtype, name="resnets_1")(hidden_states, None)
        return hidden_states


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(pixels)
        out_ch = cfg.block_out_channels[0]
        for i, ch in enumerate(cfg.block_out_channels):
            in_ch, out_ch = out_ch, ch
            h = DownEncoderBlock2D(
                in_channels=in_ch, out_channels=out_ch,
                num_layers=cfg.layers_per_block,
                norm_num_groups=cfg.norm_num_groups,
                add_downsample=i != len(cfg.block_out_channels) - 1,
                dtype=self.dtype, name=f"down_blocks_{i}")(h)
        h = MidBlock2D(out_ch, norm_num_groups=cfg.norm_num_groups,
                       dtype=self.dtype, name="mid_block")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents):
        cfg = self.config
        reversed_channels = list(reversed(cfg.block_out_channels))
        h = nn.Conv(reversed_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(latents)
        h = MidBlock2D(reversed_channels[0],
                       norm_num_groups=cfg.norm_num_groups, dtype=self.dtype,
                       name="mid_block")(h)
        out_ch = reversed_channels[0]
        for i, ch in enumerate(reversed_channels):
            in_ch, out_ch = out_ch, ch
            h = UpDecoderBlock2D(
                in_channels=in_ch, out_channels=out_ch,
                num_layers=cfg.layers_per_block + 1,
                norm_num_groups=cfg.norm_num_groups,
                add_upsample=i != len(cfg.block_out_channels) - 1,
                dtype=self.dtype, name=f"up_blocks_{i}")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAE_SD_CONFIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  padding="VALID", dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       padding="VALID", dtype=self.dtype,
                                       name="post_quant_conv")

    def moments(self, pixels):
        """pixels (B, 3, H, W) -> (mean, logvar) each (B, 4, h, w)."""
        x = pixels.astype(self.dtype).transpose(0, 2, 3, 1)
        m = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(m, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean.transpose(0, 3, 1, 2), logvar.transpose(0, 3, 1, 2)

    def encode(self, pixels, rng=None, sample: bool = True):
        """DiagonalGaussian encode; samples when `sample` else returns mode.

        Note: does NOT apply scaling_factor -- callers multiply, matching
        `tensor_to_vae_latent` (reference train.py:339-347)."""
        mean, logvar = self.moments(pixels)
        if sample:
            if rng is None:
                rng = self.make_rng("gaussian")
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(rng, mean.shape,
                                                  dtype=mean.dtype)
        return mean

    def decode(self, latents):
        """latents (B, 4, h, w) -> pixels (B, 3, H, W); no scaling factor."""
        z = latents.astype(self.dtype).transpose(0, 2, 3, 1)
        z = self.post_quant_conv(z)
        return self.decoder(z).transpose(0, 3, 1, 2)

    def __call__(self, pixels, rng=None):
        """Autoencode roundtrip (used for init/shape checks)."""
        z = self.encode(pixels, rng=rng, sample=False)
        return self.decode(z)

    def enable_slicing(self):
        """Reference API parity (vae.enable_slicing, reference
        train.py:678, inference.py:74).  Sliced/micro-batched encode-decode
        lives at the pipeline layer here (`vae_batch_size`,
        pipelines/text_to_video.py encode_video/decode_latents) because the
        module itself is pure; accepted as a no-op."""

    def disable_slicing(self):
        """See enable_slicing."""
