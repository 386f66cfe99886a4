"""Convolutional building blocks for the 3D UNet (NHWC, TPU-native).

Behavioral spec: diffusers `ResnetBlock2D`, `TemporalConvLayer`,
`Downsample2D`, `Upsample2D` as imported by the reference
(reference models/unet_3d_blocks.py:18).  Everything here is channel-last:
spatial tensors are (B*F, H, W, C); the temporal conv reshapes to
(B, F, H, W, C) and runs a (3,1,1) 3D conv over frames, exactly the
ModelScope temporal conv (zero-initialized final layer => identity at init).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from .lora_layers import LoraConv, LoraDense
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from ..ops.groupnorm import fused_group_norm_silu

# activations tagged for the "conv_outs"/"conv_dots" remat policies
# (models/unet3d_blocks.py REMAT_POLICIES): the conv results are the
# expensive-to-recompute intermediates; everything between them is a cheap
# GroupNorm/SiLU chain
_CONV_TAG = "conv_out_act"


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm + SiLU with the same param tree as nn.GroupNorm
    ({scale, bias}), lowered to the one-pass Pallas kernel on TPU
    (ops/groupnorm.py); XLA composition elsewhere."""
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    apply_silu: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if jax.default_backend() == "tpu":
            return fused_group_norm_silu(x, scale, bias, self.num_groups,
                                         self.epsilon, self.apply_silu)
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                         dtype=self.dtype, use_bias=False, use_scale=False,
                         name="stats")(x)
        y = y * scale + bias
        return nn.silu(y) if self.apply_silu else y


class ResnetBlock2D(nn.Module):
    """GroupNorm/SiLU/conv x2 with timestep-bias injection and skip conv.

    Matches diffusers ResnetBlock2D with pre_norm=True,
    time_embedding_norm='default', non_linearity='silu'.
    """
    in_channels: int
    out_channels: Optional[int] = None
    temb_channels: int = 512
    groups: int = 32
    eps: float = 1e-6
    output_scale_factor: float = 1.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # lower the GroupNorm+SiLU chains to the one-pass Pallas kernel
    fused_groupnorm: bool = False

    def _norm_silu(self, name):
        if self.fused_groupnorm:
            return FusedGroupNormSiLU(num_groups=self.groups,
                                      epsilon=self.eps, dtype=self.dtype,
                                      name=name)
        gn = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                          dtype=self.dtype, name=name)
        return lambda x: nn.silu(gn(x))

    @nn.compact
    def __call__(self, hidden_states, temb=None, deterministic: bool = True):
        out_channels = self.out_channels or self.in_channels
        residual = hidden_states

        h = self._norm_silu("norm1")(hidden_states)
        h = LoraConv(out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = checkpoint_name(h, _CONV_TAG)

        if temb is not None:
            temb_proj = LoraDense(out_channels, dtype=self.dtype,
                                 name="time_emb_proj")(nn.silu(temb))
            h = h + temb_proj[:, None, None, :]

        h = self._norm_silu("norm2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = LoraConv(out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        h = checkpoint_name(h, _CONV_TAG)

        if self.in_channels != out_channels:
            residual = LoraConv(out_channels, (1, 1), padding="VALID",
                               dtype=self.dtype, name="conv_shortcut")(residual)

        return (residual + h) / self.output_scale_factor


class TemporalConvLayer(nn.Module):
    """ModelScope temporal conv: 4x [GroupNorm, SiLU, (Dropout), Conv3D(3,1,1)]
    with a residual connection; conv4 is zero-initialized so the layer is the
    identity at init (diffusers TemporalConvLayer).

    Input/output: (B*F, H, W, C); `num_frames` unfolds the batch axis.
    """
    in_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, num_frames: int = 1,
                 deterministic: bool = True):
        out_dim = self.out_dim or self.in_dim
        bf, height, width, channels = hidden_states.shape
        batch = bf // num_frames
        h = hidden_states.reshape(batch, num_frames, height, width, channels)
        identity = h

        def conv3d(x, out_ch, name, zero_init=False):
            kernel_init = (nn.initializers.zeros if zero_init
                           else nn.initializers.lecun_normal())
            y = LoraConv(out_ch, (3, 1, 1),
                        padding=((1, 1), (0, 0), (0, 0)),
                        kernel_init=kernel_init, dtype=self.dtype,
                        name=name)(x)
            return checkpoint_name(y, _CONV_TAG)

        h = nn.GroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm1")(h)
        h = nn.silu(h)
        h = conv3d(h, out_dim, "conv1")

        for i, name in ((2, "conv2"), (3, "conv3")):
            h = nn.GroupNorm(32, epsilon=1e-5, dtype=self.dtype,
                             name=f"norm{i}")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = conv3d(h, self.in_dim, name)

        h = nn.GroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm4")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv3d(h, self.in_dim, "conv4", zero_init=True)

        h = identity + h
        return h.reshape(bf, height, width, channels)


class Downsample2D(nn.Module):
    """3x3 stride-2 conv downsample (diffusers Downsample2D, use_conv=True)."""
    out_channels: int
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        if self.padding == 0:
            # reference semantics: asymmetric (0,1,0,1) pad when padding=0
            hidden_states = jnp.pad(
                hidden_states, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = ((0, 0), (0, 0))
        else:
            pad = ((self.padding, self.padding), (self.padding, self.padding))
        return LoraConv(self.out_channels, (3, 3), strides=(2, 2), padding=pad,
                       dtype=self.dtype, name="conv")(hidden_states)


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv (diffusers Upsample2D, use_conv=True).

    `output_size` overrides the 2x target, mirroring the reference's
    forward_upsample_size path (reference models/unet_3d_condition.py:361-367).
    """
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, output_size=None):
        b, h, w, c = hidden_states.shape
        if output_size is None:
            # exact nearest-neighbour 2x: duplicate rows/cols
            up = jnp.repeat(jnp.repeat(hidden_states, 2, axis=1), 2, axis=2)
        else:
            # torch F.interpolate(mode="nearest") semantics: index
            # floor(i * in / out).  jax.image.resize "nearest" rounds from
            # pixel centers instead and disagrees for odd sizes, so gather
            # explicitly to stay checkpoint-parity with the reference.
            oh, ow = int(output_size[0]), int(output_size[1])
            rows = (jnp.arange(oh) * h) // oh
            cols = (jnp.arange(ow) * w) // ow
            up = hidden_states[:, rows][:, :, cols]
        return LoraConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(up)
