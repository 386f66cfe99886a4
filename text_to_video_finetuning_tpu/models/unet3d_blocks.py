"""3D UNet blocks: spatio-temporal down/mid/up blocks.

Behavioral spec (reference models/unet_3d_blocks.py):

* `CrossAttnDownBlock3D` (:422-569): per layer resnet -> temp_conv(f>1) ->
  spatial attn -> temporal attn(f>1); residuals collected after each layer and
  after the downsampler.
* `DownBlock3D` (:572-652): resnet -> temp_conv per layer.
* `UNetMidBlock3DCrossAttn` (:267-419): resnet0 -> temp_conv0, then per layer
  attn -> temp_attn -> resnet -> temp_conv (NOTE inverted order vs down/up).
* `CrossAttnUpBlock3D` (:655-798) / `UpBlock3D` (:801-875): concat skip
  connection on the channel axis first, then same layer order as down blocks.

Gradient checkpointing maps the reference's per-module torch checkpoint
wrappers (reference models/unet_3d_blocks.py:30-153) onto `nn.remat` around
each of the four submodule types.

Layout: (B*F, H, W, C); skip concat is on the channel (last) axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import Downsample2D, ResnetBlock2D, TemporalConvLayer, Upsample2D
from .transformers import Transformer2DModel, TransformerTemporalModel


REMAT_POLICIES = {
    # save nothing: max memory savings, ~1 extra fwd of recompute
    "nothing": None,
    # save dot_general outputs (attention/dense only -- XLA convolutions are
    # NOT matched by dots policies, so this leaves the conv chains, which
    # dominate this UNet, fully recomputed)
    "dots": "dots_saveable",
    # save the tagged convolution outputs (models/resnet.py checkpoint_name
    # tags), recompute only the cheap GroupNorm/SiLU chains and attention:
    # the right "keep MXU outputs" policy for a conv-dominated UNet
    "conv_outs": ("names", ("conv_out_act",)),
    # conv outputs AND attention-kernel outputs (models/attention.py tag):
    # backward never re-runs flash attention forward; still avoids the
    # dots_saveable set that overflows the remote compiler
    "conv_attn": ("names", ("conv_out_act", "attn_out")),
    # conv + attention + transformer dense projections / FF outputs:
    # only GroupNorm/LayerNorm/SiLU chains and the softmax remain
    # recomputed -- the named near-equivalent of conv_dots that stays
    # inside the remote compiler's limits
    "conv_attn_dense": ("names", ("conv_out_act", "attn_out",
                                  "dense_out")),
    # conv outputs AND dot outputs saved; only elementwise recomputed
    "conv_dots": ("names_and_dots", ("conv_out_act",)),
}


def _resolve_policy(policy: str):
    if policy not in REMAT_POLICIES:
        raise ValueError(f"unknown remat_policy {policy!r}; "
                         f"options: {sorted(REMAT_POLICIES)}")
    spec = REMAT_POLICIES[policy]
    if spec is None:
        return None
    if isinstance(spec, str):
        return getattr(jax.checkpoint_policies, spec)
    kind, names = spec
    if kind == "names":
        return jax.checkpoint_policies.save_only_these_names(*names)
    # names_and_dots: union of named saves and dot outputs
    by_name = jax.checkpoint_policies.save_only_these_names(*names)
    dots = jax.checkpoint_policies.dots_saveable

    def union(prim, *args, **kwargs):
        return by_name(prim, *args, **kwargs) or dots(prim, *args, **kwargs)
    return union


def _maybe_remat(cls, enable: bool, static_argnums: Tuple[int, ...],
                 policy: str = "nothing"):
    """Wrap a module class with nn.remat, matching the reference's
    per-(resnet, temp_conv, attn, temp_attn) checkpoint units
    (reference models/unet_3d_blocks.py:30-153). `policy` picks the
    jax.checkpoint saveable-set (see REMAT_POLICIES)."""
    if not enable:
        return cls
    return nn.remat(cls, static_argnums=static_argnums,
                    policy=_resolve_policy(policy))


class CrossAttnDownBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    attn_num_head_channels: int = 1
    cross_attention_dim: int = 1280
    downsample_padding: int = 1
    add_downsample: bool = True
    dropout: float = 0.0
    gradient_checkpointing: bool = False
    remat_policy: str = "nothing"
    fused_groupnorm: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    has_cross_attention: bool = True

    def setup(self):
        gc = self.gradient_checkpointing
        resnet_cls = _maybe_remat(ResnetBlock2D, gc, (3,), self.remat_policy)
        temp_conv_cls = _maybe_remat(TemporalConvLayer, gc, (2, 3), self.remat_policy)
        attn_cls = _maybe_remat(Transformer2DModel, gc, (3,), self.remat_policy)
        temp_attn_cls = _maybe_remat(TransformerTemporalModel, gc, (2, 4), self.remat_policy)

        resnets, temp_convs, attentions, temp_attentions = [], [], [], []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            resnets.append(resnet_cls(
                in_channels=in_ch, out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, dropout=self.dropout,
                dtype=self.dtype, fused_groupnorm=self.fused_groupnorm))
            temp_convs.append(temp_conv_cls(
                in_dim=self.out_channels, out_dim=self.out_channels,
                dropout=0.1, dtype=self.dtype))
            attentions.append(attn_cls(
                num_attention_heads=self.out_channels
                // self.attn_num_head_channels,
                attention_head_dim=self.attn_num_head_channels,
                in_channels=self.out_channels, num_layers=1,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups, dtype=self.dtype,
                attention_backend=self.attention_backend))
            temp_attentions.append(temp_attn_cls(
                num_attention_heads=self.out_channels
                // self.attn_num_head_channels,
                attention_head_dim=self.attn_num_head_channels,
                in_channels=self.out_channels, num_layers=1,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups, dtype=self.dtype,
                attention_backend=self.attention_backend))
        self.resnets = resnets
        self.temp_convs = temp_convs
        self.attentions = attentions
        self.temp_attentions = temp_attentions

        if self.add_downsample:
            self.downsamplers_0 = Downsample2D(
                out_channels=self.out_channels,
                padding=self.downsample_padding, dtype=self.dtype)

    def __call__(self, hidden_states, temb=None, encoder_hidden_states=None,
                 num_frames: int = 1, deterministic: bool = True):
        output_states = ()
        for resnet, temp_conv, attn, temp_attn in zip(
                self.resnets, self.temp_convs, self.attentions,
                self.temp_attentions):
            hidden_states = resnet(hidden_states, temb, deterministic)
            if num_frames > 1:
                hidden_states = temp_conv(hidden_states, num_frames,
                                          deterministic)
            hidden_states = attn(hidden_states, encoder_hidden_states,
                                 deterministic)
            if num_frames > 1:
                hidden_states = temp_attn(hidden_states, num_frames, None,
                                          deterministic)
            output_states += (hidden_states,)

        if self.add_downsample:
            hidden_states = self.downsamplers_0(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class DownBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    downsample_padding: int = 1
    add_downsample: bool = True
    dropout: float = 0.0
    gradient_checkpointing: bool = False
    remat_policy: str = "nothing"
    fused_groupnorm: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    has_cross_attention: bool = False

    def setup(self):
        gc = self.gradient_checkpointing
        resnet_cls = _maybe_remat(ResnetBlock2D, gc, (3,), self.remat_policy)
        temp_conv_cls = _maybe_remat(TemporalConvLayer, gc, (2, 3), self.remat_policy)

        resnets, temp_convs = [], []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            resnets.append(resnet_cls(
                in_channels=in_ch, out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, dropout=self.dropout,
                dtype=self.dtype, fused_groupnorm=self.fused_groupnorm))
            temp_convs.append(temp_conv_cls(
                in_dim=self.out_channels, out_dim=self.out_channels,
                dropout=0.1, dtype=self.dtype))
        self.resnets = resnets
        self.temp_convs = temp_convs

        if self.add_downsample:
            self.downsamplers_0 = Downsample2D(
                out_channels=self.out_channels,
                padding=self.downsample_padding, dtype=self.dtype)

    def __call__(self, hidden_states, temb=None, num_frames: int = 1,
                 deterministic: bool = True):
        output_states = ()
        for resnet, temp_conv in zip(self.resnets, self.temp_convs):
            hidden_states = resnet(hidden_states, temb, deterministic)
            if num_frames > 1:
                hidden_states = temp_conv(hidden_states, num_frames,
                                          deterministic)
            output_states += (hidden_states,)

        if self.add_downsample:
            hidden_states = self.downsamplers_0(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlock3DCrossAttn(nn.Module):
    in_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    attn_num_head_channels: int = 1
    cross_attention_dim: int = 1280
    output_scale_factor: float = 1.0
    dropout: float = 0.0
    gradient_checkpointing: bool = False
    remat_policy: str = "nothing"
    fused_groupnorm: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    has_cross_attention: bool = True

    def setup(self):
        gc = self.gradient_checkpointing
        resnet_cls = _maybe_remat(ResnetBlock2D, gc, (3,), self.remat_policy)
        temp_conv_cls = _maybe_remat(TemporalConvLayer, gc, (2, 3), self.remat_policy)
        attn_cls = _maybe_remat(Transformer2DModel, gc, (3,), self.remat_policy)
        temp_attn_cls = _maybe_remat(TransformerTemporalModel, gc, (2, 4), self.remat_policy)

        resnets = [resnet_cls(
            in_channels=self.in_channels, out_channels=self.in_channels,
            temb_channels=self.temb_channels, eps=self.resnet_eps,
            groups=self.resnet_groups,
            output_scale_factor=self.output_scale_factor,
            dropout=self.dropout, dtype=self.dtype,
            fused_groupnorm=self.fused_groupnorm)]
        temp_convs = [temp_conv_cls(
            in_dim=self.in_channels, out_dim=self.in_channels, dropout=0.1,
            dtype=self.dtype)]
        attentions, temp_attentions = [], []
        for _ in range(self.num_layers):
            attentions.append(attn_cls(
                num_attention_heads=self.in_channels
                // self.attn_num_head_channels,
                attention_head_dim=self.attn_num_head_channels,
                in_channels=self.in_channels, num_layers=1,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups, dtype=self.dtype,
                attention_backend=self.attention_backend))
            temp_attentions.append(temp_attn_cls(
                num_attention_heads=self.in_channels
                // self.attn_num_head_channels,
                attention_head_dim=self.attn_num_head_channels,
                in_channels=self.in_channels, num_layers=1,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups, dtype=self.dtype,
                attention_backend=self.attention_backend))
            resnets.append(resnet_cls(
                in_channels=self.in_channels, out_channels=self.in_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout, dtype=self.dtype,
                fused_groupnorm=self.fused_groupnorm))
            temp_convs.append(temp_conv_cls(
                in_dim=self.in_channels, out_dim=self.in_channels,
                dropout=0.1, dtype=self.dtype))
        self.resnets = resnets
        self.temp_convs = temp_convs
        self.attentions = attentions
        self.temp_attentions = temp_attentions

    def __call__(self, hidden_states, temb=None, encoder_hidden_states=None,
                 num_frames: int = 1, deterministic: bool = True):
        hidden_states = self.resnets[0](hidden_states, temb, deterministic)
        # Reference fidelity: the NON-checkpointed mid path runs the leading
        # temp_convs[0] UNCONDITIONALLY (reference models/unet_3d_blocks.py:
        # 387 has no num_frames>1 guard), while the checkpointed path skips
        # it at f=1 via is_video (reference models/unet_3d_blocks.py:56-70).
        # Both behaviors are reproduced, keyed on gradient_checkpointing
        # (PARITY.md "f=1 mid-block temp_convs[0]").
        if num_frames > 1 or not self.gradient_checkpointing:
            hidden_states = self.temp_convs[0](hidden_states, num_frames,
                                               deterministic)
        # NOTE: mid block runs attn -> temp_attn BEFORE resnet -> temp_conv
        # (reference models/unet_3d_blocks.py:405-417), the inverse of
        # down/up blocks.
        for attn, temp_attn, resnet, temp_conv in zip(
                self.attentions, self.temp_attentions, self.resnets[1:],
                self.temp_convs[1:]):
            hidden_states = attn(hidden_states, encoder_hidden_states,
                                 deterministic)
            if num_frames > 1:
                hidden_states = temp_attn(hidden_states, num_frames, None,
                                          deterministic)
            hidden_states = resnet(hidden_states, temb, deterministic)
            if num_frames > 1:
                hidden_states = temp_conv(hidden_states, num_frames,
                                          deterministic)
        return hidden_states


class CrossAttnUpBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    attn_num_head_channels: int = 1
    cross_attention_dim: int = 1280
    add_upsample: bool = True
    dropout: float = 0.0
    gradient_checkpointing: bool = False
    remat_policy: str = "nothing"
    fused_groupnorm: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    has_cross_attention: bool = True

    def setup(self):
        gc = self.gradient_checkpointing
        resnet_cls = _maybe_remat(ResnetBlock2D, gc, (3,), self.remat_policy)
        temp_conv_cls = _maybe_remat(TemporalConvLayer, gc, (2, 3), self.remat_policy)
        attn_cls = _maybe_remat(Transformer2DModel, gc, (3,), self.remat_policy)
        temp_attn_cls = _maybe_remat(TransformerTemporalModel, gc, (2, 4), self.remat_policy)

        resnets, temp_convs, attentions, temp_attentions = [], [], [], []
        for i in range(self.num_layers):
            res_skip_channels = (self.in_channels
                                 if i == self.num_layers - 1
                                 else self.out_channels)
            resnet_in_channels = (self.prev_output_channel if i == 0
                                  else self.out_channels)
            resnets.append(resnet_cls(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, dropout=self.dropout,
                dtype=self.dtype, fused_groupnorm=self.fused_groupnorm))
            temp_convs.append(temp_conv_cls(
                in_dim=self.out_channels, out_dim=self.out_channels,
                dropout=0.1, dtype=self.dtype))
            attentions.append(attn_cls(
                num_attention_heads=self.out_channels
                // self.attn_num_head_channels,
                attention_head_dim=self.attn_num_head_channels,
                in_channels=self.out_channels, num_layers=1,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups, dtype=self.dtype,
                attention_backend=self.attention_backend))
            temp_attentions.append(temp_attn_cls(
                num_attention_heads=self.out_channels
                // self.attn_num_head_channels,
                attention_head_dim=self.attn_num_head_channels,
                in_channels=self.out_channels, num_layers=1,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups, dtype=self.dtype,
                attention_backend=self.attention_backend))
        self.resnets = resnets
        self.temp_convs = temp_convs
        self.attentions = attentions
        self.temp_attentions = temp_attentions

        if self.add_upsample:
            self.upsamplers_0 = Upsample2D(out_channels=self.out_channels,
                                           dtype=self.dtype)

    def __call__(self, hidden_states, res_hidden_states_tuple, temb=None,
                 encoder_hidden_states=None, upsample_size=None,
                 num_frames: int = 1, deterministic: bool = True):
        for resnet, temp_conv, attn, temp_attn in zip(
                self.resnets, self.temp_convs, self.attentions,
                self.temp_attentions):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate(
                [hidden_states, res_hidden_states], axis=-1)

            hidden_states = resnet(hidden_states, temb, deterministic)
            if num_frames > 1:
                hidden_states = temp_conv(hidden_states, num_frames,
                                          deterministic)
            hidden_states = attn(hidden_states, encoder_hidden_states,
                                 deterministic)
            if num_frames > 1:
                hidden_states = temp_attn(hidden_states, num_frames, None,
                                          deterministic)

        if self.add_upsample:
            hidden_states = self.upsamplers_0(hidden_states, upsample_size)
        return hidden_states


class UpBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    add_upsample: bool = True
    dropout: float = 0.0
    gradient_checkpointing: bool = False
    remat_policy: str = "nothing"
    fused_groupnorm: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    has_cross_attention: bool = False

    def setup(self):
        gc = self.gradient_checkpointing
        resnet_cls = _maybe_remat(ResnetBlock2D, gc, (3,), self.remat_policy)
        temp_conv_cls = _maybe_remat(TemporalConvLayer, gc, (2, 3), self.remat_policy)

        resnets, temp_convs = [], []
        for i in range(self.num_layers):
            res_skip_channels = (self.in_channels
                                 if i == self.num_layers - 1
                                 else self.out_channels)
            resnet_in_channels = (self.prev_output_channel if i == 0
                                  else self.out_channels)
            resnets.append(resnet_cls(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, dropout=self.dropout,
                dtype=self.dtype, fused_groupnorm=self.fused_groupnorm))
            temp_convs.append(temp_conv_cls(
                in_dim=self.out_channels, out_dim=self.out_channels,
                dropout=0.1, dtype=self.dtype))
        self.resnets = resnets
        self.temp_convs = temp_convs

        if self.add_upsample:
            self.upsamplers_0 = Upsample2D(out_channels=self.out_channels,
                                           dtype=self.dtype)

    def __call__(self, hidden_states, res_hidden_states_tuple, temb=None,
                 upsample_size=None, num_frames: int = 1,
                 deterministic: bool = True):
        for resnet, temp_conv in zip(self.resnets, self.temp_convs):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate(
                [hidden_states, res_hidden_states], axis=-1)

            hidden_states = resnet(hidden_states, temb, deterministic)
            if num_frames > 1:
                hidden_states = temp_conv(hidden_states, num_frames,
                                          deterministic)

        if self.add_upsample:
            hidden_states = self.upsamplers_0(hidden_states, upsample_size)
        return hidden_states
