"""Test-only torch reference of the ModelScope 3D UNet.

Clean-room reimplementation of the behavior the reference model executes
(reference models/unet_3d_condition.py:325-500 and
models/unet_3d_blocks.py:386-417,517-569,632-652,746-798,855-875, plus the
diffusers building blocks it imports at models/unet_3d_blocks.py:18-20).
State-dict keys match diffusers/`text-to-video-ms-1.7b` naming so weights
flow through `utils/checkpoint.state_dict_to_flax` unchanged.

This exists ONLY to produce numerical goldens for the flax UNet
(tests/test_unet_golden.py).  It is never imported by the package.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(timesteps: torch.Tensor, dim: int) -> torch.Tensor:
    """Sinusoidal embedding, flip_sin_to_cos=True, downscale_freq_shift=0
    (diffusers Timesteps as constructed at reference
    models/unet_3d_condition.py:139)."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = timesteps.float()[:, None] * freqs[None, :]
    # sin/cos then flipped -> [cos, sin]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, time_embed_dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (pre_norm, silu, default time_embedding_norm)."""

    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 groups=32, eps=1e-6, output_scale_factor=1.0, dropout=0.0):
        super().__init__()
        out_channels = out_channels or in_channels
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        self.time_emb_proj = (nn.Linear(temb_channels, out_channels)
                              if temb_channels else None)
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps)
        self.dropout = nn.Dropout(dropout)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_channels, out_channels, 1)
                              if in_channels != out_channels else None)
        self.output_scale_factor = output_scale_factor

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and self.time_emb_proj is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(self.dropout(F.silu(self.norm2(h))))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return (x + h) / self.output_scale_factor


class TemporalConvLayer(nn.Module):
    """diffusers TemporalConvLayer: 4x [GN, SiLU, (Dropout,) Conv3d(3,1,1)]
    residual, conv4 zero-init (identity at init)."""

    def __init__(self, in_dim, out_dim=None, dropout=0.1):
        super().__init__()
        out_dim = out_dim or in_dim
        self.conv1 = nn.Sequential(
            nn.GroupNorm(32, in_dim), nn.SiLU(),
            nn.Conv3d(in_dim, out_dim, (3, 1, 1), padding=(1, 0, 0)))
        self.conv2 = nn.Sequential(
            nn.GroupNorm(32, out_dim), nn.SiLU(), nn.Dropout(dropout),
            nn.Conv3d(out_dim, in_dim, (3, 1, 1), padding=(1, 0, 0)))
        self.conv3 = nn.Sequential(
            nn.GroupNorm(32, in_dim), nn.SiLU(), nn.Dropout(dropout),
            nn.Conv3d(in_dim, in_dim, (3, 1, 1), padding=(1, 0, 0)))
        self.conv4 = nn.Sequential(
            nn.GroupNorm(32, in_dim), nn.SiLU(), nn.Dropout(dropout),
            nn.Conv3d(in_dim, in_dim, (3, 1, 1), padding=(1, 0, 0)))
        nn.init.zeros_(self.conv4[-1].weight)
        nn.init.zeros_(self.conv4[-1].bias)

    def forward(self, hidden_states, num_frames=1):
        bf = hidden_states.shape[0]
        h = hidden_states.reshape(bf // num_frames, num_frames,
                                  *hidden_states.shape[1:])
        h = h.permute(0, 2, 1, 3, 4)  # (B, C, F, H, W)
        identity = h
        h = self.conv4(self.conv3(self.conv2(self.conv1(h)))) + identity
        h = h.permute(0, 2, 1, 3, 4).reshape(bf, *hidden_states.shape[1:])
        return h


class CrossAttention(nn.Module):
    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64):
        super().__init__()
        inner = heads * dim_head
        kv_dim = cross_attention_dim or query_dim
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(kv_dim, inner, bias=False)
        self.to_v = nn.Linear(kv_dim, inner, bias=False)
        self.to_out = nn.ModuleList(
            [nn.Linear(inner, query_dim), nn.Dropout(0.0)])
        self.heads = heads
        self.scale = dim_head ** -0.5

    def forward(self, x, context=None):
        context = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)
        b, sq, _ = q.shape
        nh = self.heads

        def split(t):
            return t.reshape(b, t.shape[1], nh, -1).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, sq, -1)
        return self.to_out[1](self.to_out[0](out))


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, dim * mult), nn.Dropout(0.0),
             nn.Linear(dim * mult, dim)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class BasicTransformerBlock(nn.Module):
    """pre-LN: attn1(self) -> attn2(cross, or second self) -> GEGLU FF."""

    def __init__(self, dim, heads, dim_head, cross_attention_dim=None,
                 double_self_attention=False):
        super().__init__()
        # registration order attn1, ff, attn2, norms matches diffusers'
        # BasicTransformerBlock so torch modules() iteration (the
        # cloneofsimo .pt serialization order) is faithful
        self.attn1 = CrossAttention(dim, None, heads, dim_head)
        self.ff = FeedForward(dim)
        self.attn2 = CrossAttention(
            dim, None if double_self_attention else cross_attention_dim,
            heads, dim_head)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.double_self_attention = double_self_attention

    def forward(self, x, context=None):
        x = self.attn1(self.norm1(x)) + x
        ctx = None if self.double_self_attention else context
        x = self.attn2(self.norm2(x), ctx) + x
        x = self.ff(self.norm3(x)) + x
        return x


class Transformer2DModel(nn.Module):
    """Spatial transformer, continuous input, use_linear_projection=True
    (constructed at reference models/unet_3d_blocks.py:479-489)."""

    def __init__(self, heads, dim_head, in_channels, num_layers=1,
                 cross_attention_dim=None, norm_num_groups=32):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(norm_num_groups, in_channels, eps=1e-6)
        self.proj_in = nn.Linear(in_channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, dim_head,
                                   cross_attention_dim)
             for _ in range(num_layers)])
        self.proj_out = nn.Linear(inner, in_channels)

    def forward(self, x, context=None):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = self.proj_in(x)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        x = self.proj_out(x)
        return x.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class TransformerTemporalModel(nn.Module):
    """Temporal transformer: attention over frames, batch = B*H*W;
    double self-attention (attn2 never sees text)."""

    def __init__(self, heads, dim_head, in_channels, num_layers=1,
                 cross_attention_dim=None, norm_num_groups=32):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(norm_num_groups, in_channels, eps=1e-6)
        self.proj_in = nn.Linear(in_channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, dim_head,
                                   cross_attention_dim,
                                   double_self_attention=True)
             for _ in range(num_layers)])
        self.proj_out = nn.Linear(inner, in_channels)

    def forward(self, x, num_frames=1):
        bf, c, h, w = x.shape
        b = bf // num_frames
        residual = x
        x = x.reshape(b, num_frames, c, h, w).permute(0, 2, 1, 3, 4)
        x = self.norm(x)
        x = x.permute(0, 3, 4, 2, 1).reshape(b * h * w, num_frames, c)
        x = self.proj_in(x)
        for blk in self.transformer_blocks:
            x = blk(x, None)
        x = self.proj_out(x)
        x = x.reshape(b, h, w, num_frames, c).permute(0, 3, 4, 1, 2)
        return x.reshape(bf, c, h, w) + residual


class Downsample2D(nn.Module):
    def __init__(self, channels, padding=1):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, stride=2,
                              padding=padding)
        self.padding = padding

    def forward(self, x):
        if self.padding == 0:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x, output_size=None):
        if output_size is None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
        else:
            x = F.interpolate(x, size=output_size, mode="nearest")
        return self.conv(x)


class CrossAttnDownBlock3D(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, num_layers,
                 eps, groups, head_dim, cross_dim, add_downsample,
                 downsample_padding=1):
        super().__init__()
        resnets, temp_convs, attns, temp_attns = [], [], [], []
        for i in range(num_layers):
            in_ch = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(in_ch, out_channels, temb_channels,
                                         groups, eps))
            temp_convs.append(TemporalConvLayer(out_channels, out_channels))
            attns.append(Transformer2DModel(
                out_channels // head_dim, head_dim, out_channels, 1,
                cross_dim, groups))
            temp_attns.append(TransformerTemporalModel(
                out_channels // head_dim, head_dim, out_channels, 1,
                cross_dim, groups))
        self.resnets = nn.ModuleList(resnets)
        self.temp_convs = nn.ModuleList(temp_convs)
        self.attentions = nn.ModuleList(attns)
        self.temp_attentions = nn.ModuleList(temp_attns)
        self.downsamplers = (
            nn.ModuleList([Downsample2D(out_channels, downsample_padding)])
            if add_downsample else None)
        self.has_cross_attention = True

    def forward(self, x, temb, context, num_frames):
        states = ()
        for res, tc, attn, tattn in zip(self.resnets, self.temp_convs,
                                        self.attentions,
                                        self.temp_attentions):
            x = res(x, temb)
            if num_frames > 1:
                x = tc(x, num_frames)
            x = attn(x, context)
            if num_frames > 1:
                x = tattn(x, num_frames)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class DownBlock3D(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, num_layers,
                 eps, groups, add_downsample, downsample_padding=1):
        super().__init__()
        resnets, temp_convs = [], []
        for i in range(num_layers):
            in_ch = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(in_ch, out_channels, temb_channels,
                                         groups, eps))
            temp_convs.append(TemporalConvLayer(out_channels, out_channels))
        self.resnets = nn.ModuleList(resnets)
        self.temp_convs = nn.ModuleList(temp_convs)
        self.downsamplers = (
            nn.ModuleList([Downsample2D(out_channels, downsample_padding)])
            if add_downsample else None)
        self.has_cross_attention = False

    def forward(self, x, temb, num_frames):
        states = ()
        for res, tc in zip(self.resnets, self.temp_convs):
            x = res(x, temb)
            if num_frames > 1:
                x = tc(x, num_frames)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class UNetMidBlock3DCrossAttn(nn.Module):
    """Mid block -- NOTE inverted order: attn -> temp_attn -> resnet ->
    temp_conv after the leading resnet/temp_conv (reference
    models/unet_3d_blocks.py:386-417)."""

    def __init__(self, in_channels, temb_channels, num_layers, eps, groups,
                 head_dim, cross_dim, output_scale_factor=1.0,
                 gradient_checkpointing=False):
        super().__init__()
        # reference models/unet_3d_blocks.py:387: the non-checkpointed path
        # runs temp_convs[0] with no f>1 guard; the checkpointed path skips
        # it at f=1 (is_video, :56-70)
        self.gradient_checkpointing = gradient_checkpointing
        resnets = [ResnetBlock2D(in_channels, in_channels, temb_channels,
                                 groups, eps, output_scale_factor)]
        temp_convs = [TemporalConvLayer(in_channels, in_channels)]
        attns, temp_attns = [], []
        for _ in range(num_layers):
            attns.append(Transformer2DModel(
                in_channels // head_dim, head_dim, in_channels, 1,
                cross_dim, groups))
            temp_attns.append(TransformerTemporalModel(
                in_channels // head_dim, head_dim, in_channels, 1,
                cross_dim, groups))
            resnets.append(ResnetBlock2D(in_channels, in_channels,
                                         temb_channels, groups, eps,
                                         output_scale_factor))
            temp_convs.append(TemporalConvLayer(in_channels, in_channels))
        self.resnets = nn.ModuleList(resnets)
        self.temp_convs = nn.ModuleList(temp_convs)
        self.attentions = nn.ModuleList(attns)
        self.temp_attentions = nn.ModuleList(temp_attns)

    def forward(self, x, temb, context, num_frames):
        x = self.resnets[0](x, temb)
        if num_frames > 1 or not self.gradient_checkpointing:
            x = self.temp_convs[0](x, num_frames)
        for attn, tattn, res, tc in zip(self.attentions,
                                        self.temp_attentions,
                                        self.resnets[1:],
                                        self.temp_convs[1:]):
            x = attn(x, context)
            if num_frames > 1:
                x = tattn(x, num_frames)
            x = res(x, temb)
            if num_frames > 1:
                x = tc(x, num_frames)
        return x


class CrossAttnUpBlock3D(nn.Module):
    def __init__(self, in_channels, out_channels, prev_output_channel,
                 temb_channels, num_layers, eps, groups, head_dim, cross_dim,
                 add_upsample):
        super().__init__()
        resnets, temp_convs, attns, temp_attns = [], [], [], []
        for i in range(num_layers):
            res_skip = in_channels if i == num_layers - 1 else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            resnets.append(ResnetBlock2D(res_in + res_skip, out_channels,
                                         temb_channels, groups, eps))
            temp_convs.append(TemporalConvLayer(out_channels, out_channels))
            attns.append(Transformer2DModel(
                out_channels // head_dim, head_dim, out_channels, 1,
                cross_dim, groups))
            temp_attns.append(TransformerTemporalModel(
                out_channels // head_dim, head_dim, out_channels, 1,
                cross_dim, groups))
        self.resnets = nn.ModuleList(resnets)
        self.temp_convs = nn.ModuleList(temp_convs)
        self.attentions = nn.ModuleList(attns)
        self.temp_attentions = nn.ModuleList(temp_attns)
        self.upsamplers = (nn.ModuleList([Upsample2D(out_channels)])
                           if add_upsample else None)
        self.has_cross_attention = True

    def forward(self, x, res_states, temb, context, num_frames,
                upsample_size=None):
        for res, tc, attn, tattn in zip(self.resnets, self.temp_convs,
                                        self.attentions,
                                        self.temp_attentions):
            skip = res_states[-1]
            res_states = res_states[:-1]
            x = torch.cat([x, skip], dim=1)
            x = res(x, temb)
            if num_frames > 1:
                x = tc(x, num_frames)
            x = attn(x, context)
            if num_frames > 1:
                x = tattn(x, num_frames)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x, upsample_size)
        return x


class UpBlock3D(nn.Module):
    def __init__(self, in_channels, out_channels, prev_output_channel,
                 temb_channels, num_layers, eps, groups, add_upsample):
        super().__init__()
        resnets, temp_convs = [], []
        for i in range(num_layers):
            res_skip = in_channels if i == num_layers - 1 else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            resnets.append(ResnetBlock2D(res_in + res_skip, out_channels,
                                         temb_channels, groups, eps))
            temp_convs.append(TemporalConvLayer(out_channels, out_channels))
        self.resnets = nn.ModuleList(resnets)
        self.temp_convs = nn.ModuleList(temp_convs)
        self.upsamplers = (nn.ModuleList([Upsample2D(out_channels)])
                           if add_upsample else None)
        self.has_cross_attention = False

    def forward(self, x, res_states, temb, num_frames, upsample_size=None):
        for res, tc in zip(self.resnets, self.temp_convs):
            skip = res_states[-1]
            res_states = res_states[:-1]
            x = torch.cat([x, skip], dim=1)
            x = res(x, temb)
            if num_frames > 1:
                x = tc(x, num_frames)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x, upsample_size)
        return x


class UNet3DConditionModel(nn.Module):
    """Full torch UNet mirroring reference models/unet_3d_condition.py
    wiring; accepts the package's UNet3DConfig for geometry."""

    def __init__(self, cfg):
        super().__init__()
        ch0 = cfg.block_out_channels[0]
        time_dim = ch0 * 4
        self.cfg = cfg
        self.conv_in = nn.Conv2d(cfg.in_channels, ch0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch0, time_dim)
        self.transformer_in = TransformerTemporalModel(
            8, cfg.attention_head_dim, ch0, 1, None, 32)

        down_blocks = []
        out_ch = ch0
        for i, btype in enumerate(cfg.down_block_types):
            in_ch, out_ch = out_ch, cfg.block_out_channels[i]
            final = i == len(cfg.block_out_channels) - 1
            if btype == "CrossAttnDownBlock3D":
                down_blocks.append(CrossAttnDownBlock3D(
                    in_ch, out_ch, time_dim, cfg.layers_per_block,
                    cfg.norm_eps, cfg.norm_num_groups,
                    cfg.attention_head_dim, cfg.cross_attention_dim,
                    not final, cfg.downsample_padding))
            else:
                down_blocks.append(DownBlock3D(
                    in_ch, out_ch, time_dim, cfg.layers_per_block,
                    cfg.norm_eps, cfg.norm_num_groups, not final,
                    cfg.downsample_padding))
        up_blocks = []
        rev = list(reversed(cfg.block_out_channels))
        out_ch = rev[0]
        self.num_upsamplers = 0
        for i, btype in enumerate(cfg.up_block_types):
            prev_out = out_ch
            out_ch = rev[i]
            in_ch = rev[min(i + 1, len(rev) - 1)]
            final = i == len(cfg.block_out_channels) - 1
            if not final:
                self.num_upsamplers += 1
            if btype == "CrossAttnUpBlock3D":
                up_blocks.append(CrossAttnUpBlock3D(
                    in_ch, out_ch, prev_out, time_dim,
                    cfg.layers_per_block + 1, cfg.norm_eps,
                    cfg.norm_num_groups, cfg.attention_head_dim,
                    cfg.cross_attention_dim, not final))
            else:
                up_blocks.append(UpBlock3D(
                    in_ch, out_ch, prev_out, time_dim,
                    cfg.layers_per_block + 1, cfg.norm_eps,
                    cfg.norm_num_groups, not final))
        # register down_blocks, then up_blocks, then mid_block -- the
        # reference creates the (empty) up_blocks ModuleList before
        # mid_block (reference models/unet_3d_condition.py:155-156,186),
        # which fixes torch modules() order (up sites precede mid sites in
        # cloneofsimo .pt files)
        self.down_blocks = nn.ModuleList(down_blocks)
        self.up_blocks = nn.ModuleList(up_blocks)
        self.mid_block = UNetMidBlock3DCrossAttn(
            cfg.block_out_channels[-1], time_dim, 1, cfg.norm_eps,
            cfg.norm_num_groups, cfg.attention_head_dim,
            cfg.cross_attention_dim, cfg.mid_block_scale_factor)

        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, ch0,
                                          eps=cfg.norm_eps)
        self.conv_out = nn.Conv2d(ch0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states):
        """sample (B, C, F, H, W), timesteps (B,), context (B, S, D)."""
        b, _, f, height, width = sample.shape
        up_factor = 2 ** self.num_upsamplers
        forward_upsample_size = (height % up_factor != 0
                                 or width % up_factor != 0)

        t_emb = timestep_embedding(timesteps,
                                   self.cfg.block_out_channels[0])
        emb = self.time_embedding(t_emb)
        emb = emb.repeat_interleave(f, dim=0)
        context = encoder_hidden_states.repeat_interleave(f, dim=0)

        x = sample.permute(0, 2, 1, 3, 4).reshape(b * f, -1, height, width)
        x = self.conv_in(x)
        if f > 1:
            x = self.transformer_in(x, num_frames=f)

        res_samples = (x,)
        for block in self.down_blocks:
            if block.has_cross_attention:
                x, states = block(x, emb, context, f)
            else:
                x, states = block(x, emb, f)
            res_samples += states

        x = self.mid_block(x, emb, context, f)

        for i, block in enumerate(self.up_blocks):
            final = i == len(self.up_blocks) - 1
            states = res_samples[-len(block.resnets):]
            res_samples = res_samples[:-len(block.resnets)]
            upsample_size = None
            if not final and forward_upsample_size:
                upsample_size = res_samples[-1].shape[2:]
            if block.has_cross_attention:
                x = block(x, states, emb, context, f, upsample_size)
            else:
                x = block(x, states, emb, f, upsample_size)

        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x.reshape(b, f, -1, x.shape[-2],
                         x.shape[-1]).permute(0, 2, 1, 3, 4)
