"""Test-only torch reference of the SD AutoencoderKL the reference loads
(diffusers AutoencoderKL, reference train.py:122): encoder with
DownEncoderBlock2D x N + attention mid block, decoder mirror, quant convs,
DiagonalGaussian moments.  State-dict keys match diffusers naming so weights
flow through utils/checkpoint.state_dict_to_flax.  Never imported by the
package -- only by tests/test_vae_golden.py."""

import torch
import torch.nn as nn
import torch.nn.functional as F

from .unet3d import ResnetBlock2D, Downsample2D, Upsample2D


class AttentionBlock(nn.Module):
    """Single-head spatial self-attention (diffusers VAE mid attention),
    new-style key names (to_q/to_k/to_v/to_out.0)."""

    def __init__(self, channels, norm_num_groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(norm_num_groups, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels),
                                     nn.Dropout(0.0)])
        self.scale = channels ** -0.5

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(dim=-1)
        y = self.to_out[1](self.to_out[0](attn @ v))
        return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


def _resnet(in_ch, out_ch, groups):
    return ResnetBlock2D(in_ch, out_ch, temb_channels=0, groups=groups,
                         eps=1e-6)


class DownEncoderBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, num_layers, groups, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_resnet(in_ch if i == 0 else out_ch, out_ch, groups)
             for i in range(num_layers)])
        self.downsamplers = (nn.ModuleList([Downsample2D(out_ch, padding=0)])
                             if add_downsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x, None)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class UpDecoderBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, num_layers, groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_resnet(in_ch if i == 0 else out_ch, out_ch, groups)
             for i in range(num_layers)])
        self.upsamplers = (nn.ModuleList([Upsample2D(out_ch)])
                           if add_upsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x, None)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class MidBlock2D(nn.Module):
    def __init__(self, channels, groups):
        super().__init__()
        self.resnets = nn.ModuleList([_resnet(channels, channels, groups),
                                      _resnet(channels, channels, groups)])
        self.attentions = nn.ModuleList([AttentionBlock(channels, groups)])

    def forward(self, x):
        x = self.resnets[0](x, None)
        x = self.attentions[0](x)
        return self.resnets[1](x, None)


class Encoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        blocks, out_ch = [], chans[0]
        for i, ch in enumerate(chans):
            in_ch, out_ch = out_ch, ch
            blocks.append(DownEncoderBlock2D(
                in_ch, out_ch, cfg.layers_per_block, cfg.norm_num_groups,
                i != len(chans) - 1))
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = MidBlock2D(out_ch, cfg.norm_num_groups)
        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, out_ch,
                                          eps=1e-6)
        self.conv_out = nn.Conv2d(out_ch, 2 * cfg.latent_channels, 3,
                                  padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class Decoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        rev = list(reversed(cfg.block_out_channels))
        self.conv_in = nn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = MidBlock2D(rev[0], cfg.norm_num_groups)
        blocks, out_ch = [], rev[0]
        for i, ch in enumerate(rev):
            in_ch, out_ch = out_ch, ch
            blocks.append(UpDecoderBlock2D(
                in_ch, out_ch, cfg.layers_per_block + 1,
                cfg.norm_num_groups, i != len(rev) - 1))
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, out_ch,
                                          eps=1e-6)
        self.conv_out = nn.Conv2d(out_ch, cfg.out_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKL(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = Encoder(cfg)
        self.decoder = Decoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)

    def moments(self, pixels):
        m = self.quant_conv(self.encoder(pixels))
        mean, logvar = m.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, latents):
        return self.decoder(self.post_quant_conv(latents))
