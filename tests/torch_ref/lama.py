"""Test-only torch reference of the LaMa inpainting generator
(reference utils/lama.py:54-307): FourierUnit real/imag per-channel
interleave, SpectralTransform, FFC with reflect-padded convs, 18
FFC-resnet blocks, ConvTranspose upsampling.  State-dict keys match the
real `best.ckpt` layout (model.N...) so `models/lama.load_lama_params`
consumes a saved copy directly.  Only imported by tests."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class FourierUnit(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv_layer = nn.Conv2d(ch * 2, ch * 2, 1, bias=False)
        self.bn = nn.BatchNorm2d(ch * 2)

    def forward(self, x):
        b, c, h, w = x.shape
        f = torch.fft.rfftn(x, dim=(-2, -1), norm="ortho")
        f = torch.stack([f.real, f.imag], dim=-1)       # (b, c, h, w2, 2)
        w2 = f.shape[3]
        # per-channel interleave [c0_r, c0_i, c1_r, c1_i, ...]
        f = f.permute(0, 1, 4, 2, 3).reshape(b, 2 * c, h, w2)
        f = F.relu(self.bn(self.conv_layer(f)))
        f = f.reshape(b, c, 2, h, w2).permute(0, 1, 3, 4, 2)
        f = torch.complex(f[..., 0], f[..., 1])
        return torch.fft.irfftn(f, s=(h, w), dim=(-2, -1), norm="ortho")


class SpectralTransform(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.downsample = (nn.AvgPool2d(2, 2) if stride == 2
                           else nn.Identity())
        self.conv1 = nn.Sequential(
            nn.Conv2d(in_ch, out_ch // 2, 1, bias=False),
            nn.BatchNorm2d(out_ch // 2), nn.ReLU())
        self.fu = FourierUnit(out_ch // 2)
        self.conv2 = nn.Conv2d(out_ch // 2, out_ch, 1, bias=False)

    def forward(self, x):
        x = self.conv1(self.downsample(x))
        return self.conv2(x + self.fu(x))


def _conv_or_identity(i, o, k, stride, padding):
    if i == 0 or o == 0:
        return nn.Identity()
    return nn.Conv2d(i, o, k, stride, padding, bias=False,
                     padding_mode="reflect" if padding > 0 else "zeros")


class FFC(nn.Module):
    def __init__(self, in_ch, out_ch, k, gin, gout, stride=1, padding=0):
        super().__init__()
        in_cg, out_cg = int(in_ch * gin), int(out_ch * gout)
        in_cl, out_cl = in_ch - in_cg, out_ch - out_cg
        self.convl2l = _conv_or_identity(in_cl, out_cl, k, stride, padding)
        self.convl2g = _conv_or_identity(in_cl, out_cg, k, stride, padding)
        self.convg2l = _conv_or_identity(in_cg, out_cl, k, stride, padding)
        self.convg2g = (nn.Identity() if in_cg == 0 or out_cg == 0
                        else SpectralTransform(in_cg, out_cg, stride))
        self.gin, self.gout = gin, gout

    def forward(self, x):
        x_l, x_g = x if isinstance(x, tuple) else (x, 0)
        out_l, out_g = 0, 0
        if self.gout != 1:
            out_l = self.convl2l(x_l) + self.convg2l(x_g)
        if self.gout != 0:
            out_g = self.convl2g(x_l) + self.convg2g(x_g)
        return out_l, out_g


class FFC_BN_ACT(nn.Module):
    def __init__(self, in_ch, out_ch, k, gin=0.0, gout=0.0, stride=1,
                 padding=0):
        super().__init__()
        self.ffc = FFC(in_ch, out_ch, k, gin, gout, stride, padding)
        out_cg = int(out_ch * gout)
        self.bn_l = nn.Identity() if gout == 1 else nn.BatchNorm2d(
            out_ch - out_cg)
        self.bn_g = nn.Identity() if gout == 0 else nn.BatchNorm2d(out_cg)
        self.gout = gout

    def forward(self, x):
        x_l, x_g = self.ffc(x)
        if self.gout != 1:
            x_l = F.relu(self.bn_l(x_l))
        if self.gout != 0:
            x_g = F.relu(self.bn_g(x_g))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    def __init__(self, dim, gin, gout):
        super().__init__()
        self.conv1 = FFC_BN_ACT(dim, dim, 3, gin, gout, padding=1)
        self.conv2 = FFC_BN_ACT(dim, dim, 3, gin, gout, padding=1)

    def forward(self, x):
        id_l, id_g = x
        x = self.conv2(self.conv1(x))
        return id_l + x[0], id_g + x[1]


class ConcatTupleLayer(nn.Module):
    def forward(self, x):
        return torch.cat(x, dim=1)


class LargeMaskInpainting(nn.Module):
    def __init__(self, input_nc=4, output_nc=3, ngf=64, n_downsampling=3,
                 n_blocks=18, max_features=1024):
        super().__init__()
        model = [nn.ReflectionPad2d(3),
                 FFC_BN_ACT(input_nc, ngf, 7)]
        for i in range(n_downsampling):
            mult = 2 ** i
            model.append(FFC_BN_ACT(
                min(max_features, ngf * mult),
                min(max_features, ngf * mult * 2), 3, stride=2, padding=1,
                gout=0.75 if i == n_downsampling - 1 else 0.0))
        dim = min(max_features, ngf * 2 ** n_downsampling)
        for _ in range(n_blocks):
            model.append(FFCResnetBlock(dim, 0.75, 0.75))
        model.append(ConcatTupleLayer())
        for i in range(n_downsampling):
            mult = 2 ** (n_downsampling - i)
            model += [
                nn.ConvTranspose2d(min(max_features, ngf * mult),
                                   min(max_features, ngf * mult // 2),
                                   3, stride=2, padding=1, output_padding=1),
                nn.BatchNorm2d(min(max_features, ngf * mult // 2)),
                nn.ReLU()]
        model += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7),
                  nn.Sigmoid()]
        self.model = nn.Sequential(*model)

    def forward(self, img, mask):
        masked = img * (1 - mask)
        x = torch.cat([masked, mask], dim=1)
        pred = self.model(x)
        return mask * pred + (1 - mask) * img
