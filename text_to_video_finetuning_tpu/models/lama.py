"""LaMa Fourier-convolution watermark inpainting (inference-only).

Behavioral spec: reference utils/lama.py -- `LargeMaskInpainting` with
FourierUnit (rfftn/irfftn, reference utils/lama.py:70-90), SpectralTransform,
FFC blocks at ratio 0.75, 18 FFC-resnet blocks, 3x down/upsampling, sigmoid
output, composited as `mask * pred + (1 - mask) * img`
(reference utils/lama.py:312-315).  `inpaint_watermark(imgs)` covers the
reference call site (reference inference.py:427).

Weights load from the reference torch checkpoint (`best.ckpt`, generator.*
keys) when a local path is provided -- the reference downloads it from HF at
runtime (reference utils/lama.py:313-314), which a hermetic environment
cannot; set LAMA_CKPT or pass ckpt_path.  The default fixed watermark mask
reproduces the reference's shipped utils/mask.png geometry: a full-width
horizontal band over rows 145-191 of the 256-row mask (measured from the
png; see default_watermark_mask), or a user-supplied grayscale PNG.

All convs are NHWC; BatchNorm runs in inference mode with loaded running
stats.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

LAMA_CKPT_ENV = "LAMA_CKPT"
_NGF = 64
_N_DOWN = 3
_N_BLOCKS = 18
_MAX_F = 1024


def _conv(params, x, stride=1, padding=0, reflect=False):
    import jax.lax as lax
    k = params["kernel"]
    if reflect:
        p = padding
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        pad = ((0, 0), (0, 0))
    else:
        pad = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params:
        y = y + params["bias"]
    return y


def _conv_transpose(params, x):
    """torch ConvTranspose2d(k3, s2, p1, op1) equivalent."""
    import jax.lax as lax
    k = params["kernel"]        # (kh, kw, in, out), pre-flipped by loader
    y = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 2), (1, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params:
        y = y + params["bias"]
    return y


def _bn(params, x, eps=1e-5):
    inv = 1.0 / jnp.sqrt(params["var"] + eps)
    return (x - params["mean"]) * inv * params["scale"] + params["bias"]


def _fourier_unit(params, x):
    """reference utils/lama.py:56-90, NHWC.

    Channel layout matters for checkpoint parity: torch stacks real/imag
    per channel and flattens to [c0_r, c0_i, c1_r, c1_i, ...]
    (reference utils/lama.py:76-85), NOT [reals..., imags...]."""
    b, h, w, c = x.shape
    ffted = jnp.fft.rfftn(x, axes=(1, 2), norm="ortho")   # (b, h, w2, c)
    w2 = ffted.shape[2]
    # interleave: (b, h, w2, c, 2) -> (b, h, w2, 2c) as [c0_r, c0_i, ...]
    ffted = jnp.stack([ffted.real, ffted.imag], axis=-1).reshape(
        b, h, w2, 2 * c)
    ffted = _conv(params["conv_layer"], ffted)
    ffted = jnp.maximum(_bn(params["bn"], ffted), 0.0)
    # de-interleave back to complex pairs
    ffted = ffted.reshape(b, h, w2, ffted.shape[-1] // 2, 2)
    complex_f = ffted[..., 0] + 1j * ffted[..., 1]
    return jnp.fft.irfftn(complex_f, s=(h, w), axes=(1, 2), norm="ortho")


def _spectral_transform(params, x, stride=1):
    if stride == 2:
        x = (x[:, 0::2, 0::2] + x[:, 0::2, 1::2] + x[:, 1::2, 0::2]
             + x[:, 1::2, 1::2]) / 4.0
    x = jnp.maximum(_bn(params["conv1_bn"],
                        _conv(params["conv1"], x)), 0.0)
    out = _fourier_unit(params["fu"], x)
    return _conv(params["conv2"], x + out)


def _ffc(params, x_lg, ratio_gin, ratio_gout, stride=1, padding=0,
         reflect=False):
    x_l, x_g = x_lg
    out_l, out_g = 0.0, 0.0
    if ratio_gout != 1:
        out_l = _conv(params["convl2l"], x_l, stride, padding, reflect)
        if ratio_gin != 0:
            out_l = out_l + _conv(params["convg2l"], x_g, stride, padding,
                                  reflect)
    if ratio_gout != 0:
        out_g = _conv(params["convl2g"], x_l, stride, padding, reflect) \
            if ratio_gin != 1 else 0.0
        if ratio_gin != 0:
            out_g = out_g + _spectral_transform(params["convg2g"], x_g,
                                                stride)
        elif "convg2g" in params:
            pass
    return out_l, out_g


def _ffc_bn_act(params, x_lg, ratio_gin, ratio_gout, stride=1, padding=0,
                reflect=False):
    x_l, x_g = _ffc(params["ffc"], x_lg, ratio_gin, ratio_gout, stride,
                    padding, reflect)
    if ratio_gout != 1:
        x_l = jnp.maximum(_bn(params["bn_l"], x_l), 0.0)
    if ratio_gout != 0:
        x_g = jnp.maximum(_bn(params["bn_g"], x_g), 0.0)
    return x_l, x_g


def _ffc_resnet_block(params, x_lg):
    # FFC convs reflect-pad (padding_mode="reflect",
    # reference utils/lama.py:131,149-160)
    id_l, id_g = x_lg
    x_lg = _ffc_bn_act(params["conv1"], x_lg, 0.75, 0.75, padding=1,
                       reflect=True)
    x_lg = _ffc_bn_act(params["conv2"], x_lg, 0.75, 0.75, padding=1,
                       reflect=True)
    return id_l + x_lg[0], id_g + x_lg[1]


def lama_forward(params: Dict, img: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """img (B, H, W, 3) in [0,1]; mask (B, H, W, 1). Returns inpainted."""
    masked = img * (1.0 - mask)
    x = jnp.concatenate([masked, mask], axis=-1)

    # model.1: FFC_BN_ACT(4, 64, k7, reflect pad 3), all-local
    x_lg = _ffc_bn_act(params["model_1"], (x, 0.0), 0.0, 0.0, padding=3,
                       reflect=True)
    # model.2..4: downsample convs (reflect-padded, padding_mode="reflect")
    for i in range(_N_DOWN):
        gout = 0.75 if i == _N_DOWN - 1 else 0.0
        gin = 0.0 if i < _N_DOWN else 0.75
        x_lg = _ffc_bn_act(params[f"model_{2 + i}"], x_lg, gin, gout,
                           stride=2, padding=1, reflect=True)
    # model.5..22: 18 resnet blocks at ratio 0.75
    for i in range(_N_BLOCKS):
        x_lg = _ffc_resnet_block(params[f"model_{5 + i}"], x_lg)
    # model.23: concat tuple
    x = jnp.concatenate([x_lg[0], x_lg[1]], axis=-1)
    # model.24..32: upsample (ConvTranspose, BN, ReLU) x3
    for i in range(_N_DOWN):
        base = 24 + 3 * i
        x = _conv_transpose(params[f"model_{base}"], x)
        x = jnp.maximum(_bn(params[f"model_{base + 1}"], x), 0.0)
    # model.34: reflect-pad conv to RGB; model.35 sigmoid
    x = _conv(params["model_34"], x, padding=3, reflect=True)
    pred = 1.0 / (1.0 + jnp.exp(-x))
    return mask * pred + (1.0 - mask) * img


# -- torch checkpoint loading -------------------------------------------------

def _torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)


def _torch_convT_to_flax(w: np.ndarray) -> np.ndarray:
    # torch (in, out, kh, kw) -> flipped HWIO (kh, kw, in, out)
    return np.flip(w, (2, 3)).transpose(2, 3, 0, 1).copy()


def load_lama_params(ckpt_path: str) -> Dict:
    """Load the reference best.ckpt (torch Lightning, generator.* keys)."""
    import torch
    state = torch.load(ckpt_path, map_location="cpu",
                       weights_only=False)
    sd = state.get("state_dict", state)
    g = {k[len("generator."):]: v.numpy() for k, v in sd.items()
         if k.startswith("generator.")}

    def bn(prefix):
        return {"scale": g[f"{prefix}.weight"], "bias": g[f"{prefix}.bias"],
                "mean": g[f"{prefix}.running_mean"],
                "var": g[f"{prefix}.running_var"]}

    def conv(prefix, transpose=False):
        p = {"kernel": (_torch_convT_to_flax(g[f"{prefix}.weight"])
                        if transpose
                        else _torch_conv_to_flax(g[f"{prefix}.weight"]))}
        if f"{prefix}.bias" in g:
            p["bias"] = g[f"{prefix}.bias"]
        return p

    def spectral(prefix):
        return {
            "conv1": conv(f"{prefix}.conv1.0"),
            "conv1_bn": bn(f"{prefix}.conv1.1"),
            "fu": {"conv_layer": conv(f"{prefix}.fu.conv_layer"),
                   "bn": bn(f"{prefix}.fu.bn")},
            "conv2": conv(f"{prefix}.conv2"),
        }

    def ffc(prefix, gin, gout):
        p = {}
        if gout != 1 and gin != 1:
            p["convl2l"] = conv(f"{prefix}.convl2l")
        if gout != 0 and gin != 1:
            p["convl2g"] = conv(f"{prefix}.convl2g")
        if gin != 0 and gout != 1:
            p["convg2l"] = conv(f"{prefix}.convg2l")
        if gin != 0 and gout != 0:
            p["convg2g"] = spectral(f"{prefix}.convg2g")
        return p

    def ffc_bn_act(prefix, gin, gout):
        p = {"ffc": ffc(f"{prefix}.ffc", gin, gout)}
        if gout != 1:
            p["bn_l"] = bn(f"{prefix}.bn_l")
        if gout != 0:
            p["bn_g"] = bn(f"{prefix}.bn_g")
        return p

    params = {"model_1": ffc_bn_act("model.1", 0.0, 0.0)}
    for i in range(_N_DOWN):
        gout = 0.75 if i == _N_DOWN - 1 else 0.0
        params[f"model_{2 + i}"] = ffc_bn_act(f"model.{2 + i}", 0.0, gout)
    for i in range(_N_BLOCKS):
        params[f"model_{5 + i}"] = {
            "conv1": ffc_bn_act(f"model.{5 + i}.conv1", 0.75, 0.75),
            "conv2": ffc_bn_act(f"model.{5 + i}.conv2", 0.75, 0.75),
        }
    for i in range(_N_DOWN):
        base = 24 + 3 * i
        params[f"model_{base}"] = conv(f"model.{base}", transpose=True)
        params[f"model_{base + 1}"] = bn(f"model.{base + 1}")
    params["model_34"] = conv("model.34")
    return params


def default_watermark_mask(height: int, width: int) -> np.ndarray:
    """Full-width horizontal band covering the ModelScope watermark region.

    Matches the geometry of the reference's shipped 256x256 utils/mask.png
    (reference utils/lama.py:317), measured as a full-width band over rows
    145..191 (y in [0.5664, 0.75)): the watermark text rows at the top of
    the band have partial per-letter coverage in the png; the solid band
    here is a slight superset, which only means LaMa inpaints a few extra
    background pixels."""
    mask = np.zeros((height, width, 1), dtype=np.float32)
    y0 = int(round(height * (145.0 / 256.0)))
    y1 = int(round(height * (192.0 / 256.0)))
    mask[y0:y1, :] = 1.0
    return mask


def inpaint_watermark(imgs: np.ndarray, mask_path: Optional[str] = None,
                      ckpt_path: Optional[str] = None) -> np.ndarray:
    """imgs: (F, C, H, W) float [0,1] (reference utils/lama.py:312-329).
    Returns same shape/range."""
    ckpt_path = ckpt_path or os.environ.get(LAMA_CKPT_ENV, "")
    f, c, h, w = imgs.shape
    if mask_path and os.path.exists(mask_path):
        from PIL import Image
        m = np.asarray(Image.open(mask_path).convert("L"),
                       dtype=np.float32) / 255.0
        if m.shape != (h, w):
            import cv2
            m = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
        mask = m[:, :, None]
    else:
        mask = default_watermark_mask(h, w)
    if not ckpt_path or not os.path.exists(ckpt_path):
        print("LaMa checkpoint not available (set LAMA_CKPT); "
              "returning frames unchanged.")
        return imgs
    params = load_lama_params(ckpt_path)
    x = jnp.asarray(imgs.transpose(0, 2, 3, 1))            # NHWC
    m = jnp.broadcast_to(jnp.asarray(mask)[None], (f, h, w, 1))
    out = lama_forward(params, x, m)
    return np.asarray(out).transpose(0, 3, 1, 2)


if __name__ == "__main__":
    # CLI parity with the reference (reference utils/lama.py:332-350):
    # python -m text_to_video_finetuning_tpu.models.lama <video.mp4>
    import sys

    from ..data.video import VideoReader, export_to_video

    if len(sys.argv) < 2:
        print("Usage: python -m text_to_video_finetuning_tpu.models.lama "
              "<path/to/video> [mask.png] [lama_ckpt]")
        sys.exit(1)
    video_path = sys.argv[1]
    mask_path = sys.argv[2] if len(sys.argv) > 2 else None
    ckpt_path = sys.argv[3] if len(sys.argv) > 3 else None
    out_path = video_path.replace(".mp4", " inpainted.mp4")

    vr = VideoReader(video_path)
    fps = vr.get_avg_fps()
    video = vr[:].transpose(0, 3, 1, 2).astype(np.float32) / 255.0
    inpainted = inpaint_watermark(video, mask_path=mask_path,
                                  ckpt_path=ckpt_path)
    frames = (np.clip(inpainted, 0, 1).transpose(0, 2, 3, 1)
              * 255).astype(np.uint8)
    export_to_video(frames, out_path, fps)
    print(f"wrote {out_path}")
