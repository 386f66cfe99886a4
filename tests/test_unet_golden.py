"""Golden numerical parity: flax UNet3D (and each block) vs an independent
torch implementation of the reference model (tests/torch_ref/unet3d.py),
weights shared through utils/checkpoint.state_dict_to_flax.

This is the SURVEY §7 "correctness keystone": it proves the flax UNet
executes the same math in the same order as the reference
(reference models/unet_3d_condition.py:325-500, models/unet_3d_blocks.py)
for every block type, for the full model, with temporal paths on (f>1),
single-frame skip (f=1), and the forward_upsample_size odd-geometry path.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from text_to_video_finetuning_tpu.utils.checkpoint import state_dict_to_flax

from torch_ref import unet3d as tref


def randomize(model: torch.nn.Module, seed: int = 0):
    """Fill every parameter with non-degenerate random values (norm scales
    near 1, everything else ~N(0, 0.15^2)) so zero-init layers (temporal
    conv4) contribute to the output and the comparison is strong."""
    g = torch.Generator().manual_seed(seed)
    for name, p in model.named_parameters():
        with torch.no_grad():
            if p.ndim == 1 and ("norm" in name or name.endswith("bias")):
                if name.endswith("bias"):
                    p.copy_(torch.randn(p.shape, generator=g) * 0.05)
                else:
                    p.copy_(1.0 + torch.randn(p.shape, generator=g) * 0.1)
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.15)
    return model


def to_flax(model, kind="unet"):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return state_dict_to_flax(sd, kind)


def nchw(x_torch):
    return x_torch.detach().numpy()


def assert_close(ours_nhwc, ref_nchw, atol=1e-4, rtol=1e-3):
    ours = np.asarray(ours_nhwc).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref_nchw, atol=atol, rtol=rtol)


# ---------------------------------------------------------------- blocks


def test_resnet_block_golden():
    from text_to_video_finetuning_tpu.models.resnet import ResnetBlock2D
    tm = randomize(tref.ResnetBlock2D(16, 32, temb_channels=24, groups=8,
                                      eps=1e-5), 1).eval()
    x = torch.randn(2, 16, 8, 8, generator=torch.Generator().manual_seed(2))
    temb = torch.randn(2, 24, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        ref = tm(x, temb).numpy()

    fm = ResnetBlock2D(in_channels=16, out_channels=32, temb_channels=24,
                       groups=8, eps=1e-5)
    ours = fm.apply({"params": to_flax(tm)},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(temb.numpy()))
    assert_close(ours, ref)


def test_temporal_conv_golden():
    from text_to_video_finetuning_tpu.models.resnet import TemporalConvLayer
    tm = randomize(tref.TemporalConvLayer(32, 32), 4).eval()
    x = torch.randn(6, 32, 4, 4, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        ref = tm(x, num_frames=3).numpy()

    fm = TemporalConvLayer(in_dim=32, out_dim=32)
    ours = fm.apply({"params": to_flax(tm)},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    3, True)
    assert_close(ours, ref)


def test_transformer2d_golden():
    from text_to_video_finetuning_tpu.models.transformers import (
        Transformer2DModel)
    tm = randomize(tref.Transformer2DModel(4, 8, 16, 1, 12, 8), 6).eval()
    x = torch.randn(2, 16, 6, 6, generator=torch.Generator().manual_seed(7))
    ctx = torch.randn(2, 5, 12, generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        ref = tm(x, ctx).numpy()

    fm = Transformer2DModel(num_attention_heads=4, attention_head_dim=8,
                            in_channels=16, num_layers=1,
                            cross_attention_dim=12, norm_num_groups=8)
    ours = fm.apply({"params": to_flax(tm)},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(ctx.numpy()))
    assert_close(ours, ref)


def test_transformer_temporal_golden():
    from text_to_video_finetuning_tpu.models.transformers import (
        TransformerTemporalModel)
    tm = randomize(tref.TransformerTemporalModel(4, 8, 16, 1, 12, 8),
                   9).eval()
    x = torch.randn(8, 16, 3, 3, generator=torch.Generator().manual_seed(10))
    with torch.no_grad():
        ref = tm(x, num_frames=4).numpy()

    fm = TransformerTemporalModel(num_attention_heads=4,
                                  attention_head_dim=8, in_channels=16,
                                  num_layers=1, cross_attention_dim=12,
                                  norm_num_groups=8)
    ours = fm.apply({"params": to_flax(tm)},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    4, None, True)
    assert_close(ours, ref)


def test_downsample_golden():
    from text_to_video_finetuning_tpu.models.resnet import Downsample2D
    for padding in (1, 0):
        tm = randomize(tref.Downsample2D(8, padding), 11).eval()
        x = torch.randn(2, 8, 9, 9,
                        generator=torch.Generator().manual_seed(12))
        with torch.no_grad():
            ref = tm(x).numpy()
        fm = Downsample2D(out_channels=8, padding=padding)
        ours = fm.apply({"params": to_flax(tm)},
                        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        assert_close(ours, ref)


@pytest.mark.parametrize("out_size", [None, (6, 6), (5, 7)])
def test_upsample_golden(out_size):
    from text_to_video_finetuning_tpu.models.resnet import Upsample2D
    tm = randomize(tref.Upsample2D(8), 13).eval()
    x = torch.randn(2, 8, 3, 3, generator=torch.Generator().manual_seed(14))
    with torch.no_grad():
        ref = tm(x, out_size).numpy()
    fm = Upsample2D(out_channels=8)
    ours = fm.apply({"params": to_flax(tm)},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), out_size)
    assert_close(ours, ref)


def test_mid_block_golden():
    from text_to_video_finetuning_tpu.models.unet3d_blocks import (
        UNetMidBlock3DCrossAttn)
    tm = randomize(tref.UNetMidBlock3DCrossAttn(
        32, 24, 1, 1e-5, 8, 8, 12), 15).eval()
    x = torch.randn(4, 32, 4, 4, generator=torch.Generator().manual_seed(16))
    temb = torch.randn(4, 24, generator=torch.Generator().manual_seed(17))
    ctx = torch.randn(2, 5, 12, generator=torch.Generator().manual_seed(18))
    # torch block sees per-frame-repeated temb/ctx like the real model
    ctx_rep = ctx.repeat_interleave(2, dim=0)
    with torch.no_grad():
        ref = tm(x, temb, ctx_rep, 2).numpy()

    fm = UNetMidBlock3DCrossAttn(
        in_channels=32, temb_channels=24, num_layers=1, resnet_eps=1e-5,
        resnet_groups=8, attn_num_head_channels=8, cross_attention_dim=12)
    ours = fm.apply({"params": to_flax(tm)},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(temb.numpy()),
                    jnp.asarray(ctx_rep.numpy()), 2, True)
    assert_close(ours, ref)


def test_mid_block_golden_single_frame_runs_leading_temp_conv():
    """f=1 with gradient checkpointing OFF: the reference mid block runs
    the leading temp_convs[0] UNCONDITIONALLY (reference
    models/unet_3d_blocks.py:387 -- no num_frames>1 guard), unlike the
    checkpointed path which skips it via is_video (:56-70).  With
    randomize() the temporal conv4 is non-zero, so this golden fails if
    either side adds/drops the guard."""
    from text_to_video_finetuning_tpu.models.unet3d_blocks import (
        UNetMidBlock3DCrossAttn)
    tm = randomize(tref.UNetMidBlock3DCrossAttn(
        32, 24, 1, 1e-5, 8, 8, 12, gradient_checkpointing=False), 35).eval()
    x = torch.randn(2, 32, 4, 4, generator=torch.Generator().manual_seed(36))
    temb = torch.randn(2, 24, generator=torch.Generator().manual_seed(37))
    ctx = torch.randn(2, 5, 12, generator=torch.Generator().manual_seed(38))
    with torch.no_grad():
        ref = tm(x, temb, ctx, 1).numpy()

    fm = UNetMidBlock3DCrossAttn(
        in_channels=32, temb_channels=24, num_layers=1, resnet_eps=1e-5,
        resnet_groups=8, attn_num_head_channels=8, cross_attention_dim=12,
        gradient_checkpointing=False)
    ours = fm.apply({"params": to_flax(tm)},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(temb.numpy()),
                    jnp.asarray(ctx.numpy()), 1, True)
    assert_close(ours, ref)
    # and the checkpointed flavor skips it: outputs must DIFFER (is_video
    # guard, reference models/unet_3d_blocks.py:56-70)
    fm_gc = UNetMidBlock3DCrossAttn(
        in_channels=32, temb_channels=24, num_layers=1, resnet_eps=1e-5,
        resnet_groups=8, attn_num_head_channels=8, cross_attention_dim=12,
        gradient_checkpointing=True)
    ours_gc = fm_gc.apply({"params": to_flax(tm)},
                          jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                          jnp.asarray(temb.numpy()),
                          jnp.asarray(ctx.numpy()), 1, True)
    assert not np.allclose(np.asarray(ours_gc), np.asarray(ours), atol=1e-5)


# ------------------------------------------------------------- full model


def _run_pair(cfg, batch, frames, size, seed, atol=3e-4):
    from text_to_video_finetuning_tpu.models.unet3d import (
        UNet3DConditionModel)
    tm = randomize(tref.UNet3DConditionModel(cfg), seed).eval()
    g = torch.Generator().manual_seed(seed + 1)
    sample = torch.randn(batch, cfg.in_channels, frames, size, size,
                         generator=g)
    timesteps = torch.tensor([37, 501][:batch])
    ctx = torch.randn(batch, 7, cfg.cross_attention_dim, generator=g)
    with torch.no_grad():
        ref = tm(sample, timesteps, ctx).numpy()

    fm = UNet3DConditionModel(config=cfg)
    ours = np.asarray(fm.apply(
        {"params": to_flax(tm)}, jnp.asarray(sample.numpy()),
        jnp.asarray(timesteps.numpy()), jnp.asarray(ctx.numpy())))
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-3)


@pytest.mark.slow
def test_unet_micro_golden_multiframe():
    from text_to_video_finetuning_tpu.models.unet3d import micro_unet_config
    _run_pair(micro_unet_config(), batch=2, frames=3, size=8, seed=20)


@pytest.mark.slow
def test_unet_micro_golden_single_frame():
    """f=1 skips all temporal modules (reference
    models/unet_3d_blocks.py:25-28 via the num_frames>1 guards) EXCEPT the
    mid block's leading temp_convs[0], which the non-checkpointed reference
    path runs unconditionally (reference models/unet_3d_blocks.py:387);
    both models here run with checkpointing off, so that path is covered
    end-to-end."""
    from text_to_video_finetuning_tpu.models.unet3d import micro_unet_config
    _run_pair(micro_unet_config(), batch=2, frames=1, size=8, seed=21)


@pytest.mark.slow
def test_unet_tiny_golden_full_topology():
    """4-level geometry: every block type, 3 downsamplers/upsamplers."""
    from text_to_video_finetuning_tpu.models.unet3d import tiny_unet_config
    _run_pair(tiny_unet_config(), batch=1, frames=2, size=16, seed=22)


@pytest.mark.slow
def test_unet_tiny_golden_forward_upsample_size():
    """Odd spatial size exercises the forward_upsample_size interpolation
    override (reference models/unet_3d_condition.py:361-367,456-485)."""
    from text_to_video_finetuning_tpu.models.unet3d import tiny_unet_config
    _run_pair(tiny_unet_config(), batch=1, frames=2, size=12, seed=23)
