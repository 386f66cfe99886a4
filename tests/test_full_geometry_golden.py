"""FULL-geometry numerical parity (VERDICT r2 "Missing #1").

Every other golden runs at micro/tiny geometry; these run the REAL model
widths so geometry-dependent bugs (head-split/group-count interactions, the
1280-channel mid path, the 23-layer 1024-wide CLIP, the SD VAE channel
stack) cannot hide:

* UNet: ms-1.7b config -- block_out_channels (320,640,1280,1280),
  attention_head_dim 64, 32 norm groups, transformer_in heads=8
  (reference models/unet_3d_condition.py:91-107,146-152) -- fp32
  torch-vs-flax forward at 2 frames, 32x32 latents, batch 1.
* CLIP: the OpenCLIP-H-derived 1024-wide/23-layer text model vs the REAL
  transformers torch implementation (reference train.py:121).
* VAE: SD AutoencoderKL (128,256,512,512) encode moments + decode.

Opt-in slow tier: `pytest -m full_geometry` (also included in the default
full run); several minutes each on the 1-core CI host.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from text_to_video_finetuning_tpu.utils.checkpoint import state_dict_to_flax

from test_unet_golden import randomize, to_flax
from torch_ref import unet3d as tref

pytestmark = [pytest.mark.slow, pytest.mark.full_geometry]


def test_unet_full_geometry_golden():
    """fp32 forward parity at the real ms-1.7b widths (2 frames, 32x32
    latents ~ 256px, batch 1)."""
    from text_to_video_finetuning_tpu.models import (UNET3D_MS_1_7B_CONFIG,
                                                     UNet3DConditionModel)
    cfg = UNET3D_MS_1_7B_CONFIG
    tm = randomize(tref.UNet3DConditionModel(cfg), 100).eval()
    g = torch.Generator().manual_seed(101)
    sample = torch.randn(1, cfg.in_channels, 2, 32, 32, generator=g)
    timesteps = torch.tensor([501])
    ctx = torch.randn(1, 77, cfg.cross_attention_dim, generator=g) * 0.3
    with torch.no_grad():
        ref = tm(sample, timesteps, ctx).numpy()

    fm = UNet3DConditionModel(config=cfg)
    ours = np.asarray(fm.apply(
        {"params": to_flax(tm)}, jnp.asarray(sample.numpy()),
        jnp.asarray(timesteps.numpy()), jnp.asarray(ctx.numpy())))
    # fp32 at 1280-channel widths: per-op reduction-order differences
    # accumulate across ~60 conv/attn layers; 1e-3 absolute on O(1)
    # activations is the VERDICT-suggested bound
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-2)


def test_clip_full_geometry_matches_transformers():
    """Our flax CLIP at the REAL ms text-encoder geometry (1024 hidden,
    23 layers, 16 heads, gelu) vs the actual transformers torch model."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    from text_to_video_finetuning_tpu.models import (CLIP_MS_TEXT_CONFIG,
                                                     CLIPTextModel)
    c = CLIP_MS_TEXT_CONFIG
    torch.manual_seed(7)
    hf_cfg = HFConfig(
        vocab_size=c.vocab_size, hidden_size=c.hidden_size,
        intermediate_size=c.intermediate_size,
        num_hidden_layers=c.num_hidden_layers,
        num_attention_heads=c.num_attention_heads,
        max_position_embeddings=c.max_position_embeddings,
        hidden_act=c.hidden_act)
    hf_model = HFModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = state_dict_to_flax(sd, "text_encoder")

    rng = np.random.RandomState(1)
    ids = rng.randint(0, c.vocab_size, (2, 77)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64))
                       ).last_hidden_state.numpy()
    ours = np.asarray(CLIPTextModel(config=c).apply({"params": params},
                                                    jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_vae_full_geometry_golden():
    """SD AutoencoderKL at the real channel stack (128,256,512,512):
    encode moments + decode parity at a 64px sample (full channel widths;
    spatial extent does not change the math)."""
    from torch_ref import vae as tvref
    from text_to_video_finetuning_tpu.models import (AutoencoderKL,
                                                     VAE_SD_CONFIG)
    cfg = VAE_SD_CONFIG
    tm = randomize(tvref.AutoencoderKL(cfg), 200).eval()
    fm = AutoencoderKL(config=cfg)
    params = to_flax(tm, "vae")

    g = torch.Generator().manual_seed(201)
    img = torch.randn(1, 3, 64, 64, generator=g)
    with torch.no_grad():
        mean_ref, logvar_ref = tm.moments(img)
    mean, logvar = fm.apply({"params": params}, jnp.asarray(img.numpy()),
                            method=fm.moments)
    np.testing.assert_allclose(np.asarray(mean), mean_ref.numpy(),
                               atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(logvar), logvar_ref.numpy(),
                               atol=1e-3, rtol=1e-2)

    lat = torch.randn(1, cfg.latent_channels, 8, 8, generator=g)
    with torch.no_grad():
        dec_ref = tm.decode(lat).numpy()
    ours_d = np.asarray(fm.apply({"params": params}, jnp.asarray(lat.numpy()),
                                 method=fm.decode))
    np.testing.assert_allclose(ours_d, dec_ref, atol=1e-3, rtol=1e-2)
