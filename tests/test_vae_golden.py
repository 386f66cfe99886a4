"""Golden numerical parity: flax AutoencoderKL vs an independent torch
implementation of the diffusers VAE the reference loads
(reference train.py:122), weights shared through state_dict_to_flax.
Covers encode moments (the training latent path, reference train.py:339-347)
and decode (reference inference.py:124-140)."""

import numpy as np
import torch

import jax.numpy as jnp

from text_to_video_finetuning_tpu.models.vae import (AutoencoderKL,
                                                     tiny_vae_config)
from text_to_video_finetuning_tpu.utils.checkpoint import state_dict_to_flax

from torch_ref import vae as tref
from test_unet_golden import randomize
import pytest


# torch-golden / e2e-compile heavy: excluded by the fast
# profile `pytest -m "not slow"` (see pytest.ini)
pytestmark = pytest.mark.slow

def _pair(seed=0):
    cfg = tiny_vae_config()
    tm = randomize(tref.AutoencoderKL(cfg), seed).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = state_dict_to_flax(sd, "vae")
    fm = AutoencoderKL(config=cfg)
    return cfg, tm, fm, params


def test_vae_encode_moments_golden():
    cfg, tm, fm, params = _pair(30)
    x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(31))
    with torch.no_grad():
        mean_ref, logvar_ref = tm.moments(x)
    mean, logvar = fm.apply({"params": params}, jnp.asarray(x.numpy()),
                            method=fm.moments)
    np.testing.assert_allclose(np.asarray(mean), mean_ref.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logvar), logvar_ref.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_vae_decode_golden():
    cfg, tm, fm, params = _pair(32)
    z = torch.randn(2, cfg.latent_channels, 16, 16,
                    generator=torch.Generator().manual_seed(33))
    with torch.no_grad():
        ref = tm.decode(z)
    ours = fm.apply({"params": params}, jnp.asarray(z.numpy()),
                    method=fm.decode)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_vae_old_checkpoint_attention_names():
    """Old diffusers checkpoints name the mid attention query/key/value/
    proj_attn; the converter renames them (utils/checkpoint.py:34-38)."""
    cfg, tm, fm, params = _pair(34)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    renames = {"to_q": "query", "to_k": "key", "to_v": "value",
               "to_out.0": "proj_attn"}
    old_sd = {}
    for k, v in sd.items():
        for new, old in renames.items():
            if ".attentions.0." + new + "." in k:
                k = k.replace("." + new + ".", "." + old + ".")
                break
        old_sd[k] = v
    params_old = state_dict_to_flax(old_sd, "vae")
    z = torch.randn(1, cfg.latent_channels, 8, 8,
                    generator=torch.Generator().manual_seed(35))
    a = fm.apply({"params": params}, jnp.asarray(z.numpy()),
                 method=fm.decode)
    b = fm.apply({"params": params_old}, jnp.asarray(z.numpy()),
                 method=fm.decode)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)
