"""Golden numerical parity: JAX LaMa (models/lama.py) vs an independent
torch implementation of the reference generator (tests/torch_ref/lama.py),
loaded through the real checkpoint path (`load_lama_params` on a saved
torch Lightning-style state dict).  Catches channel-layout bugs in the
FourierUnit interleave (reference utils/lama.py:76-85) and padding-mode
mismatches in the FFC convs."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from torch_ref import lama as tref


# torch-golden / e2e-compile heavy: excluded by the fast
# profile `pytest -m "not slow"` (see pytest.ini)
pytestmark = pytest.mark.slow

def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 1:
                if name.endswith("bias"):
                    p.copy_(torch.randn(p.shape, generator=g) * 0.05)
                else:  # BN weight
                    p.copy_(1.0 + torch.randn(p.shape, generator=g) * 0.1)
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(0.5 + torch.rand(b.shape, generator=g))
    return model


def test_fourier_unit_golden():
    from text_to_video_finetuning_tpu.models.lama import _fourier_unit
    tm = _randomize(tref.FourierUnit(6), 40).eval()
    x = torch.randn(2, 6, 8, 8, generator=torch.Generator().manual_seed(41))
    with torch.no_grad():
        ref = tm(x).numpy()
    params = {
        "conv_layer": {"kernel":
                       tm.conv_layer.weight.detach().numpy()
                       .transpose(2, 3, 1, 0)},
        "bn": {"scale": tm.bn.weight.detach().numpy(),
               "bias": tm.bn.bias.detach().numpy(),
               "mean": tm.bn.running_mean.numpy(),
               "var": tm.bn.running_var.numpy()},
    }
    ours = _fourier_unit(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-3)


def test_lama_full_golden(tmp_path):
    """Full generator (real 18-block topology at ngf=8) through the real
    checkpoint-loading path."""
    from text_to_video_finetuning_tpu.models.lama import (lama_forward,
                                                          load_lama_params)
    tm = _randomize(tref.LargeMaskInpainting(ngf=8), 42).eval()
    ckpt = tmp_path / "best.ckpt"
    torch.save({"state_dict": {"generator." + k: v for k, v in
                               tm.state_dict().items()}}, str(ckpt))

    g = torch.Generator().manual_seed(43)
    img = torch.rand(1, 3, 32, 32, generator=g)
    mask = torch.zeros(1, 1, 32, 32)
    mask[:, :, 20:, 16:] = 1.0
    with torch.no_grad():
        ref = tm(img, mask).numpy()

    params = load_lama_params(str(ckpt))
    ours = lama_forward(params,
                        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
                        jnp.asarray(mask.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=1e-3)
