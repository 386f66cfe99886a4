"""Fused GroupNorm+SiLU Pallas kernel vs flax GroupNorm + silu (fwd + bwd),
run in interpret mode on the CPU suite (compiled on TPU)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_video_finetuning_tpu.ops.groupnorm import fused_group_norm_silu

INTERPRET = jax.default_backend() != "tpu"


def _ref(x, scale, bias, groups, eps, silu=True):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, use_bias=True,
                      use_scale=True)
    params = {"scale": scale, "bias": bias}
    y = gn.apply({"params": params}, x)
    return nn.silu(y) if silu else y


@pytest.mark.parametrize("shape,groups", [
    ((3, 8, 8, 32), 8),
    ((2, 16, 16, 64), 32),
    ((1, 7, 5, 32), 4),     # ragged spatial dims
])
@pytest.mark.parametrize("silu", [True, False])
def test_fused_gn_fwd_matches_flax(shape, groups, silu):
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, shape, jnp.float32)
    scale = jax.random.normal(k2, (shape[-1],)) * 0.2 + 1.0
    bias = jax.random.normal(k3, (shape[-1],)) * 0.1
    y = fused_group_norm_silu(x, scale, bias, groups=groups, eps=1e-5,
                              apply_silu=silu, interpret=INTERPRET)
    ref = _ref(x, scale, bias, groups, 1e-5, silu)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_fused_gn_bwd_matches_flax():
    shape, groups = (2, 8, 8, 32), 8
    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, shape, jnp.float32)
    scale = jax.random.normal(k2, (shape[-1],)) * 0.2 + 1.0
    bias = jax.random.normal(k3, (shape[-1],)) * 0.1

    def loss_fused(x, s, b):
        y = fused_group_norm_silu(x, s, b, groups=groups,
                                  interpret=INTERPRET)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, s, b):
        return jnp.sum(jnp.sin(_ref(x, s, b, groups, 1e-5)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for name, a, r in zip(("dx", "dgamma", "dbeta"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-5,
                                   err_msg=name)


def test_fused_gn_bf16():
    shape, groups = (2, 8, 8, 64), 32
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, shape, jnp.bfloat16)
    scale = jnp.ones((shape[-1],), jnp.float32)
    bias = jnp.zeros((shape[-1],), jnp.float32)
    y = fused_group_norm_silu(x, scale, bias, groups=groups,
                              interpret=INTERPRET)
    ref = _ref(x.astype(jnp.float32), scale, bias, groups, 1e-5)
    assert y.dtype == jnp.bfloat16
    assert float(jnp.abs(y.astype(jnp.float32) - ref).max()) < 3e-2


def test_fused_flag_preserves_param_tree(rng):
    """fused_groupnorm=True must not change the parameter tree (checkpoint
    compatibility) and must match the unfused forward numerically."""
    import jax
    from flax.traverse_util import flatten_dict
    from text_to_video_finetuning_tpu.models import (UNet3DConditionModel,
                                                     tiny_unet_config)
    cfg = tiny_unet_config()
    sample = jnp.zeros((1, 4, 2, 16, 16))
    text = jnp.zeros((1, 77, cfg.cross_attention_dim))
    a = UNet3DConditionModel(config=cfg, fused_groupnorm=False)
    b = UNet3DConditionModel(config=cfg, fused_groupnorm=True)
    pa = jax.jit(a.init)(rng, sample, jnp.array([1]), text)["params"]
    pb = jax.jit(b.init)(rng, sample, jnp.array([1]), text)["params"]
    ka = {(k, v.shape) for k, v in flatten_dict(pa).items()}
    kb = {(k, v.shape) for k, v in flatten_dict(pb).items()}
    assert ka == kb
    ya = a.apply({"params": pa}, jnp.ones((1, 4, 2, 16, 16)),
                 jnp.array([3]), text)
    yb = b.apply({"params": pa}, jnp.ones((1, 4, 2, 16, 16)),
                 jnp.array([3]), text)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-5)
