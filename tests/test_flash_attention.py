"""Pallas flash attention vs the XLA reference path.

On the CPU test mesh the kernel runs in Pallas interpret mode (same kernel
code, numpy semantics), covering the online-softmax math, the KV padding
mask trick, and the two-kernel backward.  On a real TPU the same tests run
compiled (see benchmarks/attn_bench.py for timings).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_video_finetuning_tpu.ops.attention import _xla_attention
from text_to_video_finetuning_tpu.ops.flash_attention import flash_attention

INTERPRET = jax.default_backend() != "tpu"

# (label, batch, q_seq, kv_seq, heads, head_dim) -- the model's regimes,
# shrunk for CPU interpret speed
SHAPES = [
    ("spatial_self", 2, 256, 256, 2, 64),
    ("spatial_cross_77", 2, 256, 77, 2, 64),     # padded KV masking path
    ("unaligned_q", 2, 200, 200, 1, 64),         # padded Q path
]


@pytest.mark.parametrize("label,b,sq,sk,h,d",
                         SHAPES, ids=[s[0] for s in SHAPES])
def test_flash_fwd_matches_xla(label, b, sq, sk, h, d):
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (b, sq, h, d), jnp.float32)
    k = jax.random.normal(k2, (b, sk, h, d), jnp.float32)
    v = jax.random.normal(k3, (b, sk, h, d), jnp.float32)
    scale = d ** -0.5
    o = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                        interpret=INTERPRET)
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)


def test_flash_bwd_matches_xla():
    b, sq, sk, h, d = 2, 256, 256, 2, 64
    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (b, sq, h, d), jnp.float32)
    k = jax.random.normal(k2, (b, sk, h, d), jnp.float32)
    v = jax.random.normal(k3, (b, sk, h, d), jnp.float32)
    scale = d ** -0.5

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                            interpret=INTERPRET)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, r in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-5,
                                   err_msg=f"d{name}")


def test_flash_bf16_error_bounded():
    """bf16 inputs: flash output must stay within bf16 rounding of the fp32
    reference (guards against accumulating in low precision)."""
    b, sq, sk, h, d = 2, 256, 256, 2, 64
    rng = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (b, sq, h, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, sk, h, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, sk, h, d), jnp.bfloat16)
    scale = d ** -0.5
    o = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                        interpret=INTERPRET).astype(jnp.float32)
    ref = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), scale)
    assert float(jnp.abs(o - ref).max()) < 2e-2
