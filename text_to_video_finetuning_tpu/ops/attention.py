"""Attention backend dispatch.

The reference delegates fused attention to xformers
(`MemoryEfficientAttentionFlashAttentionOp`, reference train.py:159-162) or
torch-2.0 SDPA (`set_torch_2_attn`, reference train.py:141-152).  Here the
equivalent knob selects between the XLA einsum path (which XLA fuses well for
short sequences) and a Pallas flash-attention kernel tuned for the two shapes
this model produces:

* spatial attention: seq = H*W tokens (e.g. 32*32=1024 at 256px latents),
  batch = B*F, self-attention plus cross-attention over 77 text tokens;
* temporal attention: seq = F frames (4-24), batch = B*H*W (huge).

All tensors here are (batch, seq, heads, head_dim) ("BSHD").
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp


class AttentionBackend(str, enum.Enum):
    XLA = "xla"          # plain einsum softmax einsum; XLA fusion
    PALLAS = "pallas"    # Pallas flash-attention kernel (fwd + bwd)
    AUTO = "auto"        # pick per-shape: pallas for long seq, xla for tiny


def _xla_attention(q, k, v, scale):
    """Reference-semantics attention: softmax(q k^T * scale) v, fp32 softmax.

    q: (B, Sq, H, D); k, v: (B, Sk, H, D). Returns (B, Sq, H, D) in q.dtype.
    """
    out_dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("scale", "backend"))
def dot_product_attention(q, k, v, scale: float | None = None,
                          backend: str = AttentionBackend.AUTO):
    """Fused scaled-dot-product attention with backend dispatch.

    Equivalent of the reference's attention kernel selection
    (`handle_memory_attention`, reference train.py:154-170).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    backend = AttentionBackend(backend)
    if backend == AttentionBackend.AUTO:
        # Measured on v5e (benchmarks/attn_bench.py): XLA's fused softmax is
        # at the dispatch floor for short sequences (temporal attention over
        # frames, tiny spatial grids, 77-token cross KV); the Pallas flash
        # kernel wins 2.3-2.7x once the logits matrix is HBM-bound
        # (long spatial self-attention, e.g. 2880 tokens at 576x320).
        backend = (AttentionBackend.PALLAS
                   if q.shape[1] >= 1024 and k.shape[1] >= 1024
                   else AttentionBackend.XLA)
    if backend == AttentionBackend.PALLAS and jax.default_backend() == "tpu":
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)
