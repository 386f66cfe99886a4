"""Pallas TPU flash attention (fwd + bwd).

The TPU-native replacement for xformers
`MemoryEfficientAttentionFlashAttentionOp` / torch SDPA
(reference train.py:154-170; SURVEY.md §2.3 rows 1-2).  Two shape regimes in
this model:

* spatial self-attention: seq = H*W (1024 at 256px latents, 2880 at
  576x320), batch = B*F, head_dim 64;
* cross-attention: q seq = H*W, kv seq = 77 text tokens;
* temporal attention: seq = F (4-24), batch = B*H*W -- handled by the XLA
  path (ops/attention.py AUTO heuristic), since blocking gains nothing at
  seq < block size.

Design: online-softmax streaming over KV blocks (flash attention 2 style).
Q is tiled (BLOCK_Q x head_dim) per grid step; K/V stream through VMEM in
BLOCK_K chunks via the grid's minor dimension with running (m, l)
renormalization carried in VMEM scratch.  All matmuls hit the MXU at fp32
accumulation; inputs stay in their storage dtype (bf16 in mixed precision).

Backward is a standard two-kernel recomputation flash backward (dKV then
dQ), with the forward's logsumexp saved as residual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tuned on TPU v5e at the 2880-token spatial regime (benchmarks/attn_bench):
# bq=512/bk=1024 gave 2.3-2.7x over the XLA path fwd and fwd+bwd
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30


def _pick_block(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (n is padded to 128-multiples
    by the wrapper, so this returns a 128-multiple)."""
    b = min(n, target)
    while n % b:
        b -= 128
        if b <= 0:
            return n
    return b


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _kv_mask(s, kv_step, block_k: int, kv_len: int):
    """-inf-mask score columns past the real KV length (padded keys)."""
    col = kv_step * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    return jnp.where(col < kv_len, s, NEG_INF)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                *, scale: float, block_k_steps: int, block_k: int,
                kv_len: int, mask_kv: bool):
    kv_step = pl.program_id(2)

    @pl.when(kv_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]                                    # (BQ, D)
    k = k_ref[0]                                    # (BK, D)
    v = v_ref[0]                                    # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BQ, BK)
    if mask_kv:
        s = _kv_mask(s, kv_step, block_k, kv_len)

    m_prev = m_ref[:]                               # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                          # (BQ, BK)
    correction = jnp.exp(m_prev - m_new)            # (BQ, 1)
    l_new = correction * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(kv_step == block_k_steps - 1)
    def _():
        l = l_ref[:]
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        # lse is (B, Sq, 1): a trailing singleton lane dim keeps the block
        # (BQ, 1) Mosaic-lowerable (the last dim equals the full array dim)
        lse_ref[0] = m_ref[:] + jnp.log(l)


def _flash_fwd(q, k, v, scale, block_q, block_k, kv_len, interpret=False):
    """q (B, Sq, D), k/v (B, Sk, D) -> (o, lse)."""
    b, sq, d = q.shape
    sk = k.shape[1]
    bq = _pick_block(sq, block_q)
    bk = _pick_block(sk, block_k)
    grid = (b, sq // bq, sk // bk)

    kernel = functools.partial(_fwd_kernel, scale=scale,
                               block_k_steps=sk // bk, block_k=bk,
                               kv_len=kv_len, mask_kv=kv_len < sk)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, sq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale: float, q_steps: int, block_k: int,
                    kv_len: int, mask_kv: bool):
    q_step = pl.program_id(2)

    @pl.when(q_step == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                 # (BQ, D)
    k = k_ref[0]                 # (BK, D)
    v = v_ref[0]
    do = do_ref[0]               # (BQ, D)
    lse = lse_ref[0]             # (BQ, 1)
    delta = delta_ref[0]         # (BQ, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if mask_kv:
        # kv is the BLOCKED axis here (grid dim 1), not the streamed one
        s = _kv_mask(s, pl.program_id(1), block_k, kv_len)
    p = jnp.exp(s - lse)                             # (BQ, BK)

    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, do.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BK, D)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale                    # (BQ, BK)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BK, D)

    @pl.when(q_step == q_steps - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_acc, *, scale: float, kv_steps: int, block_k: int,
                   kv_len: int, mask_kv: bool):
    kv_step = pl.program_id(2)

    @pl.when(kv_step == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]             # (BQ, 1)
    delta = delta_ref[0]         # (BQ, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if mask_kv:
        s = _kv_mask(s, kv_step, block_k, kv_len)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_step == kv_steps - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd(scale, block_q, block_k, kv_len, interpret, res, g):
    q, k, v, o, lse = res
    b, sq, d = q.shape
    sk = k.shape[1]
    # the backward keeps ~4 (bq, bk) fp32 intermediates (s, p, dp, ds) live
    # in VMEM; cap its blocks regardless of the (possibly whole-KV) forward
    # blocks or the kernel stack OOMs the 16MB scoped-vmem limit
    bq = _pick_block(sq, min(block_q, 512))
    bk = _pick_block(sk, min(block_k, 1024))
    mask_kv = kv_len < sk

    delta = jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32),
                    axis=-1, keepdims=True)          # (B, Sq, 1)

    dkv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, q_steps=sq // bq,
                          block_k=bk, kv_len=kv_len, mask_kv=mask_kv),
        grid=(b, sk // bk, sq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, ki, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bi, ki, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bi, ki, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bi, ki, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, g, lse, delta)
    dk, dv = dkv

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_steps=sk // bk,
                          block_k=bk, kv_len=kv_len, mask_kv=mask_kv),
        grid=(b, sq // bq, sk // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention_bhsd(q, k, v, scale, block_q, block_k, kv_len,
                          interpret=False):
    o, _ = _flash_fwd(q, k, v, scale, block_q, block_k, kv_len, interpret)
    return o


def _flash_fwd_rule(q, k, v, scale, block_q, block_k, kv_len, interpret):
    o, lse = _flash_fwd(q, k, v, scale, block_q, block_k, kv_len, interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd_rule(scale, block_q, block_k, kv_len, interpret, res, g):
    return _flash_bwd(scale, block_q, block_k, kv_len, interpret, res, g)


_flash_attention_bhsd.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _pad_to(x, axis, multiple):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


def flash_attention(q, k, v, scale: float | None = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False):
    """BSHD flash attention: q (B, Sq, H, D), k/v (B, Sk, H, D).

    Heads fold into the batch grid axis.  Sequences are zero-padded to
    128-lane multiples: padded KV columns are -inf-masked inside the kernel
    (iota vs the real kv length), and padded Q rows are sliced away (their
    cotangents are zero through the slice VJP, so they contribute nothing
    to dK/dV).  head_dim stays native -- a full-dim minor block is
    Mosaic-legal for any D, and padding D to 128 would double the kernel
    FLOPs at this model's D=64.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]

    # (B, S, H, D) -> (B*H, S, D)
    def to_bhsd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = to_bhsd(q), to_bhsd(k), to_bhsd(v)

    # pad sequences to the block size (not just 128): an awkward length
    # like 2880 -> 2944 = 128*23 would force 128-wide blocks everywhere,
    # while 2880 -> 3072 keeps full-width blocks for 7% padding overhead
    q_mult = min(block_q, 1 << max((sq - 1).bit_length(), 7))
    k_mult = min(512, 1 << max((sk - 1).bit_length(), 7))
    qf, orig_sq = _pad_to(qf, 1, q_mult)
    kf, orig_sk = _pad_to(kf, 1, k_mult)
    vf, _ = _pad_to(vf, 1, k_mult)
    # whole-KV blocks when K+V fit a VMEM budget: measured ~20% faster
    # than streaming 1024-wide KV at the 2880-token regime (v5e)
    sk_pad = kf.shape[1]
    if 2 * sk_pad * d * kf.dtype.itemsize <= 768 * 1024:
        block_k = max(block_k, sk_pad)

    o = _flash_attention_bhsd(qf, kf, vf, float(scale), block_q,
                              block_k, orig_sk, interpret)
    o = o[:, :orig_sq, :]
    return o.reshape(b, h, orig_sq, d).transpose(0, 2, 1, 3)
