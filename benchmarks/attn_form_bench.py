"""Attention formulation microbench (round 3, byte-lever b).

The round-2 trace attributed ~10 ms/step to sync layout copies around the
XLA attention path's (B,S,H,D) head split (benchmarks/RESULTS.md).  This
isolates the *full sublayer chain* (q/k/v projection -> attention -> output
projection) fwd+bwd at the real model shapes that ride the XLA path, and
compares formulations:

  A `einsum`   : current ops/attention.py (bqhd,bkhd->bhqk / bhqk,bkhd->bqhd)
                 + reshape + Dense out
  B `natural`  : lax.dot_general with batch dims in natural positions
                 ((b,h) at (0,2)) producing (b,h,q,k)/(b,h,q,d), and the
                 output projection contracted DIRECTLY from (b,h,q,d) via
                 einsum('bhqd,hdo->bqo') -- no head-merge transpose at all
  C `pretrans` : explicit (b,h,s,d) transposes after projection (what XLA's
                 layout assignment effectively inserts today, made visible)

Run on TPU: PYTHONPATH=/root/repo python benchmarks/attn_form_bench.py
Timing via scalar readback (~25 ms tunnel floor; report net-of-floor too).
"""

import time

import jax
import jax.numpy as jnp
from jax import lax


def chain_einsum(x, ctx, wq, wk, wv, wo, heads, dim_head):
    b, sq, _ = x.shape
    sk = ctx.shape[1]
    q = (x @ wq).reshape(b, sq, heads, dim_head)
    k = (ctx @ wk).reshape(b, sk, heads, dim_head)
    v = (ctx @ wv).reshape(b, sk, heads, dim_head)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * dim_head ** -0.5, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return (out.reshape(b, sq, heads * dim_head) @ wo)


def chain_natural(x, ctx, wq, wk, wv, wo, heads, dim_head):
    b, sq, _ = x.shape
    sk = ctx.shape[1]
    q = (x @ wq).reshape(b, sq, heads, dim_head)
    k = (ctx @ wk).reshape(b, sk, heads, dim_head)
    v = (ctx @ wv).reshape(b, sk, heads, dim_head)
    logits = lax.dot_general(
        q, k, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32)          # (b, h, q, k)
    w = jax.nn.softmax(logits * dim_head ** -0.5, axis=-1)
    out = lax.dot_general(
        w.astype(v.dtype), v, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32).astype(x.dtype)  # (b, h, q, d)
    wo3 = wo.reshape(heads, dim_head, wo.shape[-1])
    return jnp.einsum("bhqd,hdo->bqo", out, wo3)


def chain_pretrans(x, ctx, wq, wk, wv, wo, heads, dim_head):
    b, sq, _ = x.shape
    sk = ctx.shape[1]
    q = (x @ wq).reshape(b, sq, heads, dim_head).transpose(0, 2, 1, 3)
    k = (ctx @ wk).reshape(b, sk, heads, dim_head).transpose(0, 2, 1, 3)
    v = (ctx @ wv).reshape(b, sk, heads, dim_head).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * dim_head ** -0.5, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, sq, heads * dim_head)
    return out @ wo


CHAINS = {"einsum": chain_einsum, "natural": chain_natural,
          "pretrans": chain_pretrans}

# (label, batch, q_seq, kv_seq, channels, heads) at the shapes that ride
# the XLA path in the 256px training step (pallas takes >=1024/1024)
SHAPES = [
    ("cross-1024q-77kv-320c", 16, 1024, 77, 320, 5),
    ("cross-256q-77kv-640c", 16, 256, 77, 640, 10),
    ("self-256q-640c", 16, 256, 256, 640, 10),
    ("self-64q-1280c", 16, 64, 64, 1280, 20),
    ("temporal-16f-320c", 1024, 16, 16, 320, 5),
]


def bench(fn, args, n=30):
    g = jax.jit(jax.grad(lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2),
                         argnums=(0, 2, 3, 4, 5)), static_argnums=(6, 7))
    f = jax.jit(fn, static_argnums=(6, 7))
    float(jnp.sum(f(*args)))                      # compile fwd
    jax.block_until_ready(g(*args))               # compile bwd
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(r))
    t_f = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(*args)
    float(jnp.sum(r[0]))
    t_b = (time.perf_counter() - t0) / n
    return t_f * 1e3, t_b * 1e3


def main():
    print(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    for label, b, sq, sk, ch, heads in SHAPES:
        dim_head = ch // heads
        ks = jax.random.split(key, 6)
        x = jax.random.normal(ks[0], (b, sq, ch), jnp.bfloat16)
        ctx = (x if sq == sk else
               jax.random.normal(ks[1], (b, sk, 1024 if sk == 77 else ch),
                                 jnp.bfloat16))
        cdim = ctx.shape[-1]
        wq = jax.random.normal(ks[2], (ch, ch), jnp.bfloat16) * 0.02
        wk = jax.random.normal(ks[3], (cdim, ch), jnp.bfloat16) * 0.02
        wv = jax.random.normal(ks[4], (cdim, ch), jnp.bfloat16) * 0.02
        wo = jax.random.normal(ks[5], (ch, ch), jnp.bfloat16) * 0.02
        for name, fn in CHAINS.items():
            try:
                t_f, t_b = bench(fn, (x, ctx, wq, wk, wv, wo, heads,
                                      dim_head))
                print({"shape": label, "form": name,
                       "fwd_ms": round(t_f, 2), "bwd_ms": round(t_b, 2)})
            except Exception as e:
                print({"shape": label, "form": name, "error": str(e)[:120]})


if __name__ == "__main__":
    main()
