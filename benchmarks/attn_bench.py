"""Microbenchmark: Pallas flash attention vs XLA attention at the exact
shapes the ModelScope UNet produces (B=1, F=16, 256px latents).

Run on a real TPU:  python benchmarks/attn_bench.py
"""

import functools
import time

import jax
import jax.numpy as jnp

from text_to_video_finetuning_tpu.ops.attention import _xla_attention
from text_to_video_finetuning_tpu.ops.flash_attention import flash_attention

# (label, batch, q_seq, kv_seq, heads, head_dim)
SHAPES = [
    ("spatial self 32x32 (320ch)", 16, 1024, 1024, 5, 64),
    ("spatial self 16x16 (640ch)", 16, 256, 256, 10, 64),
    ("spatial self 8x8 (1280ch)", 16, 64, 64, 20, 64),
    ("spatial cross 32x32 -> 77", 16, 1024, 77, 5, 64),
    ("temporal 32x32 f16 (320ch)", 1024, 16, 16, 5, 64),
    ("temporal 16x16 f16 (640ch)", 256, 16, 16, 10, 64),
    # long-sequence regime (576x320 latents: 72*40 = 2880 tokens)
    ("spatial self 72x40 (320ch)", 16, 2880, 2880, 5, 64),
]


def bench(fn, args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3   # ms


def main():
    print(f"backend: {jax.default_backend()} {jax.devices()[0].device_kind}")
    rng = jax.random.PRNGKey(0)
    for label, b, sq, sk, h, d in SHAPES:
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(k2, (b, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(k3, (b, sk, h, d), jnp.bfloat16)
        scale = d ** -0.5

        xla_fwd = jax.jit(functools.partial(_xla_attention, scale=scale))
        pl_fwd = jax.jit(functools.partial(flash_attention, scale=scale))

        def mk_grad(f):
            return jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(f(q, k, v).astype(jnp.float32)),
                argnums=(0, 1, 2)))

        row = {"shape": label}
        try:
            row["xla_fwd_ms"] = bench(xla_fwd, (q, k, v))
            row["xla_bwd_ms"] = bench(mk_grad(xla_fwd), (q, k, v))
        except Exception as e:
            row["xla_err"] = str(e)[:80]
        try:
            row["pallas_fwd_ms"] = bench(pl_fwd, (q, k, v))
            row["pallas_bwd_ms"] = bench(mk_grad(pl_fwd), (q, k, v))
            # correctness vs fp32 reference
            o_ref = _xla_attention(q.astype(jnp.float32),
                                   k.astype(jnp.float32),
                                   v.astype(jnp.float32), scale)
            o_pl = pl_fwd(q, k, v).astype(jnp.float32)
            row["max_err"] = float(jnp.abs(o_ref - o_pl).max())
        except Exception as e:
            row["pallas_err"] = str(e)[:120]
        print({k: (round(v, 3) if isinstance(v, float) else v)
               for k, v in row.items()})


if __name__ == "__main__":
    main()
