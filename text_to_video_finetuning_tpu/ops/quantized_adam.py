"""8-bit AdamW: blockwise-quantized optimizer moments.

TPU-native replacement for bitsandbytes `AdamW8bit`
(reference train.py:238-249): first/second moments are stored int8 with
per-block absmax scales (block = 256 elements), dequantized/requantized
inside the fused update. Halves optimizer-state HBM vs fp32 Adam twice over
(m and v), the reason the reference offers the knob for 16GB GPUs.

The second moment is quantized in sqrt-space to preserve dynamic range
(bitsandbytes uses a nonlinear quantile map; sqrt-space linear quantization
has comparable error for Adam's strictly-positive v and vectorizes trivially
on the VPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

_BLOCK = 256


def _pad_len(n: int) -> int:
    return (n + _BLOCK - 1) // _BLOCK * _BLOCK


def _quantize(x_flat):
    """fp32 (padded to block multiple) -> (int8 values, fp32 scales)."""
    blocks = x_flat.reshape(-1, _BLOCK)
    scales = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    safe = jnp.where(scales == 0, 1.0, scales)
    q = jnp.clip(jnp.round(blocks / safe), -127, 127).astype(jnp.int8)
    return q, scales.astype(jnp.float32)


def _dequantize(q, scales):
    return (q.astype(jnp.float32) * scales).reshape(-1)


class _Quantized(NamedTuple):
    values: jnp.ndarray   # int8 (nblocks, BLOCK)
    scales: jnp.ndarray   # fp32 (nblocks, 1)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: object            # pytree of _Quantized
    nu: object            # pytree of _Quantized (sqrt-space)


def adamw_8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8,
               weight_decay: float = 1e-2) -> optax.GradientTransformation:

    def quantize_like(x):
        flat = jnp.ravel(x).astype(jnp.float32)
        padded = jnp.pad(flat, (0, _pad_len(flat.size) - flat.size))
        return _Quantized(*_quantize(padded))

    def dequantize_like(q: _Quantized, x):
        return _dequantize(q.values, q.scales)[: x.size].reshape(
            x.shape).astype(jnp.float32)

    def init_fn(params):
        zeros = jax.tree_util.tree_map(
            lambda p: quantize_like(jnp.zeros_like(p)), params)
        zeros2 = jax.tree_util.tree_map(
            lambda p: quantize_like(jnp.zeros_like(p)), params)
        return Adam8bitState(count=jnp.zeros([], jnp.int32), mu=zeros,
                             nu=zeros2)

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("adamw_8bit requires params (weight decay)")
        count = state.count + 1
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, q_mu, q_nu, p):
            g = g.astype(jnp.float32)
            mu = dequantize_like(q_mu, g)
            nu_sqrt = dequantize_like(q_nu, g)
            nu = nu_sqrt * nu_sqrt
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * g * g
            step = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            step = step + weight_decay * p.astype(jnp.float32)
            new_update = (-lr * step).astype(p.dtype)
            return new_update, quantize_like(mu), quantize_like(jnp.sqrt(nu))

        flat_updates, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_params = treedef.flatten_up_to(params)
        out = [upd(g, m, n, p) for g, m, n, p in
               zip(flat_updates, flat_mu, flat_nu, flat_params)]
        new_updates = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        new_nu = treedef.unflatten([o[2] for o in out])
        return new_updates, Adam8bitState(count=count, mu=new_mu, nu=new_nu)

    return optax.GradientTransformation(init_fn, update_fn)
