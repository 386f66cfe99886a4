"""Fused GroupNorm(+SiLU) Pallas kernel for spatial NHWC tensors.

The UNet's hot elementwise cost is the GroupNorm -> SiLU chains in front of
every conv (ResnetBlock2D norm1/norm2, reference diffusers ResnetBlock2D;
SURVEY.md §3.3): XLA lowers each as a stats reduction pass plus a separate
normalize/activation pass over HBM.  This kernel computes stats, the affine
normalize and the SiLU in ONE VMEM-resident pass per sample (one read + one
write of the tensor), with a matching one-pass backward (custom_vjp).

Scope: spatial tensors (N, H, W, C) whose per-sample slice fits VMEM
(true for every spatial GroupNorm in this model up to 576x320 latents).
The temporal-conv GroupNorms normalize over (F, H, W, C/G) slices that
exceed VMEM at level 0 and stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-sample VMEM budget for the x block (fp32 intermediates ~3x this)
# per-sample element budget: the BACKWARD kernel keeps ~6 fp32 copies of
# the sample slice live (x, g, xhat, z, dxhat, products), and the TPU's
# scoped-vmem stack limit is 16MB -- cap at 0.5M elements (~12MB of fp32
# intermediates).  Level-0/bottleneck tensors (32x32x320, 16x16x1280) fit;
# wide up-block concats (32x32x1920) fall back to the XLA composition.
_MAX_BLOCK_ELEMENTS = 512 * 1024


def _group_matrix(c: int, groups: int):
    """(C, G) 0/1 assignment matrix: Mosaic cannot reshape the lane
    (channel) axis into (G, C/G), so per-group reductions/broadcasts are
    expressed as matmuls against this constant instead."""
    cg = c // groups
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    gi = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ci == gi).astype(jnp.float32)


def _fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, mean_ref, rstd_ref,
                *, groups: int, eps: float, apply_silu: bool):
    x = x_ref[0].astype(jnp.float32)            # (H, W, C)
    h, w, c = x.shape
    cg = c // groups
    M = _group_matrix(c, groups)                # (C, G)
    x2 = x.reshape(h * w, c)
    # keep reductions 2-D: Mosaic's dot lowering has no vec-mat form
    s1 = jnp.sum(x2, axis=0, keepdims=True)     # (1, C)
    s2 = jnp.sum(x2 * x2, axis=0, keepdims=True)
    n_el = h * w * cg
    mean = (s1 @ M) / n_el                      # (1, G)
    var = (s2 @ M) / n_el - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)             # (1, G)

    mean_c = mean @ M.T                         # (1, C)
    rstd_c = rstd @ M.T
    z = (x - mean_c) * rstd_c * scale_ref[:].astype(jnp.float32) \
        + bias_ref[:].astype(jnp.float32)
    if apply_silu:
        z = z * jax.nn.sigmoid(z)
    y_ref[0] = z.astype(y_ref.dtype)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _bwd_kernel(x_ref, scale_ref, bias_ref, mean_ref, rstd_ref, g_ref,
                dx_ref, dgamma_ref, dbeta_ref,
                *, groups: int, apply_silu: bool):
    x = x_ref[0].astype(jnp.float32)            # (H, W, C)
    g = g_ref[0].astype(jnp.float32)
    h, w, c = x.shape
    cg = c // groups
    M = _group_matrix(c, groups)                # (C, G)
    mean_c = mean_ref[0] @ M.T                  # (1, C)
    rstd_c = rstd_ref[0] @ M.T
    gamma = scale_ref[:].astype(jnp.float32)
    beta = bias_ref[:].astype(jnp.float32)

    xhat = (x - mean_c) * rstd_c
    if apply_silu:
        z = xhat * gamma + beta
        sig = jax.nn.sigmoid(z)
        g = g * sig * (1.0 + z * (1.0 - sig))   # dSiLU/dz

    dgamma_ref[0] = jnp.sum(g * xhat, axis=(0, 1), keepdims=True)[0]
    dbeta_ref[0] = jnp.sum(g, axis=(0, 1), keepdims=True)[0]
    dxhat = g * gamma

    n_el = h * w * cg
    s_d = jnp.sum(dxhat.reshape(h * w, c), axis=0,
                  keepdims=True)                # (1, C)
    s_dx = jnp.sum((dxhat * xhat).reshape(h * w, c), axis=0,
                   keepdims=True)
    m1 = ((s_d @ M) / n_el) @ M.T               # per-group mean -> (1, C)
    m2 = ((s_dx @ M) / n_el) @ M.T
    dx = rstd_c * (dxhat - m1 - xhat * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _run_fwd(x, scale, bias, groups, eps, apply_silu, interpret):
    n, h, w, c = x.shape
    kernel = functools.partial(_fwd_kernel, groups=groups, eps=eps,
                               apply_silu=apply_silu)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, groups), jnp.float32),
        ],
        interpret=interpret,
    )(x, scale, bias)


def _run_bwd(x, scale, bias, mean, rstd, g, groups, apply_silu, interpret):
    n, h, w, c = x.shape
    kernel = functools.partial(_bwd_kernel, groups=groups,
                               apply_silu=apply_silu)
    dx, dgamma_n, dbeta_n = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, scale, bias, mean, rstd, g)
    return dx, jnp.sum(dgamma_n, axis=(0, 1)), jnp.sum(dbeta_n, axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_gn(x, scale, bias, groups, eps, apply_silu, interpret):
    y, _, _ = _run_fwd(x, scale, bias, groups, eps, apply_silu, interpret)
    return y


def _fused_gn_fwd(x, scale, bias, groups, eps, apply_silu, interpret):
    y, mean, rstd = _run_fwd(x, scale, bias, groups, eps, apply_silu,
                             interpret)
    return y, (x, scale, bias, mean, rstd)


def _fused_gn_bwd(groups, eps, apply_silu, interpret, res, g):
    x, scale, bias, mean, rstd = res
    dx, dgamma, dbeta = _run_bwd(x, scale, bias, mean, rstd, g, groups,
                                 apply_silu, interpret)
    return dx, dgamma.astype(scale.dtype), dbeta.astype(bias.dtype)


_fused_gn.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def fits_fused(x_shape, dtype) -> bool:
    """Per-sample slice must fit the backward kernel's VMEM budget."""
    n, h, w, c = x_shape
    return h * w * c <= _MAX_BLOCK_ELEMENTS


def fused_group_norm_silu(x, scale, bias, groups: int = 32,
                          eps: float = 1e-5, apply_silu: bool = True,
                          interpret: bool = False):
    """GroupNorm(+SiLU) over NHWC x in a single fused pass; falls back to
    the XLA composition when the sample slice exceeds the VMEM budget or
    channels don't divide the group count."""
    n, h, w, c = x.shape
    if c % groups != 0 or not fits_fused(x.shape, x.dtype):
        xg = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
        xhat = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        if apply_silu:
            y = jax.nn.silu(y)
        return y.astype(x.dtype)
    return _fused_gn(x, scale, bias, groups, eps, apply_silu, interpret)
