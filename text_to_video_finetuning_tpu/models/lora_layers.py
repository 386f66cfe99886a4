"""Dense/Conv layers with an optional fused LoRA *branch*.

Training-time LoRA runs in the reference's BRANCH form
(`base(x) + scale * up(down(x))`, reference utils/lora.py:57-62 /
LoraInjectedConv figures at utils/lora.py:98-127,182-204) instead of the
merged-weight overlay (lora/overlay.py `W_eff = W + up@down`).  The perf
reason is AD structure, not FLOPs: with the merged form the base kernel
becomes a *computed* tensor, so the backward pass must materialize the full
dW weight-gradient (a weight-grad convolution per LoRA'd conv, plus its
kernel-sized HBM write+read) just to chain rank-r cotangents into up/down.
In branch form the base kernel stays a non-differentiated leaf of the
`frozen` tree and JAX's partial evaluation prunes every weight-grad
convolution; the backward touches only rank-r contractions.  Measured on
v5e this removes the largest avoidable byte+FLOP bucket of the HBM-bound
train step (benchmarks/RESULTS.md, round 3).

Wiring: the LoRA weights arrive through a separate `"lora"` variable
collection whose tree mirrors the params tree at each site's module scope
(`{'down': ..., 'up': ...}` in cloneofsimo's torch layout -- exactly what
`lora.overlay.init_lora_params` builds), so

    model.apply({"params": p, "lora": lora_tree}, ...)

enables the branch, and a plain `apply({"params": p})` is bit-identical to
`nn.Dense` / `nn.Conv`.  Scale and (weight-)dropout are folded into the
`up`/`down` leaves by the caller (training/train_step.py), keeping these
layers pure.

Both LoRA flavors run as branches.  cloneofsimo's is the reference's own
branch form.  loralib (stable_lora) DEFINES its conv forward as a merged
weight, `W + (B @ A).view(W.shape) * scaling` (reference
stable_lora/lora.py:190-197) -- but that merged kernel factors EXACTLY
into a masked down-convolution with r*k^2 intermediate channels followed
by a channel contraction with B (see `_stable_conv_branch`), so the same
backward-pruning win applies: the base kernel stays a non-differentiated
leaf and no full dW weight-grad convolution is materialized.  The two
layouts are told apart at runtime by `down.ndim` (loralib conv A is a 2-D
matrix; cloneofsimo down is a conv kernel).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from flax.linen import dtypes as nn_dtypes
from jax import lax

default_kernel_init = nn.initializers.lecun_normal()

_CONV_DIMS = {
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def _normalize(padding, nd: int):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding),) * nd
    return tuple((p, p) if isinstance(p, int) else tuple(p) for p in padding)


class LoraDense(nn.Module):
    """nn.Dense plus an optional LoRA branch (either flavor).

    Branch math (reference utils/lora.py:57-62 LoraInjectedLinear):
    `y = x @ W + b + (x @ down.T) @ up.T` with down (r, in), up (out, r)
    in the torch checkpoint layout.  loralib Linear (reference
    stable_lora/lora.py:119-129) stores A (r, in) / B (out, r) -- the SAME
    shapes -- and its forward `base(x) + (x @ A.T @ B.T) * scaling` is this
    exact expression with the scaling folded into `up` by the caller.
    """
    features: int
    use_bias: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    kernel_init: Any = default_kernel_init
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, inputs):
        kernel = self.param("kernel", self.kernel_init,
                            (jnp.shape(inputs)[-1], self.features),
                            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        down = up = None
        if self.has_variable("lora", "down"):
            down = self.get_variable("lora", "down")
            up = self.get_variable("lora", "up")
        inputs, kernel, bias, down, up = nn_dtypes.promote_dtype(
            inputs, kernel, bias, down, up, dtype=self.dtype)
        y = lax.dot_general(inputs, kernel,
                            (((inputs.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        if down is not None:
            y = y + (inputs @ down.T) @ up.T
        return y


def _stable_conv_branch(inputs, down, up, kernel_size, strides, padding,
                        features):
    """loralib ConvLoRA as an exact branch (no merged dW in the backward).

    loralib stores A (r*k, in*k) / B (out*k, r*k) and defines the conv
    delta as `(B @ A).view(out, in, k, k) * scaling` (Conv2d), or that view
    extended to (out, in, k, k, 1) and MEAN-reduced over its 4th dim for
    the (k,1,1) temporal Conv3d (reference stable_lora/lora.py:143-197).
    The row-major view scrambles the factorization, but it stays exact:
    with t = i*k^2 + k1*k + k2,  a(t) = t // (in*k),  q(t) = t % (in*k),

        delta[o,i,k1,k2] = sum_{a,s} B[o*k+a, s] * (A[s, q] * [a(t) == a])

    i.e. a down-convolution whose k*r*k masked kernels are a static GATHER
    of A (differentiable; the backward is a permutation scatter), followed
    by a channel contraction with B reshaped to (k*r*k, out).  Verified
    bit-level against the merged view in tests/test_lora.py.  The backward
    therefore materializes only an (r*k^2)-channel weight-grad, never the
    full (out,in,k,k) dW convolution -- the same AD-structure win as the
    cloneofsimo branch.  Scaling (alpha/r) is folded into `up` by the
    caller."""
    nd = len(kernel_size)
    k = int(kernel_size[0])
    if nd == 2:
        assert kernel_size[0] == kernel_size[1], kernel_size
    else:
        # the model family's only 3-D convs are (k,1,1) temporal
        assert tuple(kernel_size[1:]) == (1, 1), kernel_size
    in_ch = int(inputs.shape[-1])
    rk = int(down.shape[0])                      # r * k
    assert down.shape[1] == in_ch * k, (down.shape, in_ch, k)
    assert up.shape == (features * k, rk), (up.shape, features, k, rk)

    # static torch-view index map (numpy at trace time)
    i_idx, k1_idx, k2_idx = np.meshgrid(
        np.arange(in_ch), np.arange(k), np.arange(k), indexing="ij")
    totals = i_idx * k * k + k1_idx * k + k2_idx
    a_idx = totals // (in_ch * k)                # in [0, k)
    q_idx = totals % (in_ch * k)
    gathered = down[:, q_idx]                    # (rk, in, k, k)
    onehot = jnp.asarray(
        a_idx[None] == np.arange(k)[:, None, None, None], dtype=down.dtype)
    down_k = gathered[None] * onehot[:, None]    # (ka, rk, in, k1, k2)
    if nd == 2:                                  # flax (k1, k2, in, mid)
        kern = down_k.transpose(3, 4, 2, 0, 1).reshape(k, k, in_ch, k * rk)
    else:                                        # mean over the view's k2
        kern = down_k.mean(axis=4).transpose(3, 2, 0, 1).reshape(
            k, 1, 1, in_ch, k * rk)
    dn = lax.conv_dimension_numbers(inputs.shape, kern.shape, _CONV_DIMS[nd])
    h = lax.conv_general_dilated(inputs, kern, strides, padding,
                                 dimension_numbers=dn)
    u_mat = up.reshape(features, k, rk).transpose(1, 2, 0).reshape(
        k * rk, features)                        # channel order (a, s)
    return h @ u_mat


class LoraConv(nn.Module):
    """nn.Conv (NHWC/NDHWC, no dilation/groups) plus an optional LoRA
    branch (either flavor; see `_stable_conv_branch` for loralib).

    Branch math (reference utils/lora.py:98-127,182-204 LoraInjectedConv2d/
    Conv3d): a down conv with the BASE kernel size/stride/padding into r
    channels, then a 1x1 up conv -- computed here as conv(x, down) followed
    by a channel matmul with up.  down is stored torch-style
    (r, in, *k); up (out, r, *1s).
    """
    features: int
    kernel_size: Tuple[int, ...]
    strides: Optional[Tuple[int, ...]] = None
    padding: Union[str, int, Sequence] = "SAME"
    use_bias: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    kernel_init: Any = default_kernel_init
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, inputs):
        nd = len(self.kernel_size)
        strides = self.strides or (1,) * nd
        padding = _normalize(self.padding, nd)
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (jnp.shape(inputs)[-1], self.features),
            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        down = up = None
        if self.has_variable("lora", "down"):
            down = self.get_variable("lora", "down")
            up = self.get_variable("lora", "up")
        inputs, kernel, bias, down, up = nn_dtypes.promote_dtype(
            inputs, kernel, bias, down, up, dtype=self.dtype)

        dn = lax.conv_dimension_numbers(inputs.shape, kernel.shape,
                                        _CONV_DIMS[nd])
        y = lax.conv_general_dilated(inputs, kernel, strides, padding,
                                     dimension_numbers=dn)
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        if down is not None:
            if down.ndim == 2:                  # loralib A/B matrix layout
                y = y + _stable_conv_branch(inputs, down, up,
                                            self.kernel_size, strides,
                                            padding, self.features)
            else:
                # cloneofsimo: torch (r, in, *k) -> flax (*k, in, r)
                down_k = jnp.transpose(down,
                                       tuple(range(2, 2 + nd)) + (1, 0))
                dn_d = lax.conv_dimension_numbers(inputs.shape,
                                                  down_k.shape,
                                                  _CONV_DIMS[nd])
                h = lax.conv_general_dilated(inputs, down_k, strides,
                                             padding,
                                             dimension_numbers=dn_d)
                up2 = up.reshape(up.shape[0], up.shape[1])  # (out, r)
                y = y + h @ up2.T
        return y
