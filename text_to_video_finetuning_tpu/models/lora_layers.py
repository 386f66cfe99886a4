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
layers pure.  Only the cloneofsimo flavor uses the branch: loralib's conv
flavor is *defined* as a merged-weight forward
(reference stable_lora/lora.py:190-197) and keeps the overlay path.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
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
    """nn.Dense plus an optional cloneofsimo LoRA branch.

    Branch math (reference utils/lora.py:57-62 LoraInjectedLinear):
    `y = x @ W + b + (x @ down.T) @ up.T` with down (r, in), up (out, r)
    in the torch checkpoint layout.
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


class LoraConv(nn.Module):
    """nn.Conv (NHWC/NDHWC, no dilation/groups) plus an optional cloneofsimo
    LoRA branch.

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
            # torch (r, in, *k) -> flax (*k, in, r)
            down_k = jnp.transpose(down,
                                   tuple(range(2, 2 + nd)) + (1, 0))
            dn_d = lax.conv_dimension_numbers(inputs.shape, down_k.shape,
                                              _CONV_DIMS[nd])
            h = lax.conv_general_dilated(inputs, down_k, strides, padding,
                                         dimension_numbers=dn_d)
            up2 = up.reshape(up.shape[0], up.shape[1])      # (out, r)
            y = y + h @ up2.T
        return y
