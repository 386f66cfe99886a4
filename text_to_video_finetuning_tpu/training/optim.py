"""Optimizer and LR schedules.

Behavioral spec: AdamW with (betas, weight_decay, eps) from config
(reference train.py:598-604), optional 8-bit Adam
(`get_optimizer`, reference train.py:238-249; bitsandbytes AdamW8bit), and
diffusers `get_scheduler` LR schedules (reference train.py:607-612).
Gradient clipping by global norm (reference train.py:868-875) is part of the
chain.
"""

from __future__ import annotations

import optax


def get_lr_schedule(name: str, learning_rate: float, warmup_steps: int,
                    total_steps: int):
    """diffusers get_scheduler equivalents."""
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    if name == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
             optax.constant_schedule(learning_rate)], [max(warmup_steps, 1)])
    if name == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
             optax.linear_schedule(learning_rate, 0.0,
                                   max(total_steps - warmup_steps, 1))],
            [max(warmup_steps, 1)])
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, max(warmup_steps, 1),
            max(total_steps, warmup_steps + 1))
    if name == "cosine_with_restarts":
        return optax.sgdr_schedule([
            dict(init_value=0.0, peak_value=learning_rate,
                 warmup_steps=max(warmup_steps, 1),
                 decay_steps=max(total_steps, warmup_steps + 1))])
    if name == "polynomial":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
             optax.polynomial_schedule(learning_rate, 0.0, 1.0,
                                       max(total_steps - warmup_steps, 1))],
            [max(warmup_steps, 1)])
    raise ValueError(f"unknown lr scheduler {name}")


def get_optimizer(learning_rate_schedule, adam_beta1: float = 0.9,
                  adam_beta2: float = 0.999, adam_weight_decay: float = 1e-2,
                  adam_epsilon: float = 1e-8, max_grad_norm: float = 1.0,
                  use_8bit_adam: bool = False):
    """AdamW chain with global-norm clipping. `use_8bit_adam` selects a
    quantized-moment variant (the bitsandbytes AdamW8bit analog) that keeps
    optimizer state in int8 with per-block scales to halve HBM pressure."""
    if use_8bit_adam:
        from ..ops.quantized_adam import adamw_8bit
        opt = adamw_8bit(learning_rate_schedule, b1=adam_beta1,
                         b2=adam_beta2, eps=adam_epsilon,
                         weight_decay=adam_weight_decay)
    else:
        opt = optax.adamw(learning_rate_schedule, b1=adam_beta1,
                          b2=adam_beta2, eps=adam_epsilon,
                          weight_decay=adam_weight_decay)
    transforms = []
    if max_grad_norm and max_grad_norm > 0:
        transforms.append(optax.clip_by_global_norm(max_grad_norm))
    transforms.append(opt)
    return optax.chain(*transforms)
