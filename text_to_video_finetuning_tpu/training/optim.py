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
                  use_8bit_adam: bool = False, group_overrides=None,
                  base_lr=None):
    """AdamW chain with global-norm clipping. `use_8bit_adam` selects a
    quantized-moment variant (the bitsandbytes AdamW8bit analog) that keeps
    optimizer state in int8 with per-block scales to halve HBM pressure.

    `group_overrides` maps a top-level trainable key ('unet', 'text', ...)
    to {'learning_rate', 'adam_weight_decay', 'adam_beta1', 'adam_beta2',
    'adam_epsilon'} -- the per-model param-group hyperparams of the
    reference's create_optimizer_params / extra_unet_params
    (reference train.py:205-236).  (The reference overwrites
    extra_text_encoder_params with extra_unet_params, train.py:575-576 --
    a bug we do not reproduce.)"""

    def make(lr, wd, b1, b2, eps):
        if use_8bit_adam:
            from ..ops.quantized_adam import adamw_8bit
            return adamw_8bit(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)

    if not group_overrides:
        opt = make(learning_rate_schedule, adam_weight_decay, adam_beta1,
                   adam_beta2, adam_epsilon)
    else:
        transforms = {"default": make(learning_rate_schedule,
                                      adam_weight_decay, adam_beta1,
                                      adam_beta2, adam_epsilon)}
        for group, ov in group_overrides.items():
            lr = learning_rate_schedule
            if "learning_rate" in ov:
                # the reference applies its LR scheduler multiplicatively to
                # every param group's base lr; a numeric override rescales
                # the shared schedule rather than replacing it
                ov_lr = float(ov["learning_rate"])
                if callable(learning_rate_schedule) and base_lr:
                    ratio = ov_lr / float(base_lr)
                    sched = learning_rate_schedule
                    lr = (lambda count, _s=sched, _r=ratio: _s(count) * _r)
                else:
                    lr = ov_lr
            transforms[group] = make(
                lr,
                ov.get("adam_weight_decay", adam_weight_decay),
                ov.get("adam_beta1", adam_beta1),
                ov.get("adam_beta2", adam_beta2),
                ov.get("adam_epsilon", adam_epsilon))

        def label_fn(params):
            import jax
            return {k: jax.tree_util.tree_map(
                lambda _: k if k in transforms else "default", v)
                for k, v in params.items()}

        opt = optax.multi_transform(transforms, label_fn)

    chain = []
    if max_grad_norm and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(opt)
    return optax.chain(*chain)
