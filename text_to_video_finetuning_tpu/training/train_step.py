"""The jitted training step: two-pass hybrid video/text loss.

Behavioral spec: `finetune_unet` (reference train.py:720-836) --
latents (cached or VAE-encoded), offset noise (reference train.py:349-358),
per-video uniform timesteps, eps/v targets, and the TWO-PASS loss
(reference train.py:803-834): pass 0 runs the full video with DETACHED text
embeddings; pass 1 (when frames > 1 and the text path is trainable) runs
frame index 1 only with trainable text embeddings; total loss is the sum.
Both passes live in ONE compiled step (stop_gradient replaces .detach()),
so there is no recompilation and XLA shares the text-encoder forward.

Gradients are computed only for the trainable subtree (base-param selections
+ LoRA overlays); the DP all-reduce is implicit in SPMD sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..lora.overlay import apply_lora, prepare_branch_collection
from ..lora.sites import LoraSite
from ..schedulers.ddpm import DDPMScheduler
from ..utils.pytree import merge


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: Dict[str, Any]    # {'unet','text','unet_lora','text_lora'}
    opt_state: Any
    rng: jax.Array

    def tree_flatten(self):
        return (self.step, self.trainable, self.opt_state, self.rng), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    unet: Any                     # flax module
    text_encoder: Any             # flax module
    vae: Any                      # flax module (used when not cache_latents)
    scheduler: DDPMScheduler
    unet_sites: Tuple[LoraSite, ...] = ()
    text_sites: Tuple[LoraSite, ...] = ()
    lora_version: str = "cloneofsimo"
    lora_scale: float = 1.0
    lora_unet_dropout: float = 0.0
    lora_text_dropout: float = 0.0
    cache_latents: bool = False
    use_offset_noise: bool = False
    rescale_schedule: bool = False
    offset_noise_strength: float = 0.1
    scaling_factor: float = 0.18215
    mixed_precision: Optional[str] = None   # None|'bf16' (compute dtype)
    # reference eval_train kwarg (train.py:779-781): run the models in eval
    # mode during training (disables dropout)
    eval_train: bool = False
    # The reference ALWAYS runs two UNet passes when frames > 1
    # (train.py:813-829 `for i in range(2)`), even with a frozen text
    # encoder -- where pass 1 repeats pass 0 on the same inputs (only the
    # dropout draw differs) and merely doubles the gradient in expectation.
    # two_pass=False skips that redundant pass and scales the loss by 2 for
    # an expectation-equivalent trajectory at ~half the step cost; when the
    # text path IS trainable the second (frame-1, trainable-text) pass is
    # load-bearing and always runs.
    two_pass: bool = True
    # Run cloneofsimo LoRA in the reference's BRANCH form
    # (base(x) + up(down(x)), reference utils/lora.py:57-62) through the
    # "lora" variable collection (models/lora_layers.py) instead of folding
    # merged weights: keeps base kernels non-differentiated, so the
    # backward never materializes full dW weight-grad convolutions for
    # LoRA'd convs -- a large HBM-byte/FLOP win (benchmarks/RESULTS.md).
    # stable_lora always uses the merged overlay (loralib conv semantics).
    lora_branch: bool = True


def _effective_params(cfg: TrainStepConfig, trainable, frozen, rng,
                      train: bool):
    """Merge trainable/frozen subtrees and prepare LoRA: either the branch
    collections (cloneofsimo + lora_branch, models/lora_layers.py) or
    merged-weight overlays.  Returns (unet_params, text_params,
    unet_lora_col, text_lora_col) with cols None when not in branch mode."""
    branch = cfg.lora_branch and cfg.lora_version == "cloneofsimo"
    unet_params = merge(frozen.get("unet", {}), trainable.get("unet", {}))
    unet_col = text_col = None
    if "unet_lora" in trainable:
        drop_rng = None
        if train and cfg.lora_unet_dropout > 0:
            rng, drop_rng = jax.random.split(rng)
        if branch:
            unet_col = prepare_branch_collection(
                trainable["unet_lora"], cfg.unet_sites,
                scale=cfg.lora_scale, dropout_rng=drop_rng,
                dropout_rate=cfg.lora_unet_dropout)
        else:
            unet_params = apply_lora(
                unet_params, trainable["unet_lora"], cfg.unet_sites,
                version=cfg.lora_version, scale=cfg.lora_scale,
                dropout_rng=drop_rng, dropout_rate=cfg.lora_unet_dropout)
    text_params = merge(frozen.get("text", {}), trainable.get("text", {}))
    if "text_lora" in trainable:
        drop_rng = None
        if train and cfg.lora_text_dropout > 0:
            rng, drop_rng = jax.random.split(rng)
        if branch:
            text_col = prepare_branch_collection(
                trainable["text_lora"], cfg.text_sites,
                scale=cfg.lora_scale, dropout_rng=drop_rng,
                dropout_rate=cfg.lora_text_dropout)
        else:
            text_params = apply_lora(
                text_params, trainable["text_lora"], cfg.text_sites,
                version=cfg.lora_version, scale=cfg.lora_scale,
                dropout_rng=drop_rng, dropout_rate=cfg.lora_text_dropout)
    return unet_params, text_params, unet_col, text_col


def sample_noise(rng, latents, noise_strength: float,
                 use_offset_noise: bool):
    """reference train.py:349-358."""
    noise_rng, offset_rng = jax.random.split(rng)
    noise = jax.random.normal(noise_rng, latents.shape, latents.dtype)
    if use_offset_noise:
        b, c, f = latents.shape[:3]
        offset = jax.random.normal(offset_rng, (b, c, f, 1, 1),
                                   latents.dtype)
        noise = noise + noise_strength * offset
    return noise


def tensor_to_vae_latent(cfg: TrainStepConfig, vae_params, pixel_values,
                         rng):
    """reference train.py:339-347: per-frame encode, fold frames to batch,
    scale by 0.18215. pixel_values: (B, F, C, H, W)."""
    b, f = pixel_values.shape[:2]
    px = pixel_values.reshape((b * f,) + pixel_values.shape[2:])
    latents = cfg.vae.apply({"params": vae_params}, px, rng=rng,
                            method=type(cfg.vae).encode)
    latents = latents.reshape((b, f) + latents.shape[1:])
    latents = latents.transpose(0, 2, 1, 3, 4)      # (B, C, F, h, w)
    return latents * cfg.scaling_factor


def make_loss_fn(cfg: TrainStepConfig):
    """Build loss_fn(trainable, frozen, vae_params, batch, rng) ->
    (loss, aux).  Exposed separately from make_train_step so tests can
    differentiate individual loss terms (e.g. assert the pass-0 text
    detach, reference train.py:814-829)."""

    use_offset = cfg.use_offset_noise and not cfg.rescale_schedule

    def loss_fn(trainable, frozen, vae_params, batch, rng):
        rng_lora, rng_noise, rng_t, rng_vae, rng_drop = jax.random.split(
            rng, 5)
        unet_params, text_params, unet_col, text_col = _effective_params(
            cfg, trainable, frozen, rng_lora, train=not cfg.eval_train)
        unet_vars = {"params": unet_params}
        if unet_col is not None:
            unet_vars["lora"] = unet_col
        text_vars = {"params": text_params}
        if text_col is not None:
            text_vars["lora"] = text_col

        if cfg.cache_latents:
            latents = batch["pixel_values"]       # already latents
        else:
            latents = tensor_to_vae_latent(cfg, vae_params,
                                           batch["pixel_values"], rng_vae)

        video_length = latents.shape[2]
        noise = sample_noise(rng_noise, latents,
                             cfg.offset_noise_strength, use_offset)
        bsz = latents.shape[0]
        timesteps = jax.random.randint(
            rng_t, (bsz,), 0, cfg.scheduler.num_train_timesteps)
        noisy_latents = cfg.scheduler.add_noise(latents, noise, timesteps)

        token_ids = batch["prompt_ids"]
        if token_ids.ndim > 2:
            token_ids = token_ids[:, 0]
        hidden_states = cfg.text_encoder.apply(text_vars, token_ids)
        target = cfg.scheduler.training_target(latents, noise, timesteps)

        text_trainable = ("text" in trainable) or ("text_lora" in trainable)

        def unet_fwd(latents_in, target_in, hs, key):
            pred = cfg.unet.apply(
                unet_vars, latents_in, timesteps, hs,
                deterministic=cfg.eval_train, rngs={"dropout": key})
            return jnp.mean(jnp.square(pred.astype(jnp.float32)
                                       - target_in.astype(jnp.float32)))

        k0, k1 = jax.random.split(rng_drop)
        # pass 0: full clip; detach text when multi-frame
        hs0 = (jax.lax.stop_gradient(hidden_states) if video_length > 1
               else hidden_states)
        raw_loss0 = unet_fwd(noisy_latents, target, hs0, k0)
        losses = [raw_loss0]

        if video_length > 1:
            # pass 1: reference runs a second pass; frame-1-only when the
            # text path is trainable (reference train.py:807-820)
            if text_trainable:
                nl = noisy_latents[:, :, 1:2]
                tg = target[:, :, 1:2]
                losses.append(unet_fwd(nl, tg, hidden_states, k1))
            elif cfg.two_pass:
                losses.append(unet_fwd(noisy_latents, target,
                                       hidden_states, k1))
            else:
                # skipped redundant pass: x2 keeps the expected gradient
                # equal to the reference's summed two-pass loss
                losses[0] = losses[0] * 2.0

        loss = sum(losses)
        aux = {"loss0": raw_loss0,
               "loss1": losses[1] if len(losses) > 1 else jnp.zeros(())}
        return loss, aux

    return loss_fn


def make_train_step(cfg: TrainStepConfig, optimizer):
    """Build the pure train_step(state, frozen, vae_params, batch)."""
    loss_fn = make_loss_fn(cfg)

    def train_step(state: TrainState, frozen, vae_params, batch):
        rng, step_rng = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, frozen, vae_params, batch, step_rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        metrics = {"loss": loss, **aux,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(step=state.step + 1, trainable=new_trainable,
                          opt_state=new_opt_state, rng=rng), metrics

    return train_step
