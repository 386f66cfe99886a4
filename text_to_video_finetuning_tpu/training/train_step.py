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
    # EMA shadow of `trainable` (beyond reference; None when use_ema is
    # off -- None is an empty pytree subtree, so existing 4-field states,
    # checkpoints and shardings are unaffected)
    ema: Any = None

    def tree_flatten(self):
        return (self.step, self.trainable, self.opt_state, self.rng,
                self.ema), None

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
    # EMA of the trainable subtree (beyond reference): decay applied once
    # per OPTIMIZER update; 0.0 disables.  The update boundary is derived
    # from the optimizer state itself (_update_applied) -- MultiSteps'
    # mini_step wrap and apply_if_finite's last_finite -- so dropped
    # non-finite micro-batches (which defer the accumulation window) keep
    # the EMA aligned with REAL updates.  `ema_every` is only the fallback
    # cadence for optimizers whose state exposes neither signal.
    ema_decay: float = 0.0
    ema_every: int = 1
    # The reference ALWAYS runs two UNet passes when frames > 1
    # (train.py:813-829 `for i in range(2)`), even with a frozen text
    # encoder -- where pass 1 repeats pass 0 on the same inputs (only the
    # dropout draw differs) and merely doubles the gradient in expectation.
    # two_pass=False skips that redundant pass and scales the loss by 2 for
    # an expectation-equivalent trajectory at ~half the step cost; when the
    # text path IS trainable the second (frame-1, trainable-text) pass is
    # load-bearing and always runs.
    two_pass: bool = True
    # Run LoRA in BRANCH form (base(x) + up(down(x)), reference
    # utils/lora.py:57-62) through the "lora" variable collection
    # (models/lora_layers.py) instead of folding merged weights: keeps
    # base kernels non-differentiated, so the backward never materializes
    # full dW weight-grad convolutions for LoRA'd convs -- a large
    # HBM-byte/FLOP win (benchmarks/RESULTS.md).  Applies to BOTH flavors:
    # loralib's merged conv definition factors exactly into a branch
    # (models/lora_layers.py::_stable_conv_branch); its embedding sites
    # are folded (see _effective_params).
    lora_branch: bool = True


def _effective_params(cfg: TrainStepConfig, trainable, frozen, rng,
                      train: bool):
    """Merge trainable/frozen subtrees and prepare LoRA: either the branch
    collections (lora_branch, models/lora_layers.py -- both flavors) or
    merged-weight overlays.  Returns (unet_params, text_params,
    unet_lora_col, text_lora_col) with cols None when not in branch mode.

    stable_lora embedding sites (loralib CLIPTextEmbeddings LoRA) have no
    branch layer; in branch mode they are folded into text_params via
    apply_lora(only_kinds={"embedding"}).  Their deltas are (V, D) adds
    whose backward is the embedding grad buffer the step materializes
    anyway -- no dW convolution is involved, so nothing is lost.  Branch
    weight-dropout is not applied to those folded embedding sites (the
    reference applies loralib dropout on branch activations per site;
    this overlay approximates it on down-matrices -- see lora/overlay.py)."""
    branch = cfg.lora_branch and cfg.lora_version in ("cloneofsimo",
                                                      "stable_lora")
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
                dropout_rate=cfg.lora_unet_dropout,
                version=cfg.lora_version)
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
            if cfg.lora_version == "stable_lora":
                text_params = apply_lora(
                    text_params, trainable["text_lora"], cfg.text_sites,
                    version="stable_lora",
                    only_kinds=frozenset({"embedding"}))
            text_col = prepare_branch_collection(
                trainable["text_lora"], cfg.text_sites,
                scale=cfg.lora_scale, dropout_rng=drop_rng,
                dropout_rate=cfg.lora_text_dropout,
                version=cfg.lora_version)
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


def make_loss_fn(cfg: TrainStepConfig, pass_sel: Optional[int] = None):
    """Build loss_fn(trainable, frozen, vae_params, batch, rng) ->
    (loss, aux).  Exposed separately from make_train_step so tests can
    differentiate individual loss terms (e.g. assert the pass-0 text
    detach, reference train.py:814-829).

    pass_sel selects which of the reference's two loss passes
    (train.py:803-834) the built function computes:
      None -- both passes in one function (the fused train step);
      0    -- pass 0 only (full clip, detached text), including the x2
              expectation-scaling when the redundant second pass is
              disabled via two_pass=False;
      1    -- pass 1 only (frame-1 trainable-text when the text path is
              trainable, else the full second clip pass); evaluates to a
              constant 0.0 when no second pass exists (single-frame
              batches), so its gradient contribution is exactly zero.
    All three draw the SAME rng splits, so pass_sel=0 plus pass_sel=1
    reproduces the fused function's noise/timestep/dropout draws term by
    term -- the basis of the split-compile step (make_split_train_step).
    """

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

        raw_loss0 = loss0 = loss1 = jnp.zeros(())
        if pass_sel in (None, 0):
            raw_loss0 = unet_fwd(noisy_latents, target, hs0, k0)
            loss0 = raw_loss0
            if (video_length > 1 and not text_trainable
                    and not cfg.two_pass):
                # skipped redundant pass: x2 keeps the expected gradient
                # equal to the reference's summed two-pass loss
                loss0 = loss0 * 2.0
        if pass_sel in (None, 1) and video_length > 1:
            # pass 1: reference runs a second pass; frame-1-only when the
            # text path is trainable (reference train.py:807-820)
            if text_trainable:
                nl = noisy_latents[:, :, 1:2]
                tg = target[:, :, 1:2]
                loss1 = unet_fwd(nl, tg, hidden_states, k1)
            elif cfg.two_pass:
                loss1 = unet_fwd(noisy_latents, target, hidden_states, k1)

        loss = loss0 + loss1
        aux = {"loss0": raw_loss0, "loss1": loss1}
        return loss, aux

    return loss_fn


def _update_applied(new_opt_state, state: TrainState, ema_every: int):
    """True iff the optimizer ACTUALLY applied a parameter update this
    micro-step, read from the POST-update optimizer state (the engine
    composes apply_if_finite OUTSIDE MultiSteps OUTSIDE the AdamW chain):

    - `optax.ApplyIfFiniteState.last_finite` is False when the update was
      rejected (skip_nonfinite_updates) -- nothing was applied;
    - `optax.MultiStepsState.mini_step` wraps to 0 exactly when the
      accumulated window's update was emitted; mid-window steps apply
      nothing.

    A rejected micro-batch defers the accumulation window by one, so a
    step-counter gate (`(step+1) % every`) would permanently misalign the
    EMA boundary with real updates after the first drop -- this reads the
    truth instead.  Falls back to the step-counter cadence only when the
    state exposes neither signal (custom optimizers without MultiSteps)."""
    applied = None
    s = new_opt_state
    if isinstance(s, optax.ApplyIfFiniteState):
        applied = s.last_finite
        s = s.inner_state
    if isinstance(s, optax.MultiStepsState):
        wrapped = s.mini_step == 0
        applied = wrapped if applied is None else applied & wrapped
    elif applied is None:
        applied = ((state.step + 1) % ema_every) == 0
    return applied


def _ema_update(cfg: TrainStepConfig, state: TrainState, new_trainable,
                new_opt_state):
    """Blend the EMA shadow toward the post-update params, once per REAL
    optimizer update (see _update_applied): at micro-steps where no update
    was applied (MultiSteps mid-window, apply_if_finite rejection) the
    effective decay is 1.0, leaving the shadow untouched."""
    if cfg.ema_decay <= 0.0 or state.ema is None:
        return state.ema
    at_boundary = _update_applied(new_opt_state, state, cfg.ema_every)
    decay = jnp.where(at_boundary, cfg.ema_decay, 1.0)
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        state.ema, new_trainable)


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
        if isinstance(new_opt_state, optax.ApplyIfFiniteState):
            # skip_nonfinite_updates observability: cumulative count of
            # dropped micro-batches (logged by the engine)
            metrics["notfinite_drops"] = new_opt_state.total_notfinite
        return TrainState(step=state.step + 1, trainable=new_trainable,
                          opt_state=new_opt_state, rng=rng,
                          ema=_ema_update(cfg, state, new_trainable,
                                          new_opt_state)), metrics

    return train_step


def make_split_train_step(cfg: TrainStepConfig, optimizer):
    """Split-compile variant of make_train_step: the two loss passes
    (reference train.py:803-834) are compiled as SEPARATE XLA programs,
    plus a third small program for the optimizer update.

    grad(loss0 + loss1) == grad(loss0) + grad(loss1), and both pass
    functions draw the same rng splits as the fused step (make_loss_fn
    pass_sel docstring), so the parameter trajectory matches the fused
    step to float tolerance.  The point is COMPILER capacity, not speed:
    each program holds one UNet fwd+bwd instead of two, roughly halving
    the peak scheduling problem.  At 16-frame 576x320 the fused two-pass
    graph crashes the remote TPU compile helper under every selective
    remat policy while both split halves compile fine
    (benchmarks/RESULTS.md "16f hires").  Costs: three dispatches per
    step, a second live gradient pytree (LoRA-sized in the shipped
    configs), and re-running the cheap prologue (noise sampling, CLIP
    forward, VAE encode when latents are not cached) in each half.

    Returns train_step(state, frozen, vae_params, batch) with the same
    signature/semantics as the fused one; the pieces are jitted here, so
    do NOT wrap the result in jax.jit.
    """
    loss0_fn = make_loss_fn(cfg, pass_sel=0)
    loss1_fn = make_loss_fn(cfg, pass_sel=1)

    def _grads(loss_fn):
        def f(trainable, frozen, vae_params, batch, step_rng):
            return jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, vae_params, batch, step_rng)
        return jax.jit(f)

    jit_grads0 = _grads(loss0_fn)
    jit_grads1 = _grads(loss1_fn)
    jit_split = jax.jit(lambda rng: tuple(jax.random.split(rng)))

    def apply_fn(state, grads0, grads1, new_rng, losses):
        grads = jax.tree_util.tree_map(jnp.add, grads0, grads1)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        metrics = {**losses, "grad_norm": optax.global_norm(grads)}
        if isinstance(new_opt_state, optax.ApplyIfFiniteState):
            metrics["notfinite_drops"] = new_opt_state.total_notfinite
        return TrainState(step=state.step + 1, trainable=new_trainable,
                          opt_state=new_opt_state, rng=new_rng,
                          ema=_ema_update(cfg, state, new_trainable,
                                          new_opt_state)), metrics

    # donate only the state: its leaves (trainable + opt moments + step +
    # rng) pair 1:1 with the new TrainState's outputs; donating the grad
    # trees too would leave one unusable pytree per call (warning noise)
    jit_apply = jax.jit(apply_fn, donate_argnums=(0,))

    def train_step(state: TrainState, frozen, vae_params, batch):
        rng, step_rng = jit_split(state.rng)
        (l0, aux0), grads0 = jit_grads0(state.trainable, frozen,
                                        vae_params, batch, step_rng)
        (l1, aux1), grads1 = jit_grads1(state.trainable, frozen,
                                        vae_params, batch, step_rng)
        losses = {"loss": l0 + l1, "loss0": aux0["loss0"],
                  "loss1": aux1["loss1"]}
        return jit_apply(state, grads0, grads1, rng, losses)

    def aot_lower(state, frozen, vae_params, batch):
        """AOT-compile the two (large) gradient programs, for the
        multi-host compile barrier (engine._aot_compile_and_barrier) --
        the closure itself has no .lower().  A grads program's rng arg
        matches state.rng in shape/dtype/sharding, so lowering reuses it.
        The small optimizer-apply program is left to first-call compile:
        it is elementwise over replicated arrays (grads arrive already
        reduced), so it opens no fresh collective handshake and compiles
        in seconds, not minutes."""
        jit_grads0.lower(state.trainable, frozen, vae_params, batch,
                         state.rng).compile()
        jit_grads1.lower(state.trainable, frozen, vae_params, batch,
                         state.rng).compile()

    train_step.aot_lower = aot_lower
    # the two big programs, exposed for memory analysis (the closure has
    # no .lower(); benchmarks/step_bench.py::mem_analysis bounds the split
    # step's peak from these) -- each takes (trainable, frozen, vae_params,
    # batch, rng)
    train_step.grad_programs = (jit_grads0, jit_grads1)
    return train_step
