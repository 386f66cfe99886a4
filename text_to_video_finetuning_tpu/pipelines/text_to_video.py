"""Text-to-video sampling pipeline.

Behavioral spec: diffusers `TextToVideoSDPipeline` +
`DPMSolverMultistepScheduler` as the reference uses for validation sampling
(reference train.py:918-943) and inference (reference inference.py:62-78),
including classifier-free guidance with an empty-string negative prompt and
the standard latents -> video postprocess.

The UNet step and the VAE decode are jitted once per (shape, guidance)
signature; the denoise loop is host-side Python over the DPM-Solver
timestep schedule with explicit scheduler state.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip_text import CLIPTextModel
from ..models.unet3d import UNet3DConditionModel
from ..models.vae import AutoencoderKL
from ..schedulers.ddpm import SchedulerConfig
from ..schedulers.dpmsolver import (DPMSolverMultistepScheduler,
                                    scan_step_static)


@functools.partial(jax.jit, static_argnames=("unet", "prediction_type",
                                             "solver_order", "cfg",
                                             "act_sharding"))
def _scan_denoise(params, latents, state, embeds, gs, ts, coeffs, *,
                  unet, prediction_type, solver_order, cfg,
                  act_sharding=None):
    """One compiled dispatch for the whole denoise loop.  `unet` (a frozen
    flax module) and the scheduler statics key the jit cache.

    act_sharding (an optional NamedSharding over the (2B, C, F, h, w)
    UNet input) turns this into a MULTI-CHIP sampler: the CFG pair shards
    over 'dp' (uncond and cond branches run on disjoint device groups) and
    frames over 'sp'; XLA inserts the all-to-alls at the spatial<->temporal
    module boundaries and the cross-'dp' gather at the guidance combine.
    The reference has no distributed inference at all (its inference.py is
    single-GPU); see parallel/sharding.py for the param rules."""

    def body(carry, xs):
        lat, st = carry
        t, ci = xs
        latent_in = jnp.concatenate([lat] * 2) if cfg else lat
        if act_sharding is not None:
            latent_in = jax.lax.with_sharding_constraint(latent_in,
                                                         act_sharding)
        pred = unet.apply({"params": params}, latent_in,
                          jnp.full((latent_in.shape[0],), t), embeds)
        pred = pred.astype(jnp.float32)
        if cfg:
            uncond, text = jnp.split(pred, 2, axis=0)
            pred = uncond + gs * (text - uncond)
        lat, st = scan_step_static(ci, pred, lat, st, prediction_type,
                                   solver_order)
        return (lat, st), None

    (lat, _), _ = jax.lax.scan(body, (latents, state), (ts, coeffs))
    return lat


@dataclasses.dataclass
class TextToVideoSDPipeline:
    unet: UNet3DConditionModel
    unet_params: dict
    vae: AutoencoderKL
    vae_params: dict
    text_encoder: CLIPTextModel
    text_params: dict
    tokenizer: object
    scheduler_config: SchedulerConfig
    vae_scale_factor: int = 8
    # multi-chip inference: a jax Mesh with any of the training axes
    # ('dp','fsdp','tp','sp').  dp shards the CFG pair / request batch,
    # sp the frame axis, tp/fsdp the UNet params (parallel/sharding.py
    # rules — the same ones the train step uses).  None = single device.
    # The reference's inference is single-GPU only (inference.py:336-435).
    mesh: Optional[object] = None

    def __post_init__(self):
        if self.mesh is not None:
            from ..parallel.sharding import shard_params
            use_fsdp = self.mesh.shape.get("fsdp", 1) > 1
            use_tp = self.mesh.shape.get("tp", 1) > 1
            if use_fsdp or use_tp:
                # the UNet dominates param bytes; text/VAE stay replicated
                self.unet_params = shard_params(
                    self.unet_params, self.mesh,
                    use_fsdp=use_fsdp, use_tp=use_tp)
        self._encode_text = jax.jit(
            lambda params, ids: self.text_encoder.apply({"params": params},
                                                        ids))

        @jax.jit
        def _unet_step(params, latents, t, embeds):
            return self.unet.apply({"params": params}, latents, t, embeds)
        self._unet_apply = _unet_step

        @jax.jit
        def _decode(params, latents):
            return self.vae.apply({"params": params}, latents,
                                  method=AutoencoderKL.decode)
        self._vae_decode = _decode

        @functools.partial(jax.jit, static_argnames=("sample",))
        def _encode(params, pixels, rng, sample=True):
            return self.vae.apply({"params": params}, pixels, rng=rng,
                                  sample=sample,
                                  method=AutoencoderKL.encode)
        self._vae_encode = _encode

    # -- multi-chip placement -------------------------------------------------
    def sampler_sharding(self, unet_batch: int, num_frames: int):
        """NamedSharding for the in-loop UNet input (unet_batch includes
        the CFG doubling), or None when off-mesh / nothing divides."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec
        dp = self.mesh.shape.get("dp", 1)
        sp = self.mesh.shape.get("sp", 1)
        spec = [None, None, None]
        if dp > 1 and unet_batch % dp == 0:
            spec[0] = "dp"
        if sp > 1 and num_frames % sp == 0:
            spec[2] = "sp"
        if spec == [None, None, None]:
            return None
        return NamedSharding(self.mesh, PartitionSpec(*spec))

    def place_sampler_inputs(self, latents, embeds):
        """Commit latents (frames over 'sp') and embeds (batch over 'dp')
        before the sampler dispatch so jit sees sharded inputs instead of
        host transfers of replicated copies."""
        if self.mesh is None:
            return latents, embeds
        from jax.sharding import NamedSharding, PartitionSpec as P
        sp = self.mesh.shape.get("sp", 1)
        dp = self.mesh.shape.get("dp", 1)
        if sp > 1 and latents.shape[2] % sp == 0:
            latents = jax.device_put(
                latents, NamedSharding(self.mesh, P(None, None, "sp")))
        if dp > 1 and embeds.shape[0] % dp == 0:
            embeds = jax.device_put(
                embeds, NamedSharding(self.mesh, P("dp")))
        return latents, embeds

    # -- prompts -------------------------------------------------------------
    def tokenize(self, prompts: List[str]) -> np.ndarray:
        return np.asarray(self.tokenizer(
            prompts, truncation=True, padding="max_length",
            max_length=self.tokenizer.model_max_length,
            return_tensors="np").input_ids, dtype=np.int32)

    def encode_prompt(self, prompt, negative_prompt=None,
                      do_classifier_free_guidance=True,
                      prompt_embeds=None, negative_prompt_embeds=None):
        """(2B or B, 77, D) embeds: [uncond; cond] like diffusers
        _encode_prompt (reference inference.py:173-181)."""
        if prompt_embeds is None:
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            prompt_embeds = self._encode_text(self.text_params,
                                              self.tokenize(prompts))
        batch = prompt_embeds.shape[0]
        if not do_classifier_free_guidance:
            return prompt_embeds
        if negative_prompt_embeds is None:
            if negative_prompt is None:
                negative = [""] * batch
            elif isinstance(negative_prompt, str):
                negative = [negative_prompt] * batch
            else:
                negative = list(negative_prompt)
            negative_prompt_embeds = self._encode_text(
                self.text_params, self.tokenize(negative))
        if negative_prompt_embeds.shape[1] != prompt_embeds.shape[1]:
            # long-prompt chunking can give cond/uncond different window
            # counts; pad the shorter with encoded-empty windows (compel's
            # pad_conditioning_tensors_to_same_length behavior)
            from ..utils.prompt_weighting import pad_with_empty
            target = max(negative_prompt_embeds.shape[1],
                         prompt_embeds.shape[1])
            empty = self._encode_text(self.text_params,
                                      self.tokenize([""]))[0]

            def pad(e):
                if e.shape[1] >= target:
                    return e
                return jnp.stack([
                    pad_with_empty(e[i], target, empty.astype(e.dtype))
                    for i in range(e.shape[0])])
            prompt_embeds = pad(prompt_embeds)
            negative_prompt_embeds = pad(negative_prompt_embeds)
        return jnp.concatenate([negative_prompt_embeds, prompt_embeds],
                               axis=0)

    # -- vae ------------------------------------------------------------------
    def encode_video(self, pixels, rng, batch_size: int = 8,
                     scaling: bool = True):
        """pixels (B, C, F, H, W) in [-1,1] -> latents (B, 4, F, h, w);
        micro-batched per-frame encode (reference inference.py:105-121)."""
        b, c, f, h, w = pixels.shape
        flat = jnp.transpose(pixels, (0, 2, 1, 3, 4)).reshape(b * f, c, h, w)
        outs = []
        for i in range(0, flat.shape[0], batch_size):
            rng, key = jax.random.split(rng)
            outs.append(self._vae_encode(self.vae_params,
                                         flat[i:i + batch_size], key))
        lat = jnp.concatenate(outs, axis=0)
        lat = lat.reshape(b, f, *lat.shape[1:]).transpose(0, 2, 1, 3, 4)
        if scaling:
            lat = lat * self.vae.config.scaling_factor
        return lat

    def decode_latents(self, latents, batch_size: int = 8):
        """latents (B, 4, F, h, w) -> pixels (B, 3, F, H, W) float32
        (reference inference.py:124-140).  On a mesh, frames decode
        embarrassingly parallel in ONE dispatch sharded over all devices
        (vae_batch_size micro-batching exists to bound single-device
        memory; sharding bounds it by devices instead)."""
        b, c, f, h, w = latents.shape
        flat = jnp.transpose(latents, (0, 2, 1, 3, 4)).reshape(
            b * f, c, h, w) / self.vae.config.scaling_factor
        n_dev = 1 if self.mesh is None else int(np.prod(
            [self.mesh.shape[a] for a in ("dp", "sp")]))
        if n_dev > 1 and flat.shape[0] % n_dev == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(self.mesh, P(("dp", "sp")))
            # vae_batch_size is a PER-DEVICE memory bound; on a mesh the
            # dispatch covers n_dev frames at once, so chunk at
            # n_dev * batch_size (every chunk stays divisible by n_dev,
            # so the sharding lays out evenly).  Without this, coalesced
            # multi-request batches make per-device decode size B*F/n_dev,
            # which can OOM at geometries the unsharded path handles.
            chunk = n_dev * max(1, batch_size)
            outs = []
            for i in range(0, flat.shape[0], chunk):
                part = jax.device_put(flat[i:i + chunk], sharding)
                outs.append(self._vae_decode(self.vae_params, part))
        else:
            outs = [self._vae_decode(self.vae_params, flat[i:i + batch_size])
                    for i in range(0, flat.shape[0], batch_size)]
        px = jnp.concatenate(outs, axis=0)
        px = px.reshape(b, f, *px.shape[1:]).transpose(0, 2, 1, 3, 4)
        return px.astype(jnp.float32)

    # -- sampling --------------------------------------------------------------
    def __call__(self, prompt, width: int = 256, height: int = 256,
                 num_frames: int = 16, num_inference_steps: int = 25,
                 guidance_scale: float = 9.0, negative_prompt=None,
                 seed: int = 0, vae_batch_size: int = 8,
                 solver_order: int = 2, jit_sampler: bool = True):
        """Full-window sampling; returns uint8 frames list per batch item
        (diffusers pipeline .frames equivalent).

        jit_sampler compiles the WHOLE denoise loop as one lax.scan (one
        device dispatch per video) -- the TPU-native replacement for the
        reference's host-side per-timestep loop."""
        rng = jax.random.PRNGKey(seed)
        do_cfg = guidance_scale > 1.0
        embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch = embeds.shape[0] // 2 if do_cfg else embeds.shape[0]

        scheduler = DPMSolverMultistepScheduler(self.scheduler_config,
                                                solver_order=solver_order)
        timesteps = scheduler.set_timesteps(num_inference_steps)
        shape = (batch, self.unet.config.in_channels, num_frames,
                 height // self.vae_scale_factor,
                 width // self.vae_scale_factor)
        rng, key = jax.random.split(rng)
        latents = jax.random.normal(key, shape, dtype=jnp.float32)
        state = scheduler.init_state(shape)

        if jit_sampler:
            latents = self._scan_sample(scheduler, latents, state, embeds,
                                        timesteps, float(guidance_scale),
                                        do_cfg)
        else:
            for i, t in enumerate(timesteps):
                latent_in = (jnp.concatenate([latents] * 2)
                             if do_cfg else latents)
                noise_pred = self._unet_apply(
                    self.unet_params, latent_in,
                    jnp.full((latent_in.shape[0],), t), embeds)
                if do_cfg:
                    uncond, text = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance_scale * (text - uncond)
                latents, state = scheduler.step(noise_pred, i, latents,
                                                state)

        video = self.decode_latents(latents, batch_size=vae_batch_size)
        return self.postprocess(video)

    def _scan_sample(self, scheduler, latents, state, embeds, timesteps,
                     guidance_scale: float, do_cfg: bool):
        """The full denoise loop as one jitted lax.scan (module-level jit:
        cached across calls/pipeline instances with the same unet config)."""
        coeffs = scheduler.scan_coeffs()
        ts = jnp.asarray(timesteps, jnp.int32)
        unet_batch = latents.shape[0] * (2 if do_cfg else 1)
        latents, embeds = self.place_sampler_inputs(latents, embeds)
        return _scan_denoise(
            self.unet_params, latents, state, embeds,
            jnp.float32(guidance_scale), ts, coeffs, unet=self.unet,
            prediction_type=scheduler.config.prediction_type,
            solver_order=scheduler.solver_order, cfg=do_cfg,
            act_sharding=self.sampler_sharding(unet_batch,
                                               latents.shape[2]))

    @staticmethod
    def postprocess(video) -> List[np.ndarray]:
        """(B, C, F, H, W) [-1,1] -> list of (F, H, W, C) uint8."""
        video = np.asarray(jnp.clip(video, -1, 1))
        video = ((video + 1.0) * 127.5).astype(np.uint8)
        return [v.transpose(1, 2, 3, 0) for v in video]
