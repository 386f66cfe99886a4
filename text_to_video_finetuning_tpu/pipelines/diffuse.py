"""Windowed round-robin long-video denoising.

Behavioral spec: `diffuse` (reference inference.py:153-267) -- generate
num_frames >> window_size by denoising one temporal window per timestep,
carrying the DPM-Solver multistep history across windows by slicing a cached
full-length model_outputs buffer (reference inference.py:216-221,237-256),
and rotating the frame axis by a random prime each timestep so chunk borders
move (reference inference.py:197-209; primes sieve :143-150); un-rotated at
the end (:264-265).  Our scheduler keeps its history as an explicit value,
so the reference's attribute surgery becomes pure array slicing.

Also covers init-video img2img: start at round(init_weight * steps) with
add_noise-initialized latents (reference inference.py:184-192).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import functools

from ..schedulers.dpmsolver import (DPMSolverMultistepScheduler,
                                    DPMSolverState, scan_step_static)
from .text_to_video import TextToVideoSDPipeline


@functools.partial(jax.jit, static_argnames=(
    "unet", "prediction_type", "order", "window_size", "cfg",
    "act_sharding"))
def _scan_windowed_denoise(params, latents, buffer, embeds, gs, ts, coeffs,
                           shifts, lons, hist_idx, write_idx, *, unet,
                           prediction_type, order, window_size, cfg,
                           act_sharding=None):
    """The whole windowed round-robin denoise loop as ONE compiled lax.scan
    (vs the reference's nested host loops, inference.py:202-258): windows
    unroll statically inside the scan body; frame-axis rotation and the
    DPM-Solver history surgery are traced rolls/gathers."""
    num_frames = latents.shape[2]

    def body(carry, xs):
        lat, buf = carry
        t, ci, shift, lon, hidx, widx = xs
        lat = jnp.roll(lat, shift, axis=2)
        buf = jnp.roll(buf, shift, axis=3)          # (order, B, 4, F, h, w)

        new_lat = jnp.zeros_like(lat)
        new_out = jnp.zeros_like(lat)
        hist = jnp.take(buf, hidx, axis=0)          # oldest..newest
        for w0 in range(0, num_frames, window_size):
            window = lat[:, :, w0:w0 + window_size]
            st = DPMSolverState(
                model_outputs=hist[:, :, :, w0:w0 + window_size],
                lower_order_nums=lon)
            latent_in = jnp.concatenate([window] * 2) if cfg else window
            if act_sharding is not None:
                # multi-chip: CFG pair over 'dp', window frames over 'sp'
                # (see text_to_video._scan_denoise's act_sharding note)
                latent_in = jax.lax.with_sharding_constraint(latent_in,
                                                             act_sharding)
            pred = unet.apply({"params": params}, latent_in,
                              jnp.full((latent_in.shape[0],), t), embeds)
            pred = pred.astype(jnp.float32)
            if cfg:
                uncond, text = jnp.split(pred, 2, axis=0)
                pred = uncond + gs * (text - uncond)
            window, st = scan_step_static(ci, pred, window, st,
                                          prediction_type, order)
            new_lat = new_lat.at[:, :, w0:w0 + window_size].set(window)
            new_out = new_out.at[:, :, w0:w0 + window_size].set(
                st.model_outputs[-1])
        buf = jax.lax.dynamic_update_index_in_dim(buf, new_out, widx, 0)
        return (new_lat, buf), None

    (lat, _), _ = jax.lax.scan(
        body, (latents, buffer),
        (ts, coeffs, shifts, lons, hist_idx, write_idx))
    return jnp.roll(lat, -jnp.sum(shifts), axis=2)


def primes_up_to(n: int) -> np.ndarray:
    """Primes strictly below max(n, 4), as a boolean Eratosthenes sieve.

    Powers the prime-shift rotation schedule for windowed long-video
    denoising.  Behavioral parity with reference inference.py:143-150:
    that wheel sieve unconditionally prepends [2, 3], so its result for
    any n equals the primes below max(n, 4) and is never empty — the
    rotation schedule must get a non-empty shift set even at
    window_size 2."""
    bound = max(n, 4)
    is_prime = np.ones(bound, dtype=bool)
    is_prime[:2] = False
    for p in range(2, int(bound ** 0.5) + 1):
        if is_prime[p]:
            is_prime[p * p::p] = False
    return np.nonzero(is_prime)[0]


def diffuse(pipe: TextToVideoSDPipeline,
            latents: jnp.ndarray,
            init_weight: float,
            prompt: Optional[List[str]],
            negative_prompt: Optional[List[str]],
            num_inference_steps: int,
            guidance_scale: float,
            window_size: int,
            rotate: bool,
            prompt_embeds=None,
            negative_prompt_embeds=None,
            seed: int = 0,
            solver_order: int = 2,
            jit_loop: bool = True):
    """latents: (B, 4, F, h, w) init latents. Returns denoised latents.

    jit_loop compiles the whole timestep x window loop as one lax.scan
    dispatch (numerically identical to the host loop, covered by tests)."""
    rng = jax.random.PRNGKey(seed)
    do_cfg = guidance_scale > 1.0
    batch_size, _, num_frames, _, _ = latents.shape
    window_size = min(num_frames, window_size)
    if num_frames % window_size != 0:
        # real exception, not assert: CLI-reachable (t2v-inference -WS) and
        # must survive python -O; mirrors serving/server.py's validation.
        # The requirement itself is reference-faithful ("Must be divide
        # num_frames exactly!", reference inference.py:352).
        raise ValueError(
            f"window_size ({window_size}) must divide num_frames "
            f"({num_frames}) exactly")

    embeds = pipe.encode_prompt(prompt, negative_prompt, do_cfg,
                                prompt_embeds, negative_prompt_embeds)

    scheduler = DPMSolverMultistepScheduler(pipe.scheduler_config,
                                            solver_order=solver_order)
    order = scheduler.order
    all_timesteps = scheduler.set_timesteps(num_inference_steps)
    start_step = round(init_weight * len(all_timesteps))
    timesteps = all_timesteps[start_step:]
    # re-register the truncated schedule so step indices line up
    scheduler.timesteps = timesteps

    rng, key = jax.random.split(rng)
    if init_weight == 0:
        latents = jax.random.normal(key, latents.shape, latents.dtype)
    else:
        latents = scheduler.add_noise(
            latents, jax.random.normal(key, latents.shape, latents.dtype),
            np.full((), timesteps[0]))

    # full-length cache of converted model outputs, one slot per order
    model_outputs = [None] * order

    if rotate:
        rng, key = jax.random.split(rng)
        shifts = np.asarray(primes_up_to(window_size))
        shifts = shifts[np.asarray(
            jax.random.permutation(key, len(shifts)))]
        total_shift = 0

    if jit_loop:
        n = len(timesteps)
        shift_arr = np.zeros((n,), np.int32)
        if rotate:
            shift_arr = np.asarray(
                [int(shifts[i % len(shifts)]) for i in range(n)], np.int32)
        lons = np.minimum(np.arange(n), order).astype(np.int32)
        hist_idx = np.asarray(
            [[(i - 1 - o) % order for o in reversed(range(order))]
             for i in range(n)], np.int32)
        write_idx = (np.arange(n) % order).astype(np.int32)
        buffer = jnp.zeros((order,) + latents.shape, jnp.float32)
        latents, embeds = pipe.place_sampler_inputs(
            latents.astype(jnp.float32), embeds)
        unet_batch = batch_size * (2 if do_cfg else 1)
        return _scan_windowed_denoise(
            pipe.unet_params, latents, buffer, embeds,
            jnp.float32(guidance_scale), jnp.asarray(timesteps, jnp.int32),
            scheduler.scan_coeffs(), jnp.asarray(shift_arr),
            jnp.asarray(lons), jnp.asarray(hist_idx),
            jnp.asarray(write_idx), unet=pipe.unet,
            prediction_type=scheduler.config.prediction_type,
            order=order, window_size=window_size, cfg=do_cfg,
            act_sharding=pipe.sampler_sharding(unet_batch, window_size))

    for i, t in enumerate(timesteps):
        if rotate:
            shift = int(shifts[i % len(shifts)])
            model_outputs = [None if m is None
                             else jnp.roll(m, shift, axis=2)
                             for m in model_outputs]
            latents = jnp.roll(latents, shift, axis=2)
            total_shift += shift

        new_latents = jnp.zeros_like(latents)
        new_outputs = jnp.zeros_like(latents)

        for idx in range(0, num_frames, window_size):
            # scheduler history for this window: slices of the cached
            # full-length outputs, ordered oldest..newest
            # (reference inference.py:216-221)
            hist = [model_outputs[(i - 1 - o) % order]
                    for o in reversed(range(order))]
            hist = [jnp.zeros_like(latents[:, :, idx:idx + window_size])
                    if m is None else m[:, :, idx:idx + window_size]
                    for m in hist]
            state = DPMSolverState(
                model_outputs=jnp.stack(hist, axis=0),
                lower_order_nums=jnp.asarray(min(i, order), jnp.int32))

            window = latents[:, :, idx:idx + window_size]
            latent_in = (jnp.concatenate([window] * 2) if do_cfg else window)
            noise_pred = pipe._unet_apply(
                pipe.unet_params, latent_in,
                jnp.full((latent_in.shape[0],), t), embeds)
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)

            window, state = scheduler.step(noise_pred, i, window, state)

            new_latents = new_latents.at[:, :, idx:idx + window_size].set(
                window)
            new_outputs = new_outputs.at[:, :, idx:idx + window_size].set(
                state.model_outputs[-1])

        latents = new_latents
        model_outputs[i % order] = new_outputs

    if rotate:
        latents = jnp.roll(latents, -total_shift, axis=2)
    return latents
