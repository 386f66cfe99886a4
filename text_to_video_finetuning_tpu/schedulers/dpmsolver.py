"""DPM-Solver++ multistep scheduler with EXPLICIT, swappable state.

Behavioral spec: diffusers `DPMSolverMultistepScheduler` (algorithm
dpmsolver++, midpoint, order 2) as used by the reference for validation
sampling (reference train.py:925-926) and inference.  Crucially, the
reference's windowed round-robin denoiser manually overwrites
`scheduler.model_outputs` and `scheduler.lower_order_nums` per window
(reference inference.py:216-221,237-256); here that state is a first-class
value (`DPMSolverState`) passed in and returned by `step`, so window surgery
is just array slicing -- no mutation, fully jit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ddpm import SchedulerConfig, make_betas


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DPMSolverState:
    """model_outputs: (order, *sample_shape) converted (x0-space) outputs of
    the previous steps, most recent LAST -- garbage-filled until
    lower_order_nums steps have run."""
    model_outputs: jnp.ndarray
    lower_order_nums: jnp.ndarray  # scalar int32

    def tree_flatten(self):
        return (self.model_outputs, self.lower_order_nums), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class DPMSolverMultistepScheduler:
    """Functional DPM-Solver++ (2M).  Usage:

        sched = DPMSolverMultistepScheduler(config)
        timesteps = sched.set_timesteps(25)
        state = sched.init_state(sample_shape)
        for i, t in enumerate(timesteps):
            eps = unet(sample, t, ...)
            sample, state = sched.step(eps, i, sample, state)
    """

    def __init__(self, config: SchedulerConfig = SchedulerConfig(),
                 solver_order: int = 2):
        self.config = config
        self.solver_order = solver_order
        self.order = solver_order
        betas = make_betas(config)
        alphas_cumprod = np.cumprod(1.0 - betas)
        self.alphas_cumprod = alphas_cumprod
        # per-train-timestep arrays, indexed by actual timestep value
        self.alpha_t = np.sqrt(alphas_cumprod)
        self.sigma_t = np.sqrt(1.0 - alphas_cumprod)
        self.lambda_t = np.log(self.alpha_t) - np.log(self.sigma_t)
        self.timesteps: Optional[np.ndarray] = None
        self.num_inference_steps: Optional[int] = None

    # -- setup ------------------------------------------------------------
    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """linspace timestep schedule (descending), diffusers-compatible."""
        n = self.config.num_train_timesteps
        timesteps = (np.linspace(0, n - 1, num_inference_steps + 1)
                     .round()[::-1][:-1].copy().astype(np.int64))
        self.timesteps = timesteps
        self.num_inference_steps = num_inference_steps
        return timesteps

    def init_state(self, sample_shape, dtype=jnp.float32) -> DPMSolverState:
        return DPMSolverState(
            model_outputs=jnp.zeros((self.solver_order,) + tuple(sample_shape),
                                    dtype=dtype),
            lower_order_nums=jnp.zeros((), dtype=jnp.int32))

    def scale_model_input(self, sample, timestep=None):
        return sample

    def add_noise(self, original_samples, noise, timesteps):
        ts = jnp.asarray(timesteps)
        sa = jnp.asarray(self.alpha_t, dtype=jnp.float32)[ts]
        s1 = jnp.asarray(self.sigma_t, dtype=jnp.float32)[ts]
        nd = original_samples.ndim - sa.ndim
        sa = sa.reshape(sa.shape + (1,) * nd)
        s1 = s1.reshape(s1.shape + (1,) * nd)
        return (sa * original_samples + s1 * noise).astype(
            original_samples.dtype)

    # -- internals ---------------------------------------------------------
    def _coeffs(self, step_index: int):
        """Python-level (static) per-step coefficients: the timestep schedule
        is host-side, so all lambda/alpha/sigma gathers fold to constants."""
        ts = self.timesteps
        t = int(ts[step_index])
        prev_t = int(ts[step_index + 1]) if step_index + 1 < len(ts) else 0
        s1_t = int(ts[step_index - 1]) if step_index >= 1 else t
        return t, prev_t, s1_t

    def convert_model_output(self, model_output, step_index: int, sample):
        """Raw model output -> x0 prediction (dpmsolver++ data-space)."""
        t, _, _ = self._coeffs(step_index)
        alpha_t, sigma_t = self.alpha_t[t], self.sigma_t[t]
        pt = self.config.prediction_type
        if pt == "epsilon":
            x0 = (sample - sigma_t * model_output) / alpha_t
        elif pt == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
        elif pt == "sample":
            x0 = model_output
        else:
            raise ValueError(f"unknown prediction type {pt}")
        return x0.astype(sample.dtype)

    # -- scan-compatible form ------------------------------------------------
    def scan_coeffs(self) -> dict:
        """Per-step coefficient arrays for a fully-jitted lax.scan sampler
        (one device dispatch for the whole denoise loop instead of a host
        Python loop).  Same math as step(); every per-step Python-int gather
        becomes an indexed array."""
        ts = self.timesteps
        n = len(ts)
        c = {k: np.zeros((n,), np.float32) for k in
             ("alpha_cur", "sigma_cur", "ratio", "alpha_h", "r0_inv",
              "first")}
        for i in range(n):
            t, prev_t, s1_t = self._coeffs(i)
            lam_t, lam_s0 = self.lambda_t[prev_t], self.lambda_t[t]
            h = lam_t - lam_s0
            c["alpha_cur"][i] = self.alpha_t[t]
            c["sigma_cur"][i] = self.sigma_t[t]
            c["ratio"][i] = self.sigma_t[prev_t] / self.sigma_t[t]
            c["alpha_h"][i] = self.alpha_t[prev_t] * (np.exp(-h) - 1.0)
            if i >= 1:
                h_0 = lam_s0 - self.lambda_t[s1_t]
                c["r0_inv"][i] = h / h_0 if h_0 != 0 else 0.0
            lower_order_final = (i == n - 1 and n < 15)
            c["first"][i] = float(self.solver_order == 1
                                  or lower_order_final or i == 0)
        return {k: jnp.asarray(v) for k, v in c.items()}

    def scan_step(self, coeffs_i: dict, model_output, sample,
                  state: DPMSolverState):
        """Jit/scan-safe step: identical math to step(), coefficients
        gathered from scan_coeffs() rows."""
        return scan_step_static(coeffs_i, model_output, sample, state,
                                self.config.prediction_type,
                                self.solver_order)

    def step(self, model_output, step_index: int, sample,
             state: DPMSolverState):
        """One solver step. `step_index` is a Python int (host loop).

        Returns (prev_sample, new_state). new_state.model_outputs[-1] is the
        converted x0 prediction of this step -- the quantity the reference's
        windowed denoiser caches (reference inference.py:253-256).
        """
        t, prev_t, s1_t = self._coeffs(step_index)
        m0 = self.convert_model_output(model_output, step_index, sample)

        # shift history: most recent last
        outputs = jnp.concatenate(
            [state.model_outputs[1:], m0[None]], axis=0)

        num_steps = len(self.timesteps)
        lower_order_final = (step_index == num_steps - 1 and num_steps < 15)

        lam_t, lam_s0 = self.lambda_t[prev_t], self.lambda_t[t]
        alpha_p, sigma_p, sigma_c = (self.alpha_t[prev_t],
                                     self.sigma_t[prev_t], self.sigma_t[t])
        h = lam_t - lam_s0

        def first_order():
            return ((sigma_p / sigma_c) * sample
                    - (alpha_p * (np.exp(-h) - 1.0)) * m0)

        def second_order():
            m1 = outputs[-2]
            lam_s1 = self.lambda_t[s1_t]
            h_0 = lam_s0 - lam_s1
            r0 = h_0 / h
            d0 = m0
            d1 = (1.0 / r0) * (m0 - m1)
            return ((sigma_p / sigma_c) * sample
                    - (alpha_p * (np.exp(-h) - 1.0)) * d0
                    - 0.5 * (alpha_p * (np.exp(-h) - 1.0)) * d1)

        if self.solver_order == 1 or lower_order_final or step_index == 0:
            # step 0 has no history (h_0 would be 0); always first order
            prev_sample = first_order()
        else:
            # warmup gating is data-dependent (the windowed denoiser sets
            # lower_order_nums per-window), so select with lax.cond
            prev_sample = jax.lax.cond(
                state.lower_order_nums < 1,
                lambda: first_order(), lambda: second_order())

        new_state = DPMSolverState(
            model_outputs=outputs,
            lower_order_nums=jnp.minimum(
                state.lower_order_nums + 1, self.solver_order))
        return prev_sample.astype(sample.dtype), new_state


def scan_step_static(coeffs_i: dict, model_output, sample,
                     state: DPMSolverState, prediction_type: str,
                     solver_order: int):
    """Free-function form of scan_step (hashable statics only), usable
    inside module-level jitted samplers without per-call recompilation."""
    a_c, s_c = coeffs_i["alpha_cur"], coeffs_i["sigma_cur"]
    if prediction_type == "epsilon":
        m0 = (sample - s_c * model_output) / a_c
    elif prediction_type == "v_prediction":
        m0 = a_c * sample - s_c * model_output
    else:
        m0 = model_output
    m0 = m0.astype(sample.dtype)

    outputs = jnp.concatenate([state.model_outputs[1:], m0[None]], axis=0)
    m1 = outputs[-2]
    d1 = coeffs_i["r0_inv"] * (m0 - m1)
    base = coeffs_i["ratio"] * sample - coeffs_i["alpha_h"] * m0
    second = base - 0.5 * coeffs_i["alpha_h"] * d1
    use_first = jnp.logical_or(coeffs_i["first"] > 0.5,
                               state.lower_order_nums < 1)
    prev_sample = jnp.where(use_first, base, second)
    new_state = DPMSolverState(
        model_outputs=outputs,
        lower_order_nums=jnp.minimum(state.lower_order_nums + 1,
                                     solver_order))
    return prev_sample.astype(sample.dtype), new_state
