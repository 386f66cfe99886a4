"""DDPM training scheduler (functional, jit-friendly).

Behavioral spec: the diffusers `DDPMScheduler` surface the reference training
loop uses -- `add_noise` (reference train.py:760), `get_velocity`
(reference train.py:797), `num_train_timesteps` / `prediction_type` fields,
and the zero-terminal-SNR beta rescale (`enforce_zero_terminal_snr`,
reference train.py:360-389).

Everything is precomputed numpy/jnp arrays; no mutable state.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"   # or "v_prediction"
    steps_offset: int = 1
    rescale_zero_terminal_snr: bool = False


def make_betas(config: SchedulerConfig) -> np.ndarray:
    n = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, n,
                            dtype=np.float64)
    elif config.beta_schedule == "scaled_linear":
        betas = np.linspace(config.beta_start ** 0.5, config.beta_end ** 0.5,
                            n, dtype=np.float64) ** 2
    elif config.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.array([
            min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), 0.999)
            for i in range(n)], dtype=np.float64)
    else:
        raise ValueError(f"unknown beta schedule {config.beta_schedule}")
    if config.rescale_zero_terminal_snr:
        betas = enforce_zero_terminal_snr(betas)
    return betas


def enforce_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal step has zero SNR
    (arXiv:2305.08891; reference train.py:360-389)."""
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_bar)

    a0 = alphas_bar_sqrt[0].copy()
    aT = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt = alphas_bar_sqrt - aT
    alphas_bar_sqrt = alphas_bar_sqrt * a0 / (a0 - aT)

    alphas_bar = alphas_bar_sqrt ** 2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


def _extract(arr, timesteps, ndim):
    """Gather per-batch scalars and broadcast to `ndim` dims."""
    vals = arr[timesteps]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


class DDPMScheduler:
    """Functional DDPM scheduler: training-noise utilities + ancestral step."""

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        self.config = config
        self.betas = make_betas(config)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = np.cumprod(self.alphas)
        self._sqrt_acp = jnp.asarray(np.sqrt(self.alphas_cumprod),
                                     dtype=jnp.float32)
        self._sqrt_1m_acp = jnp.asarray(np.sqrt(1.0 - self.alphas_cumprod),
                                        dtype=jnp.float32)

    @property
    def num_train_timesteps(self) -> int:
        return self.config.num_train_timesteps

    @property
    def prediction_type(self) -> str:
        return self.config.prediction_type

    def rescale_betas_zero_snr(self) -> "DDPMScheduler":
        """Return a new scheduler with zero-terminal-SNR betas
        (reference train.py:689-690)."""
        return DDPMScheduler(dataclasses.replace(
            self.config, rescale_zero_terminal_snr=True))

    def add_noise(self, original_samples, noise, timesteps):
        """x_t = sqrt(a_bar_t) x_0 + sqrt(1 - a_bar_t) eps."""
        sa = _extract(self._sqrt_acp, timesteps, original_samples.ndim)
        s1 = _extract(self._sqrt_1m_acp, timesteps, original_samples.ndim)
        return (sa * original_samples + s1 * noise).astype(
            original_samples.dtype)

    def get_velocity(self, sample, noise, timesteps):
        """v = sqrt(a_bar_t) eps - sqrt(1 - a_bar_t) x_0."""
        sa = _extract(self._sqrt_acp, timesteps, sample.ndim)
        s1 = _extract(self._sqrt_1m_acp, timesteps, sample.ndim)
        return (sa * noise - s1 * sample).astype(sample.dtype)

    def training_target(self, latents, noise, timesteps):
        """Dispatch on prediction_type (reference train.py:793-800)."""
        if self.config.prediction_type == "epsilon":
            return noise
        if self.config.prediction_type == "v_prediction":
            return self.get_velocity(latents, noise, timesteps)
        raise ValueError(
            f"Unknown prediction type {self.config.prediction_type}")
