"""Golden numerics for the DPM-Solver++ scheduler.

The reference samples with diffusers `DPMSolverMultistepScheduler`
(reference inference.py:36,71 and train.py:925-926; algorithm dpmsolver++,
solver_order 2, midpoint).  diffusers is not installed here, so the golden
is an INDEPENDENT reimplementation of the published DPM-Solver++(2M) update
written in the k-diffusion style (denoised-mixture form
`(1 + 1/(2r))*d_i - 1/(2r)*d_{i-1}`), which is algebraically equal to
diffusers' D0/D1 form but derived/coded differently -- a genuine
cross-check of schedule construction, coefficient math, warmup gating and
the lower_order_final rule, for both the host-loop `step` and the
fully-jitted `scan_step` paths.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from text_to_video_finetuning_tpu.schedulers.ddpm import (SchedulerConfig,
                                                          make_betas)
from text_to_video_finetuning_tpu.schedulers.dpmsolver import (
    DPMSolverMultistepScheduler)


def _schedule(num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012):
    # independent scaled_linear schedule (diffusers convention)
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    ac = np.cumprod(1.0 - betas)
    alpha = np.sqrt(ac)
    sigma = np.sqrt(1.0 - ac)
    lam = np.log(alpha) - np.log(sigma)
    return alpha, sigma, lam


def _timesteps(num_steps, n_train=1000):
    return (np.linspace(0, n_train - 1, num_steps + 1)
            .round()[::-1][:-1].astype(np.int64))


def ref_dpmpp(x0, model_fn, num_steps, prediction_type="epsilon", order=2):
    """Independent DPM-Solver++ (1/2M, midpoint) in k-diffusion style."""
    alpha, sigma, lam = _schedule()
    ts = _timesteps(num_steps)
    x = x0.astype(np.float64)
    old_denoised = None
    t_prev = None
    for i, t in enumerate(ts):
        m = model_fn(x, t)
        if prediction_type == "epsilon":
            denoised = (x - sigma[t] * m) / alpha[t]
        else:  # v_prediction
            denoised = alpha[t] * x - sigma[t] * m
        t_next = int(ts[i + 1]) if i + 1 < len(ts) else 0
        h = lam[t_next] - lam[t]
        first = (order == 1 or old_denoised is None
                 or (i == len(ts) - 1 and len(ts) < 15))
        if first:
            d = denoised
        else:
            r = (lam[t] - lam[t_prev]) / h
            d = (1.0 + 1.0 / (2 * r)) * denoised \
                - (1.0 / (2 * r)) * old_denoised
        x = (sigma[t_next] / sigma[t]) * x \
            - alpha[t_next] * (np.exp(-h) - 1.0) * d
        old_denoised, t_prev = denoised, t
    return x


def _model(x, t):
    # deterministic pseudo-denoiser, identical for both implementations
    return np.sin(np.asarray(x, np.float64) * 3.0 + float(t) * 0.01)


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
@pytest.mark.parametrize("num_steps", [3, 5, 25])
@pytest.mark.parametrize("order", [1, 2])
def test_step_matches_independent_impl(prediction_type, num_steps, order):
    cfg = SchedulerConfig(prediction_type=prediction_type)
    sched = DPMSolverMultistepScheduler(cfg, solver_order=order)
    ts = sched.set_timesteps(num_steps)
    np.testing.assert_array_equal(ts, _timesteps(num_steps))

    rng = np.random.RandomState(7)
    x0 = rng.randn(2, 3).astype(np.float32)

    ref = ref_dpmpp(x0, _model, num_steps, prediction_type, order)

    x = jnp.asarray(x0)
    state = sched.init_state(x.shape)
    for i, t in enumerate(ts):
        m = jnp.asarray(_model(np.asarray(x), t).astype(np.float32))
        x, state = sched.step(m, i, x, state)
    np.testing.assert_allclose(np.asarray(x), ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
def test_scan_path_matches_independent_impl(prediction_type):
    """The one-dispatch scan form uses precomputed coefficient tables
    (scan_coeffs); it must hit the same numbers."""
    num_steps = 7
    cfg = SchedulerConfig(prediction_type=prediction_type)
    sched = DPMSolverMultistepScheduler(cfg, solver_order=2)
    ts = sched.set_timesteps(num_steps)
    coeffs = sched.scan_coeffs()

    rng = np.random.RandomState(8)
    x0 = rng.randn(2, 3).astype(np.float32)
    ref = ref_dpmpp(x0, _model, num_steps, prediction_type, 2)

    x = jnp.asarray(x0)
    state = sched.init_state(x.shape)
    for i, t in enumerate(ts):
        m = jnp.asarray(_model(np.asarray(x), t).astype(np.float32))
        row = {k: v[i] for k, v in coeffs.items()}
        x, state = sched.scan_step(row, m, x, state)
    np.testing.assert_allclose(np.asarray(x), ref, atol=2e-5, rtol=1e-4)


def test_lower_order_final_only_for_short_schedules():
    """diffusers applies the final first-order step only when
    len(timesteps) < 15; at 25 steps the last step stays second order."""
    cfg = SchedulerConfig()
    sched = DPMSolverMultistepScheduler(cfg, solver_order=2)
    sched.set_timesteps(25)
    c = sched.scan_coeffs()
    first = np.asarray(c["first"])
    assert first[0] == 1.0 and not first[1:].any()

    sched.set_timesteps(10)
    c = sched.scan_coeffs()
    first = np.asarray(c["first"])
    assert first[0] == 1.0 and first[-1] == 1.0 and not first[1:-1].any()


def test_add_noise_matches_schedule():
    alpha, sigma, _ = _schedule()
    cfg = SchedulerConfig()
    sched = DPMSolverMultistepScheduler(cfg)
    rng = np.random.RandomState(9)
    x = rng.randn(2, 4).astype(np.float32)
    n = rng.randn(2, 4).astype(np.float32)
    t = np.array([10, 900])
    out = sched.add_noise(jnp.asarray(x), jnp.asarray(n), jnp.asarray(t))
    ref = alpha[t][:, None] * x + sigma[t][:, None] * n
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
