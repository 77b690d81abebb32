"""Scheduler parity tests.

The LMS trajectory is validated against an independent numpy/scipy
re-derivation of the multistep update (the same math diffusers 0.10.0
implements: integrated Lagrange coefficients over the sigma trajectory, 4-term
derivative history) so the compiled scan path provably matches the reference's
host-side scheduler.
"""
import numpy as np
import pytest
from scipy import integrate

from pww_tpu.config import SchedulerConfig
from pww_tpu.schedulers.schedules import (
    LMS_ORDER,
    Scheduler,
    make_betas,
    make_scheduler,
)

import jax.numpy as jnp


def _reference_lms_trajectory(num_steps, eps_seq, x0, cfg=SchedulerConfig()):
    """Plain numpy LMS sampler: the diffusers-0.10.0 update rule re-derived."""
    betas = make_betas(cfg)
    ac = np.cumprod(1.0 - betas)
    sig_full = np.sqrt((1 - ac) / ac)
    ts = np.linspace(0, cfg.num_train_timesteps - 1, num_steps)[::-1]
    sigmas = np.concatenate([np.interp(ts, np.arange(len(sig_full)), sig_full), [0.0]])

    x = x0 * sigmas.max()
    derivs = []
    for i in range(num_steps):
        eps = eps_seq[i]
        derivs.append(eps)
        if len(derivs) > LMS_ORDER:
            derivs.pop(0)
        order = min(i + 1, LMS_ORDER)

        def coeff(j):
            def poly(tau):
                p = 1.0
                for k in range(order):
                    if k != j:
                        p *= (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
                return p

            return integrate.quad(poly, sigmas[i], sigmas[i + 1], epsrel=1e-4)[0]

        x = x + sum(coeff(j) * d for j, d in zip(range(order), reversed(derivs)))
    return x


def test_lms_scan_matches_reference_math(rng):
    num_steps = 7
    shape = (1, 4, 4, 2)
    x0 = rng.standard_normal(shape).astype(np.float32)
    eps_seq = [rng.standard_normal(shape).astype(np.float32) * 0.1 for _ in range(num_steps)]

    sch = make_scheduler("lms").set_timesteps(num_steps)
    x = jnp.asarray(x0) * sch.init_noise_sigma
    state = sch.init_state(shape, jnp.float32)
    for i in range(num_steps):
        x, state = sch.step(jnp.asarray(eps_seq[i]), jnp.int32(i), x, state)

    want = _reference_lms_trajectory(num_steps, eps_seq, x0)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-4)


def test_lms_init_noise_sigma_matches_diffusers():
    sch = make_scheduler("lms").set_timesteps(30)
    # Known value for SD's scaled_linear schedule (diffusers LMS, 30 steps)
    assert abs(float(sch.init_noise_sigma) - 14.6146) < 1e-3


def test_scale_model_input():
    sch = make_scheduler("lms").set_timesteps(10)
    x = jnp.ones((1, 2, 2, 1))
    scaled = sch.scale_model_input(x, jnp.int32(0))
    s = float(sch.sigmas[0])
    np.testing.assert_allclose(
        np.asarray(scaled), 1.0 / np.sqrt(s * s + 1), rtol=1e-5
    )


def test_euler_step_is_first_order():
    sch = make_scheduler("euler").set_timesteps(10)
    x = jnp.ones((1, 2, 2, 1))
    eps = jnp.full((1, 2, 2, 1), 0.5)
    out, _ = sch.step(eps, jnp.int32(3), x, sch.init_state(x.shape, x.dtype))
    dt = float(sch.sigmas[4] - sch.sigmas[3])
    np.testing.assert_allclose(np.asarray(out), 1.0 + 0.5 * dt, rtol=1e-5)


def test_ddim_step_preserves_x0_when_eps_exact(rng):
    """If eps is the exact noise, DDIM must land on sqrt(a_prev)x0 + ..."""
    sch = make_scheduler("ddim").set_timesteps(10)
    x0 = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
    eps = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
    i = 4
    a_t = float(sch.alphas_cumprod_t[i])
    xt = np.sqrt(a_t) * x0 + np.sqrt(1 - a_t) * eps
    out, _ = sch.step(
        jnp.asarray(eps), jnp.int32(i), jnp.asarray(xt),
        sch.init_state(xt.shape, jnp.float32),
    )
    a_prev = float(sch.alphas_cumprod_prev[i])
    want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_add_noise_sigma_space(rng):
    sch = make_scheduler("lms").set_timesteps(10)
    x = jnp.zeros((1, 2, 2, 1))
    n = jnp.ones((1, 2, 2, 1))
    out = sch.add_noise(x, n, jnp.int32(2))
    np.testing.assert_allclose(np.asarray(out), float(sch.sigmas[2]), rtol=1e-6)


def test_all_schedulers_expose_sigmas():
    """Uniform sigma interface: the PwW weight fn works on every scheduler
    (fixes the reference's LMS-only quirk, SURVEY.md §2 quirks)."""
    for kind in ("lms", "euler", "euler_ancestral", "ddim"):
        sch = make_scheduler(kind).set_timesteps(5)
        assert sch.sigmas.shape == (6,)
        assert float(sch.sigma(jnp.int32(0))) > 0
