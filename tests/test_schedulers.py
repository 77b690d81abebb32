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

import jax
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
    for kind in ("lms", "euler", "euler_ancestral", "ddim", "pndm",
                 "dpmpp_2m", "dpmpp_2m_sde", "heun", "unipc", "lcm"):
        sch = make_scheduler(kind).set_timesteps(5)
        assert sch.sigmas.shape == (sch.num_steps + 1,), kind
        assert float(sch.sigma(jnp.int32(0))) > 0, kind


def _reference_plms_trajectory(num_steps, eps_fn, x0, cfg=SchedulerConfig()):
    """Stateful PLMS re-derivation (the diffusers skip_prk update rule)."""
    betas = make_betas(cfg)
    ac = np.cumprod(1.0 - betas)
    ratio = cfg.num_train_timesteps // num_steps
    base = (np.arange(num_steps) * ratio).round().astype(np.int64) + cfg.steps_offset
    plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
    final_alpha = ac[0]

    def get_prev(sample, t, t_prev, eps):
        a_t = ac[t]
        a_prev = ac[t_prev] if t_prev >= 0 else final_alpha
        sc = np.sqrt(a_prev / a_t)
        denom = a_t * np.sqrt(1 - a_prev) + np.sqrt(a_t * (1 - a_t) * a_prev)
        return sc * sample - (a_prev - a_t) * eps / denom

    ets, cur, x = [], None, x0
    for counter, t in enumerate(plms):
        eps = eps_fn(counter)
        t_prev = t - ratio
        if counter != 1:
            ets = ets[-3:] + [eps]
        else:
            t_prev = t
            t = t + ratio
        if len(ets) == 1 and counter == 0:
            ep, cur = eps, x
        elif len(ets) == 1 and counter == 1:
            ep, x = (eps + ets[-1]) / 2, cur
        elif len(ets) == 2:
            ep = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            ep = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            ep = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24
        x = get_prev(x, int(t), int(t_prev), ep)
    return x


def test_pndm_scan_matches_reference_math(rng):
    num_steps = 7
    shape = (1, 4, 4, 2)
    x0 = rng.standard_normal(shape).astype(np.float32)
    eps_seq = [rng.standard_normal(shape).astype(np.float32) * 0.1
               for _ in range(num_steps + 1)]

    sch = make_scheduler("pndm").set_timesteps(num_steps)
    assert sch.num_steps == num_steps + 1  # duplicated warmup timestep
    x = jnp.asarray(x0)
    state = sch.init_state(shape, jnp.float32)
    for i in range(sch.num_steps):
        x, state = sch.step(jnp.asarray(eps_seq[i]), jnp.int32(i), x, state)

    want = _reference_plms_trajectory(num_steps, lambda i: eps_seq[i], x0)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-4)


def test_pndm_end_to_end():
    from pww_tpu import PwwPipeline
    from pww_tpu.config import SDModelConfig

    pipe = PwwPipeline(config=SDModelConfig.tiny(), scheduler="pndm")
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=3, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_dpmpp_2m_exact_for_constant_x0(rng):
    """DPM-Solver++ is an exponential integrator: if the model's implied x0 is
    constant, the update is EXACT — the trajectory must land on
    alpha_N*x0 + sigma_N*c for any noise direction c."""
    sch = make_scheduler("dpmpp_2m").set_timesteps(8)
    shape = (1, 4, 4, 2)
    x0 = rng.standard_normal(shape).astype(np.float32)
    c = rng.standard_normal(shape).astype(np.float32)

    a0 = np.sqrt(float(sch.alphas_cumprod_t[0]))
    s0 = np.sqrt(1 - float(sch.alphas_cumprod_t[0]))
    x = jnp.asarray(a0 * x0 + s0 * c)
    state = sch.init_state(shape, jnp.float32)
    for i in range(sch.num_steps):
        a_i = np.sqrt(float(sch.alphas_cumprod_t[i]))
        s_i = np.sqrt(1 - float(sch.alphas_cumprod_t[i]))
        eps = (np.asarray(x) - a_i * x0) / s_i  # implied eps for constant x0
        x, state = sch.step(jnp.asarray(eps), jnp.int32(i), x, state)

    a_n = np.sqrt(float(sch.alphas_cumprod_prev[-1]))
    s_n = np.sqrt(1 - float(sch.alphas_cumprod_prev[-1]))
    np.testing.assert_allclose(np.asarray(x), a_n * x0 + s_n * c,
                               atol=1e-4, rtol=1e-4)


def test_dpmpp_2m_end_to_end():
    from pww_tpu import PwwPipeline
    from pww_tpu.config import SDModelConfig

    pipe = PwwPipeline(config=SDModelConfig.tiny(), scheduler="dpmpp_2m")
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=4, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_ddim_set_alpha_to_one_knob():
    """set_alpha_to_one=True (diffusers bare-constructor default, what the
    reference's DDIMScheduler() gets) clamps the final a_prev to 1.0;
    False (SD checkpoint scheduler_config.json) clamps to alpha_bar[0] —
    only the LAST step's update may differ."""
    on = make_scheduler("ddim").set_timesteps(5)
    off = make_scheduler(
        "ddim", SchedulerConfig(set_alpha_to_one=False)
    ).set_timesteps(5)
    np.testing.assert_array_equal(
        np.asarray(on.alphas_cumprod_prev[:-1]),
        np.asarray(off.alphas_cumprod_prev[:-1]),
    )
    assert float(on.alphas_cumprod_prev[-1]) == 1.0
    a0 = float(off.alphas_cumprod_prev[-1])
    assert 0.99 < a0 < 1.0 and a0 != 1.0

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 4)),
                    jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 4, 4)),
                      jnp.float32)
    st = on.init_state(x.shape, jnp.float32)
    for i in range(4):
        same_on, _ = on.step(eps, jnp.int32(i), x, st)
        same_off, _ = off.step(eps, jnp.int32(i), x, st)
        np.testing.assert_array_equal(np.asarray(same_on), np.asarray(same_off))
    last_on, _ = on.step(eps, jnp.int32(4), x, st)
    last_off, _ = off.step(eps, jnp.int32(4), x, st)
    assert np.abs(np.asarray(last_on) - np.asarray(last_off)).max() > 0


def _sigma_trajectory(num_steps, cfg=SchedulerConfig()):
    betas = (np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5,
                         cfg.num_train_timesteps) ** 2)
    ac = np.cumprod(1.0 - betas)
    full = np.sqrt((1 - ac) / ac)
    ts = np.linspace(0, cfg.num_train_timesteps - 1, num_steps)[::-1]
    return np.interp(ts, np.arange(cfg.num_train_timesteps), full)


def test_heun_matches_reference_loop():
    """Scan-form Heun must match a literal k-diffusion sample_heun loop
    (Euler predictor + trapezoidal corrector, Euler-only final step)."""
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)

    def eps_fn(x, sigma):  # synthetic, smooth in (x, sigma)
        return 0.3 * x / np.sqrt(sigma**2 + 1.0) + 0.05 * sigma

    num_steps = 6
    sig = np.concatenate([_sigma_trajectory(num_steps), [0.0]])
    want = x0 * sig[0]
    for i in range(num_steps):
        s, sn = sig[i], sig[i + 1]
        d = eps_fn(want, s)
        x2 = want + d * (sn - s)
        if sn > 0:
            d2 = eps_fn(x2, sn)
            want = want + 0.5 * (d + d2) * (sn - s)
        else:
            want = x2

    sch = make_scheduler("heun").set_timesteps(num_steps)
    assert sch.num_steps == 2 * num_steps - 1
    x = jnp.asarray(x0) * sch.init_noise_sigma
    st = sch.init_state(x.shape, jnp.float32)
    for i in range(sch.num_steps):
        eps = eps_fn(np.asarray(x), float(sch.sigmas[i]))
        x, st = sch.step(jnp.asarray(eps), jnp.int32(i), x, st)
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-5, atol=1e-5)


def test_heun_is_second_order_vs_euler():
    """On a linear ODE with known solution, Heun at N steps must beat Euler
    at N steps by a clear margin (2nd vs 1st order accuracy)."""
    x0 = np.full((1, 2, 2, 1), 1.7, np.float32)

    def eps_fn(x, sigma):  # dx/dsigma = sigma -> x(0) = x(smax) - smax^2/2
        return np.full_like(x, sigma)

    def run(kind, n):
        sch = make_scheduler(kind).set_timesteps(n)
        x = jnp.asarray(x0) * sch.init_noise_sigma
        st = sch.init_state(x.shape, jnp.float32)
        for i in range(sch.num_steps):
            eps = eps_fn(np.asarray(x), float(sch.sigmas[i]))
            x, st = sch.step(jnp.asarray(eps), jnp.int32(i), x, st)
        return np.asarray(x)

    s_max = float(make_scheduler("euler").set_timesteps(8).init_noise_sigma)
    exact = x0 * s_max - s_max**2 / 2.0
    err_euler = np.abs(run("euler", 8) - exact).max()
    err_heun = np.abs(run("heun", 8) - exact).max()
    assert err_heun < err_euler / 3, (err_heun, err_euler)


def test_karras_sigmas_spacing():
    cfg = SchedulerConfig(use_karras_sigmas=True)
    sch = make_scheduler("euler", cfg).set_timesteps(10)
    sig = np.asarray(sch.sigmas)[:-1]
    lin = _sigma_trajectory(10)
    # same endpoints, different interior spacing, monotone decreasing
    np.testing.assert_allclose(sig[0], lin[0], rtol=1e-5)
    np.testing.assert_allclose(sig[-1], lin[-1], rtol=1e-5)
    assert (np.diff(sig) < 0).all()
    assert np.abs(sig[1:-1] - lin[1:-1]).max() > 0.1
    ts = np.asarray(sch.timesteps)
    assert (ts[:-1] > ts[1:]).all() and ts.min() >= 0 and ts.max() <= 999
    # LMS coefficients recompute from the Karras sigmas without error
    sch_lms = make_scheduler("lms", cfg).set_timesteps(10)
    assert np.isfinite(np.asarray(sch_lms.lms_coeffs)).all()


def test_heun_pipeline_end_to_end():
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import PwwPipeline

    pipe = PwwPipeline(config=SDModelConfig.tiny(), scheduler="heun")
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=3, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def _run_alpha_space(kind, n, x_init, x0_fn):
    """Drive an alpha-space scheduler with a synthetic x0-prediction model."""
    sch = make_scheduler(kind).set_timesteps(n)
    x = jnp.asarray(x_init, jnp.float32)
    st = sch.init_state(x.shape, jnp.float32)
    for i in range(sch.num_steps):
        a = float(sch.alphas_cumprod_t[i])
        m = x0_fn(np.asarray(x))
        eps = (np.asarray(x) - np.sqrt(a) * m) / np.sqrt(1.0 - a)
        x, st = sch.step(jnp.asarray(eps, jnp.float32), jnp.int32(i), x, st)
    return np.asarray(x)


def test_unipc_exact_for_constant_x0():
    """Exponential integrators are EXACT when the x0 prediction is constant —
    2 UniPC steps must land where 64 do (validates every coefficient sign)."""
    x0 = np.full((1, 3, 3, 2), 0.37, np.float32)
    x_init = np.random.default_rng(0).standard_normal((1, 3, 3, 2)).astype(np.float32)

    def const_model(x):
        return x0

    few = _run_alpha_space("unipc", 2, x_init, const_model)
    many = _run_alpha_space("unipc", 64, x_init, const_model)
    np.testing.assert_allclose(few, many, rtol=1e-4, atol=1e-5)


def test_unipc_converges_to_ode_solution():
    """UniPC-2 and DPM-Solver++ 2M integrate the same probability-flow ODE
    over the same trajectory family. With ``final_sigmas_type="zero"``
    (diffusers default) the output is the t_min x0 prediction and t_min
    shrinks with N, so the error vs a dense-step reference has two
    components: the SOLVER error (2nd order — measured solver-vs-solver at
    matched N, where the endpoint cancels exactly) and the endpoint drift
    of this toy model's ever-changing x0 prediction (decays slowly by
    construction — real denoisers' x0 output is nearly constant at low t,
    which is why diffusers defaults to the zero-final-sigma jump)."""
    rng = np.random.default_rng(1)
    x_init = rng.standard_normal((1, 4, 4, 1)).astype(np.float32)

    def model(x):  # smooth nonlinear x0 prediction
        return np.tanh(x)

    # 500 steps: dense but below the 1000-train-timestep grid (a denser
    # linspace would duplicate integer timesteps -> degenerate h=0 steps)
    ref = _run_alpha_space("dpmpp_2m", 500, x_init, model)
    scale = np.abs(ref).mean()
    solver_err, end_err = {}, {}
    for n in (4, 16, 64):
        u = _run_alpha_space("unipc", n, x_init, model)
        d = _run_alpha_space("dpmpp_2m", n, x_init, model)
        solver_err[n] = np.abs(u - d).max()
        end_err[n] = np.abs(u - ref).max()
    # matched-N solver agreement: 2nd-order-like decay, tight by N=64
    assert solver_err[16] < solver_err[4] / 3, solver_err
    assert solver_err[64] < solver_err[16] / 3, solver_err
    assert solver_err[64] < 1e-3 * scale, (solver_err, scale)
    # endpoint drift decays monotonically toward the dense reference
    assert end_err[16] < end_err[4] and end_err[64] < end_err[16], end_err
    assert end_err[64] < 0.2 * scale, (end_err, scale)


def test_unipc_pipeline_end_to_end():
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import PwwPipeline

    pipe = PwwPipeline(config=SDModelConfig.tiny(), scheduler="unipc")
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=4, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_karras_spacing_for_alpha_space_solvers():
    """'DPM++ 2M Karras' / 'UniPC Karras': the alpha-space solvers follow the
    Karras sigma ramp (same endpoints, different interior spacing, fractional
    timesteps) and still converge for a constant-x0 model."""
    cfg = SchedulerConfig(use_karras_sigmas=True)
    for kind in ("dpmpp_2m", "unipc"):
        sch_k = make_scheduler(kind, cfg).set_timesteps(10)
        sch_l = make_scheduler(kind).set_timesteps(10)
        sk = np.asarray(sch_k.sigmas)[:-1]
        sl = np.asarray(sch_l.sigmas)[:-1]
        np.testing.assert_allclose(sk[0], sl[0], rtol=1e-4)
        np.testing.assert_allclose(sk[-1], sl[-1], rtol=1e-2)
        assert (np.diff(sk) < 0).all()
        assert np.abs(sk[1:-1] - sl[1:-1]).max() > 0.05, kind
        ts = np.asarray(sch_k.timesteps)
        assert (ts[:-1] > ts[1:]).all(), kind  # fractional but descending

    # exponential-integrator exactness holds on the Karras grid too
    x0 = np.full((1, 2, 2, 1), 0.4, np.float32)
    x_init = np.random.default_rng(0).standard_normal((1, 2, 2, 1)).astype(np.float32)

    def const_model(x):
        return x0

    import jax.numpy as _jnp

    def run(kind, n):
        sch = make_scheduler(kind, cfg).set_timesteps(n)
        x = _jnp.asarray(x_init)
        st = sch.init_state(x.shape, _jnp.float32)
        for i in range(sch.num_steps):
            a = float(sch.alphas_cumprod_t[i])
            eps = (np.asarray(x) - np.sqrt(a) * x0) / np.sqrt(1 - a)
            x, st = sch.step(_jnp.asarray(eps, _jnp.float32), _jnp.int32(i), x, st)
        return np.asarray(x)

    for kind in ("dpmpp_2m", "unipc"):
        np.testing.assert_allclose(run(kind, 3), run(kind, 48),
                                   rtol=2e-4, atol=2e-5, err_msg=kind)


def _reference_lcm_trajectory(num_steps, eps_fn, x_init, noises,
                              cfg=SchedulerConfig()):
    """Stateful python replica of diffusers LCMScheduler.step semantics
    (Luo et al. 2023): x0 from eps, consistency boundary scalings
    c_skip/c_out at the scaled timestep, ancestral re-noising with the given
    per-step noise except at the final step."""
    betas = make_betas(cfg)
    ac = np.cumprod(1.0 - betas)
    k = cfg.num_train_timesteps // cfg.original_inference_steps
    origin = np.arange(1, cfg.original_inference_steps + 1) * k - 1
    skip = len(origin) // num_steps
    ts = origin[::-1][::skip][:num_steps]

    x = np.asarray(x_init, np.float64)
    for i, t in enumerate(ts):
        a_t = ac[t]
        a_prev = ac[ts[i + 1]] if i + 1 < num_steps else None
        eps = eps_fn(i)
        x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        st = cfg.timestep_scaling * t
        c_skip = cfg.sigma_data**2 / (st**2 + cfg.sigma_data**2)
        c_out = st / np.sqrt(st**2 + cfg.sigma_data**2)
        denoised = c_out * x0 + c_skip * x
        if a_prev is None:
            x = denoised
        else:
            x = np.sqrt(a_prev) * denoised + np.sqrt(1 - a_prev) * noises[i]
    return x


def test_lcm_scan_matches_reference_math(rng):
    import jax

    num_steps = 4
    shape = (2, 3)
    eps_seq = [rng.standard_normal(shape) for _ in range(num_steps)]
    x_init = rng.standard_normal(shape)

    sch = make_scheduler("lcm").set_timesteps(num_steps)
    assert sch.needs_rng
    x = jnp.asarray(x_init, jnp.float32)
    st = sch.init_state(x.shape, jnp.float32)
    noises = []
    for i in range(num_steps):
        key = jax.random.PRNGKey(100 + i)
        noises.append(np.asarray(jax.random.normal(key, shape, jnp.float32)))
        x, st = sch.step(
            jnp.asarray(eps_seq[i], jnp.float32), jnp.int32(i), x, st, rng=key
        )
    want = _reference_lcm_trajectory(
        num_steps, lambda i: eps_seq[i], x_init, noises
    )
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-5)


def test_lcm_timestep_grid():
    """Timesteps come from the teacher's original_inference_steps DDIM grid."""
    sch = make_scheduler("lcm").set_timesteps(4)
    # k = 1000/50 = 20; descending grid 999, 979, ...; skip = 50//4 = 12
    np.testing.assert_array_equal(
        np.asarray(sch.timesteps), [999.0, 759.0, 519.0, 279.0]
    )
    with pytest.raises(ValueError, match="original_inference_steps"):
        make_scheduler("lcm").set_timesteps(51)


def test_lcm_pipeline_end_to_end():
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import PwwPipeline

    pipe = PwwPipeline(config=SDModelConfig.tiny(), scheduler="lcm")
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=4, guidance_scale=1.0, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_lcm_distilled_guidance_embedding_pipeline(tmp_path):
    """time_cond_proj_dim: the guidance scale becomes a UNet input (folded
    CFG), the external combine is neutralized, and the knob round-trips
    through save/load."""
    import dataclasses

    import jax
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import (PwwPipeline,
                                           guidance_scale_embedding)

    base = SDModelConfig.tiny()
    cfg = dataclasses.replace(
        base, unet=dataclasses.replace(base.unet, time_cond_proj_dim=32)
    )
    pipe = PwwPipeline(config=cfg, scheduler="lcm")
    # cond_proj params exist
    flat = jax.tree_util.tree_flatten_with_path(pipe.params["unet"])[0]
    assert any(
        "cond_proj" in str(kp) for kp, _ in flat
    ), "guidance cond_proj missing from param tree"

    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kwargs = dict(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=4, seed=0, output_type="np",
    )
    out_w8 = pipe.generate(guidance_scale=8.0, **kwargs)
    out_w2 = pipe.generate(guidance_scale=2.0, **kwargs)
    assert out_w8.shape == (1, 64, 64, 3)
    # w reaches the model: different embedded guidance -> different image
    assert not np.array_equal(out_w8, out_w2)

    d = str(tmp_path / "lcm_ckpt")
    pipe.save_pretrained(d)
    pipe2 = PwwPipeline.from_pretrained(d, scheduler="lcm")
    assert pipe2.config.unet.time_cond_proj_dim == 32
    np.testing.assert_array_equal(out_w8, pipe2.generate(guidance_scale=8.0, **kwargs))

    # embedding layout: sin block then cos block, dim respected
    emb = np.asarray(guidance_scale_embedding(8.0, 32))
    assert emb.shape == (32,)
    w = (8.0 - 1.0) * 1000.0
    np.testing.assert_allclose(emb[0], np.sin(w), rtol=1e-5)
    np.testing.assert_allclose(emb[16], np.cos(w), rtol=1e-5)


# ---------------------------------------------------------------------------
# DPM++ 2M SDE (diffusers algorithm_type="sde-dpmsolver++", midpoint)
# ---------------------------------------------------------------------------


def test_dpmpp_2m_sde_coefficient_identities():
    """The SDE tables must satisfy the exact OU-transition identities:
    mean lands on alpha_next (x_coeff*a_t + d_coeff == a_next at first order)
    and variance is preserved ((x_coeff*s_t)^2 + n_coeff^2 == s_next^2)."""
    sch = make_scheduler("dpmpp_2m_sde").set_timesteps(9)
    tab = sch.pndm_tables
    a_t = np.asarray(tab["alpha_t"])
    s_t = np.asarray(tab["sigma_t"])
    a_n = np.sqrt(np.asarray(sch.alphas_cumprod_prev))
    s_n = np.sqrt(1.0 - np.asarray(sch.alphas_cumprod_prev))
    x_c = np.asarray(tab["x_coeff"])
    d_c = np.asarray(tab["d_coeff"])
    n_c = np.asarray(tab["n_coeff"])
    np.testing.assert_allclose(x_c * a_t + d_c, a_n, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        (x_c * s_t) ** 2 + n_c ** 2, s_n ** 2, rtol=1e-5, atol=1e-6
    )


def _sde_dpmpp_replica_trajectory(sch, eps_fn, x_init, noise_fn):
    """Stateful re-derivation of diffusers DPMSolverMultistepScheduler with
    algorithm_type="sde-dpmsolver++", solver_type="midpoint", order 2,
    lower_order_final — coefficients recomputed per step from the alpha
    trajectory (independent of the Schedule's precomputed tables)."""
    ac_t = np.asarray(sch.alphas_cumprod_t, np.float64)
    ac_n = np.asarray(sch.alphas_cumprod_prev, np.float64)
    n = sch.num_steps
    x = np.asarray(x_init, np.float64)
    m_prev = None
    h_prev = None
    for i in range(n):
        a_t, s_t = np.sqrt(ac_t[i]), np.sqrt(1 - ac_t[i])
        a_n, s_n = np.sqrt(ac_n[i]), np.sqrt(1 - ac_n[i])
        lam_t = np.log(a_t) - np.log(s_t)
        lam_n = np.log(a_n) - np.log(s_n)
        h = lam_n - lam_t
        eps = eps_fn(x, i)
        m0 = (x - s_t * eps) / a_t
        if m_prev is None or i == n - 1:
            d = m0  # first order: no history / lower_order_final
        else:
            r0 = h_prev / h
            d1 = (m0 - m_prev) / r0
            d = m0 + 0.5 * d1  # midpoint
        z = noise_fn(i)
        x = (
            (s_n / s_t) * np.exp(-h) * x
            + a_n * (1.0 - np.exp(-2.0 * h)) * d
            + s_n * np.sqrt(1.0 - np.exp(-2.0 * h)) * z
        )
        m_prev, h_prev = m0, h
    return x


def test_dpmpp_2m_sde_matches_diffusers_replica(rng):
    sch = make_scheduler("dpmpp_2m_sde").set_timesteps(7)
    shape = (1, 4, 4, 2)
    x0 = rng.standard_normal(shape).astype(np.float32)

    def eps_fn(x, i):
        # a fixed-x0 model keeps the trajectory smooth and well-conditioned
        a_i = np.sqrt(float(sch.alphas_cumprod_t[i]))
        s_i = np.sqrt(1 - float(sch.alphas_cumprod_t[i]))
        return (np.asarray(x, np.float64) - a_i * x0) / s_i

    base = jax.random.PRNGKey(3)

    def noise_fn(i):
        return np.asarray(
            jax.random.normal(jax.random.fold_in(base, i), shape, jnp.float32),
            np.float64,
        )

    x_init = rng.standard_normal(shape).astype(np.float32)
    want = _sde_dpmpp_replica_trajectory(sch, eps_fn, x_init, noise_fn)

    x = jnp.asarray(x_init)
    state = sch.init_state(shape, jnp.float32)
    for i in range(sch.num_steps):
        eps = jnp.asarray(eps_fn(np.asarray(x), i), jnp.float32)
        x, state = sch.step(
            eps, jnp.int32(i), x, state, rng=jax.random.fold_in(base, i)
        )
    np.testing.assert_allclose(np.asarray(x), want, atol=5e-4, rtol=5e-4)


def test_dpmpp_2m_sde_pipeline_end_to_end():
    from pww_tpu import PwwPipeline
    from pww_tpu.config import SDModelConfig

    pipe = PwwPipeline(config=SDModelConfig.tiny(), scheduler="dpmpp_2m_sde")
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kw = dict(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=4, output_type="np",
    )
    a = np.asarray(pipe.generate(seed=0, **kw))
    a2 = np.asarray(pipe.generate(seed=0, **kw))
    b = np.asarray(pipe.generate(seed=1, **kw))
    assert a.shape == (1, 64, 64, 3)
    np.testing.assert_array_equal(a, a2)  # deterministic under fixed seed
    assert not np.array_equal(a, b)


def test_dpmpp_2m_sde_karras_spacing_runs():
    sch = make_scheduler(
        "dpmpp_2m_sde", SchedulerConfig(use_karras_sigmas=True)
    ).set_timesteps(6)
    s = np.asarray(sch.sigmas)[:-1]
    assert (np.diff(s) < 0).all()  # strictly decreasing Karras ramp


def test_alpha_trajectory_diffusers_spacing_no_degenerate_final_step():
    """dpmpp_2m/unipc spacing must match diffusers
    (linspace(0, T-1, N+1).round()[::-1][:-1]): keeping t=0 as the last
    timestep makes the final step h=0 — an identity update that discards
    one UNet eval per image and parks lower_order_final on a no-op."""
    for kind in ("dpmpp_2m", "dpmpp_2m_sde", "unipc"):
        sch = make_scheduler(kind).set_timesteps(8)
        ts = np.asarray(sch.timesteps)
        np.testing.assert_array_equal(
            ts, [999, 874, 749, 624, 500, 375, 250, 125]
        )
        ac = np.asarray(sch.alphas_cumprod_t)
        ac_next = np.asarray(sch.alphas_cumprod_prev)
        # every step advances: next alpha strictly above current alpha
        assert (ac_next > ac + 1e-9).all(), (kind, ac_next - ac)


def test_dpmpp_2m_final_step_is_not_identity(rng):
    sch = make_scheduler("dpmpp_2m").set_timesteps(8)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    st = sch.init_state(x.shape, jnp.float32)
    eps = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    # run to the last index with arbitrary eps; the final update must move
    prev = x
    for i in range(sch.num_steps):
        prev = x
        x, st = sch.step(eps, jnp.int32(i), x, st)
    assert float(jnp.abs(x - prev).max()) > 1e-6


def test_visit_of_step_mappings():
    """Sampler-step → scan-visit mapping (prompt-editing switch points)."""
    n = 8
    pndm = make_scheduler("pndm").set_timesteps(n)
    heun = make_scheduler("heun").set_timesteps(n)
    lms = make_scheduler("lms").set_timesteps(n)
    assert [lms.visit_of_step(s) for s in (0, 1, 4, n)] == [0, 1, 4, n]
    # pndm: PLMS warmup doubles the 2nd step → N+1 visits
    assert pndm.num_steps == n + 1
    assert [pndm.visit_of_step(s) for s in (0, 1, 2, 3, n)] == [0, 1, 3, 4,
                                                               n + 1]
    ts = np.asarray(pndm.timesteps)
    assert ts[1] == ts[2]  # the doubled visit is step 1, visits 1-2
    # heun: steps 1.. run two stages → 2N-1 visits
    assert heun.num_steps == 2 * n - 1
    assert [heun.visit_of_step(s) for s in (0, 1, 2, n)] == [0, 1, 3,
                                                             2 * n - 1]
    ts = np.asarray(heun.timesteps)
    assert ts[1] == ts[2] and ts[3] == ts[4]


def test_from_pretrained_restores_saved_scheduler(tmp_path):
    """save_pretrained records scheduler_type; from_pretrained must restore
    it by default (regression: the reloaded pipeline silently reset to lms)
    while an explicit scheduler= still overrides."""
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import PwwPipeline

    pipe = PwwPipeline(config=SDModelConfig.tiny(), scheduler="ddim")
    d = str(tmp_path / "ckpt")
    pipe.save_pretrained(d)
    assert PwwPipeline.from_pretrained(d).scheduler.kind == "ddim"
    assert PwwPipeline.from_pretrained(d, scheduler="euler").scheduler.kind \
        == "euler"
