"""Device-side diffusion schedulers with a uniform sigma interface.

The reference hardcodes diffusers' ``LMSDiscreteScheduler`` (reference
`paint_with_words/paint_with_words.py:197-202`) and reads
``scheduler.sigmas[step_index]`` on the host every step (reference ``:473-474``)
— which also means only sigma-based schedulers actually work there. Here every
scheduler precomputes its full trajectory host-side once (numpy/scipy) into a
static-shape pytree, so the entire denoise loop is one ``lax.scan`` with zero
host round-trips, and *every* scheduler exposes ``sigmas`` for the PwW weight
function (fixing the reference's LMS-only quirk).

Numerical parity notes:
  * betas/alphas/sigma tables match diffusers' ``scaled_linear`` schedule.
  * LMS coefficients are the integrated Lagrange polynomials computed with
    ``scipy.integrate.quad`` at setup time — bit-identical to diffusers 0.10.0,
    but they live in the compiled program as constants instead of being
    integrated per step on host.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig

LMS_ORDER = 4


def make_betas(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(
                cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    if cfg.beta_schedule == "linear":
        return np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64
        )
    raise ValueError(f"unknown beta_schedule {cfg.beta_schedule!r}")


def _lms_coefficients(sigmas: np.ndarray, num_steps: int) -> np.ndarray:
    """(num_steps, LMS_ORDER) integrated-Lagrange coefficients, zero-padded."""
    from scipy import integrate

    coeffs = np.zeros((num_steps, LMS_ORDER), dtype=np.float64)
    for t in range(num_steps):
        order = min(t + 1, LMS_ORDER)
        for j in range(order):
            def poly(tau, j=j, order=order, t=t):
                prod = 1.0
                for k in range(order):
                    if k == j:
                        continue
                    prod *= (tau - sigmas[t - k]) / (sigmas[t - j] - sigmas[t - k])
                return prod

            coeffs[t, j] = integrate.quad(
                poly, sigmas[t], sigmas[t + 1], epsrel=1e-4
            )[0]
    return coeffs


def _karras_sigmas(
    sigmas: np.ndarray, sigmas_full: np.ndarray, num_steps: int, rho: float = 7.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Karras et al. (2022) ρ-spaced sigma trajectory over the same [σ_min,
    σ_max] range, with timesteps re-derived by log-sigma interpolation
    (diffusers ``_convert_to_karras`` / ``_sigma_to_t`` semantics)."""
    s_max, s_min = float(sigmas[0]), float(sigmas[-1])
    ramp = np.linspace(0.0, 1.0, num_steps)
    new_sigmas = (
        s_max ** (1.0 / rho) + ramp * (s_min ** (1.0 / rho) - s_max ** (1.0 / rho))
    ) ** rho
    log_full = np.log(sigmas_full)
    timesteps = np.interp(
        np.log(new_sigmas), log_full, np.arange(len(sigmas_full), dtype=np.float64)
    )
    return new_sigmas, timesteps



def _step_noise(rng, sample, dtype):
    """Fresh per-step scheduler noise. ``rng`` is one key, or a (B, 2) batch
    of per-sample keys — ``generate_batch`` passes per-request keys so a
    batched row's ancestral noise is drawn from the same stream the request
    would get served alone (jax.random bits depend only on key + flat count,
    so a (h, w, c) per-row draw equals the (1, h, w, c) single-path draw)."""
    if rng.ndim == 2:
        return jax.vmap(
            lambda k: jax.random.normal(k, sample.shape[1:], dtype)
        )(rng)
    return jax.random.normal(rng, sample.shape, dtype)


class Schedule(flax.struct.PyTreeNode):
    """Static-shape scheduler trajectory + pure step functions.

    kind: "lms" | "euler" | "euler_ancestral" | "ddim" | "pndm".
    All arrays are length ``num_steps`` (sigmas: ``num_steps + 1``).
    """

    timesteps: jnp.ndarray  # (N,) float32 train-timestep per step
    sigmas: jnp.ndarray  # (N+1,) float32
    init_noise_sigma: jnp.ndarray  # scalar
    alphas_cumprod_t: jnp.ndarray  # (N,) ᾱ at each step's timestep
    alphas_cumprod_prev: jnp.ndarray  # (N,) ᾱ at the *next* (previous-noise) step
    lms_coeffs: Optional[jnp.ndarray]  # (N, LMS_ORDER) or None
    pndm_tables: Optional[dict] = None  # PLMS per-step coefficient tables
    kind: str = flax.struct.field(pytree_node=False, default="lms")
    num_steps: int = flax.struct.field(pytree_node=False, default=30)

    # -- uniform interface ---------------------------------------------------
    def visit_of_step(self, step: int) -> int:
        """Scan-visit index at which requested step ``step`` (0-based)
        begins. The denoise scan visits some steps more than once —
        pndm's doubled PLMS warmup (its 2nd step runs twice) and heun's
        two-stage steps — so anything expressed in sampler-step units
        (e.g. A1111 prompt-editing switch points) must be mapped before
        it is compared against scan indices. 1:1 for every other kind.
        ``step == N`` maps to ``num_steps`` (the end of the scan)."""
        if self.kind == "heun":
            return min(max(2 * step - 1, 0), self.num_steps)
        if self.kind == "pndm":
            return min(step if step <= 1 else step + 1, self.num_steps)
        return min(step, self.num_steps)

    @property
    def needs_rng(self) -> bool:
        """Kinds whose ``step`` draws fresh noise (pass ``rng=``)."""
        return self.kind in ("euler_ancestral", "lcm", "dpmpp_2m_sde")

    def sigma(self, i: jnp.ndarray) -> jnp.ndarray:
        return self.sigmas[i]

    def scale_model_input(self, sample: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
        if self.kind in ("lms", "euler", "euler_ancestral", "heun"):
            s = self.sigmas[i].astype(sample.dtype)
            return sample / jnp.sqrt(s * s + 1.0)
        return sample  # ddim/pndm: identity

    def to_epsilon(
        self, model_output: jnp.ndarray, sample: jnp.ndarray, i: jnp.ndarray,
        prediction_type: str = "epsilon",
    ) -> jnp.ndarray:
        """Convert a model output to epsilon convention (SD-2.x v-prediction).

        Sigma-space schedulers carry ``x = x0 + σ·ε`` samples; alpha-space
        ones carry ``x = √ᾱ·x0 + √(1−ᾱ)·ε`` — the conversion differs.
        """
        if prediction_type == "epsilon":
            return model_output
        if prediction_type != "v_prediction":
            raise ValueError(f"unknown prediction_type {prediction_type!r}")
        v = model_output.astype(jnp.float32)
        x = sample.astype(jnp.float32)
        if self.kind in ("lms", "euler", "euler_ancestral", "heun"):
            s = self.sigmas[i]
            denom = s * s + 1.0
            pred_x0 = -s * v / jnp.sqrt(denom) + x / denom
            eps = (x - pred_x0) / s
        else:
            a_t = self.alphas_cumprod_t[i]
            eps = jnp.sqrt(a_t) * v + jnp.sqrt(1.0 - a_t) * x
        return eps.astype(model_output.dtype)

    def init_state(self, shape: Tuple[int, ...], dtype) -> jnp.ndarray:
        """Scan-carried scheduler state (LMS derivative history / PLMS eps
        history + warmup sample; else empty)."""
        if self.kind == "lms":
            return jnp.zeros((LMS_ORDER,) + tuple(shape), dtype)
        if self.kind == "pndm":
            # rows 0..3 = eps history (most recent first), row 4 = cur_sample
            return jnp.zeros((5,) + tuple(shape), dtype)
        if self.kind in ("dpmpp_2m", "dpmpp_2m_sde"):
            return jnp.zeros((1,) + tuple(shape), dtype)  # previous x0
        if self.kind == "unipc":
            # rows: [x0 pred at i-1, x0 pred at i-2, corrected sample at i-1]
            return jnp.zeros((3,) + tuple(shape), dtype)
        if self.kind == "heun":
            # rows: [x at the step's start, first-visit derivative]
            return jnp.zeros((2,) + tuple(shape), dtype)
        return jnp.zeros((0,) + tuple(shape), dtype)

    def step(
        self,
        model_output: jnp.ndarray,
        i: jnp.ndarray,
        sample: jnp.ndarray,
        state: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x_t → x_{t-1}. epsilon-prediction convention throughout."""
        if self.kind == "lms":
            # derivative == eps for epsilon prediction; history most-recent-first
            state = jnp.concatenate([model_output[None], state[:-1]], axis=0)
            c = self.lms_coeffs[i].astype(sample.dtype)  # (ORDER,)
            delta = jnp.tensordot(c, state, axes=1)
            return sample + delta, state

        if self.kind == "euler":
            sig, sig_next = self.sigmas[i], self.sigmas[i + 1]
            dt = (sig_next - sig).astype(sample.dtype)
            return sample + model_output * dt, state

        if self.kind == "euler_ancestral":
            sig = self.sigmas[i]
            sig_next = self.sigmas[i + 1]
            var = sig_next**2 * (sig**2 - sig_next**2) / sig**2
            sigma_up = jnp.sqrt(jnp.maximum(var, 0.0))
            sigma_down = jnp.sqrt(jnp.maximum(sig_next**2 - sigma_up**2, 0.0))
            dt = (sigma_down - sig).astype(sample.dtype)
            prev = sample + model_output * dt
            if rng is None:
                raise ValueError("euler_ancestral requires rng")
            noise = _step_noise(rng, sample, sample.dtype)
            return prev + noise * sigma_up.astype(sample.dtype), state

        if self.kind == "pndm":
            # PLMS (pseudo linear multistep, skip_prk variant — what SD uses).
            # All per-step branching is host-precomputed into coefficient
            # tables so the device step is pure arithmetic:
            #   eps' = a[i]·eps + Σ_j c[i,j]·ets[j]   (Adams–Bashforth blend)
            #   x_prev = sc[i]·x − ad[i]·eps' / dn[i]
            tab = self.pndm_tables
            ets, cur = state[:4], state[4]
            push = tab["push"][i] > 0
            new_ets = jnp.where(
                push,
                jnp.concatenate([model_output[None], ets[:-1]], axis=0),
                ets,
            )
            new_cur = jnp.where(tab["set_cur"][i] > 0, sample, cur)
            c = tab["c"][i].astype(sample.dtype)
            eps_prime = tab["a"][i].astype(sample.dtype) * model_output + (
                jnp.tensordot(c, new_ets, axes=1)
            )
            base = jnp.where(tab["use_cur"][i] > 0, cur, sample)
            prev = (
                tab["sample_coeff"][i] * base
                - tab["alpha_diff"][i] * eps_prime / tab["denom"][i]
            ).astype(sample.dtype)
            return prev, jnp.concatenate([new_ets, new_cur[None]], axis=0)

        if self.kind == "dpmpp_2m":
            # DPM-Solver++ 2M (multistep, data-prediction). Per-step constants
            # precomputed host-side; state row 0 carries the previous x0.
            tab = self.pndm_tables  # reused table slot
            a_t = tab["alpha_t"][i]
            s_t = tab["sigma_t"][i]
            x = sample.astype(jnp.float32)
            x0 = (x - s_t * model_output.astype(jnp.float32)) / a_t
            prev_x0 = state[0].astype(jnp.float32)
            c0, c1 = tab["c0"][i], tab["c1"][i]  # blend coeffs (1st order: 1,0)
            d = c0 * x0 + c1 * prev_x0
            prev = tab["x_coeff"][i] * x + tab["d_coeff"][i] * d
            new_state = jnp.concatenate(
                [x0[None].astype(state.dtype), state[1:]], axis=0
            )
            return prev.astype(sample.dtype), new_state

        if self.kind == "dpmpp_2m_sde":
            # SDE-DPM-Solver++ 2M (midpoint noise; diffusers
            # ``algorithm_type="sde-dpmsolver++"``): the 2M data-prediction
            # blend plus an exact Ornstein–Uhlenbeck noise refresh —
            #   x_{i+1} = (σ'/σ)e^{−h}·x + α'(1−e^{−2h})·D + σ'√(1−e^{−2h})·z
            tab = self.pndm_tables
            a_t = tab["alpha_t"][i]
            s_t = tab["sigma_t"][i]
            x = sample.astype(jnp.float32)
            x0 = (x - s_t * model_output.astype(jnp.float32)) / a_t
            prev_x0 = state[0].astype(jnp.float32)
            d = tab["c0"][i] * x0 + tab["c1"][i] * prev_x0
            if rng is None:
                raise ValueError("dpmpp_2m_sde requires rng")
            noise = _step_noise(rng, sample, jnp.float32)
            prev = (
                tab["x_coeff"][i] * x
                + tab["d_coeff"][i] * d
                + tab["n_coeff"][i] * noise
            )
            new_state = jnp.concatenate(
                [x0[None].astype(state.dtype), state[1:]], axis=0
            )
            return prev.astype(sample.dtype), new_state

        if self.kind == "heun":
            # Heun's 2nd-order method (k-diffusion sample_heun / diffusers
            # HeunDiscreteScheduler): each trajectory step is TWO scan visits —
            # an Euler predictor at σ_i, then a trapezoidal corrector evaluated
            # at σ_{i+1} on the predicted sample. The final step (σ→0) is
            # Euler-only. Per-visit dt/second tables are host-precomputed.
            tab = self.pndm_tables
            dt = tab["dt"][i]
            second = tab["second"][i] > 0
            x = sample.astype(jnp.float32)
            d = model_output.astype(jnp.float32)  # d = ε for ε-prediction
            first_prev = x + d * dt
            x_orig = state[0].astype(jnp.float32)
            d1 = state[1].astype(jnp.float32)
            second_prev = x_orig + 0.5 * (d1 + d) * dt
            prev = jnp.where(second, second_prev, first_prev)
            new_state = jnp.where(
                second, state, jnp.stack([x, d]).astype(state.dtype)
            )
            return prev.astype(sample.dtype), new_state

        if self.kind == "lcm":
            # Latent Consistency Model step (Luo et al. 2023; diffusers
            # LCMScheduler semantics): map the sample to the consistency
            # function's output via the boundary-condition scalings
            #   f(x, t) = c_out(t)·x0(x, t) + c_skip(t)·x
            # then (except at the final step) re-noise the denoised estimate
            # to the next timestep's noise level with FRESH noise.
            tab = self.pndm_tables
            a_t = self.alphas_cumprod_t[i].astype(jnp.float32)
            a_prev = self.alphas_cumprod_prev[i].astype(jnp.float32)
            x = sample.astype(jnp.float32)
            eps = model_output.astype(jnp.float32)
            x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            denoised = tab["c_out"][i] * x0 + tab["c_skip"][i] * x
            if rng is None:
                raise ValueError("lcm requires rng (fresh noise per step)")
            noise = _step_noise(rng, sample, jnp.float32)
            renoised = (
                jnp.sqrt(a_prev) * denoised + jnp.sqrt(1.0 - a_prev) * noise
            )
            prev = jnp.where(tab["is_last"][i] > 0, denoised, renoised)
            return prev.astype(sample.dtype), state

        if self.kind == "ddim":
            a_t = self.alphas_cumprod_t[i].astype(jnp.float32)
            a_prev = self.alphas_cumprod_prev[i].astype(jnp.float32)
            x = sample.astype(jnp.float32)
            eps = model_output.astype(jnp.float32)
            x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
            return prev.astype(sample.dtype), state

        if self.kind == "unipc":
            # UniPC-2 (Zhao et al. 2023), x0-prediction, B(h)=e^{hh}-1 ("bh2"),
            # lower-order final step. Each scan step runs the UniC corrector
            # on the CURRENT sample (re-derived from the previous sample with
            # the new model information) and then the UniP predictor — one
            # model evaluation per step, all exponential-integrator
            # coefficients precomputed host-side.
            tab = self.pndm_tables
            x = sample.astype(jnp.float32)
            eps = model_output.astype(jnp.float32)
            a_i, s_i = tab["alpha_t"][i], tab["sigma_t"][i]
            m_raw = (x - s_i * eps) / a_i  # x0 prediction at the raw sample
            m1, m2, x_prev = (
                state[0].astype(jnp.float32),
                state[1].astype(jnp.float32),
                state[2].astype(jnp.float32),
            )
            # --- corrector (skipped at step 0 via zeroed tables + where) ----
            d1_hist = (m2 - m1) * tab["c_inv_r"][i]
            x_c_base = tab["c_ratio"][i] * x_prev - a_i * tab["c_hphi1"][i] * m1
            x_c = x_c_base - a_i * tab["c_bh"][i] * (
                tab["c_rho_hist"][i] * d1_hist
                + tab["c_rho_new"][i] * (m_raw - m1)
            )
            x = jnp.where(tab["use_corr"][i] > 0, x_c, x)
            m = (x - s_i * eps) / a_i  # x0 re-derived at the corrected sample
            # --- predictor to the next step ---------------------------------
            d1_p = (m1 - m) * tab["p_inv_r"][i]
            prev = (
                tab["p_ratio"][i] * x
                - tab["p_alpha_next"][i] * tab["p_hphi1"][i] * m
                - tab["p_alpha_next"][i] * tab["p_bh"][i] * tab["p_rho"][i] * d1_p
            )
            new_state = jnp.stack([m, m1, x]).astype(state.dtype)
            return prev.astype(sample.dtype), new_state

        raise ValueError(f"unknown scheduler kind {self.kind!r}")

    def pred_x0(
        self, eps: jnp.ndarray, sample: jnp.ndarray, i: jnp.ndarray
    ) -> jnp.ndarray:
        """The denoised estimate implied by an epsilon prediction at step i
        (inverse of :meth:`add_noise` — sigma-space x = x0 + σ·ε, alpha-space
        x = √ᾱ·x0 + √(1−ᾱ)·ε)."""
        x = sample.astype(jnp.float32)
        e = eps.astype(jnp.float32)
        if self.kind in ("lms", "euler", "euler_ancestral", "heun"):
            return x - self.sigmas[i] * e
        a_t = self.alphas_cumprod_t[i]
        return (x - jnp.sqrt(1.0 - a_t) * e) / jnp.sqrt(a_t)

    def add_noise(
        self, original: jnp.ndarray, noise: jnp.ndarray, i: jnp.ndarray
    ) -> jnp.ndarray:
        if self.kind in ("lms", "euler", "euler_ancestral", "heun"):
            return original + noise * self.sigmas[i].astype(original.dtype)
        a_t = self.alphas_cumprod_t[i].astype(jnp.float32)
        return (
            jnp.sqrt(a_t) * original.astype(jnp.float32)
            + jnp.sqrt(1.0 - a_t) * noise.astype(jnp.float32)
        ).astype(original.dtype)


@dataclasses.dataclass(frozen=True)
class Scheduler:
    """Host-side factory: config + kind → per-call :class:`Schedule`."""

    config: SchedulerConfig = SchedulerConfig()
    kind: str = "lms"

    def set_timesteps(self, num_steps: int) -> Schedule:
        cfg = self.config
        betas = make_betas(cfg)
        alphas_cumprod = np.cumprod(1.0 - betas)
        sigmas_full = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)

        if self.kind in ("lms", "euler", "euler_ancestral", "heun"):
            timesteps = np.linspace(
                0, cfg.num_train_timesteps - 1, num_steps, dtype=np.float64
            )[::-1].copy()
            sigmas = np.interp(
                timesteps, np.arange(cfg.num_train_timesteps), sigmas_full
            )
            if cfg.use_karras_sigmas:
                sigmas, timesteps = _karras_sigmas(sigmas, sigmas_full, num_steps)
            if self.kind == "heun":
                return self._set_timesteps_heun(
                    sigmas, timesteps, alphas_cumprod
                )
            sigmas = np.concatenate([sigmas, [0.0]])
            init_noise_sigma = sigmas.max()
            lms = (
                _lms_coefficients(sigmas, num_steps) if self.kind == "lms" else None
            )
            t_int = np.round(timesteps).astype(np.int64)
        elif self.kind == "ddim":
            step_ratio = cfg.num_train_timesteps // num_steps
            t_int = (np.arange(num_steps) * step_ratio).round()[::-1].copy()
            t_int = (t_int + cfg.steps_offset).astype(np.int64)
            timesteps = t_int.astype(np.float64)
            sigmas = np.sqrt(
                (1.0 - alphas_cumprod[t_int]) / alphas_cumprod[t_int]
            )
            sigmas = np.concatenate([sigmas, [0.0]])
            init_noise_sigma = 1.0
            lms = None
        elif self.kind == "pndm":
            return self._set_timesteps_pndm(num_steps, alphas_cumprod)
        elif self.kind in ("dpmpp_2m", "dpmpp_2m_sde"):
            return self._set_timesteps_dpmpp(
                num_steps, alphas_cumprod, sde=(self.kind == "dpmpp_2m_sde")
            )
        elif self.kind == "unipc":
            return self._set_timesteps_unipc(num_steps, alphas_cumprod)
        elif self.kind == "lcm":
            return self._set_timesteps_lcm(num_steps, alphas_cumprod)
        else:
            raise ValueError(f"unknown scheduler kind {self.kind!r}")

        a_t = alphas_cumprod[np.clip(t_int, 0, cfg.num_train_timesteps - 1)]
        t_prev = np.concatenate([t_int[1:], [-1]])
        final_alpha = 1.0 if cfg.set_alpha_to_one else alphas_cumprod[0]
        a_prev = np.where(
            t_prev >= 0, alphas_cumprod[np.maximum(t_prev, 0)], final_alpha
        )

        return Schedule(
            timesteps=jnp.asarray(timesteps, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            init_noise_sigma=jnp.asarray(init_noise_sigma, jnp.float32),
            alphas_cumprod_t=jnp.asarray(a_t, jnp.float32),
            alphas_cumprod_prev=jnp.asarray(a_prev, jnp.float32),
            lms_coeffs=None if lms is None else jnp.asarray(lms, jnp.float32),
            kind=self.kind,
            num_steps=num_steps,
        )


    def _set_timesteps_heun(
        self, sigmas: np.ndarray, timesteps: np.ndarray,
        alphas_cumprod: np.ndarray,
    ) -> Schedule:
        """Heun visit expansion: each trajectory step becomes (predictor at
        σ_i, corrector at σ_{i+1}); the final σ→0 step is Euler-only, so the
        scan runs 2·N−1 visits (k-diffusion ``sample_heun`` structure)."""
        cfg = self.config
        num_steps = len(sigmas)
        sig = np.concatenate([sigmas, [0.0]])
        visit_sigma, visit_t, dt, second = [], [], [], []
        for i in range(num_steps):
            s_cur, s_next = sig[i], sig[i + 1]
            visit_sigma.append(s_cur)
            visit_t.append(timesteps[i])
            dt.append(s_next - s_cur)
            second.append(0.0)
            if s_next > 0:  # corrector visit, evaluated at the NEXT sigma
                visit_sigma.append(s_next)
                visit_t.append(timesteps[i + 1] if i + 1 < num_steps else 0.0)
                dt.append(s_next - s_cur)
                second.append(1.0)
        visit_sigma = np.asarray(visit_sigma)
        t_int = np.clip(
            np.round(np.asarray(visit_t)).astype(np.int64), 0,
            cfg.num_train_timesteps - 1,
        )
        a_t = alphas_cumprod[t_int]
        return Schedule(
            timesteps=jnp.asarray(visit_t, jnp.float32),
            sigmas=jnp.asarray(
                np.concatenate([visit_sigma, [0.0]]), jnp.float32
            ),
            init_noise_sigma=jnp.asarray(visit_sigma.max(), jnp.float32),
            alphas_cumprod_t=jnp.asarray(a_t, jnp.float32),
            alphas_cumprod_prev=jnp.asarray(a_t, jnp.float32),  # unused
            lms_coeffs=None,
            pndm_tables={
                "dt": jnp.asarray(dt, jnp.float32),
                "second": jnp.asarray(second, jnp.float32),
            },
            kind="heun",
            num_steps=len(visit_sigma),
        )

    def _set_timesteps_lcm(
        self, num_steps: int, alphas_cumprod: np.ndarray
    ) -> Schedule:
        """LCM trajectory (diffusers ``LCMScheduler.set_timesteps``):
        inference timesteps are an evenly-skipped descending subset of the
        teacher's ``original_inference_steps``-point grid
        ``k·j − 1, j = 1..orig`` with ``k = train_steps / orig``. Few-step
        (1–8) sampling for LCM-distilled checkpoints / LCM-LoRA adapters."""
        cfg = self.config
        orig = cfg.original_inference_steps
        if num_steps > orig:
            raise ValueError(
                f"lcm: num_steps ({num_steps}) must be <= "
                f"original_inference_steps ({orig})"
            )
        k = cfg.num_train_timesteps // orig
        origin = np.arange(1, orig + 1, dtype=np.int64) * k - 1
        skip = len(origin) // num_steps
        t_int = origin[::-1][::skip][:num_steps].copy()

        a_t = alphas_cumprod[t_int]
        t_prev = np.concatenate([t_int[1:], [t_int[-1]]])  # last unused
        a_prev = alphas_cumprod[t_prev]
        is_last = np.zeros(num_steps)
        is_last[-1] = 1.0
        st = cfg.timestep_scaling * t_int.astype(np.float64)
        c_skip = cfg.sigma_data**2 / (st**2 + cfg.sigma_data**2)
        c_out = st / np.sqrt(st**2 + cfg.sigma_data**2)
        sigmas = np.sqrt((1.0 - a_t) / a_t)  # PwW weight-fn sigma interface
        return Schedule(
            timesteps=jnp.asarray(t_int, jnp.float32),
            sigmas=jnp.asarray(np.concatenate([sigmas, [0.0]]), jnp.float32),
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            alphas_cumprod_t=jnp.asarray(a_t, jnp.float32),
            alphas_cumprod_prev=jnp.asarray(a_prev, jnp.float32),
            lms_coeffs=None,
            pndm_tables={
                "c_skip": jnp.asarray(c_skip, jnp.float32),
                "c_out": jnp.asarray(c_out, jnp.float32),
                "is_last": jnp.asarray(is_last, jnp.float32),
            },
            kind="lcm",
            num_steps=num_steps,
        )

    def _set_timesteps_pndm(self, num_steps: int, alphas_cumprod: np.ndarray) -> Schedule:
        """PLMS trajectory: the second timestep is visited twice (pseudo
        improved-Euler warmup refining from the ORIGINAL sample), then 2nd/3rd/
        4th-order Adams–Bashforth blends of the eps history. ``set_alpha_to_one
        = False`` (SD convention): the final 'previous' alpha clamps to
        ᾱ[0]."""
        cfg = self.config
        ratio = cfg.num_train_timesteps // num_steps
        base = (np.arange(num_steps) * ratio).round().astype(np.int64) + cfg.steps_offset
        # ascending [t0..t_{N-1}] → PLMS order (descending, t_{N-2} doubled)
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        n = len(plms)  # num_steps + 1 (for num_steps > 1)

        t_cur = plms.astype(np.int64).copy()
        t_prev = t_cur - ratio
        if n > 1:
            # warmup refinement step: same (t, t_prev) pair as step 0
            t_prev[1] = t_cur[1]
            t_cur[1] = t_cur[1] + ratio

        final_alpha = alphas_cumprod[0]
        a_t = alphas_cumprod[np.clip(t_cur, 0, cfg.num_train_timesteps - 1)]
        a_prev = np.where(
            t_prev >= 0,
            alphas_cumprod[np.clip(t_prev, 0, cfg.num_train_timesteps - 1)],
            final_alpha,
        )
        sample_coeff = np.sqrt(a_prev / a_t)
        denom = a_t * np.sqrt(1.0 - a_prev) + np.sqrt(a_t * (1.0 - a_t) * a_prev)
        alpha_diff = a_prev - a_t

        # eps-blend tables (push first except warmup; history most-recent-first)
        a = np.zeros((n,), np.float64)
        c = np.zeros((n, 4), np.float64)
        push = np.ones((n,), np.float64)
        use_cur = np.zeros((n,), np.float64)
        set_cur = np.zeros((n,), np.float64)
        for i in range(n):
            if i == 0:
                c[i, 0] = 1.0
                set_cur[i] = 1.0
            elif i == 1:
                push[i] = 0.0
                a[i] = 0.5
                c[i, 0] = 0.5
                use_cur[i] = 1.0
            elif i == 2:
                c[i, :2] = (1.5, -0.5)
            elif i == 3:
                c[i, :3] = np.array([23.0, -16.0, 5.0]) / 12.0
            else:
                c[i, :4] = np.array([55.0, -59.0, 37.0, -9.0]) / 24.0

        sigmas = np.sqrt((1.0 - a_t) / a_t)
        return Schedule(
            timesteps=jnp.asarray(plms, jnp.float32),
            sigmas=jnp.asarray(np.concatenate([sigmas, [0.0]]), jnp.float32),
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            alphas_cumprod_t=jnp.asarray(a_t, jnp.float32),
            alphas_cumprod_prev=jnp.asarray(a_prev, jnp.float32),
            lms_coeffs=None,
            pndm_tables={
                "a": jnp.asarray(a, jnp.float32),
                "c": jnp.asarray(c, jnp.float32),
                "push": jnp.asarray(push, jnp.float32),
                "use_cur": jnp.asarray(use_cur, jnp.float32),
                "set_cur": jnp.asarray(set_cur, jnp.float32),
                "sample_coeff": jnp.asarray(sample_coeff, jnp.float32),
                "denom": jnp.asarray(denom, jnp.float32),
                "alpha_diff": jnp.asarray(alpha_diff, jnp.float32),
            },
            kind="pndm",
            num_steps=n,
        )


    def _alpha_trajectory(
        self, num_steps: int, alphas_cumprod: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(timesteps, ᾱ_t, ᾱ_next) for the alpha-space multistep solvers.

        With ``use_karras_sigmas`` the trajectory follows the Karras ρ=7 ramp
        (σ ↦ ᾱ = 1/(1+σ²), fractional timesteps via log-sigma interpolation —
        the "DPM++ 2M Karras" / "UniPC Karras" sampler variants); otherwise
        the standard rounded-linspace integer timesteps. Spacing follows
        diffusers: ``linspace(0, T−1, N+1).round()[::-1][:-1]`` — N+1 points
        with the trailing t=0 DROPPED, and the final 'next' alpha is exactly
        1.0 (σ=0 — diffusers ``final_sigmas_type="zero"``, the modern
        DPMSolverMultistep/UniPC default): the last update lands exactly on
        the predicted x0, so the x0-prediction error at t_min — not a fixed
        λ-jump — bounds the final-step error. Keeping t=0 as the last
        timestep (the old behavior) would make the final step h=0 — an
        identity update that discards one UNet eval per image and parks
        ``lower_order_final`` on a no-op step.
        """
        cfg = self.config
        t_int = np.linspace(
            0, cfg.num_train_timesteps - 1, num_steps + 1
        ).round().astype(np.int64)[::-1][:-1].copy()
        if cfg.use_karras_sigmas:
            full = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
            lin = full[t_int]
            sig, ts = _karras_sigmas(lin, full, num_steps)
            ac = 1.0 / (1.0 + sig ** 2)
        else:
            ts = t_int.astype(np.float64)
            ac = alphas_cumprod[t_int]
        ac_next = np.concatenate([ac[1:], [1.0]])
        return ts, ac, ac_next

    def _set_timesteps_dpmpp(
        self, num_steps: int, alphas_cumprod: np.ndarray, sde: bool = False
    ) -> Schedule:
        """DPM-Solver++ 2M: second-order multistep in λ = log(α/σ) space with
        x0 (data) prediction. All exponential-integrator coefficients are
        precomputed so the device step is two multiplies and a blend:
            D_i = c0·x0_i + c1·x0_{i-1}
            x_{i+1} = (σ_{i+1}/σ_i)·x_i − α_{i+1}(e^{−h}−1)·D_i
        First and final steps run first order (lower_order_final stability).

        ``sde=True`` builds the SDE-DPM-Solver++ 2M tables instead (diffusers
        ``algorithm_type="sde-dpmsolver++"``, ``solver_type="midpoint"``):
        same D blend, with the deterministic coefficients replaced by the
        exact variance-preserving OU transition
            x_{i+1} = (σ'/σ)e^{−h}·x + α'(1−e^{−2h})·D + σ'√(1−e^{−2h})·z.
        """
        t_float, ac_t, ac_p = self._alpha_trajectory(num_steps, alphas_cumprod)
        alpha_t, sigma_t = np.sqrt(ac_t), np.sqrt(1 - ac_t)
        alpha_p, sigma_p = np.sqrt(ac_p), np.sqrt(1 - ac_p)
        lam_t = np.log(alpha_t) - np.log(sigma_t)
        # final σ' is exactly 0 (final_sigmas_type="zero"): the floor keeps
        # λ finite so the coefficient limits fall out exactly —
        # exp(-h) underflows to 0, so x_coeff[-1]=0, d_coeff[-1]=α'=1 (the
        # final update returns the predicted x0) and n_coeff[-1]=0.
        lam_p = np.log(alpha_p) - np.log(np.maximum(sigma_p, 1e-38))
        h = lam_p - lam_t  # step size in λ space (positive: λ grows)
        h_last = np.concatenate([[np.nan], h[:-1]])

        if sde:
            x_coeff = (sigma_p / sigma_t) * np.exp(-h)
            d_coeff = -alpha_p * np.expm1(-2.0 * h)
            n_coeff = sigma_p * np.sqrt(np.maximum(-np.expm1(-2.0 * h), 0.0))
        else:
            x_coeff = sigma_p / sigma_t
            d_coeff = -alpha_p * (np.exp(-h) - 1.0)
            n_coeff = np.zeros(num_steps)

        c0 = np.ones(num_steps)
        c1 = np.zeros(num_steps)
        for i in range(1, num_steps - 1):  # 2nd order on interior steps
            r = h_last[i] / h[i]
            c0[i] = 1.0 + 1.0 / (2.0 * r)
            c1[i] = -1.0 / (2.0 * r)

        sigmas = np.sqrt((1 - ac_t) / ac_t)  # PwW weight-fn sigma interface
        return Schedule(
            timesteps=jnp.asarray(t_float, jnp.float32),
            sigmas=jnp.asarray(np.concatenate([sigmas, [0.0]]), jnp.float32),
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            alphas_cumprod_t=jnp.asarray(ac_t, jnp.float32),
            alphas_cumprod_prev=jnp.asarray(ac_p, jnp.float32),
            lms_coeffs=None,
            pndm_tables={
                "alpha_t": jnp.asarray(alpha_t, jnp.float32),
                "sigma_t": jnp.asarray(sigma_t, jnp.float32),
                "x_coeff": jnp.asarray(x_coeff, jnp.float32),
                "d_coeff": jnp.asarray(d_coeff, jnp.float32),
                "c0": jnp.asarray(c0, jnp.float32),
                "c1": jnp.asarray(c1, jnp.float32),
                "n_coeff": jnp.asarray(n_coeff, jnp.float32),
            },
            kind="dpmpp_2m_sde" if sde else "dpmpp_2m",
            num_steps=num_steps,
        )


    def _set_timesteps_unipc(self, num_steps: int, alphas_cumprod: np.ndarray) -> Schedule:
        """UniPC-2 tables (Zhao et al. 2023, ``bh2`` variant, x0-prediction).

        Per scan step ``i`` (sample x_i entering, one model eval producing
        eps_i):
          * UniC corrector: re-derive x_i from the PREVIOUS corrected sample
            with the new x0 information —
            ``x_i ← (σ_i/σ_{i-1})·x_{i-1} − α_i·φ₁·m_{i-1}
                     − α_i·B(h)·(ρ_hist·D1_hist + ρ_new·(m_raw − m_{i-1}))``
            where hh = −h, φ₁ = e^{hh}−1, B(h) = φ₁ (bh2), and (ρ_hist,
            ρ_new) solve the 2×2 order system (ρ = 1/2 at the first
            correctable step, where no D1 history exists).
          * UniP predictor to x_{i+1} with ρ_p = 1/2 (order 2); the first and
            final steps run first order (lower_order_final).
        All coefficients depend only on the λ = log(α/σ) trajectory, so they
        are host-precomputed into per-step tables.
        """
        t_float, ac, ac_n = self._alpha_trajectory(num_steps, alphas_cumprod)
        alpha, sigma = np.sqrt(ac), np.sqrt(1 - ac)
        alpha_n, sigma_n = np.sqrt(ac_n), np.sqrt(1 - ac_n)
        lam = np.log(alpha) - np.log(sigma)  # increases along the trajectory

        # ---- predictor tables (step i -> i+1) ----------------------------
        lam_n = np.log(alpha_n) - np.log(np.maximum(sigma_n, 1e-12))
        h_p = lam_n - lam
        hh_p = -h_p
        p_hphi1 = np.expm1(hh_p)
        p_bh = np.expm1(hh_p)  # bh2
        p_ratio = sigma_n / sigma
        p_rho = np.full(num_steps, 0.5)
        p_rho[0] = 0.0  # no history yet: first order
        if num_steps > 1:
            p_rho[-1] = 0.0  # lower_order_final
        # r1 = (λ_{i-1} − λ_i) / h_p ; D1 = (m_{i-1} − m_i)/r1
        p_inv_r = np.zeros(num_steps)
        for i in range(1, num_steps):
            if h_p[i] == 0:
                continue  # degenerate no-op transition (duplicate timestep)
            r1 = (lam[i - 1] - lam[i]) / h_p[i]
            p_inv_r[i] = 1.0 / r1 if r1 != 0 else 0.0

        # ---- corrector tables (correct x_i using x_{i-1} history) --------
        use_corr = np.zeros(num_steps)
        c_ratio = np.zeros(num_steps)
        c_hphi1 = np.zeros(num_steps)
        c_bh = np.zeros(num_steps)
        c_rho_hist = np.zeros(num_steps)
        c_rho_new = np.zeros(num_steps)
        c_inv_r = np.zeros(num_steps)
        for i in range(1, num_steps):
            h = lam[i] - lam[i - 1]
            hh = -h
            phi1 = np.expm1(hh)
            bh = np.expm1(hh)
            use_corr[i] = 1.0
            c_ratio[i] = sigma[i] / sigma[i - 1]
            c_hphi1[i] = phi1
            c_bh[i] = bh
            if i == 1:
                c_rho_new[i] = 0.5  # order-1 corrector: no D1 history
            else:
                r = (lam[i - 2] - lam[i - 1]) / h
                c_inv_r[i] = 1.0 / r if r != 0 else 0.0
                phi2 = phi1 / hh - 1.0
                phi3 = phi2 / hh - 0.5
                R = np.array([[1.0, 1.0], [r, 1.0]])
                b = np.array([phi2 / bh, 2.0 * phi3 / bh])
                rho = np.linalg.solve(R, b)
                c_rho_hist[i], c_rho_new[i] = rho[0], rho[1]

        sigmas = np.sqrt((1 - ac) / ac)  # PwW weight-fn sigma interface
        return Schedule(
            timesteps=jnp.asarray(t_float, jnp.float32),
            sigmas=jnp.asarray(np.concatenate([sigmas, [0.0]]), jnp.float32),
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            alphas_cumprod_t=jnp.asarray(ac, jnp.float32),
            alphas_cumprod_prev=jnp.asarray(ac_n, jnp.float32),
            lms_coeffs=None,
            pndm_tables={
                "alpha_t": jnp.asarray(alpha, jnp.float32),
                "sigma_t": jnp.asarray(sigma, jnp.float32),
                "p_ratio": jnp.asarray(p_ratio, jnp.float32),
                "p_alpha_next": jnp.asarray(alpha_n, jnp.float32),
                "p_hphi1": jnp.asarray(p_hphi1, jnp.float32),
                "p_bh": jnp.asarray(p_bh, jnp.float32),
                "p_rho": jnp.asarray(p_rho, jnp.float32),
                "p_inv_r": jnp.asarray(p_inv_r, jnp.float32),
                "use_corr": jnp.asarray(use_corr, jnp.float32),
                "c_ratio": jnp.asarray(c_ratio, jnp.float32),
                "c_hphi1": jnp.asarray(c_hphi1, jnp.float32),
                "c_bh": jnp.asarray(c_bh, jnp.float32),
                "c_rho_hist": jnp.asarray(c_rho_hist, jnp.float32),
                "c_rho_new": jnp.asarray(c_rho_new, jnp.float32),
                "c_inv_r": jnp.asarray(c_inv_r, jnp.float32),
            },
            kind="unipc",
            num_steps=num_steps,
        )


def make_scheduler(kind: str = "lms", config: SchedulerConfig = SchedulerConfig()) -> Scheduler:
    return Scheduler(config=config, kind=kind)
