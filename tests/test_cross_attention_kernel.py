"""Fused PwW cross-attention kernel vs the dense reference path."""
import jax.numpy as jnp
import numpy as np

from pww_tpu.ops.attention import pww_attention
from pww_tpu.ops.cross_attention_kernel import (
    fused_pww_cross_attention,
    pww_cross_attention_reduce,
)
from pww_tpu.ops.weight_functions import WeightFunction


def _data(rng, b=2, h=2, lq=256, lk=77, dh=40):
    q = rng.standard_normal((b, h, lq, dh)).astype(np.float32)
    k = rng.standard_normal((b, h, lk, dh)).astype(np.float32)
    v = rng.standard_normal((b, h, lk, dh)).astype(np.float32)
    w = np.zeros((b, lq, lk), np.float32)
    w[1] = rng.random((lq, lk))  # row 0 = uncond (zero weights)
    return (jnp.asarray(x) for x in (q, k, v, w))


def test_fused_matches_dense_max(rng):
    q, k, v, w = _data(rng)
    wf = WeightFunction(0.1, "log1p_sigma", "max")
    sigma = jnp.float32(5.0)
    want = np.asarray(pww_attention(q, k, v, bias_w=w, weight_fn=wf, sigma=sigma))
    r = pww_cross_attention_reduce(q, k, wf)
    coef = wf.sigma_coef(sigma) * r
    got = np.asarray(fused_pww_cross_attention(q, k, v, w, coef))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_fused_matches_dense_std(rng):
    q, k, v, w = _data(rng, lq=512)
    wf = WeightFunction(0.3, "log1p_sigma2", "std")
    sigma = jnp.float32(2.0)
    want = np.asarray(pww_attention(q, k, v, bias_w=w, weight_fn=wf, sigma=sigma))
    r = pww_cross_attention_reduce(q, k, wf)
    coef = wf.sigma_coef(sigma) * r
    got = np.asarray(fused_pww_cross_attention(q, k, v, w, coef))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_fused_uncond_rows_are_plain_attention(rng):
    """coef·w = 0 on the uncond row — must equal bias-free attention there."""
    q, k, v, w = _data(rng)
    wf = WeightFunction(0.1, "log1p_sigma", "max")
    r = pww_cross_attention_reduce(q, k, wf)
    coef = wf.sigma_coef(jnp.float32(3.0)) * r
    got = np.asarray(fused_pww_cross_attention(q, k, v, w, coef))
    plain = np.asarray(pww_attention(q, k, v))
    np.testing.assert_allclose(got[0], plain[0], atol=3e-5, rtol=1e-3)
    assert not np.allclose(got[1], plain[1], atol=1e-3)  # cond row is biased


def test_dense_fallback_for_odd_lq(rng):
    q, k, v, w = _data(rng, lq=100)  # not blockable -> fallback path
    wf = WeightFunction(0.1, "log1p_sigma", "max")
    sigma = jnp.float32(5.0)
    r = pww_cross_attention_reduce(q, k, wf)
    coef = wf.sigma_coef(sigma) * r
    got = np.asarray(fused_pww_cross_attention(q, k, v, w, coef))
    want = np.asarray(pww_attention(q, k, v, bias_w=w, weight_fn=wf, sigma=sigma))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_pallas_reduce_matches_dense_max_and_std(rng):
    """fused_pww_reduce (blocked partials, scores never materialized) ==
    the dense per-sample reduce, for max AND std (unbiased, torch.std
    semantics) — VERDICT r2 item 2's equality criterion."""
    from pww_tpu.ops.cross_attention_kernel import fused_pww_reduce

    q, k, _, _ = _data(rng, b=3, h=4, lq=1024, lk=77, dh=40)
    for mode, rtol in (("max", 1e-6), ("std", 1e-4), ("mean", 1e-5)):
        wf = WeightFunction(0.1, "log1p_sigma", mode)
        want = np.asarray(pww_cross_attention_reduce(q, k, wf))
        got = np.asarray(fused_pww_reduce(q, k, wf, block_q=256))
        np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-5)


def test_pallas_reduce_fallback_odd_lq(rng):
    from pww_tpu.ops.cross_attention_kernel import fused_pww_reduce

    q, k, _, _ = _data(rng, lq=100)
    wf = WeightFunction(0.1, "log1p_sigma", "std")
    want = np.asarray(pww_cross_attention_reduce(q, k, wf))
    got = np.asarray(fused_pww_reduce(q, k, wf))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_reduce_one_mode(rng):
    from pww_tpu.ops.cross_attention_kernel import fused_pww_reduce
    from pww_tpu.ops.weight_functions import ZERO

    q, k, _, _ = _data(rng)
    np.testing.assert_array_equal(
        np.asarray(fused_pww_reduce(q, k, ZERO)), np.ones((2,), np.float32)
    )


def test_fused_end_to_end_single_hbm_pass_matches_dense(rng):
    """Full new path (Pallas reduce -> Pallas epilogue) == dense attention
    for both reference weight-function families."""
    from pww_tpu.ops.cross_attention_kernel import fused_pww_reduce

    q, k, v, w = _data(rng, lq=512)
    sigma = jnp.float32(4.0)
    for wf in (
        WeightFunction(0.1, "log1p_sigma", "max"),
        WeightFunction(0.3, "log1p_sigma2", "std"),
    ):
        want = np.asarray(
            pww_attention(q, k, v, bias_w=w, weight_fn=wf, sigma=sigma)
        )
        r = fused_pww_reduce(q, k, wf, block_q=256)
        coef = wf.sigma_coef(sigma) * r
        got = np.asarray(
            fused_pww_cross_attention(q, k, v, w, coef, block_q=256)
        )
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_xattn_variants_agree_through_unet(rng):
    """All three UNetConfig.xattn_variant implementations produce the same
    UNet output (they are perf variants, not numerics variants)."""
    import dataclasses

    import jax
    from pww_tpu.config import UNetConfig
    from pww_tpu.models.unet import UNet2DCondition
    from pww_tpu.types import PwwState

    base = UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        num_attention_heads=4, cross_attention_dim=40, norm_num_groups=8,
        down_block_has_attn=(True, False), sample_size=32,
        xattn_block_q=256,
    )
    h = w = 32  # top attention site: 1024 tokens -> fused path engages
    sample = jnp.asarray(rng.standard_normal((2, h, w, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 40)), jnp.float32)
    wmap = np.zeros((2, h * w, 7), np.float32)
    wmap[1] = rng.random((h * w, 7))
    pww = PwwState(
        weights={h * w: jnp.asarray(wmap)}, weight_orig=None,
        sigma=jnp.float32(3.0), weight_fn=WeightFunction(0.1, "log1p_sigma", "max"),
    )
    outs = {}
    for variant in ("fused", "fused_head_major", "two_pass"):
        cfg = dataclasses.replace(base, xattn_variant=variant)
        unet = UNet2DCondition(cfg)
        params = unet.init(
            jax.random.PRNGKey(0), sample, jnp.zeros((2,)), ctx
        )
        outs[variant] = np.asarray(
            unet.apply(params, sample, jnp.float32(500.0), ctx, pww=pww)
        )
    np.testing.assert_allclose(
        outs["fused"], outs["fused_head_major"], atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        outs["fused"], outs["two_pass"], atol=1e-4, rtol=1e-3
    )


def test_pallas_reduce_std_large_mean_stability(rng):
    """std must stay accurate when |mean| >> std (the one-pass sum/sumsq
    formula cancels catastrophically in f32; the kernel emits Chan-
    combinable block moments instead)."""
    from pww_tpu.ops.cross_attention_kernel import fused_pww_reduce

    b, h, lq, lk, dh = 2, 4, 1024, 77, 40
    # construct q,k whose scores have mean ~120, std ~1: q has a large
    # shared component along one direction plus small noise
    base = np.ones((dh,), np.float32)
    q = (np.sqrt(120.0 / dh) * base[None, None, None, :]
         + 0.05 * rng.standard_normal((b, h, lq, dh))).astype(np.float32)
    k = (np.sqrt(120.0 / dh) * base[None, None, None, :]
         + 0.05 * rng.standard_normal((b, h, lk, dh))).astype(np.float32)
    q, k = jnp.asarray(q), jnp.asarray(k)
    wf = WeightFunction(0.3, "log1p_sigma", "std")
    # reference: float64 two-pass over the exact scores
    s = np.asarray(
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    ).astype(np.float64)
    flat = s.reshape(b, -1)
    want = flat.std(axis=-1, ddof=1)
    assert np.abs(flat.mean()) > 50 * want.max()  # the adversarial regime
    got = np.asarray(fused_pww_reduce(q, k, wf, block_q=256))
    np.testing.assert_allclose(got, want, rtol=2e-3)
