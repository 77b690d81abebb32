"""Numerics re-derivation tests for the inpaint-prep host ops.

CLAUDE.md convention: numerics that feed fidelity must be tested against
torch semantics or an independent math re-derivation. ``_gauss2d`` feathers
the legacy-blend latent mask (A1111 ``mask_blur``) and ``fill_masked_region``
seeds the masked latents (``masked_content='fill'``) — both directly shape
the output image, so their definitions are pinned here independently of the
scipy-backed implementation.
"""
import numpy as np
import pytest

from pww_tpu.pipeline.inpaint import (
    _gauss2d,
    blur_mask,
    expand_crop_region,
    fill_masked_region,
)


def _gauss2d_rederived(arr: np.ndarray, sigma: float) -> np.ndarray:
    """Direct re-derivation of the documented definition: truncated
    normalized gaussian at radius max(int(3σ), 1), per-axis convolution
    with edge replication — written with np.pad + np.convolve, sharing no
    code with the scipy implementation under test."""
    radius = max(int(3 * sigma), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    m = np.asarray(arr, np.float32)
    mp = np.pad(m, ((radius, radius), (0, 0)), mode="edge")
    m = np.stack(
        [np.convolve(mp[:, j], k, mode="valid") for j in range(m.shape[1])],
        axis=1,
    )
    mp = np.pad(m, ((0, 0), (radius, radius)), mode="edge")
    m = np.stack(
        [np.convolve(mp[i, :], k, mode="valid") for i in range(m.shape[0])],
        axis=0,
    )
    return m.astype(np.float32)


@pytest.mark.parametrize("sigma", [0.5, 1.0, 4.0, 16.0])
def test_gauss2d_matches_rederivation(sigma):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((40, 56)).astype(np.float32)  # signed values
    got = _gauss2d(arr, sigma)
    want = _gauss2d_rederived(arr, sigma)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_gauss2d_preserves_mean_of_constant():
    # normalized kernel + edge replication: a constant field is a fixpoint
    arr = np.full((17, 23), 0.37, np.float32)
    np.testing.assert_allclose(_gauss2d(arr, 8.0), arr, atol=1e-6)


def test_blur_mask_identity_at_zero_and_range():
    m = np.zeros((32, 32), np.float32)
    m[8:24, 8:24] = 1.0
    np.testing.assert_array_equal(blur_mask(m, 0.0), m)
    b = blur_mask(m, 5.0)
    assert b.min() >= 0.0 and b.max() <= 1.0
    assert 0.0 < b[7, 16] < 1.0  # feather extends past the hard edge


def test_fill_known_pixels_unchanged_and_bounded():
    rng = np.random.default_rng(1)
    img = (rng.random((48, 48, 3)).astype(np.float32) * 2 - 1)
    hole = np.zeros((48, 48), bool)
    hole[12:36, 12:36] = True
    out = fill_masked_region(img, hole)
    # context pixels are untouched
    np.testing.assert_array_equal(out[~hole], img[~hole])
    # filled values are diffused-in context: inside the context's range
    known = img[~hole]
    assert out[hole].min() >= known.min() - 1e-5
    assert out[hole].max() <= known.max() + 1e-5
    assert np.isfinite(out).all()


def test_fill_constant_image_is_fixpoint():
    img = np.full((32, 32, 3), -0.25, np.float32)
    hole = np.zeros((32, 32), bool)
    hole[8:24, 4:28] = True
    out = fill_masked_region(img, hole)
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_fill_fully_masked_falls_back_to_mean():
    rng = np.random.default_rng(2)
    img = (rng.random((16, 16, 3)).astype(np.float32) * 2 - 1)
    mean = img.mean(axis=(0, 1))
    out = fill_masked_region(img, np.ones((16, 16), bool))
    np.testing.assert_allclose(out, np.broadcast_to(mean, out.shape),
                               atol=1e-5)


def test_blurred_mask_support_grows_crop_region():
    """Regression for the inpaint_full_res seam: the crop must be computed
    from the BLURRED mask's support so a feather wider than the padding
    still lands inside the pasted region."""
    m = np.zeros((256, 256), np.float32)
    m[120:136, 120:136] = 1.0
    sigma = 24.0
    mb = blur_mask(m, sigma)
    pad = 8
    x0, y0, x1, y1 = expand_crop_region(
        (mb > 1e-3).astype(np.float32), pad, 256, 256
    )
    # every pixel with non-negligible feather weight is inside the crop
    ys, xs = np.nonzero(mb > 1e-3)
    assert y0 <= ys.min() and ys.max() < y1
    assert x0 <= xs.min() and xs.max() < x1
    # and the crop is strictly larger than the hard bbox + padding
    hx0, hy0, hx1, hy1 = expand_crop_region(m, pad, 256, 256)
    assert (x1 - x0) > (hx1 - hx0) and (y1 - y0) > (hy1 - hy0)
