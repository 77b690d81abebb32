"""Resize ops must match torch F.interpolate bit-for-bit (fidelity-critical:
every bias-pyramid level and the ORIG fallback go through these)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pww_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    resize_nearest_1d,
    upsample_nearest_2x,
)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((64, 64), (8, 8)), ((64, 48), (9, 7)), ((7, 7), (64, 64)), ((16, 16), (16, 16))],
)
def test_bilinear_matches_torch(rng, align, in_hw, out_hw):
    x = rng.standard_normal((2, 3, *in_hw), dtype=np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align
    ).numpy()
    got = np.asarray(resize_bilinear(x, *out_hw, align_corners=align))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 64), (8, 8)), ((10, 14), (23, 5))])
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, 2, *in_hw), dtype=np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    got = np.asarray(resize_nearest(x, *out_hw))
    np.testing.assert_array_equal(got, want)


def test_nearest_1d_matches_torch(rng):
    x = rng.standard_normal((1, 4, 100), dtype=np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(64,), mode="nearest").numpy()
    got = np.asarray(resize_nearest_1d(x, 64))
    np.testing.assert_array_equal(got, want)


def test_upsample_nearest_2x(rng):
    x = rng.standard_normal((1, 4, 6, 3), dtype=np.float32)
    got = np.asarray(upsample_nearest_2x(x))
    want = np.transpose(
        F.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), scale_factor=2,
            mode="nearest",
        ).numpy(),
        (0, 2, 3, 1),
    )
    np.testing.assert_array_equal(got, want)
