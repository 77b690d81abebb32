"""Native host-ops library: C++ vs numpy-fallback equivalence."""
import numpy as np
import pytest

from pww_tpu import native


@pytest.fixture(scope="module")
def lib():
    return native.load()


def _img(rng, h=64, w=96):
    img = np.zeros((h, w, 3), np.uint8)
    img[:32] = (255, 0, 0)
    img[32:] = (0, 0, 255)
    img[:4, :4] = (9, 9, 9)
    noise = rng.integers(0, 255, (8, 8, 3), np.uint8)
    img[-8:, -8:] = noise
    return img


def test_library_builds(lib):
    assert lib is not None, "g++ build of libpww_host.so failed"


def test_color_masks_match_numpy(rng, lib):
    img = _img(rng)
    colors = np.array([(255, 0, 0), (0, 0, 255), (1, 2, 3)], np.uint8)
    strengths = np.array([0.5, 2.0, 1.0], np.float32)
    got, counts = native.color_masks(img, colors, strengths)
    eq = (img[None] == colors[:, None, None]).all(-1)
    want = eq.astype(np.float32) * strengths[:, None, None]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(counts, eq.reshape(3, -1).sum(-1))
    assert counts[2] == 0  # absent color


def test_color_mask_sqdist_matches_numpy(rng, lib):
    img = _img(rng)
    img[10, 10] = (252, 2, 1)  # sq-dist 9+4+1=14 < 30
    got = native.color_mask_sqdist(img, (255, 0, 0), 30)
    diff = img.astype(np.int64) - np.array([255, 0, 0])
    want = (diff * diff).sum(-1) < 30
    np.testing.assert_array_equal(got, want)
    assert got[10, 10]


def test_unique_colors_ordering(rng, lib):
    img = _img(rng)
    res = native.unique_colors(img, min_fraction=0.01, max_out=8)
    # red: 32*96-16 px, blue: 32*96-64 px -> red first
    assert res[0][0] == (255, 0, 0)
    assert res[1][0] == (0, 0, 255)
    assert res[0][1] > res[1][1]
    names = [c for c, _ in res]
    assert (9, 9, 9) not in names  # 16 px < 1% of 64*96


def test_token_match_row_overlap(lib):
    row, hits = native.token_match_row([5, 5, 5, 1], [5, 5])
    np.testing.assert_array_equal(row, [1, 2, 1, 0])
    assert hits == 2


def test_token_match_row_absent(lib):
    row, hits = native.token_match_row([1, 2, 3], [9])
    assert hits == 0 and row.sum() == 0
