"""ToMe token-merging tests (Bolya & Hoffman 2023 / tomesd semantics)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pww_tpu.ops.tome import _dst_src_indices, build_token_merge


def test_dst_src_partition():
    dst, src = _dst_src_indices(4, 4, 2, 2)
    assert dst.shape == (4,)
    assert src.shape == (12,)
    np.testing.assert_array_equal(np.asarray(dst), [0, 2, 8, 10])
    assert set(np.asarray(dst)) | set(np.asarray(src)) == set(range(16))


def test_merge_unmerge_identity_at_ratio_zero(rng):
    h = w = 4
    x = jnp.asarray(rng.standard_normal((2, h * w, 8)), jnp.float32)
    merge, unmerge, lm = build_token_merge(x, h, w, ratio=0.0)
    assert lm == h * w
    np.testing.assert_allclose(
        np.asarray(unmerge(merge(x))), np.asarray(x), rtol=1e-6
    )


def test_merge_reduces_length_and_duplicates_merge_first(rng):
    h = w = 4
    c = 8
    base = rng.standard_normal((h * w, c)).astype(np.float32)
    # make src token 1 an exact duplicate of dst token 0, and src token 3 a
    # duplicate of dst token 2 — they must be the first merged
    base[1] = base[0]
    base[3] = base[2]
    x = jnp.asarray(base[None])
    merge, unmerge, lm = build_token_merge(x, h, w, ratio=2 / 16)
    assert lm == h * w - 2
    merged = np.asarray(merge(x))
    assert merged.shape == (1, lm, c)
    # unmerge writes each merged src its dst's (post-merge mean) value:
    # dst0 = mean(x0, x1) = x0 since duplicates
    restored = np.asarray(unmerge(merge(x)))[0]
    np.testing.assert_allclose(restored[1], base[0], rtol=1e-5)
    np.testing.assert_allclose(restored[3], base[2], rtol=1e-5)
    # non-merged tokens survive exactly
    np.testing.assert_allclose(restored[5], base[5], rtol=1e-5)


def test_merge_constant_input_exact(rng):
    """All-identical tokens: merging is lossless whatever is picked."""
    h = w = 8
    x = jnp.broadcast_to(
        jnp.asarray(rng.standard_normal((1, 1, 16)), jnp.float32),
        (3, h * w, 16),
    )
    merge, unmerge, lm = build_token_merge(x, h, w, ratio=0.5)
    assert lm == h * w - h * w // 2
    np.testing.assert_allclose(
        np.asarray(unmerge(merge(x))), np.asarray(x), rtol=1e-5
    )


def test_ratio_bounded_by_src_partition(rng):
    h = w = 4
    x = jnp.asarray(rng.standard_normal((1, h * w, 4)), jnp.float32)
    # ratio 0.9 of 16 = 14 > n_src = 12 -> clamps to 12
    _, _, lm = build_token_merge(x, h, w, ratio=0.9)
    assert lm == 4  # only the dst partition remains


def test_merged_length_flash_aligned(rng):
    """At flash-sized grids the merged length L_m snaps UP to the next 256
    multiple (merging fewer tokens than requested, never more): an
    unaligned L_m falls off the flash kernel's q-block ladder
    (flash_attention.py) into XLA-dense O(L²) — measured as tome_03 at 8.01
    s/img vs 4.56 exact at 1024² (AB_KERNELS_1024_tome.json). Already
    aligned ratios are untouched, and sub-flash grids (l % 256 != 0) keep
    the exact requested ratio."""
    h = w = 64  # L = 4096, the SD-1.5 512² full-res site
    x = jnp.asarray(rng.standard_normal((1, h * w, 8)), jnp.float32)
    _, _, lm03 = build_token_merge(x, h, w, ratio=0.3)
    assert lm03 == 3072  # requested 2868 -> next 1024 multiple
    _, _, lm05 = build_token_merge(x, h, w, ratio=0.5)
    assert lm05 == 2048  # already aligned: unchanged
    _, _, lm075 = build_token_merge(x, h, w, ratio=0.75)
    assert lm075 == 1024  # capped at the dst partition: unchanged
    # a ratio that rounds to zero merges IS the honest outcome at 1024-align
    _, _, lm01 = build_token_merge(x, h, w, ratio=0.1)
    assert lm01 == 4096  # requested 3687 -> 4096 == no merge
    # the 1024² full-res site (L=16384): ratio 0.3 -> 11469 -> 12288, so
    # the kernel keeps q-block 1024 instead of dropping to 256
    xl = jnp.asarray(rng.standard_normal((1, 128 * 128, 4)), jnp.float32)
    _, _, lm_big = build_token_merge(xl, 128, 128, ratio=0.3)
    assert lm_big == 12288
    # sub-flash grid: exact requested ratio (16 - 4 = 12 kept)
    y = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
    _, _, lm_small = build_token_merge(y, 4, 4, ratio=0.25)
    assert lm_small == 12
    # 256-aligned but sub-flash (L=256 < 1024): dense attention runs there
    # regardless, so the exact ratio is kept (no degenerate round-to-zero)
    z = jnp.asarray(rng.standard_normal((1, 256, 4)), jnp.float32)
    _, _, lm_256 = build_token_merge(z, 16, 16, ratio=0.3)
    assert lm_256 == 256 - 76


def test_pipeline_tome_end_to_end(rng):
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import PwwPipeline

    base = SDModelConfig.tiny()
    cfg = dataclasses.replace(
        base, unet=dataclasses.replace(base.unet, tome_min_tokens=32)
    )
    pipe = PwwPipeline(config=cfg)
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kwargs = dict(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="latent",
    )
    exact = np.asarray(pipe.generate(**kwargs))
    merged = np.asarray(pipe.generate(tome_ratio=0.3, **kwargs))
    assert merged.shape == exact.shape
    assert np.all(np.isfinite(merged))
    # approximation: different from exact but strongly correlated
    assert not np.array_equal(merged, exact)
    cc = np.corrcoef(exact.ravel(), merged.ravel())[0, 1]
    assert cc > 0.8, cc
    # ratio 0 goes through the exact module (same compiled program)
    np.testing.assert_array_equal(
        np.asarray(pipe.generate(tome_ratio=0.0, **kwargs)), exact
    )
