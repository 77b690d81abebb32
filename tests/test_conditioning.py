"""Color-context parsing + rasterization parity tests.

The rasterized bias pyramid is compared against a literal numpy/torch replica
of the reference's per-region loop (`_tokens_img_attention_weight` +
`_img_importance_flatten`, reference paint_with_words.py:38-45, 247-276).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pww_tpu.conditioning.color_context import (
    Region,
    always_round,
    extract_seed_and_sigma,
    parse_color,
    separate_image_context,
    token_match_matrix,
)
from pww_tpu.conditioning.rasterize import numpy_pyramid, pyramid_level_shape
from pww_tpu.tokenizer.clip_bpe import toy_tokenizer


def _reference_rasterize(regions, match, h, w, ratio):
    """Literal re-implementation of the reference's loop for cross-checking."""
    h_r, w_r = always_round(h / ratio), always_round(w / ratio)
    n_tok = match.shape[1]
    out = np.zeros((h_r * w_r, n_tok), np.float32)
    for r, region in enumerate(regions):
        down = F.interpolate(
            torch.from_numpy(region.mask)[None, None], size=(h_r, w_r),
            mode="bilinear", align_corners=True,
        )[0, 0].numpy().reshape(-1, 1)
        out += down * match[r][None, :]
    return out


def test_always_round_quirk():
    # even int(x): round half down; odd: banker's round
    assert always_round(2.4) == 2
    assert always_round(2.5) == 3
    assert always_round(3.5) == 4
    assert always_round(3.4) == 3
    assert always_round(64.0) == 64


def test_parse_color_hex_and_tuple():
    assert parse_color("#ff00aa") == (255, 0, 170)
    assert parse_color((1, 2, 3)) == (1, 2, 3)


@pytest.mark.parametrize(
    "ctx,want",
    [
        ("cat,0.5", ("cat,0.5", None, None)),
        ("cat,0.5,42", ("cat,0.5", 42, None)),
        ("cat,0.5,42,8.0", ("cat,0.5", 42, 8.0)),
        ("cat,0.5,-1", ("cat,0.5", None, None)),  # ignore_seed sentinel
        ("a cat, very fluffy,0.7", ("a cat, very fluffy,0.7", None, None)),
    ],
)
def test_extract_seed_and_sigma(ctx, want):
    assert extract_seed_and_sigma(ctx) == want


def test_separate_image_context_masks(rng):
    tok = toy_tokenizer()
    img = np.zeros((32, 48, 3), np.uint8)
    img[:16] = (255, 0, 0)
    img[16:] = (0, 255, 0)
    ctx = {(255, 0, 0): "cat,0.5", "#00ff00": "dog,2.0,7"}
    regions, w, h = separate_image_context(img, ctx, tok)
    assert (w, h) == (48, 32)
    assert regions[0].mask.max() == 0.5 and regions[0].mask.sum() == 0.5 * 16 * 48
    assert regions[1].mask.max() == 2.0
    assert regions[1].seed == 7


def test_empty_context_zero_mask():
    tok = toy_tokenizer()
    regions, w, h = separate_image_context(None, {}, tok)
    assert (w, h) == (512, 512)
    assert regions[0].token_ids == [-1]
    assert regions[0].mask.sum() == 0


def test_token_match_multi_occurrence():
    r = Region((0, 0, 0), "x", 1.0, [5, 6], np.zeros((4, 4), np.float32))
    ids = [0, 5, 6, 9, 5, 6, 5, 1]
    m = token_match_matrix([r], ids, 8)
    # occurrences at 1 and 4; lone 5 at index 6 doesn't match [5, 6]
    np.testing.assert_array_equal(m[0], [0, 1, 1, 0, 1, 1, 0, 0])


def test_token_match_overlapping_adds():
    r = Region((0, 0, 0), "x", 1.0, [5, 5], np.zeros((2, 2), np.float32))
    m = token_match_matrix([r], [5, 5, 5], 3)
    # matches at 0 and 1 overlap on index 1 -> additive (reference += loop)
    np.testing.assert_array_equal(m[0], [1, 2, 1])


def test_rasterize_matches_reference_loop(rng):
    h, w, n_tok = 64, 64, 12
    masks = []
    for lo, hi, s in ((0, 32, 0.5), (32, 64, 1.5)):
        m = np.zeros((h, w), np.float32)
        m[lo:hi] = s
        masks.append(m)
    regions = [
        Region((0, 0, 0), "a", 1.0, [3], masks[0]),
        Region((1, 1, 1), "b", 1.0, [4, 5], masks[1]),
    ]
    match = np.zeros((2, n_tok), np.float32)
    match[0, 2] = 1
    match[1, 5:7] = 1
    pyr, orig = numpy_pyramid(np.stack(masks), match, h, w)
    for ratio in (8, 16, 32, 64):
        h_r, w_r = pyramid_level_shape(h, w, ratio)
        want = _reference_rasterize(regions, match, h, w, ratio)
        np.testing.assert_allclose(pyr[h_r * w_r], want, atol=1e-5, rtol=1e-4)
    # ORIG level: (H, W, T) full-res
    assert orig.shape == (h, w, n_tok)
    np.testing.assert_allclose(orig[:32, :, 2], 0.5, atol=1e-6)


def test_rasterize_nonsquare(rng):
    """Non-square maps match the reference's LITERAL name-swapped loop.

    The reference reads ``w, h = mask.shape`` on an (H, W) numpy array
    (reference paint_with_words.py:252-254) — the names are swapped, but the
    code stays positionally consistent: ``size=(w_r, h_r)`` on the (H, W)
    tensor targets (H/r, W/r) by position (`:38-45`), and the row-major
    flatten matches the UNet's q-token layout. SURVEY §2 flags this quirk as
    "replicate or deliberately fix, document either way": this test proves
    the swap is purely cosmetic — a literal replica of the swapped naming
    produces the exact pyramid our true-(H, W) implementation builds.
    """
    h, w = 96, 64
    mask = rng.random((1, h, w)).astype(np.float32)
    match = np.ones((1, 7), np.float32)
    pyr, orig = numpy_pyramid(mask, match, h, w)
    h8, w8 = pyramid_level_shape(h, w, 8)
    assert (h8, w8) == (12, 8)
    assert pyr[96].shape == (96, 7)
    # literal reference naming: "w" holds H, "h" holds W
    w_name, h_name = mask[0].shape
    w_r, h_r = always_round(w_name / 8), always_round(h_name / 8)
    down = F.interpolate(
        torch.from_numpy(mask[0])[None, None], size=(w_r, h_r),
        mode="bilinear", align_corners=True,
    )[0, 0].numpy().reshape(-1, 1)
    want = down * match[0][None, :]
    np.testing.assert_allclose(pyr[96], want, atol=1e-5, rtol=1e-4)


def test_pwwstate_orig_fallback_resize(rng):
    """Attention sizes missing from the pyramid fall back to resizing the
    full-res ORIG map (reference paint_with_words.py:96-103: bilinear
    align_corners=True at floor(size/ratio), then 1-D nearest to q_len)."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from pww_tpu.ops.weight_functions import WeightFunction
    from pww_tpu.types import PwwState

    h, w, nc = 24, 24, 7
    orig = rng.random((1, h, w, nc)).astype(np.float32)
    st = PwwState(weights={}, weight_orig=jnp.asarray(orig),
                  sigma=jnp.float32(1.0), weight_fn=WeightFunction())
    q_len = 100  # not a pyramid key; ratio = sqrt(576/100) = 2.4
    got = np.asarray(st.bias_for(q_len))

    t = torch.from_numpy(orig[0]).permute(2, 0, 1).unsqueeze(0)
    ratio = (h * w / q_len) ** 0.5
    t2 = F.interpolate(t, scale_factor=1 / ratio, mode="bilinear",
                       align_corners=True)
    t3 = F.interpolate(t2.reshape(1, nc, -1), size=(q_len,), mode="nearest")
    want = t3[0].permute(1, 0).numpy()
    np.testing.assert_allclose(got[0], want, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "ctx,want",
    [
        # A1111 ControlNet+PwW extension form (reference README.md:403-405)
        ("aurora@0.5@-1", ("aurora", 0.5, None, None)),
        ("full moon@1.5@-1", ("full moon", 1.5, None, None)),
        ("boat@2.0@7", ("boat", 2.0, 7, None)),
        ("boat@2.0@7@4.5", ("boat", 2.0, 7, 4.5)),
        ("a, b and c@0.3", ("a, b and c", 0.3, None, None)),  # commas in label
        # comma form still routes through the reference-parity splitter
        ("cat,0.5,42,8.0", ("cat", 0.5, 42, 8.0)),
        ("a cat, very fluffy,0.7", ("a cat, very fluffy", 0.7, None, None)),
    ],
)
def test_parse_context_entry_both_separators(ctx, want):
    from pww_tpu.conditioning.color_context import parse_context_entry

    assert parse_context_entry(ctx) == want


def test_separate_image_context_at_separator(rng):
    """The @ form flows through mask extraction like the comma form."""
    tok = toy_tokenizer()
    img = np.zeros((32, 48, 3), np.uint8)
    img[:16] = (7, 9, 182)
    img[16:] = (136, 178, 92)
    ctx = {(7, 9, 182): "aurora@0.5@-1", (136, 178, 92): "full moon@1.5@9"}
    regions, w, h = separate_image_context(img, ctx, tok)
    assert regions[0].label == "aurora" and regions[0].seed is None
    assert regions[0].mask.max() == 0.5
    assert regions[1].label == "full moon" and regions[1].seed == 9
    assert regions[1].mask.max() == 1.5


@pytest.mark.parametrize(
    "ctx,want",
    [
        # comma-form labels containing '@' must keep parsing as comma form
        ("portrait by @greg,0.7", ("portrait by @greg", 0.7, None, None)),
        ("cat@home,0.5", ("cat@home", 0.5, None, None)),
        ("a@0.5,0.7", ("a@0.5", 0.7, None, None)),  # ambiguous -> comma wins
    ],
)
def test_parse_context_entry_at_in_comma_labels(ctx, want):
    from pww_tpu.conditioning.color_context import parse_context_entry

    assert parse_context_entry(ctx) == want
