"""Vectorized bias-pyramid rasterization (single jit'd stage).

Replaces the reference's per-region/per-ratio Python+torch loop
(reference `paint_with_words/paint_with_words.py:247-276, 343-357`): all region
masks are stacked into one (R, H, W) tensor, downsampled with the exact
``F.interpolate(bilinear, align_corners=True)`` numerics at every UNet
attention resolution, and contracted against the (R, n_tokens) token-match
matrix in one einsum per level — one XLA program for the whole pyramid.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blur import gaussian_blur
from ..ops.resize import resize_bilinear
from .color_context import always_round

PYRAMID_RATIOS = (8, 16, 32, 64)


def pyramid_level_shape(h: int, w: int, ratio: int) -> Tuple[int, int]:
    """Reference's rounding quirk: sizes via :func:`always_round`."""
    return always_round(h / ratio), always_round(w / ratio)


@functools.partial(jax.jit, static_argnames=("height", "width", "ratios"))
def rasterize_pyramid(
    masks: jnp.ndarray,  # (R, H, W) strength-scaled region masks
    token_match: jnp.ndarray,  # (R, T) occurrence counts
    blur_sigmas: Optional[jnp.ndarray] = None,  # (R,) 0 = no blur
    *,
    height: int,
    width: int,
    ratios: Tuple[int, ...] = PYRAMID_RATIOS,
) -> Tuple[Dict[int, jnp.ndarray], jnp.ndarray]:
    """Returns ({h_r*w_r: (h_r*w_r, T)}, full-res (H, W, T) ``ORIG`` map).

    Keys collide across ratios exactly like the reference's size-keyed dict
    (later/coarser levels win on collision, matching dict construction order
    at reference ``:370-377``).
    """
    masks = masks.astype(jnp.float32)
    if blur_sigmas is not None:
        safe = jnp.maximum(blur_sigmas, 1e-6)
        blurred = jax.vmap(lambda m, s: gaussian_blur(m, 39, s))(masks, safe)
        masks = jnp.where((blur_sigmas > 0)[:, None, None], blurred, masks)

    pyramid: Dict[int, jnp.ndarray] = {}
    for ratio in ratios:
        h_r, w_r = pyramid_level_shape(height, width, ratio)
        down = resize_bilinear(masks, h_r, w_r, align_corners=True)
        flat = down.reshape(masks.shape[0], h_r * w_r)
        pyramid[h_r * w_r] = jnp.einsum("rq,rt->qt", flat, token_match)

    orig = jnp.einsum("rhw,rt->hwt", masks, token_match)
    return pyramid, orig


def numpy_pyramid(
    masks: np.ndarray,
    token_match: np.ndarray,
    height: int,
    width: int,
    blur_sigmas: Optional[np.ndarray] = None,
    ratios: Sequence[int] = PYRAMID_RATIOS,
):
    """Host-callable wrapper returning numpy (used by tests/tools)."""
    pyr, orig = rasterize_pyramid(
        jnp.asarray(masks),
        jnp.asarray(token_match),
        None if blur_sigmas is None else jnp.asarray(blur_sigmas),
        height=height,
        width=width,
        ratios=tuple(ratios),
    )
    return {k: np.asarray(v) for k, v in pyr.items()}, np.asarray(orig)
