"""Bilinear / nearest resize with exact torch `F.interpolate` semantics.

The reference leans on torch interpolation in three places whose numerics we
must reproduce for fixed-seed fidelity:
  * mask rasterization: ``F.interpolate(mode="bilinear", align_corners=True)``
    (reference `paint_with_words/paint_with_words.py:38-45`)
  * the ``CROSS_ATTENTION_WEIGHT_ORIG`` fallback resize: bilinear
    ``align_corners=True`` + 1-D ``nearest`` (reference ``:96-101``)
  * regional-seed binary masks: bilinear ``align_corners=False``
    (reference ``:300-304``)

Implemented as pure-jnp gathers + lerps so they fuse under jit; all are
shape-static and batched over leading dims via vmap-free broadcasting.
"""
from __future__ import annotations

import jax.numpy as jnp


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """Float source coordinate for each output index (torch convention)."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_size - 1) / (out_size - 1)
        return i * scale
    scale = in_size / out_size
    # torch: src = (dst + 0.5) * scale - 0.5, clamped at 0 below
    return jnp.maximum((i + 0.5) * scale - 0.5, 0.0)


def _axis_weights(out_size: int, in_size: int, align_corners: bool):
    src = _source_coords(out_size, in_size, align_corners)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = src - lo.astype(jnp.float32)
    return lo, hi, w_hi


def resize_bilinear(
    img: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear resize over the last two axes.

    Matches ``torch.nn.functional.interpolate(mode="bilinear")`` bit-for-bit
    at float32 for both ``align_corners`` conventions.
    """
    in_h, in_w = img.shape[-2], img.shape[-1]
    dtype = img.dtype
    x = img.astype(jnp.float32)

    ylo, yhi, wy = _axis_weights(out_h, in_h, align_corners)
    xlo, xhi, wx = _axis_weights(out_w, in_w, align_corners)

    top = jnp.take(x, ylo, axis=-2)
    bot = jnp.take(x, yhi, axis=-2)
    rows = top + (bot - top) * wy[..., :, None]

    left = jnp.take(rows, xlo, axis=-1)
    right = jnp.take(rows, xhi, axis=-1)
    out = left + (right - left) * wx
    return out.astype(dtype)


def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour resize over the last two axes (torch 'nearest')."""
    in_h, in_w = img.shape[-2], img.shape[-1]
    ys = jnp.minimum(
        (jnp.arange(out_h, dtype=jnp.float32) * (in_h / out_h)).astype(jnp.int32),
        in_h - 1,
    )
    xs = jnp.minimum(
        (jnp.arange(out_w, dtype=jnp.float32) * (in_w / out_w)).astype(jnp.int32),
        in_w - 1,
    )
    return jnp.take(jnp.take(img, ys, axis=-2), xs, axis=-1)


def resize_nearest_1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """1-D nearest resize over the last axis (torch ``mode='nearest'`` on 3-D).

    Used by the ORIG-weight fallback path (reference
    `paint_with_words/paint_with_words.py:101`).
    """
    in_len = x.shape[-1]
    idx = jnp.minimum(
        (jnp.arange(out_len, dtype=jnp.float32) * (in_len / out_len)).astype(jnp.int32),
        in_len - 1,
    )
    return jnp.take(x, idx, axis=-1)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Fast 2x nearest upsample on NHWC tensors (UNet/VAE decoder upsampling)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
