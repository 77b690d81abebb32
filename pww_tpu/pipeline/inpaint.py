"""Inpainting mask/masked-image preparation.

jnp port of the reference's validation + normalization
(reference `paint_with_words/paint_with_words_inpaint.py:20-106`): image to
[-1, 1], mask binarized at 0.5, ``masked_image = image · (mask < 0.5)``.
Layout is NHWC (TPU conv layout) instead of the reference's BCHW.

Note: the reference's functional path samples the masked-image VAE posterior
while ignoring its ``generator`` (survey §2 C10 quirk); we use the posterior
mean in :meth:`PwwPipeline._prepare_inpaint_channels` — deterministic, within
posterior noise of the reference.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _to_nhwc_float(image) -> jnp.ndarray:
    """PIL / numpy / jnp image → (B, H, W, C) float32."""
    from PIL import Image

    if isinstance(image, Image.Image):
        image = np.asarray(image.convert("RGB"), np.float32) / 127.5 - 1.0
        return jnp.asarray(image)[None]
    arr = jnp.asarray(image, jnp.float32)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.shape[-1] not in (1, 3):
        raise ValueError(f"expected channel-last image, got shape {arr.shape}")
    return arr


def prepare_mask_and_masked_image(
    image, mask
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(mask (B,H,W,1) in {0,1}, masked_image (B,H,W,3) in [-1,1])``.

    Accepts PIL images, numpy arrays, or jnp arrays; validates ranges/shapes
    like the reference's assert block (inpaint.py:53-101).
    """
    from PIL import Image

    img = _to_nhwc_float(image) if not isinstance(image, jnp.ndarray) else (
        image if image.ndim == 4 else image[None]
    )
    img = jnp.asarray(img, jnp.float32)
    if float(jnp.min(img)) < -1.0 - 1e-4 or float(jnp.max(img)) > 1.0 + 1e-4:
        raise ValueError("image should be in [-1, 1] range")

    if isinstance(mask, Image.Image):
        m = np.asarray(mask.convert("L"), np.float32) / 255.0
        m = jnp.asarray(m)[None, :, :, None]
    else:
        m = jnp.asarray(mask, jnp.float32)
        if m.ndim == 2:
            m = m[None, :, :, None]
        elif m.ndim == 3:
            m = m[..., None] if m.shape[-1] not in (1,) else m[None]
    if float(jnp.min(m)) < 0.0 or float(jnp.max(m)) > 1.0:
        raise ValueError("mask should be in [0, 1] range")
    if m.shape[1:3] != img.shape[1:3]:
        raise ValueError(
            f"mask spatial size {m.shape[1:3]} != image {img.shape[1:3]}"
        )

    m = (m >= 0.5).astype(jnp.float32)
    masked = img * (m < 0.5)
    return m, masked


def _gauss2d(arr: np.ndarray, sigma: float) -> np.ndarray:
    """Separable 2D gaussian of a (H, W) float array, edge-padded,
    UNclipped (also used on signed image channels).

    Definition: truncated kernel at radius max(int(3σ), 1), normalized to
    sum 1, applied per axis with edge replication — pinned against a direct
    pad+convolve re-derivation in tests/test_inpaint_numerics.py. Runs via
    scipy's C convolution (a Python per-row loop here is multi-second host
    work at 512² σ=64 in the serving path)."""
    from scipy.ndimage import convolve1d

    radius = max(int(3 * sigma), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    m = np.asarray(arr, np.float32)
    m = convolve1d(m, k, axis=0, mode="nearest")
    m = convolve1d(m, k, axis=1, mode="nearest")
    return m.astype(np.float32)


def blur_mask(mask: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian-feather a (H, W) float mask in pixel space (A1111
    ``mask_blur``; beyond-reference surface — the reference uses hard
    masks only). Returns float32 in [0, 1]; downstream consumers choose
    whether to keep it fractional (legacy latent blend) or re-binarize
    (9-ch conditioning)."""
    if sigma <= 0:
        return np.asarray(mask, np.float32)
    return np.clip(_gauss2d(mask, sigma), 0.0, 1.0)


def fill_masked_region(image: np.ndarray, hole: np.ndarray) -> np.ndarray:
    """Replace ``hole`` pixels with colors diffused in from the surrounding
    context (A1111 ``masked content: fill``; re-derived — normalized
    convolution at decreasing radii instead of A1111's pasted PIL blurs,
    same intent: seed the masked area with plausible low-frequency content
    instead of the original pixels).

    ``image``: (H, W, 3) float in [-1, 1]; ``hole``: (H, W) bool/0-1,
    1 = region to fill. Returns a new (H, W, 3) float32 array.
    """
    img = np.asarray(image, np.float32).copy()
    hole = np.asarray(hole).astype(bool)
    if not hole.any():
        return img
    keep = (~hole).astype(np.float32)
    if not keep.any():  # fully masked: fall back to the global mean color
        img[:] = img.mean(axis=(0, 1), keepdims=True)
        return img
    # fine -> coarse: near-edge pixels take local color, deeper pixels are
    # reached by progressively wider kernels (fill diffuses inward)
    out = img * keep[..., None]
    w = keep
    for sigma in (4.0, 16.0, 64.0):
        bw = _gauss2d(w, sigma)
        bi = np.stack(
            [_gauss2d(out[..., c], sigma) for c in range(img.shape[-1])],
            axis=-1,
        )
        filled = bi / np.maximum(bw[..., None], 1e-3)
        known = bw > 1e-3  # firm support only: tiny tails amplify noise
        upd = hole & known & (w <= 0)
        img[upd] = np.clip(filled[upd], -1.0, 1.0)
        w = np.maximum(w, known.astype(np.float32))
        out = img * w[..., None]
    # any still-unreached pixels (pathological masks): global mean
    left = hole & (w <= 0)
    if left.any():
        img[left] = img[~hole].mean(axis=0)
    return img


def expand_crop_region(
    mask: np.ndarray, padding: int, target_w: int, target_h: int
) -> Tuple[int, int, int, int]:
    """Crop region for "inpaint only the masked area" (A1111
    ``inpaint_full_res``; re-derived): the mask's bounding box, grown by
    ``padding`` pixels, then expanded to the processing aspect ratio
    ``target_w:target_h`` so the crop resizes to the processing resolution
    without distortion. Shifts toward the image when a side hits a border.

    ``mask``: (H, W) float/bool, >= 0.5 = masked. Returns ``(x0, y0, x1,
    y1)`` half-open pixel coords; the full image when the mask is empty.
    """
    m = np.asarray(mask)
    h, w = m.shape
    ys, xs = np.nonzero(m >= 0.5)
    if len(ys) == 0:
        return 0, 0, w, h
    x0 = max(int(xs.min()) - padding, 0)
    x1 = min(int(xs.max()) + 1 + padding, w)
    y0 = max(int(ys.min()) - padding, 0)
    y1 = min(int(ys.max()) + 1 + padding, h)

    ratio_crop = (x1 - x0) / (y1 - y0)
    ratio_proc = target_w / target_h
    if ratio_crop < ratio_proc:  # too narrow: widen
        want = min(int(round((y1 - y0) * ratio_proc)), w)
        extra = want - (x1 - x0)
        x0 -= extra // 2
        x1 += extra - extra // 2
        if x0 < 0:
            x1 = min(x1 - x0, w)
            x0 = 0
        elif x1 > w:
            x0 = max(x0 - (x1 - w), 0)
            x1 = w
    elif ratio_crop > ratio_proc:  # too wide: heighten
        want = min(int(round((x1 - x0) / ratio_proc)), h)
        extra = want - (y1 - y0)
        y0 -= extra // 2
        y1 += extra - extra // 2
        if y0 < 0:
            y1 = min(y1 - y0, h)
            y0 = 0
        elif y1 > h:
            y0 = max(y0 - (y1 - h), 0)
            y1 = h
    return x0, y0, x1, y1


def paste_region(
    full: np.ndarray,
    patch: np.ndarray,
    region: Tuple[int, int, int, int],
    mask: np.ndarray,
) -> np.ndarray:
    """Paste a generated ``patch`` back into ``full`` (H, W, 3) uint8 at
    ``region`` = (x0, y0, x1, y1), blended by the (H, W) float ``mask``
    (fractional values feather the seam). ``patch`` is resized to the
    region if needed (the inpaint ran at processing resolution)."""
    from PIL import Image

    x0, y0, x1, y1 = region
    out = np.asarray(full, np.uint8).copy()
    p = np.asarray(patch)
    if p.shape[:2] != (y1 - y0, x1 - x0):
        p = np.asarray(
            Image.fromarray(p.astype(np.uint8)).resize(
                (x1 - x0, y1 - y0), Image.LANCZOS
            )
        )
    m = np.asarray(mask, np.float32)[y0:y1, x0:x1, None]
    blend = (
        out[y0:y1, x0:x1].astype(np.float32) * (1.0 - m)
        + p.astype(np.float32) * m
    )
    out[y0:y1, x0:x1] = np.clip(np.round(blend), 0, 255).astype(np.uint8)
    return out
