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
