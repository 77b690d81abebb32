"""Separable Gaussian blur matching ``torchvision.transforms.GaussianBlur``.

The reference soft-blurs region masks with a fixed 39x39 kernel and a
per-region sigma (reference `paint_with_words/paint_with_words.py:307-312`).
torchvision builds a normalized sampled-Gaussian 1-D kernel and applies it
separably with *reflect* padding; we reproduce that exactly so sigma-blurred
masks are bit-compatible.
"""
from __future__ import annotations

import jax.numpy as jnp


def gaussian_kernel_1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    half = (kernel_size - 1) * 0.5
    x = jnp.linspace(-half, half, kernel_size, dtype=jnp.float32)
    pdf = jnp.exp(-0.5 * (x / sigma) ** 2)
    return pdf / pdf.sum()


def _reflect_pad_1d(x: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    pads = [(0, 0)] * x.ndim
    pads[axis] = (pad, pad)
    return jnp.pad(x, pads, mode="reflect")


def gaussian_blur(img: jnp.ndarray, kernel_size: int = 39, sigma: float = 1.0) -> jnp.ndarray:
    """Blur the last two axes of ``img`` (any leading batch dims).

    Equivalent to ``torchvision.transforms.GaussianBlur((k, k), (sigma, sigma))``.
    """
    k = gaussian_kernel_1d(kernel_size, sigma).astype(jnp.float32)
    pad = kernel_size // 2
    x = img.astype(jnp.float32)

    # Separable: convolve rows then columns via windowed dot products.
    xp = _reflect_pad_1d(x, pad, axis=-1)
    idx = jnp.arange(img.shape[-1])[:, None] + jnp.arange(kernel_size)[None, :]
    x = jnp.take(xp, idx, axis=-1) @ k  # (..., W, K) @ (K,) -> (..., W)

    xp = _reflect_pad_1d(x, pad, axis=-2)
    idx = jnp.arange(img.shape[-2])[:, None] + jnp.arange(kernel_size)[None, :]
    # take along H: (..., H, K, W) -> move K last -> (..., H, W, K) -> dot k
    x = jnp.moveaxis(jnp.take(xp, idx, axis=-2), -2, -1) @ k
    return x.astype(img.dtype)
