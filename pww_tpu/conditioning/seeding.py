"""Latent initialization: global seed, regional seeding, torch-parity RNG.

Reference behavior (reference `paint_with_words/paint_with_words.py:444-457`):
draw a global ``randn`` latent from ``seed``; for every region with an extra
seed, draw a full latent from that seed, bilinearly resize the binarized
region mask to the latent grid, and overwrite the foreground with the
mask-weighted sum of the regional latents.

RNG parity: torch's ``manual_seed`` stream is not reproducible with
``jax.random``, so for fixed-seed fidelity checks we optionally draw initial
noise with CPU torch (``noise_mode="torch"`` — host-side, prologue only);
default is pure ``jax.random``, with each region's latent drawn from
``PRNGKey(region.seed)`` directly — mirroring the reference's independent
``manual_seed`` generator per region, NOT a fold_in of one master key (two
regions given the same seed intentionally get identical noise, as there).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from .color_context import Region


def make_noise(
    seed: int, shape: Tuple[int, ...], noise_mode: str = "jax"
) -> jnp.ndarray:
    """Standard-normal noise, NHWC ``shape``.

    ``noise_mode="torch"``: draws with CPU torch in NCHW (the reference's
    layout) and transposes — bitwise-identical to ``torch.randn(generator=
    torch.manual_seed(seed))`` for reproducing reference outputs.
    """
    if noise_mode == "torch":
        import torch

        b, h, w, c = shape
        g = torch.manual_seed(seed)
        x = torch.randn((b, c, h, w), generator=g).numpy()
        return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    key = jax.random.PRNGKey(seed)
    return jax.random.normal(key, shape, jnp.float32)


def regional_seed_latents(
    base_latents: jnp.ndarray,  # (B, h, w, C) NHWC
    regions: Sequence[Region],
    noise_mode: str = "jax",
) -> jnp.ndarray:
    """Composite per-region seeded noise over the base latent."""
    seeded = [r for r in regions if r.seed is not None]
    if not seeded:
        return base_latents
    b, h, w, c = base_latents.shape
    masks = []
    lats = []
    for r in seeded:
        binary = (r.mask > 0).astype(np.float32)
        m = resize_bilinear(
            jnp.asarray(binary)[None, None], h, w, align_corners=False
        )[0, 0]
        masks.append(m)
        lats.append(make_noise(r.seed, (b, h, w, c), noise_mode))
    mask_stack = jnp.stack(masks)  # (S, h, w)
    foreground = (jnp.sum(mask_stack, axis=0) > 0)[None, :, :, None]
    summed = sum(l * m[None, :, :, None] for l, m in zip(lats, mask_stack))
    return jnp.where(foreground, summed, base_latents)
