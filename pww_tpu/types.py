"""Typed PwW conditioning state — replaces the reference's dict smuggling.

The reference threads a dict through diffusers' ``encoder_hidden_states``
argument, keyed by strings like ``CROSS_ATTENTION_WEIGHT_4096`` and mutated
every denoise step (reference `paint_with_words/paint_with_words.py:370-386,
479-482`). Here the same information is a pytree passed as a normal UNet
argument, so it shards, scans, and differentiates like any other operand.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.struct
import jax.numpy as jnp

from .ops.resize import resize_bilinear, resize_nearest_1d
from .ops.weight_functions import AnyWeightFunction, WeightFunction


class PwwState(flax.struct.PyTreeNode):
    """Per-call paint-with-words conditioning.

    Attributes:
      weights: bias pyramid keyed by flattened spatial size ``h·w`` at each
        UNet attention resolution → (B, h·w, n_text_tokens) arrays.
        Unconditional batch rows are all-zero (reference uses the int ``0``).
      weight_orig: (B, H, W, n_text_tokens) full-resolution map, the resize
        fallback for attention resolutions missing from ``weights`` (reference
        ``:96-101``).
      sigma: current scheduler sigma, scalar f32 (refreshed each step).
      weight_fn: static, hashable weight function (not a pytree leaf).
    """

    weights: Dict[int, jnp.ndarray]
    weight_orig: Optional[jnp.ndarray]
    sigma: jnp.ndarray
    weight_fn: AnyWeightFunction = flax.struct.field(
        pytree_node=False, default=WeightFunction()
    )

    def bias_for(self, q_len: int) -> Optional[jnp.ndarray]:
        """(B, q_len, n_tokens) weight map for an attention site, or None.

        Mirrors the reference's size-keyed lookup with the ORIG bilinear +
        1-D-nearest fallback (reference `paint_with_words.py:93-103`); all
        shapes here are static so the choice happens at trace time.
        """
        if q_len in self.weights:
            return self.weights[q_len]
        if self.weight_orig is None:
            return None
        b, h, w, nc = self.weight_orig.shape
        ratio = (h * w / q_len) ** 0.5
        # torch F.interpolate(scale_factor=1/ratio) floors the output size.
        h2, w2 = int(h / ratio), int(w / ratio)
        x = self.weight_orig.transpose(0, 3, 1, 2)  # (B, nc, H, W)
        x = resize_bilinear(x, h2, w2, align_corners=True)
        x = resize_nearest_1d(x.reshape(b, nc, h2 * w2), q_len)
        return x.transpose(0, 2, 1)  # (B, q_len, nc)

    def with_sigma(self, sigma: jnp.ndarray) -> "PwwState":
        return self.replace(sigma=jnp.asarray(sigma, jnp.float32))


class IpState(flax.struct.PyTreeNode):
    """IP-Adapter image conditioning (decoupled cross-attention operand).

    Attributes:
      tokens: (B, n_ip, D_ctx) projected image-prompt tokens; the uncond
        batch rows carry the projection of the ZERO image embedding (the
        IP-Adapter reference's unconditional image input).
      scale: scalar multiplier on the image-attention branch.
    """

    tokens: jnp.ndarray
    scale: jnp.ndarray
