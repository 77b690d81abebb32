"""Flax CLIP vision tower (image embeddings for IP-Adapter conditioning).

Beyond-the-reference capability: the reference conditions only on text.
Architecture matches ``transformers.CLIPVisionModelWithProjection`` (patch
conv without bias, learned class token + position embeddings, pre-LayerNorm,
NON-causal pre-LN transformer reusing the text tower's encoder layer, post
LayerNorm on the class token, bias-free visual projection) so converted
image-encoder checkpoints drop in — parity is proven against the real torch
module in ``tests/test_ip_adapter.py``.

TPU-first notes: input is NHWC ``(B, H, W, 3)``; the patch embedding is a
stride-``patch`` conv that XLA maps straight onto the MXU; everything jits
as one program with the projection.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config import CLIPVisionConfig
from .clip import CLIPEncoderLayer


class CLIPVisionEncoder(nn.Module):
    """pixel_values (B, H, W, 3) → ``image_embeds`` (B, projection_dim).

    ``output="hidden_and_pooled"`` additionally returns the penultimate
    hidden states (B, 1 + n_patches, hidden) — what the IP-Adapter-plus
    resampler variant consumes.
    """

    config: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, output: str = "embeds"):
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)),
             patches],
            axis=1,
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_positions, cfg.hidden_size),
        )
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="pre_layernorm"
        )(x).astype(self.dtype)
        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(
                cfg, self.dtype, causal=False, name=f"layers_{i}"
            )(x)
        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="post_layernorm"
        )(x[:, 0]).astype(self.dtype)
        embeds = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)
        if output == "embeds":
            return embeds
        if output == "hidden_and_pooled":
            return penultimate, embeds
        raise ValueError(f"unknown output mode {output!r}")


# CLIP image preprocessing constants (OpenAI convention; transformers
# CLIPImageProcessor defaults)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_clip_image(image, size: int = 224) -> jnp.ndarray:
    """PIL / (H, W, 3) uint8 → normalized (1, size, size, 3) float32.

    Bicubic resize to (size, size) + CLIP mean/std normalization
    (transformers CLIPImageProcessor with do_center_crop on a square
    resize — the IP-Adapter reference preprocessing).
    """
    import numpy as np
    from PIL import Image

    if not isinstance(image, Image.Image):
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        image = Image.fromarray(arr)
    image = image.convert("RGB").resize((size, size), Image.BICUBIC)
    x = np.asarray(image, np.float32) / 255.0
    x = (x - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    return jnp.asarray(x[None])


class ImageProjection(nn.Module):
    """IP-Adapter image projection: CLIP ``image_embeds`` → N context tokens.

    The standard (non-plus) variant: one linear layer fanning the global
    image embedding out to ``num_tokens * cross_attention_dim``, followed by
    LayerNorm (checkpoint keys ``image_proj.proj.*`` / ``image_proj.norm.*``).
    """

    cross_attention_dim: int
    num_tokens: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = nn.Dense(
            self.cross_attention_dim * self.num_tokens, dtype=self.dtype,
            name="proj",
        )(image_embeds.astype(self.dtype))
        x = x.reshape(b, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x
        ).astype(self.dtype)
