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

import jax
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

    transformers ``CLIPImageProcessor`` semantics (the IP-Adapter reference
    preprocessing): bicubic resize of the SHORTEST edge to ``size``
    preserving aspect ratio, center crop to (size, size), 1/255 rescale,
    CLIP mean/std normalization. A direct square resize would squash
    non-square references anisotropically and shift the image embedding.
    Pinned against the real ``transformers.CLIPImageProcessor`` in
    tests/test_ip_adapter.py.
    """
    import numpy as np
    from PIL import Image

    if not isinstance(image, Image.Image):
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        image = Image.fromarray(arr)
    image = image.convert("RGB")
    w, h = image.size
    if h <= w:  # shortest-edge resize (transformers
        nh, nw = size, int(size * w / h)  # get_resize_output_image_size)
    else:
        nh, nw = int(size * h / w), size
    image = image.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - size) // 2, (nh - size) // 2
    image = image.crop((left, top, left + size, top + size))
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


class PerceiverAttention(nn.Module):
    """Resampler attention (tencent-ailab IP-Adapter-plus): queries from the
    learned latents, keys/values from [image features ; latents]; the
    1/sqrt(sqrt(d)) scale is applied to BOTH q and k (their formulation)."""

    dim: int
    dim_head: int = 64
    heads: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim_head * self.heads
        xn = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        ln = nn.LayerNorm(dtype=jnp.float32, name="norm2")(latents).astype(self.dtype)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(ln)
        kv = nn.Dense(
            inner * 2, use_bias=False, dtype=self.dtype, name="to_kv"
        )(jnp.concatenate([xn, ln], axis=-2))
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(self.dim_head)))
        w = jnp.einsum(
            "bhqd,bhkd->bhqk", (q * scale).astype(jnp.float32),
            (k * scale).astype(jnp.float32),
        )
        a = jax.nn.softmax(w, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        b, h, l, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
        return nn.Dense(
            self.dim, use_bias=False, dtype=self.dtype, name="to_out"
        )(out)


class Resampler(nn.Module):
    """IP-Adapter-plus image projection: a small perceiver that cross-attends
    N learned latent queries to the image encoder's penultimate patch tokens
    (checkpoint group ``image_proj`` with a ``latents`` entry)."""

    dim: int  # internal width (768 for the sd15 plus adapter)
    output_dim: int  # cross_attention_dim
    num_queries: int = 16
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    ff_mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_feats: jnp.ndarray) -> jnp.ndarray:
        b = image_feats.shape[0]
        lat0 = self.param(
            "latents", nn.initializers.normal(1.0), (self.num_queries, self.dim)
        )
        latents = jnp.broadcast_to(
            lat0.astype(self.dtype), (b, self.num_queries, self.dim)
        )
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(
            image_feats.astype(self.dtype)
        )
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                self.dim, self.dim_head, self.heads, self.dtype,
                name=f"layers_{i}_attn",
            )(x, latents)
            h = nn.LayerNorm(dtype=jnp.float32, name=f"layers_{i}_ff_norm")(
                latents
            ).astype(self.dtype)
            h = nn.Dense(
                self.dim * self.ff_mult, use_bias=False, dtype=self.dtype,
                name=f"layers_{i}_ff_in",
            )(h)
            h = nn.Dense(
                self.dim, use_bias=False, dtype=self.dtype,
                name=f"layers_{i}_ff_out",
            )(jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(self.dtype))
            latents = latents + h
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="proj_out")(latents)
        return nn.LayerNorm(dtype=jnp.float32, name="norm_out")(out).astype(
            self.dtype
        )
