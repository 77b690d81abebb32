"""Flax AutoencoderKL (SD 1.x VAE) — encoder, decoder, diagonal Gaussian.

Replaces diffusers' ``AutoencoderKL`` used by the reference for init-image
encoding and final decoding (reference `paint_with_words/paint_with_words.py:
153-168, 461-463, 48-57`). NHWC layout, bf16 compute with f32 GroupNorms.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import VAEConfig
from ..ops.group_norm import FusedGroupNorm
from ..ops.resize import upsample_nearest_2x


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32
    fused_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        h = FusedGroupNorm(
            self.groups, 1e-6, act="silu", out_dtype=self.dtype,
            use_fused=self.fused_norm, name="norm1",
        )(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = FusedGroupNorm(
            self.groups, 1e-6, act="silu", out_dtype=self.dtype,
            use_fused=self.fused_norm, name="norm2",
        )(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention (diffusers AttentionBlock)."""

    groups: int = 32
    dtype: Any = jnp.float32
    fused_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        z = FusedGroupNorm(
            self.groups, 1e-6, out_dtype=self.dtype,
            use_fused=self.fused_norm, name="norm",
        )(x)
        z = z.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(z)
        k = nn.Dense(c, dtype=self.dtype, name="k")(z)
        v = nn.Dense(c, dtype=self.dtype, name="v")(z)
        scores = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * (c ** -0.5), axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(x.astype(self.dtype))
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                h = VAEResnetBlock(
                    ch, cfg.norm_num_groups, self.dtype,
                    fused_norm=cfg.fused_group_norm,
                    name=f"down_{bi}_resnet_{li}",
                )(h)
            if bi < len(cfg.block_out_channels) - 1:
                # diffusers VAE downsample: asymmetric (0,1) pad + stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                    name=f"down_{bi}_downsample",
                )(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                           fused_norm=cfg.fused_group_norm, name="mid_resnet_0")(h)
        h = VAEAttention(cfg.norm_num_groups, self.dtype,
                         fused_norm=cfg.fused_group_norm, name="mid_attn")(h)
        h = VAEResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                           fused_norm=cfg.fused_group_norm, name="mid_resnet_1")(h)
        h = FusedGroupNorm(
            cfg.norm_num_groups, 1e-6, act="silu", out_dtype=self.dtype,
            use_fused=cfg.fused_group_norm, name="conv_norm_out",
        )(h)
        h = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        return nn.Conv(
            2 * cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )(h)


class VAEDecoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        z = nn.Conv(
            cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )(z.astype(self.dtype))
        rev = list(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(rev[0], cfg.norm_num_groups, self.dtype,
                           fused_norm=cfg.fused_group_norm, name="mid_resnet_0")(h)
        h = VAEAttention(cfg.norm_num_groups, self.dtype,
                         fused_norm=cfg.fused_group_norm, name="mid_attn")(h)
        h = VAEResnetBlock(rev[0], cfg.norm_num_groups, self.dtype,
                           fused_norm=cfg.fused_group_norm, name="mid_resnet_1")(h)
        for bi, ch in enumerate(rev):
            for li in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(
                    ch, cfg.norm_num_groups, self.dtype,
                    fused_norm=cfg.fused_group_norm,
                    name=f"up_{bi}_resnet_{li}",
                )(h)
            if bi < len(rev) - 1:
                h = upsample_nearest_2x(h)
                h = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype, name=f"up_{bi}_upsample"
                )(h)
        h = FusedGroupNorm(
            cfg.norm_num_groups, 1e-6, act="silu", out_dtype=self.dtype,
            use_fused=cfg.fused_group_norm, name="conv_norm_out",
        )(h)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class AutoencoderKL(nn.Module):
    """Bundles encoder + decoder; ``method=`` dispatch for init/apply."""

    config: VAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(self.config, self.dtype)
        self.decoder = VAEDecoder(self.config, self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B,H,W,3) image in [-1,1] → (B,h,w,2*latent) mean/logvar moments."""
        return self.encoder(x)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B,h,w,latent) *unscaled* latents → (B,H,W,3) image in [-1,1]."""
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray):
        moments = self.encode_moments(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        return self.decode(mean)


def sample_from_moments(moments: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Sample the diagonal Gaussian posterior (logvar clamped as diffusers)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
