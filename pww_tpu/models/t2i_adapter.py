"""Flax T2I-Adapter (Mou et al. 2023) — structural conditioning residuals.

The reference has no T2I-Adapter; it is the lightweight alternative to
ControlNet in the SD ecosystem the reference serves. Architecture follows
diffusers' ``T2IAdapter``/``FullAdapter`` (pixel-unshuffle ×8 → conv_in →
4 stages of 1×[optional avgpool + 1×1 in_conv] + N residual blocks), emitting
one feature map per UNet down block that
:class:`~pww_tpu.models.unet.UNet2DCondition` adds after the block's last
attention (diffusers ``down_intrablock_additional_residuals`` semantics).

TPU-first property: unlike ControlNet (a per-step UNet-encoder copy), the
adapter depends only on the hint image — it runs ONCE per generation outside
the denoise scan, so its cost is amortized over all steps.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/f, W/f, C·f²), torch ``PixelUnshuffle`` channel
    order (channels-major over the (fh, fw) offsets)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    # torch NCHW pixel_unshuffle output channel index = c*f*f ordering
    # (c, fh, fw); transpose accordingly with channels last.
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


class AdapterResnetBlock(nn.Module):
    """conv3x3 → ReLU → conv1x1, residual (diffusers AdapterResnetBlock)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(
            self.channels, (3, 3), padding=1, dtype=self.dtype, name="block1"
        )(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="block2")(h)
        return x + h


class AdapterBlock(nn.Module):
    """[optional avgpool ↓2] → [optional 1×1 channel proj] → N res blocks."""

    out_channels: int
    num_res_blocks: int
    down: bool
    needs_in_conv: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.down:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if self.needs_in_conv:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="in_conv"
            )(x)
        for i in range(self.num_res_blocks):
            x = AdapterResnetBlock(
                self.out_channels, self.dtype, name=f"resnets_{i}"
            )(x)
        return x


class T2IAdapter(nn.Module):
    """Hint image → one conditioning feature per UNet down block."""

    channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    num_res_blocks: int = 2
    downscale_factor: int = 8
    in_channels: int = 3  # 1 for sketch/depth-style mono hints
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hint: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """``hint``: (B, H, W, in_channels) in [0, 1]. Returns a tuple of
        ``len(channels)`` features at the UNet down-block resolutions."""
        x = pixel_unshuffle(hint.astype(self.dtype), self.downscale_factor)
        x = nn.Conv(
            self.channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)
        feats = []
        prev = self.channels[0]
        for i, ch in enumerate(self.channels):
            x = AdapterBlock(
                ch, self.num_res_blocks, down=(i != 0),
                needs_in_conv=(ch != prev), dtype=self.dtype,
                name=f"body_{i}",
            )(x)
            feats.append(x)
            prev = ch
        return tuple(feats)


def t2i_adapter_key(path: Tuple[str, ...]):
    """Flax param path → diffusers ``T2IAdapter`` state_dict key + transform.

    diffusers keys: ``adapter.conv_in.{weight,bias}``,
    ``adapter.body.{i}.in_conv.*``, ``adapter.body.{i}.resnets.{j}.block{1,2}.*``.
    Returns (torch_key, transform_name) with transform ∈ {"conv", None}.
    """
    flat = list(path)
    if flat[-1] == "kernel":
        suffix, tf = "weight", "conv"
    else:
        suffix, tf = "bias", None
    name = flat[0]
    if name == "conv_in":
        return f"adapter.conv_in.{suffix}", tf
    if name.startswith("body_"):
        i = name.split("_")[1]
        inner = flat[1]
        if inner == "in_conv":
            return f"adapter.body.{i}.in_conv.{suffix}", tf
        j = inner.split("_")[1]  # resnets_{j}
        block = flat[2]  # block1 | block2
        return f"adapter.body.{i}.resnets.{j}.{block}.{suffix}", tf
    raise KeyError(f"unmapped t2i-adapter param path {path}")
