"""Alternative conv lowerings for the UNet ResNet 3×3 convolutions.

Round-4 roofline work (docs/BENCHMARKING.md) left b8 denoise MXU-bound at
58% with the 320-channel stages named as a structural cost (320 lanes =
2.5 MXU tiles on the contraction/output axes). These lowerings exist to
TEST, not assume, whether XLA's native conv tiling is beatable at those
shapes (VERDICT r4 item 3b/3c):

- ``"xla"``      lax.conv_general_dilated NHWC — what flax nn.Conv emits.
- ``"im2col"``   explicit patch extraction + one big matmul: M = B·H·W,
                 K = 9·C_in, N = C_out. The contraction grows 9× (2880 at
                 C=320 = 22.5 full MXU tiles vs 2.5), trading XLA's
                 spatial-reuse conv schedule for one dense MXU-friendly
                 GEMM.
- ``"nchw"``     the identical conv with NCHW operand dimension numbers
                 (kernel stays HWIO); XLA's layout assignment then picks
                 C-major tilings where it wants — measures whether the
                 NHWC default leaves anything behind.

All three are numerically identical (same lax dot/conv semantics, same
params); ``tests/test_conv_lowering.py`` pins equality. Selection via
``UNetConfig.conv_lowering``; defaults follow PERF_DEFAULTS.md.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def conv2d_lowered(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    strides: Tuple[int, int] = (1, 1),
    padding: Any = ((1, 1), (1, 1)),
    lowering: str = "xla",
) -> jnp.ndarray:
    """NHWC conv with an HWIO kernel under the chosen lowering."""
    kh, kw, cin, cout = kernel.shape
    if lowering == "im2col" and strides == (1, 1):
        # lax.conv_general_dilated_patches returns NHWC features ordered
        # channel-major then spatial: feature dim = C_in * (kh*kw) with
        # index c*(kh*kw) + (i*kw + j)  — so the matmul weight is the HWIO
        # kernel transposed to (C_in, kh, kw, C_out) then flattened.
        patches = jax.lax.conv_general_dilated_patches(
            x, (kh, kw), strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H', W', C_in*kh*kw)
        b, hh, ww, _ = patches.shape
        wmat = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(kh * kw * cin, cout)
        out = jax.lax.dot_general(
            patches.reshape(b * hh * ww, kh * kw * cin), wmat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=x.dtype,
        ).reshape(b, hh, ww, cout)
    elif lowering == "nchw":
        xc = jnp.transpose(x, (0, 3, 1, 2))
        out = jax.lax.conv_general_dilated(
            xc, kernel, strides, padding,
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )
        out = jnp.transpose(out, (0, 2, 3, 1))
    else:  # "xla" (default) — identical to flax nn.Conv's lowering
        out = jax.lax.conv_general_dilated(
            x, kernel, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if bias is not None:
        out = out + bias
    return out


class Conv2D(nn.Module):
    """Drop-in for ``nn.Conv`` (same param names/shapes: HWIO ``kernel``,
    ``bias``) with a selectable lowering. Checkpoints load identically."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    lowering: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        ).astype(self.dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        ).astype(self.dtype)
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        return conv2d_lowered(
            x.astype(self.dtype), kernel, bias, self.strides, pad,
            self.lowering,
        )
