"""Pallas TPU fused LayerNorm (+ output-dtype cast epilogue).

Companion to :mod:`pww_tpu.ops.group_norm`: the same b8 512² device trace
that indicted XLA's GroupNorm stat fusions (43–66 GB/s) showed the
transformer LayerNorms lowered the same way — multi-output
``convert_reduce_fusion``s re-reading the activation for (sum, sum²) and
again for the normalize. Per-token stats only need the lane axis, so this
kernel is ONE streaming pass: each (chunk, C) tile is read once, its
mean/var reduced across lanes in-register, normalized, scaled, and written
in the consumer's dtype.

Numerics: f32 stats/normalize with flax's fast-variance formula
(var = E[x²] − E[x]², clamped at 0), identical to the ``nn.LayerNorm
(dtype=f32)`` + ``.astype`` composition it replaces up to f32 summation
order. On non-TPU backends the op IS that composition bit-for-bit (same
reasoning as group_norm: the suite pins single-vs-batch bit-equality).

Reference parity: LayerNorm sites per diffusers' BasicTransformerBlock
(norm1/2/3) — the reference model is stock SD-1.5 via diffusers 0.10.0
(reference `paint_with_words/paint_with_words.py:174-189`).
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl

from .group_norm import (_fused_backend_ok, _padded_lanes, _pick_chunk,
                         _use_interpret)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    """One (1, chunk, C) tile: per-token stats are chunk-local, so the
    whole norm is a single streaming pass with ~3 chunk blocks of VMEM."""
    xf = x_ref[0, :, :].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale_ref[:, :] \
        + bias_ref[:, :]
    o_ref[0, :, :] = y.astype(o_ref.dtype)


def fused_ok(shape, max_bytes: int = 4 * 1024 * 1024,
             itemsize: int = 2) -> bool:
    """Only pathological L (no power-of-two chunk divisor) falls back."""
    c = shape[-1]
    l = int(np.prod(shape[1:-1])) if len(shape) > 2 else 1
    if l < 8:
        return False
    return _pick_chunk(l, _padded_lanes(c), itemsize) is not None


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    eps: float,
    out_dtype: Any = None,
    use_fused: bool = True,
    max_bytes: int = 4 * 1024 * 1024,
    force_fused: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the last axis of (N, *L, C) ``x``, f32 stats.

    The result is cast to ``out_dtype`` (default: x.dtype) inside the
    kernel so the f32 intermediate never hits HBM.
    """
    out_dtype = x.dtype if out_dtype is None else out_dtype
    if not (use_fused and _fused_backend_ok(force_fused)
            and fused_ok(x.shape, max_bytes, x.dtype.itemsize)):
        return _reference_layer_norm(x, scale, bias, eps=eps,
                                     out_dtype=out_dtype)
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    l = int(np.prod(orig_shape[1:-1])) if len(orig_shape) > 2 else 1
    xr = x.reshape(n, l, c)
    chunk = _pick_chunk(l, _padded_lanes(c), x.dtype.itemsize)
    kern = functools.partial(_ln_kernel, eps=float(eps))
    blk = pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0))
    fixed = pl.BlockSpec((1, c), lambda i, j: (0, 0))
    out = pl.pallas_call(
        kern,
        grid=(n, l // chunk),
        in_specs=[blk, fixed, fixed],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, l, c), out_dtype),
        interpret=_use_interpret(),
    )(xr, scale.astype(jnp.float32).reshape(1, c),
      bias.astype(jnp.float32).reshape(1, c))
    return out.reshape(orig_shape)


class FusedLayerNorm(nn.Module):
    """Drop-in ``nn.LayerNorm`` replacement (same {scale, bias} params)."""

    epsilon: float
    out_dtype: Any = None
    use_fused: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return layer_norm(x, scale, bias, eps=self.epsilon,
                          out_dtype=self.out_dtype, use_fused=self.use_fused)


def _reference_layer_norm(x, scale, bias, *, eps, out_dtype):
    """The literal unfused composition (bit-identical on non-TPU — see
    group_norm._reference_group_norm for why this delegates to flax)."""
    ln = nn.LayerNorm(epsilon=eps, dtype=jnp.float32)
    y = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    return y.astype(out_dtype)
