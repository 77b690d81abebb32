"""Attention cores: PwW-biased cross-attention and plain self-attention.

This replaces the reference's monkeypatched ``inj_forward``
(reference `paint_with_words/paint_with_words.py:60-125`): instead of smuggling
a dict through ``encoder_hidden_states`` and patching
``CrossAttention.__call__`` class-wide, the bias map is a first-class operand
threaded through the UNet, and the sigma-dependent weight function is a
traceable object (:mod:`pww_tpu.ops.weight_functions`).

Numerics preserved from the reference:
  * bias is added to the *raw* logits before the 1/sqrt(d) scale:
    ``softmax((QKᵀ + bias) · scale)`` (reference ``:112``) — not the usual
    post-scale additive mask.
  * the weight function's qk-reduction (max/std/…) is over each sample's full
    (heads, q, k) score tensor (reference calls the UNet with batch 1, so its
    ``qk.max()`` is per-sample; we keep that semantics under CFG batching so
    the cond half's reduction never sees uncond scores).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .weight_functions import AnyWeightFunction, CustomWeightFunction


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, L, H*dh) -> (B, H, L, dh)."""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, dh) -> (B, L, H*dh)."""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def pww_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias_w: Optional[jnp.ndarray] = None,
    weight_fn: Optional[AnyWeightFunction] = None,
    sigma: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Scaled-dot-product attention with optional PwW additive logit bias.

    Args:
      q, k, v: (B, H, Lq, dh) / (B, H, Lk, dh).
      bias_w: optional (B, Lq, Lk) token-region weight map ``w`` (zero rows for
        unconditional samples). Broadcast over heads.
      weight_fn: weight function producing ``bias = f(w, sigma, QKᵀ)``.
      sigma: scheduler sigma for the current step (scalar).
      causal: apply a causal mask (CLIP text encoder).

    Returns (B, H, Lq, dh).
    """
    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )

    if bias_w is not None and weight_fn is not None:
        w = bias_w.astype(jnp.float32)[:, None]  # (B, 1, Lq, Lk)
        if isinstance(weight_fn, CustomWeightFunction):
            # Per-sample: each sample's lambda sees only its own (H, Lq, Lk)
            # scores — the reference always evaluates lambdas at batch 1
            # (two separate CFG forwards, `paint_with_words.py:483-499`), so
            # reductions like ``qk.max()`` must not span other batch rows
            # (serving batches, dp shards). vmap also keeps the reduce
            # collective-free when the batch axis is device-sharded.
            bias = jax.vmap(lambda wi, si: weight_fn(wi, sigma, si))(w, scores)
        else:
            r = weight_fn.reduce_qk(scores, batch_axes=1)  # (B,1,1,1)
            bias = weight_fn.sigma_coef(sigma) * r * w
        scores = scores + bias

    if causal:
        lq, lk = scores.shape[-2], scores.shape[-1]
        mask = jnp.tril(jnp.ones((lq, lk), bool))
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)

    probs = jax.nn.softmax(scores * scale, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
