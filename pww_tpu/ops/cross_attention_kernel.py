"""Pallas fused PwW cross-attention epilogue kernel.

The cross-attention sites (image queries × 77 text keys) are small in FLOPs
but in the reference they materialize three full score-sized tensors per call
(scores, bias, probs — reference `paint_with_words/paint_with_words.py:87-116`).
This kernel fuses ``bias = coef·r·w``, the reference's pre-scale add
``(QKᵀ + bias)·scale``, the softmax, and the V-matmul into one VMEM-resident
pass over query blocks, so only Q/K/V/W and the output touch HBM.

The weight function's global reduction over QKᵀ (``max``/``std`` per sample,
reference ``:106``) is inherently two-pass in a blocked kernel (SURVEY.md §7
hard part #1): pass 1 is a cheap jnp reduction (XLA fuses it into a couple of
fused loops over the 4096×77 scores); its per-sample scalar feeds this kernel
as the ``coef`` operand. Custom (non-family) weight functions fall back to the
dense jnp path.

Key padding: L_k=77 pads to the 128 lane width; padded columns are masked to
-inf *after* the bias add so softmax semantics are exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(q_ref, k_ref, v_ref, w_ref, coef_ref, o_ref, *, scale, lk_real, heads):
    q = q_ref[0]  # (Bq, d_pad)
    k = k_ref[0]  # (Lk_pad, d_pad)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, Lk_pad)

    b_idx = pl.program_id(0) // heads
    coef = coef_ref[b_idx]  # f32 = sigma_coef * reduce(QK^T) for this sample
    bias = coef * w_ref[0]  # (Bq, Lk_pad); padded cols are zero in w
    s = (s + bias) * scale

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < lk_real, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def fused_pww_cross_attention(
    q: jnp.ndarray,  # (B, H, Lq, dh)
    k: jnp.ndarray,  # (B, H, Lk, dh)
    v: jnp.ndarray,  # (B, H, Lk, dh)
    w: jnp.ndarray,  # (B, Lq, Lk) token-region weights (zero rows = no bias)
    coef: jnp.ndarray,  # (B,) f32: sigma_coef * reduce(QK^T) per sample
) -> jnp.ndarray:
    """Fused ``softmax((QKᵀ + coef·w)·scale)·V``. Returns (B, H, Lq, dh)."""
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = 1.0 / (dh ** 0.5)

    import os

    pref = int(os.environ.get("PWW_XATTN_BLOCK", "1024"))  # 22.3 vs 22.9 ms/step at 512
    block_q = next((b for b in (pref, 512, 256) if lq % b == 0), None)
    if block_q is None or lq < 256:
        # shapes too odd to tile: dense fallback, bias = coef·w inlined
        # (coef already includes the per-sample reduce)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = (s + coef[:, None, None, None] * w[:, None].astype(jnp.float32)) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    d_pad = max(128, ((dh + 127) // 128) * 128)
    lk_pad = max(128, ((lk + 127) // 128) * 128)
    bh = b * h

    def prep_qv(x):
        x = x.reshape(bh, x.shape[2], dh)
        return jnp.pad(x, ((0, 0), (0, 0), (0, d_pad - dh)))

    qp = prep_qv(q)
    kp = jnp.pad(k.reshape(bh, lk, dh), ((0, 0), (0, lk_pad - lk), (0, d_pad - dh)))
    vp = jnp.pad(v.reshape(bh, lk, dh), ((0, 0), (0, lk_pad - lk), (0, d_pad - dh)))
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, 0), (0, lk_pad - lk)))
    coef_arr = coef.astype(jnp.float32).reshape(b)

    grid = (bh, lq // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, lk_real=lk, heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bhi, qi: (bhi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), lambda bhi, qi: (bhi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), lambda bhi, qi: (bhi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, lk_pad), lambda bhi, qi, _h=h: (bhi // _h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B,) coef vector
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda bhi, qi: (bhi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d_pad), v.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq * lk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize
            + wp.size * 4,
            transcendentals=bh * lq * lk_pad,
        ),
    )(qp, kp, vp, wp, coef_arr)
    return out[:, :, :dh].reshape(b, h, lq, dh)


def pww_cross_attention_reduce(
    q: jnp.ndarray, k: jnp.ndarray, weight_fn
) -> jnp.ndarray:
    """Pass 1: per-sample ``sigma_coef``-less reduction r(QKᵀ) over (H, Lq, Lk).

    Cheap relative to self-attention (Lk = 77); XLA fuses the matmul+reduce.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    return weight_fn.reduce_qk(s, batch_axes=1).reshape(q.shape[0])
