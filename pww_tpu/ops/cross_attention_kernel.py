"""Pallas fused PwW cross-attention: blockwise reduce + fused epilogue.

The cross-attention sites (image queries × 77 text keys) are small in FLOPs
but in the reference they materialize three full score-sized tensors per call
(scores, bias, probs — reference `paint_with_words/paint_with_words.py:87-116`).
Here the full score tensor NEVER touches HBM:

  * :func:`fused_pww_reduce` — the weight function's global reduction over
    QKᵀ (``max``/``std`` per sample, reference ``:106``; SURVEY.md §7 hard
    part #1) runs as a blocked Pallas kernel: each (head, q-block) grid step
    computes its QKᵀ tile in VMEM and emits one tiny partial (block max, or
    block sum + sum-of-squares for ``std``/``mean``); the partials (a few
    hundred floats) are combined into the per-sample scalar ``r`` with exact
    algebra (unbiased variance via ``(Σx² − (Σx)²/n)/(n−1)``, matching
    ``torch.Tensor.std()``).
  * :func:`fused_pww_cross_attention` — fuses ``bias = coef·w``, the
    reference's pre-scale add ``(QKᵀ + bias)·scale``, the softmax, and the
    V-matmul into one VMEM-resident pass over query blocks.

QKᵀ is computed twice in FLOPs (the standard flash-attention recompute
trade: ~2·Lq·77·dh extra MACs, trivial next to the UNet's convs) but the
(B, H, Lq, 77) f32 score tensor — ~40 MB of HBM write+read per 512² site in
the two-pass design this replaces — is never materialized. Custom
(non-family) weight functions fall back to the dense jnp path.

Key padding: L_k=77 pads to the 128 lane width; padded columns are masked to
-inf (softmax) / excluded from the reduction *after* the bias add so the
semantics are exact.
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


def _pick_block_q(lq: int, pref: int):
    """Largest of (pref, 512, 256) that tiles lq; None -> dense fallback."""
    return next((b for b in (pref, 512, 256) if lq % b == 0 and lq >= b), None)


def _pad_qkv(q, k, v, dh, lk):
    b, h, lq = q.shape[0], q.shape[1], q.shape[2]
    d_pad = max(128, ((dh + 127) // 128) * 128)
    lk_pad = max(128, ((lk + 127) // 128) * 128)
    bh = b * h
    qp = jnp.pad(q.reshape(bh, lq, dh), ((0, 0), (0, 0), (0, d_pad - dh)))
    kp = vp = None
    if k is not None:
        kp = jnp.pad(
            k.reshape(bh, lk, dh), ((0, 0), (0, lk_pad - lk), (0, d_pad - dh))
        )
    if v is not None:
        vp = jnp.pad(
            v.reshape(bh, lk, dh), ((0, 0), (0, lk_pad - lk), (0, d_pad - dh))
        )
    return qp, kp, vp, d_pad, lk_pad, bh


def _kernel(q_ref, k_ref, v_ref, w_ref, coef_ref, o_ref, *, scale, lk_real,
            heads, bh_axis=1):
    """Fused epilogue; ``bh_axis`` names the grid axis carrying the
    head-batch index (1 for the default q-block-major order, 0 for the
    head-major variant — the math is identical)."""
    q = q_ref[0]  # (Bq, d_pad)
    k = k_ref[0]  # (Lk_pad, d_pad)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, Lk_pad)

    b_idx = pl.program_id(bh_axis) // heads
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


def _reduce_kernel(q_ref, k_ref, part_ref, *, lk_real, mode):
    """One (head, q-block) partial of the per-sample score reduction.

    Emits an (8, 128) f32 tile per grid step — rows 0-3 broadcast partial
    ``a``, rows 4-7 partial ``b`` — so the output stays VMEM-tile-aligned
    on Mosaic while costing only 4 KB/block in HBM (vs the ~2 MB score
    block it summarizes). Partials per mode:
      max  -> (block max, block max)
      mean -> (block Σx, block Σx)
      std  -> (block mean, block Σ(x−mean)²) — Chan-combinable moments;
              the naive (Σx, Σx²) pair cancels catastrophically in f32
              when |mean| ≫ std.
    """
    q = q_ref[0]  # (Bq, d_pad)
    k = k_ref[0]  # (Lk_pad, d_pad)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    valid = col < lk_real
    if mode == "max":
        a = jnp.max(jnp.where(valid, s, NEG_INF))
        b = a
    elif mode == "mean":
        a = jnp.sum(jnp.where(valid, s, 0.0))
        b = a
    else:  # std
        n_blk = s.shape[0] * lk_real
        a = jnp.sum(jnp.where(valid, s, 0.0)) / n_blk
        d = jnp.where(valid, s - a, 0.0)
        b = jnp.sum(d * d)
    part_ref[0, 0] = jnp.concatenate(
        [jnp.full((4, 128), a, jnp.float32), jnp.full((4, 128), b, jnp.float32)],
        axis=0,
    )


def fused_pww_reduce(
    q: jnp.ndarray,  # (B, H, Lq, dh)
    k: jnp.ndarray,  # (B, H, Lk, dh)
    weight_fn,
    block_q: int = 1024,
) -> jnp.ndarray:
    """Per-sample ``reduce(QKᵀ)`` over (H, Lq, Lk) without materializing
    the scores: blocked Pallas partials + exact host-side combine.

    Semantics match :meth:`WeightFunction.reduce_qk` (the reference's
    per-sample ``qk.max()`` / ``qk.std()``, `paint_with_words.py:106`):
    ``std`` is the unbiased estimator over the sample's full score tensor.
    Returns (B,) f32.
    """
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    mode = weight_fn.reduce_mode
    if mode == "one":
        return jnp.ones((b,), jnp.float32)
    bq = _pick_block_q(lq, block_q)
    if bq is None:
        return pww_cross_attention_reduce(q, k, weight_fn)

    qp, kp, _, d_pad, lk_pad, bh = _pad_qkv(q, k, None, dh, lk)
    nq = lq // bq
    parts = pl.pallas_call(
        functools.partial(_reduce_kernel, lk_real=lk, mode=mode),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda bhi, qi: (bhi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), lambda bhi, qi: (bhi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, 128), lambda bhi, qi: (bhi, qi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nq, 8, 128), jnp.float32),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * lq * lk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size) * q.dtype.itemsize
            + bh * nq * 8 * 128 * 4,
            transcendentals=0,
        ),
    )(qp, kp)
    a = parts[:, :, 0, 0].reshape(b, h * nq)
    if mode == "max":
        return jnp.max(a, axis=-1)
    n = h * lq * lk
    if mode == "mean":
        return jnp.sum(a, axis=-1) / n
    # std: combine per-block (mean, M2) moments with Chan's parallel update —
    # exact-to-f32-stable for any score mean (the one-pass Σx²−(Σx)²/n
    # formula loses ~(mean/std)² digits to cancellation).
    mu = a  # (b, m) block means
    m2 = parts[:, :, 4, 0].reshape(b, h * nq)
    n_blk = jnp.float32(bq * lk)

    def step(carry, x):
        n_a, mu_a, m2_a = carry
        mu_b, m2_b = x
        n_t = n_a + n_blk
        d = mu_b - mu_a
        mu_n = mu_a + d * (n_blk / n_t)
        m2_n = m2_a + m2_b + d * d * (n_a * n_blk / n_t)
        return (n_t, mu_n, m2_n), None

    init = (n_blk, mu[:, 0], m2[:, 0])
    (_, _, m2_t), _ = jax.lax.scan(
        step, init, (mu[:, 1:].T, m2[:, 1:].T)
    )
    var = m2_t / max(n - 1, 1)
    return jnp.sqrt(jnp.maximum(var, 0.0))


def fused_pww_cross_attention(
    q: jnp.ndarray,  # (B, H, Lq, dh)
    k: jnp.ndarray,  # (B, H, Lk, dh)
    v: jnp.ndarray,  # (B, H, Lk, dh)
    w: jnp.ndarray,  # (B, Lq, Lk) token-region weights (zero rows = no bias)
    coef: jnp.ndarray,  # (B,) f32: sigma_coef * reduce(QK^T) per sample
    block_q: int = 1024,  # UNetConfig.xattn_block_q
    grid_order: str = "q",  # "q" (q-block-major, w reused across heads) | "bh"
) -> jnp.ndarray:
    """Fused ``softmax((QKᵀ + coef·w)·scale)·V``. Returns (B, H, Lq, dh)."""
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = 1.0 / (dh ** 0.5)

    bq = _pick_block_q(lq, block_q)
    if bq is None:  # too short (< 256) or not tile-divisible: dense fallback
        # shapes too odd to tile: dense fallback, bias = coef·w inlined
        # (coef already includes the per-sample reduce)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = (s + coef[:, None, None, None] * w[:, None].astype(jnp.float32)) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    qp, kp, vp, d_pad, lk_pad, bh = _pad_qkv(q, k, v, dh, lk)
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, 0), (0, lk_pad - lk)))
    coef_arr = coef.astype(jnp.float32).reshape(b)

    # Grid order "q" (q-block, head-batch): for a fixed q-block the
    # (B, Lq, 77) weight map's block index repeats across the H heads of a
    # sample, so Pallas skips its refetch H−1 times — the f32 w operand is
    # the largest per-step fetch (bq·128·4 = 512 KB vs 32 KB k/v tiles).
    # "bh" keeps k/v resident across a head's whole q sweep instead.
    # Both are config-selectable (UNetConfig.xattn_variant) for in-session
    # A/B measurement on the shared tunneled chip.
    if grid_order == "q":
        grid = (lq // bq, bh)
        bq_ix = lambda qi, bhi: (bhi, qi, 0)  # noqa: E731
        kv_ix = lambda qi, bhi: (bhi, 0, 0)  # noqa: E731
        w_ix = lambda qi, bhi, _h=h: (bhi // _h, qi, 0)  # noqa: E731
        kern = functools.partial(_kernel, scale=scale, lk_real=lk, heads=h)
    else:
        grid = (bh, lq // bq)
        bq_ix = lambda bhi, qi: (bhi, qi, 0)  # noqa: E731
        kv_ix = lambda bhi, qi: (bhi, 0, 0)  # noqa: E731
        w_ix = lambda bhi, qi, _h=h: (bhi // _h, qi, 0)  # noqa: E731
        kern = functools.partial(
            _kernel, scale=scale, lk_real=lk, heads=h, bh_axis=0
        )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), bq_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), kv_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), kv_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lk_pad), w_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B,) coef vector
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d_pad), bq_ix,
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
    """jnp fallback for :func:`fused_pww_reduce` (odd shapes): per-sample
    reduction r(QKᵀ) over (H, Lq, Lk) via a materialized score tensor."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    return weight_fn.reduce_qk(s, batch_axes=1).reshape(q.shape[0])
