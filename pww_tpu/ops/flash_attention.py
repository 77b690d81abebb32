"""Pallas TPU flash self-attention for the UNet's spatial attention sites.

The reference materializes the full (heads, L, L) score tensor in its patched
forward (reference `paint_with_words/paint_with_words.py:87-116`); at 512²
latents that is an L=4096 self-attention per transformer block. This kernel
streams K/V blocks through VMEM with the online-softmax recurrence so the
score matrix never hits HBM — the standard TPU flash formulation (one grid
axis over batch·heads, one over query blocks, sequential innermost axis over
key blocks with carried running max / normalizer / accumulator in VMEM
scratch).

Head dims in SD-1.x are 40/80/160; the wrapper zero-pads the contraction dim
to 128 (MXU tile) which leaves softmax and output exactly unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _use_interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on non-TPU backends (tests)."""
    return jax.default_backend() != "tpu"


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, n_kv):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Bq, Bk)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)

    l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    m_scr[:, :1] = m_new

    @pl.when(ki == n_kv - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def flash_self_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block: int = 1024,
    pad_heads: bool = True,
) -> jnp.ndarray:
    """Self-attention, (B, H, L, dh) → (B, H, L, dh). No bias, no mask.

    ``block``: q/k block size (``UNetConfig.flash_block``) — 1024 measured
    fastest on v5e for SD shapes (22.9 vs 26.4 ms/step full UNet at 512²);
    2048 exceeds the 16 MB scoped-VMEM limit.
    Falls back to the jnp path when shapes don't tile cleanly.

    ``pad_heads`` (``UNetConfig.flash_pad_heads``): when True, Q/K/V are
    zero-padded to a 128-lane head dim in HBM before the kernel. Because a
    pallas_call is opaque to XLA, those pads (and the output slice)
    MATERIALIZE — six extra HBM passes of padded Q/K/V plus two of the
    output per site, ~3.2× the useful bytes at dh=40. ``False`` hands the
    kernel dh-lane blocks directly; Mosaic pads tiles internally on the
    VMEM side with no HBM copy. The MXU machine work is identical either
    way: a 128-wide systolic pass per output tile is underfilled at
    contraction 40 regardless of how the operand is stored, and packing
    independent heads into the lanes cannot fix that (block-diagonal
    operands grow M or the contraction by the same factor they fill — see
    docs/BENCHMARKING.md round-5 head-packing note). What this knob attacks
    is the HBM side only.
    """
    b, h, l, dh = q.shape
    scale = 1.0 / (dh ** 0.5)

    block_q = next(
        (b for b in (block, 512, 256) if l % b == 0), None
    )
    block_k = block_q
    if block_q is None:
        from .attention import pww_attention

        return pww_attention(q, k, v)

    d_pad = max(128, ((dh + 127) // 128) * 128) if pad_heads else dh
    bh = b * h

    def prep(x):
        x = x.reshape(bh, l, dh)
        if d_pad != dh:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, d_pad - dh)))
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)
    n_kv = l // block_k

    grid = (bh, l // block_q, n_kv)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_kv=n_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bhi, qi, ki: (bhi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda bhi, qi, ki: (bhi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda bhi, qi, ki: (bhi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda bhi, qi, ki: (bhi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, l, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l * l * d_pad,
            bytes_accessed=3 * bh * l * d_pad * q.dtype.itemsize
            + bh * l * d_pad * q.dtype.itemsize,
            transcendentals=bh * l * l,
        ),
    )(qp, kp, vp)

    if d_pad != dh:
        out = out[:, :, :dh]
    return out.reshape(b, h, l, dh)
