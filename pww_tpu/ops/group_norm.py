"""Pallas TPU fused GroupNorm (+ optional pre-add and SiLU epilogue).

Why: a device trace of the batch-8 512² denoise program (round 4) showed
XLA's GroupNorm lowering — multi-output ``convert_reduce_fusion``s
producing (sum, sum-of-squares, passthrough) — running at 43–66 GB/s on
v5e, ~8× below the ~430 GB/s the same program's plain copies sustain.
Those fusions totalled 1.2 s of the 4.5 s call (26%), more than the
convolutions.

Two schemes, picked by the per-row slab size (both stream at HBM
bandwidth; group stats are formed with tiny one-hot matmuls because
cross-lane C↔G mixing is a matmul, not a VPU reduce):

* **whole-row** (slab ≤ ``whole_row_bytes``, default 1.5 MB padded): grid
  (N,); the (L, C) slab for one batch row lives in VMEM; pass 1
  accumulates per-channel f32 sum/sum² in chunked ``fori`` steps, pass 2
  normalizes + optional pre-add/SiLU and writes the consumer's dtype.
  ONE HBM read + ONE write. Larger slabs OOM the in-program scoped VMEM
  (measured: the 4096×320 level inside the full b8 UNet), hence:
* **chunked two-kernel** (any L divisible by a lane-friendly chunk): a
  stats kernel over grid (N, L/chunk) accumulates (sum, sum²) into a
  VMEM-resident (1, 2, C) block (revisited across chunk steps, written
  back once per row), tiny XLA glue forms per-row affine (a, b) =
  (rstd·scale, bias − mean·rstd·scale), and an apply kernel streams
  y = x·a + b (+pre-add/SiLU). TWO reads + ONE write — still far above
  XLA's effective bandwidth, with ~1 MB of scoped VMEM, so it covers the
  top UNet levels AND the large-spatial VAE levels.

Numerics: stats and normalization in f32 like the flax path (CLAUDE.md
convention); results differ from ``nn.GroupNorm`` only by f32 summation
order and one fma rearrangement (~1e-7 relative), inside every
golden/parity tolerance. On non-TPU backends the op IS the literal flax
composition bit-for-bit (the suite pins single-vs-batch bit-equality
across differently-sharded programs); ``force_fused`` lets unit tests
exercise the kernels in interpret mode.

Reference parity: GroupNorm sites per diffusers' UNet/VAE blocks (ResNet
norm1/norm2, attention pre-norm, conv_norm_out); the reference model is
stock SD so the sites mirror `/root/reference/paint_with_words/
paint_with_words.py:391-510`'s UNet via diffusers 0.10.0.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl


def _use_interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on non-TPU backends."""
    return jax.default_backend() != "tpu"


def _fused_backend_ok(force_fused: bool) -> bool:
    """The kernel only replaces XLA's GroupNorm on a real TPU.

    On CPU the interpret-mode kernel would be slower AND break the suite's
    bit-exactness invariants (single-vs-batch equality asserts identical
    bits across differently-sharded programs; the jnp fallback below is
    op-for-op the composition those tests pinned). ``force_fused`` lets the
    kernel unit tests exercise interpret mode explicitly.
    """
    return force_fused or jax.default_backend() == "tpu"


def _padded_lanes(c: int) -> int:
    """Mosaic pads the lane (last) dim to a multiple of 128 in VMEM."""
    return -(-c // 128) * 128


def _pick_chunk(l: int, c_pad: int = 0, itemsize: int = 2,
                budget: int = 1024 * 1024) -> Optional[int]:
    """Largest power-of-two row chunk dividing ``l`` whose padded block
    fits ``budget`` bytes (the double-buffered streaming block)."""
    for ch in (512, 256, 128, 64, 32, 16, 8):
        if l % ch == 0 and (not c_pad or ch * c_pad * itemsize <= budget):
            return min(ch, l)
    return None


# ---------------------------------------------------------------- whole-row


def _gn_kernel(x_ref, scale_ref, bias_ref, gsum_ref, gbcast_ref, add_ref,
               o_ref, *, eps, act, chunk, n_chunks, count):
    """One batch row: x_ref (1, L, C) → o_ref (1, L, C)."""
    zero = jnp.zeros((1, x_ref.shape[-1]), jnp.float32)

    def _load(i):
        xb = x_ref[0, pl.ds(i * chunk, chunk), :]
        if add_ref is not None:
            # pre-add in the INPUT dtype: matches the unfused `h + t`
            # (bf16) rounding bit-for-bit before stats are taken
            xb = xb + add_ref[0, :, :].astype(xb.dtype)
        return xb.astype(jnp.float32)

    def _acc(i, carry):
        cs, css = carry
        xf = _load(i)
        cs = cs + jnp.sum(xf, axis=0, keepdims=True)
        css = css + jnp.sum(xf * xf, axis=0, keepdims=True)
        return cs, css

    cs, css = jax.lax.fori_loop(0, n_chunks, _acc, (zero, zero))

    # channel → group sums on the MXU (one-hot (C,G)), then group → channel
    # broadcast-back ((G,C)); cross-lane mixing is a matmul, not a reduce.
    # HIGHEST precision: the default single-pass bf16 MXU matmul truncates
    # the f32 stat sums to 8 mantissa bits (measured ~0.03 abs output error
    # at 512² shapes on v5e); these dots are (1,C)×(C,G) — negligible time.
    hi = jax.lax.Precision.HIGHEST
    gs = jnp.dot(cs, gsum_ref[:, :], precision=hi,
                 preferred_element_type=jnp.float32)
    gss = jnp.dot(css, gsum_ref[:, :], precision=hi,
                  preferred_element_type=jnp.float32)
    mean_g = gs / count
    var_g = jnp.maximum(gss / count - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, gbcast_ref[:, :], precision=hi,
                     preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, gbcast_ref[:, :], precision=hi,
                     preferred_element_type=jnp.float32)
    a = rstd_c * scale_ref[:, :]  # (1, C) f32
    b = bias_ref[:, :]

    def _norm(i, _):
        xf = _load(i)
        y = (xf - mean_c) * a + b
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, _norm, 0)


def _gn_kernel_no_add(x_ref, scale_ref, bias_ref, gsum_ref, gbcast_ref,
                      o_ref, **kw):
    _gn_kernel(x_ref, scale_ref, bias_ref, gsum_ref, gbcast_ref, None,
               o_ref, **kw)


def _whole_row(xr, scale2, bias2, gsum, gbcast, add, *, eps, act, chunk,
               out_dtype):
    n, l, c = xr.shape
    groups = gsum.shape[1]
    kern = functools.partial(
        _gn_kernel if add is not None else _gn_kernel_no_add,
        eps=float(eps), act=act, chunk=chunk, n_chunks=l // chunk,
        count=float(l * (c // groups)),
    )
    row = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0))
    fixed = pl.BlockSpec((1, c), lambda i: (0, 0))
    in_specs = [row, fixed, fixed,
                pl.BlockSpec((c, groups), lambda i: (0, 0)),
                pl.BlockSpec((groups, c), lambda i: (0, 0))]
    args = [xr, scale2, bias2, gsum, gbcast]
    if add is not None:
        # (N, 1, C) so the block's last two dims are full-array (Mosaic
        # requires blocked dims be 8/128-divisible otherwise; C=320 isn't)
        in_specs.append(pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)))
        args.append(add.reshape(n, 1, c))
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=in_specs,
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n, l, c), out_dtype),
        interpret=_use_interpret(),
    )(*args)


# ------------------------------------------------------- chunked two-kernel


def _gn_stats_kernel(x_ref, add_ref, o_ref):
    """Accumulate (sum, sum²) for one chunk into the row's (1, 2, C) block.

    The o block's index map ignores the chunk axis, so it stays resident
    in VMEM across all of a row's chunk steps and is written back once.
    """
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    xb = x_ref[0, :, :]
    if add_ref is not None:
        xb = xb + add_ref[0, :, :].astype(xb.dtype)
    xf = xb.astype(jnp.float32)
    o_ref[0, 0, :] = o_ref[0, 0, :] + jnp.sum(xf, axis=0)
    o_ref[0, 1, :] = o_ref[0, 1, :] + jnp.sum(xf * xf, axis=0)


def _gn_stats_kernel_no_add(x_ref, o_ref):
    _gn_stats_kernel(x_ref, None, o_ref)


def _gn_apply_kernel(x_ref, a_ref, b_ref, add_ref, o_ref, *, act):
    xb = x_ref[0, :, :]
    if add_ref is not None:
        xb = xb + add_ref[0, :, :].astype(xb.dtype)
    y = xb.astype(jnp.float32) * a_ref[0, :, :] + b_ref[0, :, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0, :, :] = y.astype(o_ref.dtype)


def _gn_apply_kernel_no_add(x_ref, a_ref, b_ref, o_ref, **kw):
    _gn_apply_kernel(x_ref, a_ref, b_ref, None, o_ref, **kw)


def _chunked(xr, scale2, bias2, gsum, gbcast, add, *, eps, act, chunk,
             groups, out_dtype):
    n, l, c = xr.shape
    blk = pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0))
    per_row = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))
    addr = None if add is None else add.reshape(n, 1, c)

    in_specs = [blk]
    args = [xr]
    kern = _gn_stats_kernel_no_add
    if add is not None:
        in_specs.append(per_row)
        args.append(addr)
        kern = _gn_stats_kernel
    sums = pl.pallas_call(
        kern,
        grid=(n, l // chunk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        interpret=_use_interpret(),
    )(*args)

    # tiny XLA glue: (N, 2, C) → per-row affine (a, b); HIGHEST precision
    # for the same mantissa reason as the whole-row kernel's dots
    hi = jax.lax.Precision.HIGHEST
    count = float(l * (c // groups))
    gsn = jnp.einsum("nkc,cg->nkg", sums, gsum, precision=hi)  # (N, 2, G)
    mean_g = gsn[:, 0] / count
    var_g = jnp.maximum(gsn[:, 1] / count - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.einsum("ng,gc->nc", mean_g, gbcast, precision=hi)
    rstd_c = jnp.einsum("ng,gc->nc", rstd_g, gbcast, precision=hi)
    a = (rstd_c * scale2).reshape(n, 1, c)
    b = (bias2 - mean_c * rstd_c * scale2).reshape(n, 1, c)

    in_specs = [blk, per_row, per_row]
    args = [xr, a, b]
    kern = functools.partial(_gn_apply_kernel_no_add, act=act)
    if add is not None:
        in_specs.append(per_row)
        args.append(addr)
        kern = functools.partial(_gn_apply_kernel, act=act)
    return pl.pallas_call(
        kern,
        grid=(n, l // chunk),
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, l, c), out_dtype),
        interpret=_use_interpret(),
    )(*args)


# ------------------------------------------------------------------ public


def fused_ok(shape, groups: int, max_bytes: int = 4 * 1024 * 1024,
             itemsize: int = 2) -> bool:
    """Can a Pallas scheme handle this (N, ..., C) activation?

    ``max_bytes`` retained for API compatibility (it bounds nothing the
    chunked scheme needs; only pathological L with no power-of-two chunk
    divisor falls back to XLA now).
    """
    c = shape[-1]
    l = int(np.prod(shape[1:-1])) if len(shape) > 2 else 1
    if c % groups or l < 8:
        return False
    return _pick_chunk(l, _padded_lanes(c), itemsize) is not None


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    groups: int,
    eps: float,
    act: Optional[str] = None,
    add: Optional[jnp.ndarray] = None,
    out_dtype: Any = None,
    use_fused: bool = True,
    max_bytes: int = 4 * 1024 * 1024,
    whole_row_bytes: int = 1536 * 1024,
    force_fused: bool = False,
) -> jnp.ndarray:
    """GroupNorm over the channel-last axis of (N, *spatial, C) ``x``.

    f32 stats/normalize; optional ``add`` (N, C) is added to ``x`` in x's
    dtype BEFORE the norm (the ResNet time-embedding shift); ``act``
    ("silu" | None) is applied in f32 after scale/bias; the result is cast
    to ``out_dtype`` (default: x.dtype).
    """
    out_dtype = x.dtype if out_dtype is None else out_dtype
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    if not (use_fused and _fused_backend_ok(force_fused)
            and fused_ok(x.shape, groups, max_bytes, x.dtype.itemsize)):
        return _reference_group_norm(
            x, scale, bias, groups=groups, eps=eps, act=act, add=add,
            out_dtype=out_dtype,
        )

    l = int(np.prod(orig_shape[1:-1])) if len(orig_shape) > 2 else 1
    xr = x.reshape(n, l, c)
    cpg = c // groups
    # one-hot mixing matrices (constants; folded into the executable)
    gidx = np.arange(c) // cpg
    gsum = jnp.asarray(np.eye(groups, dtype=np.float32)[gidx])      # (C, G)
    gbcast = jnp.asarray(np.eye(groups, dtype=np.float32)[gidx].T)  # (G, C)
    scale2 = scale.astype(jnp.float32).reshape(1, c)
    bias2 = bias.astype(jnp.float32).reshape(1, c)

    slab = l * _padded_lanes(c) * x.dtype.itemsize
    if slab <= whole_row_bytes:
        chunk = _pick_chunk(l)
        out = _whole_row(xr, scale2, bias2, gsum, gbcast, add, eps=eps,
                         act=act, chunk=chunk, out_dtype=out_dtype)
    else:
        chunk = _pick_chunk(l, _padded_lanes(c), x.dtype.itemsize)
        out = _chunked(xr, scale2, bias2, gsum, gbcast, add, eps=eps,
                       act=act, chunk=chunk, groups=groups,
                       out_dtype=out_dtype)
    return out.reshape(orig_shape)


class FusedGroupNorm(nn.Module):
    """Drop-in ``nn.GroupNorm`` replacement with a fused epilogue.

    Declares the same param tree as ``flax.linen.GroupNorm`` (``scale``/
    ``bias`` of shape (C,), f32) so checkpoints round-trip unchanged, but
    computes norm + optional time-embedding pre-add + optional SiLU in one
    Pallas pass (with a jnp fallback for shapes the kernel can't block).
    ``out_dtype`` replaces the call sites' trailing ``.astype`` so the
    f32 intermediate never hits HBM.
    """

    num_groups: int
    epsilon: float
    act: Optional[str] = None
    out_dtype: Any = None
    use_fused: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 add: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(
            x, scale, bias, groups=self.num_groups, eps=self.epsilon,
            act=self.act, add=add, out_dtype=self.out_dtype,
            use_fused=self.use_fused,
        )


def _reference_group_norm(x, scale, bias, *, groups, eps, act, add,
                          out_dtype):
    """The literal unfused composition the kernel replaces.

    Delegates to ``flax.linen.GroupNorm`` (not a re-derivation) so the
    non-TPU path is BIT-identical to what every golden/parity test pinned
    before the kernel existed — the suite asserts single-vs-batch equality
    across differently-compiled programs, which only holds when the op
    structure XLA sees is unchanged.
    """
    if add is not None:
        x = x + add.astype(x.dtype).reshape(
            (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        )
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    if act == "silu":
        y = nn.silu(y)
    return y.astype(out_dtype)
