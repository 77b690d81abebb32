"""Token merging (ToMe) for the UNet's self-attention sites.

Opt-in approximation (Bolya & Hoffman 2023, "Token Merging for Fast Stable
Diffusion"): adjacent latent tokens are visually redundant, so the
highest-similarity tokens are merged before self-attention and unmerged
(broadcast back) afterwards — attention cost drops quadratically in the kept
ratio. Matches the tomesd default policy: merge ONLY around attn1 (the PwW
cross-attention bias is per-position, so attn2 is never merged), only at the
full-resolution sites, ratio of the token count bounded by the src partition.

TPU-first formulation: everything is static-shape — the merged length
``L_m = L − r`` is a Python int, the bipartite matching runs as one batched
``argsort`` + ``take_along_axis``/scatter program under jit, and the merge /
unmerge are gathers XLA fuses around the attention kernel. A fixed (0,0)
stride offset replaces tomesd's per-call random offset so the whole denoise
scan stays a single compiled program (documented determinism win; tomesd
itself exposes ``use_rand=False``).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _dst_src_indices(h: int, w: int, sx: int = 2, sy: int = 2):
    """Partition the h*w token grid: one dst per sx*sy block (offset (0,0)),
    the rest src. Returns (dst_idx, src_idx) flat index arrays."""
    ys = jnp.arange(0, h, sy)
    xs = jnp.arange(0, w, sx)
    dst = (ys[:, None] * w + xs[None, :]).reshape(-1)
    mask = jnp.ones((h * w,), bool).at[dst].set(False)
    src = jnp.nonzero(mask, size=h * w - dst.shape[0])[0]
    return dst, src


def build_token_merge(
    metric: jnp.ndarray,  # (B, L, C) block-input features (similarity metric)
    h: int,
    w: int,
    ratio: float,
    sx: int = 2,
    sy: int = 2,
) -> Tuple[Callable, Callable, int]:
    """Bipartite soft matching on a (h, w) token grid.

    Returns ``(merge, unmerge, L_m)``: ``merge`` maps (B, L, C') →
    (B, L_m, C') averaging each merged src into its best-matching dst;
    ``unmerge`` maps (B, L_m, C') back to (B, L, C') broadcasting dst values
    to their merged srcs. ``r = min(int(L·ratio), L_src)`` tokens merge.
    """
    b, l, c = metric.shape
    assert l == h * w, (l, h, w)
    dst_idx, src_idx = _dst_src_indices(h, w, sx, sy)
    n_dst = dst_idx.shape[0]
    n_src = l - n_dst
    r = min(int(l * ratio), n_src)
    # Keep the merged length flash-block-aligned: the flash wrapper requires
    # L divisible by one of (1024, 512, 256) (flash_attention.py q-block
    # ladder) and silently falls back to XLA-dense O(L²) otherwise — at
    # 1024² ratio 0.3 measured 8.01 s/img vs 4.56 exact purely from that
    # cliff (benchmarks/AB_KERNELS_1024_tome.json). Alignment target: 1024
    # at large sites (l ≥ 4096), because a 256-aligned-only L_m drops the
    # kernel to q-block 256 — the A/B'd-slow block size — which still cost
    # ratio 0.3 a 7.41 s/img loss at L_m=11520; 256 at small flash sites.
    # Round r DOWN (merge fewer tokens) so L_m snaps UP: fidelity can only
    # improve vs the requested ratio, already-aligned ratios (0.5, 0.75 at
    # L=4096/16384) are untouched, and a ratio that rounds to r=0 is the
    # honest "merges too little to pay" outcome. Gated to flash-sized
    # sites (L ≥ 1024 = flash_min_seq default): below that the dispatch
    # picks XLA-dense regardless, and rounding would degenerate (at L=256
    # any ratio < 1/4 rounds to zero merges).
    if l >= 1024 and l % 256 == 0 and r > 0:
        align = 1024 if (l >= 4096 and l % 1024 == 0) else 256
        l_m_aligned = -(-(l - r) // align) * align
        r = max(0, l - l_m_aligned)
    n_unm = n_src - r

    m = metric / (jnp.linalg.norm(metric.astype(jnp.float32), axis=-1,
                                  keepdims=True) + 1e-6)
    a = jnp.take(m, src_idx, axis=1)  # (B, n_src, C)
    bm = jnp.take(m, dst_idx, axis=1)  # (B, n_dst, C)
    scores = jnp.einsum("bsc,bdc->bsd", a, bm)  # cosine similarity
    node_max = scores.max(axis=-1)  # (B, n_src)
    node_idx = scores.argmax(axis=-1)  # (B, n_src) best dst per src

    order = jnp.argsort(-node_max, axis=-1)  # most-similar first
    merged_src = order[:, :r]  # (B, r) positions INTO src_idx
    unm_src = order[:, r:]  # (B, n_unm)
    # best dst (position into dst_idx) for each merged src
    merged_dst = jnp.take_along_axis(node_idx, merged_src, axis=1)  # (B, r)

    def merge(x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        src = jnp.take(xf, src_idx, axis=1)  # (B, n_src, C')
        dst = jnp.take(xf, dst_idx, axis=1)  # (B, n_dst, C')
        unm = jnp.take_along_axis(src, unm_src[..., None], axis=1)
        picked = jnp.take_along_axis(src, merged_src[..., None], axis=1)

        def scatter_mean(dst_1, picked_1, mdst_1):
            tot = dst_1.at[mdst_1].add(picked_1)
            cnt = (
                jnp.ones((n_dst,), jnp.float32).at[mdst_1].add(1.0)
            )
            return tot / cnt[:, None]

        dst = jax.vmap(scatter_mean)(dst, picked, merged_dst)
        return jnp.concatenate([unm, dst], axis=1).astype(x.dtype)

    def unmerge(x: jnp.ndarray) -> jnp.ndarray:
        unm, dst = x[:, :n_unm], x[:, n_unm:]
        # src tokens: unmerged keep their value; merged take their dst's
        merged_vals = jnp.take_along_axis(dst, merged_dst[..., None], axis=1)

        def build_src(unm_1, merged_1, uidx_1, midx_1):
            out = jnp.zeros((n_src, x.shape[-1]), x.dtype)
            out = out.at[uidx_1].set(unm_1)
            return out.at[midx_1].set(merged_1)

        src = jax.vmap(build_src)(unm, merged_vals, unm_src, merged_src)
        full = jnp.zeros((x.shape[0], l, x.shape[-1]), x.dtype)
        full = full.at[:, dst_idx].set(dst)
        return full.at[:, src_idx].set(src)

    return merge, unmerge, n_unm + n_dst
