"""Fused Pallas GroupNorm vs the unfused flax composition.

The kernel replaces every ``nn.GroupNorm`` (+ optional time-embedding
pre-add + optional SiLU + trailing ``.astype``) site in the UNet/VAE
(reference models are stock SD via diffusers 0.10.0 — reference
`paint_with_words/paint_with_words.py:174-189`), so equality is asserted
against the exact unfused sequence each call site previously ran.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pww_tpu.ops.group_norm import FusedGroupNorm, fused_ok, group_norm


def _unfused(x, scale, bias, groups, eps, act=None, add=None,
             out_dtype=None):
    """The literal call-site composition being replaced."""
    out_dtype = x.dtype if out_dtype is None else out_dtype
    if add is not None:
        x = x + add.reshape(
            (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        ).astype(x.dtype)
    gn = nn.GroupNorm(groups, epsilon=eps, dtype=jnp.float32)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    if act == "silu":
        y = nn.silu(y)
    return y.astype(out_dtype)


def _mk(shape, dtype, seed=0):
    k = jax.random.PRNGKey(seed)
    return (jax.random.normal(k, shape, jnp.float32) * 2.0 + 0.3).astype(dtype)


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_matches_unfused(act, dtype):
    x = _mk((2, 8, 8, 32), dtype)
    scale = _mk((32,), jnp.float32, 1) * 0.1 + 1.0
    bias = _mk((32,), jnp.float32, 2) * 0.1
    assert fused_ok(x.shape, 4, itemsize=x.dtype.itemsize)
    got = group_norm(x, scale, bias, groups=4, eps=1e-5, act=act,
                     out_dtype=jnp.bfloat16, force_fused=True)
    want = _unfused(x, scale, bias, 4, 1e-5, act=act, out_dtype=jnp.bfloat16)
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=2e-2 if act else 4e-2,  # one bf16 ulp after the cast
    )


def test_matches_unfused_f32_exactly():
    """In f32 the only difference is summation order (~1e-6)."""
    x = _mk((3, 16, 16, 64), jnp.float32)
    scale = _mk((64,), jnp.float32, 1) * 0.2 + 1.0
    bias = _mk((64,), jnp.float32, 2)
    got = group_norm(x, scale, bias, groups=8, eps=1e-6, force_fused=True)
    want = _unfused(x, scale, bias, 8, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pre_add_matches_resnet_site():
    """norm2's ``h + t[:,None,None,:]`` pre-add, in h's dtype, then GN+SiLU."""
    h = _mk((2, 8, 8, 32), jnp.bfloat16)
    t = _mk((2, 32), jnp.bfloat16, 3)
    scale = _mk((32,), jnp.float32, 1) * 0.1 + 1.0
    bias = _mk((32,), jnp.float32, 2) * 0.1
    got = group_norm(h, scale, bias, groups=4, eps=1e-5, act="silu", add=t,
                     out_dtype=jnp.bfloat16, force_fused=True)
    want = _unfused(h, scale, bias, 4, 1e-5, act="silu", add=t,
                    out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_fallback_equals_kernel():
    x = _mk((2, 8, 8, 32), jnp.bfloat16)
    t = _mk((2, 32), jnp.bfloat16, 3)
    scale = _mk((32,), jnp.float32, 1)
    bias = _mk((32,), jnp.float32, 2)
    a = group_norm(x, scale, bias, groups=4, eps=1e-5, act="silu", add=t,
                   force_fused=True)
    b = group_norm(x, scale, bias, groups=4, eps=1e-5, act="silu", add=t,
                   use_fused=False)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               rtol=1e-2, atol=2e-2)  # 1 bf16 ulp


def test_oversize_uses_chunked_scheme():
    """Rows over the whole-row VMEM budget route to the two-kernel chunked
    scheme (stats-accumulate + apply) instead of falling back to XLA."""
    assert fused_ok((1, 128, 128, 320), 32)  # top UNet level at 1024²
    x = _mk((2, 32, 32, 16), jnp.bfloat16)
    t = _mk((2, 16), jnp.bfloat16, 3)
    scale = _mk((16,), jnp.float32, 1) * 0.1 + 1.0
    bias = _mk((16,), jnp.float32, 2) * 0.1
    got = group_norm(x, scale, bias, groups=4, eps=1e-5, act="silu", add=t,
                     out_dtype=jnp.bfloat16, force_fused=True,
                     whole_row_bytes=0)  # force the chunked scheme
    want = _unfused(x, scale, bias, 4, 1e-5, act="silu", add=t,
                    out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=2e-2)


def test_odd_shapes_fall_back():
    x = _mk((1, 4, 3, 32), jnp.float32)  # L=12: no aligned chunk
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    got = group_norm(x, scale, bias, groups=4, eps=1e-5)
    want = _unfused(x, scale, bias, 4, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_module_param_tree_matches_nn_groupnorm():
    """Same {scale, bias} tree so checkpoints round-trip unchanged."""
    x = _mk((1, 8, 8, 16), jnp.float32)
    ref = nn.GroupNorm(4, epsilon=1e-5, dtype=jnp.float32)
    mod = FusedGroupNorm(4, 1e-5)
    p_ref = ref.init(jax.random.PRNGKey(0), x)
    p_mod = mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_ref) == \
        jax.tree_util.tree_structure(p_mod)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_mod)):
        assert a.shape == b.shape and a.dtype == b.dtype
    y_ref = ref.apply(p_ref, x)
    y_mod = mod.apply(p_ref, x)
    np.testing.assert_allclose(np.asarray(y_mod), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_cpu_path_bit_identical_to_unfused():
    """On non-TPU backends group_norm must be BIT-identical to the flax
    composition it replaced: the suite's single-vs-batch equality tests
    compare uint8 images across differently-sharded programs, which only
    holds if XLA sees the exact same op structure (the interpret-mode
    kernel reassociates sums and broke one pixel of
    test_generate_batch_custom_weight_fn_matches_single)."""
    x = _mk((2, 8, 8, 32), jnp.bfloat16)
    t = _mk((2, 32), jnp.bfloat16, 3)
    scale = _mk((32,), jnp.float32, 1)
    bias = _mk((32,), jnp.float32, 2)
    got = group_norm(x, scale, bias, groups=4, eps=1e-5, act="silu", add=t,
                     out_dtype=jnp.bfloat16)  # default: no force_fused
    want = _unfused(x, scale, bias, 4, 1e-5, act="silu", add=t,
                    out_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_grouping_is_contiguous_channels():
    """Channel c belongs to group c // (C/G) — torch/diffusers convention."""
    c, g = 8, 2
    x = np.zeros((1, 1, 8, c), np.float32)
    x[..., : c // g] = np.arange(8 * c // g).reshape(8, c // g)  # group 0 only
    got = group_norm(jnp.asarray(x), jnp.ones((c,)), jnp.zeros((c,)),
                     groups=g, eps=1e-5, force_fused=True)
    # group 1 saw all-zero input → normalizes to exactly zero
    np.testing.assert_array_equal(np.asarray(got)[..., c // g:], 0.0)
    assert np.abs(np.asarray(got)[..., : c // g]).max() > 0.5
