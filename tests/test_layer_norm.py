"""Fused Pallas LayerNorm vs the unfused flax composition.

Replaces the ``nn.LayerNorm(dtype=f32)`` + ``.astype`` pairs in
TransformerBlock norm1/2/3 (diffusers BasicTransformerBlock; reference
model is stock SD via diffusers 0.10.0).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pww_tpu.ops.layer_norm import FusedLayerNorm, fused_ok, layer_norm


def _unfused(x, scale, bias, eps, out_dtype=None):
    out_dtype = x.dtype if out_dtype is None else out_dtype
    ln = nn.LayerNorm(epsilon=eps, dtype=jnp.float32)
    y = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    return y.astype(out_dtype)


def _mk(shape, dtype, seed=0):
    k = jax.random.PRNGKey(seed)
    return (jax.random.normal(k, shape, jnp.float32) * 2.0 + 0.3).astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_matches_unfused(dtype):
    x = _mk((2, 64, 32), dtype)
    scale = _mk((32,), jnp.float32, 1) * 0.1 + 1.0
    bias = _mk((32,), jnp.float32, 2) * 0.1
    assert fused_ok(x.shape, itemsize=x.dtype.itemsize)
    got = layer_norm(x, scale, bias, eps=1e-5, out_dtype=jnp.bfloat16,
                     force_fused=True)
    want = _unfused(x, scale, bias, 1e-5, out_dtype=jnp.bfloat16)
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=2e-2)


def test_matches_unfused_f32_exactly():
    x = _mk((3, 16, 16, 64), jnp.float32)  # 4D input (pre-flatten shape)
    scale = _mk((64,), jnp.float32, 1) * 0.2 + 1.0
    bias = _mk((64,), jnp.float32, 2)
    got = layer_norm(x, scale, bias, eps=1e-6, force_fused=True)
    want = _unfused(x, scale, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_odd_shapes_fall_back():
    assert fused_ok((1, 128, 128, 320))  # big rows are fine (chunked tiles)
    x = _mk((1, 12, 32), jnp.float32)  # L=12: no aligned chunk
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    got = layer_norm(x, scale, bias, eps=1e-5)
    want = _unfused(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_cpu_path_bit_identical_to_unfused():
    """Non-TPU backends must see the exact flax op structure (bit-exact
    single-vs-batch invariants — see test_group_norm for the full story)."""
    x = _mk((2, 64, 32), jnp.bfloat16)
    scale = _mk((32,), jnp.float32, 1)
    bias = _mk((32,), jnp.float32, 2)
    got = layer_norm(x, scale, bias, eps=1e-5, out_dtype=jnp.bfloat16)
    want = _unfused(x, scale, bias, 1e-5, out_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_module_param_tree_matches_nn_layernorm():
    x = _mk((1, 64, 16), jnp.float32)
    ref = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    mod = FusedLayerNorm(1e-5)
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
