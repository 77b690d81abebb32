"""Attention core tests: PwW bias numerics + Pallas flash vs jnp reference."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from pww_tpu.ops.attention import merge_heads, pww_attention, split_heads
from pww_tpu.ops.flash_attention import flash_self_attention
from pww_tpu.ops.weight_functions import CustomWeightFunction, WeightFunction


def _torch_inj_forward_core(q, k, v, w, sigma, weight_fn, scale):
    """The reference's patched-attention math (paint_with_words.py:87-116):
    scores, bias from the *raw* scores, (scores + bias) * scale, softmax, V."""
    scores = torch.matmul(q, k.transpose(-1, -2))
    bias = weight_fn(w, sigma, scores)
    probs = ((scores + bias) * scale).softmax(dim=-1)
    return torch.matmul(probs, v)


def test_pww_attention_matches_reference_math(rng):
    b, h, lq, lk, d = 1, 2, 16, 8, 8
    q = rng.standard_normal((b, h, lq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    w = rng.random((b, lq, lk)).astype(np.float32)
    sigma = 5.0
    scale = 1.0 / np.sqrt(d)

    got = pww_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        bias_w=jnp.asarray(w),
        weight_fn=WeightFunction(0.1, "log1p_sigma", "max"),
        sigma=jnp.asarray(sigma),
    )

    tf = lambda w_, s_, qk: 0.1 * w_ * np.log(1 + s_) * qk.max()
    want = _torch_inj_forward_core(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        torch.from_numpy(w[:, None]), sigma, tf, scale,
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_pre_scale_bias_add_is_preserved(rng):
    """(QK^T + bias)*scale differs from QK^T*scale + bias — ensure we do the
    former (reference quirk, paint_with_words.py:112)."""
    b, h, lq, lk, d = 1, 1, 4, 4, 64  # large d -> small scale -> big difference
    q = rng.standard_normal((b, h, lq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    w = np.ones((b, lq, lk), np.float32) * 10.0
    wf = WeightFunction(1.0, "one", "one")  # bias == w exactly

    got = np.asarray(
        pww_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            bias_w=jnp.asarray(w), weight_fn=wf, sigma=jnp.asarray(1.0),
        )
    )
    scale = 1 / np.sqrt(d)
    scores = np.einsum("bhqd,bhkd->bhqk", q, k)
    pre = torch.softmax(torch.from_numpy((scores + 10.0) * scale), -1).numpy()
    post = torch.softmax(torch.from_numpy(scores * scale + 10.0), -1).numpy()
    want_pre = np.einsum("bhqk,bhkd->bhqd", pre, v)
    want_post = np.einsum("bhqk,bhkd->bhqd", post, v)
    np.testing.assert_allclose(got, want_pre, atol=1e-5)
    # constant bias is a softmax no-op pre-scale and post-scale alike; use a
    # non-constant bias to prove ordering:
    w2 = rng.random((b, lq, lk)).astype(np.float32) * 20
    got2 = np.asarray(
        pww_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            bias_w=jnp.asarray(w2), weight_fn=wf, sigma=jnp.asarray(1.0),
        )
    )
    pre2 = torch.softmax(torch.from_numpy((scores + w2[:, None]) * scale), -1).numpy()
    post2 = torch.softmax(torch.from_numpy(scores * scale + w2[:, None]), -1).numpy()
    assert not np.allclose(pre2, post2, atol=1e-3)  # orders genuinely differ
    np.testing.assert_allclose(
        got2, np.einsum("bhqk,bhkd->bhqd", pre2, v), atol=1e-5
    )


def test_custom_weight_function_in_attention(rng):
    b, h, lq, lk, d = 1, 2, 8, 8, 4
    arrs = [rng.standard_normal((b, h, lq if i == 0 else lk, d)).astype(np.float32) for i in range(3)]
    w = rng.random((b, lq, lk)).astype(np.float32)
    f = CustomWeightFunction(lambda w_, s_, qk: 0.3 * w_ * jnp.std(qk))
    out = pww_attention(
        *(jnp.asarray(a) for a in arrs), bias_w=jnp.asarray(w),
        weight_fn=f, sigma=jnp.asarray(2.0),
    )
    assert out.shape == (b, h, lq, d)
    assert np.isfinite(np.asarray(out)).all()


def test_split_merge_heads_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    y = merge_heads(split_heads(x, 4))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_flash_matches_jnp_reference(rng):
    """Pallas flash self-attention (interpret mode on CPU) vs dense path."""
    b, h, l, d = 1, 2, 512, 40  # SD head_dim=40 exercises the pad-to-128 path
    q = rng.standard_normal((b, h, l, d)).astype(np.float32)
    k = rng.standard_normal((b, h, l, d)).astype(np.float32)
    v = rng.standard_normal((b, h, l, d)).astype(np.float32)
    want = np.asarray(pww_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    got = np.asarray(
        flash_self_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_falls_back_on_odd_lengths(rng):
    b, h, l, d = 1, 1, 100, 16  # 100 not divisible by 256
    args = [jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32)) for _ in range(3)]
    out = flash_self_attention(*args)
    want = pww_attention(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_custom_weight_function_is_per_sample(rng):
    """A batched call must give each sample the bias it would get alone —
    the lambda's reductions (e.g. qk.max()) must not span other batch rows
    (the reference evaluates lambdas at batch 1, paint_with_words.py:483-499)."""
    b, h, lq, lk, d = 3, 2, 8, 8, 4
    q = rng.standard_normal((b, h, lq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    w = rng.random((b, lq, lk)).astype(np.float32)
    f = CustomWeightFunction(lambda w_, s_, qk: 0.3 * w_ * jnp.max(qk))
    batched = np.asarray(pww_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        bias_w=jnp.asarray(w), weight_fn=f, sigma=jnp.asarray(2.0),
    ))
    for i in range(b):
        alone = np.asarray(pww_attention(
            jnp.asarray(q[i:i+1]), jnp.asarray(k[i:i+1]), jnp.asarray(v[i:i+1]),
            bias_w=jnp.asarray(w[i:i+1]), weight_fn=f, sigma=jnp.asarray(2.0),
        ))
        np.testing.assert_allclose(batched[i:i+1], alone, atol=1e-6)
