"""Weight-function family must reproduce the reference's lambdas exactly."""
import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pww_tpu.ops.weight_functions import (
    CustomWeightFunction,
    WeightFunction,
    as_weight_function,
)


def test_default_matches_reference_lambda(rng):
    """reference default: 0.1 * w * log(1+sigma) * qk.max()"""
    wf = WeightFunction(scale=0.1, sigma_mode="log1p_sigma", reduce_mode="max")
    qk = rng.standard_normal((8, 64, 77)).astype(np.float32)
    w = rng.standard_normal((64, 77)).astype(np.float32)
    sigma = 7.3
    want = 0.1 * w * math.log(sigma + 1) * qk.max()
    got = np.asarray(wf(jnp.asarray(w), jnp.asarray(sigma), jnp.asarray(qk)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_std_matches_torch_unbiased(rng):
    qk = rng.standard_normal((4, 32, 77)).astype(np.float32)
    wf = WeightFunction(scale=0.3, sigma_mode="log1p_sigma2", reduce_mode="std")
    got_r = np.asarray(wf.reduce_qk(jnp.asarray(qk), batch_axes=0)).item()
    want_r = torch.from_numpy(qk).std().item()  # unbiased by default
    np.testing.assert_allclose(got_r, want_r, rtol=1e-5)
    sigma = 3.0
    want = 0.3 * math.log(1 + sigma**2) * want_r
    got = np.asarray(wf.sigma_coef(sigma)).item() * got_r
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_per_sample_reduction_isolates_batch(rng):
    """Under CFG batching the cond half's max must not see uncond scores."""
    wf = WeightFunction(reduce_mode="max")
    qk = np.stack(
        [np.full((2, 4, 5), -1.0, np.float32), np.full((2, 4, 5), 9.0, np.float32)]
    )
    r = np.asarray(wf.reduce_qk(jnp.asarray(qk), batch_axes=1))
    assert r.shape == (2, 1, 1, 1)
    assert r[0].item() == -1.0 and r[1].item() == 9.0


def test_custom_callable_passthrough(rng):
    f = lambda w, sigma, qk: 0.4 * w * jnp.log(sigma + 1) * jnp.max(qk)
    wf = as_weight_function(f)
    assert isinstance(wf, CustomWeightFunction)
    qk = jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(wf(w, 2.0, qk)), np.asarray(f(w, 2.0, qk)), rtol=1e-6
    )


def test_invalid_modes_raise():
    with pytest.raises(ValueError):
        WeightFunction(sigma_mode="nope")
    with pytest.raises(ValueError):
        WeightFunction(reduce_mode="nope")


def test_weight_function_hashable_static():
    assert hash(WeightFunction()) == hash(WeightFunction())
    assert WeightFunction() == WeightFunction(0.1, "log1p_sigma", "max")
