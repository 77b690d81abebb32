"""Traceable paint-with-words weight functions.

The reference accepts an arbitrary Python lambda
``weight_function(w, sigma, qk)`` evaluated on the *full pre-softmax score
tensor* inside every patched cross-attention (reference
`paint_with_words/paint_with_words.py:106, 402-405`; the README's sweep uses
``0.1·w·log(1+σ)·max(QKᵀ)``, ``0.3·w·log(1+σ)·std(QKᵀ)``,
``0.3·w·log(1+σ²)·std(QKᵀ)`` variants).

Under jit we split that contract into:
  * a host/step-side scalar ``sigma_coef(sigma) = scale · g(sigma)``, and
  * an in-attention reduction ``reduce(QKᵀ)`` over each sample's score tensor
    (heads × q × k), matching the reference where batch = 1 per UNet call.
so ``bias = sigma_coef · reduce(QKᵀ) · w``. Every weight function the
reference ships is expressible in this family; arbitrary callables remain
supported through :class:`CustomWeightFunction` (re-traced per callable).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Union

import jax.numpy as jnp

SIGMA_MODES = ("log1p_sigma", "log1p_sigma2", "one")
REDUCE_MODES = ("max", "std", "mean", "one")


@dataclasses.dataclass(frozen=True)
class WeightFunction:
    """``bias = scale · g(sigma) · reduce(QKᵀ) · w`` — hashable, jit-static.

    ``reduce`` is taken over each batch element's full (heads, q, k) score
    tensor in float32; ``std`` uses the unbiased estimator to match
    ``torch.Tensor.std()``.
    """

    scale: float = 0.1
    sigma_mode: str = "log1p_sigma"  # g(σ): log(1+σ) | log(1+σ²) | 1
    reduce_mode: str = "max"  # reduce(QKᵀ): max | std | mean | 1

    def __post_init__(self):
        if self.sigma_mode not in SIGMA_MODES:
            raise ValueError(f"sigma_mode must be one of {SIGMA_MODES}")
        if self.reduce_mode not in REDUCE_MODES:
            raise ValueError(f"reduce_mode must be one of {REDUCE_MODES}")

    def sigma_coef(self, sigma: jnp.ndarray) -> jnp.ndarray:
        sigma = jnp.asarray(sigma, jnp.float32)
        if self.sigma_mode == "log1p_sigma":
            g = jnp.log1p(sigma)
        elif self.sigma_mode == "log1p_sigma2":
            g = jnp.log1p(sigma * sigma)
        else:
            g = jnp.ones_like(sigma)
        return self.scale * g

    def reduce_qk(self, qk: jnp.ndarray, batch_axes: int = 1) -> jnp.ndarray:
        """Reduce scores over everything but the leading ``batch_axes`` axes.

        ``qk``: (..., heads, q, k) float scores. Returns shape broadcastable
        against the scores with the reduced axes kept as size-1.
        """
        axes = tuple(range(batch_axes, qk.ndim))
        x = qk.astype(jnp.float32)
        if self.reduce_mode == "max":
            r = jnp.max(x, axis=axes, keepdims=True)
        elif self.reduce_mode == "mean":
            r = jnp.mean(x, axis=axes, keepdims=True)
        elif self.reduce_mode == "std":
            n = 1
            for a in axes:
                n *= qk.shape[a]
            mean = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.sum((x - mean) ** 2, axis=axes, keepdims=True) / max(n - 1, 1)
            r = jnp.sqrt(var)
        else:
            r = jnp.ones(
                qk.shape[:batch_axes] + (1,) * (qk.ndim - batch_axes), jnp.float32
            )
        return r

    def __call__(self, w, sigma, qk):
        """Reference-signature escape hatch: full bias tensor (batch size 1)."""
        r = jnp.squeeze(self.reduce_qk(qk, batch_axes=0))  # scalar
        return self.sigma_coef(sigma) * r * w


@dataclasses.dataclass(frozen=True)
class CustomWeightFunction:
    """Wraps an arbitrary ``f(w, sigma, qk) -> bias`` callable (jnp ops only).

    Keeps API parity with the reference's free-form lambdas; each distinct
    callable triggers one re-trace of the pipeline.
    """

    fn: Callable

    def sigma_coef(self, sigma):  # pragma: no cover - trivial
        return jnp.asarray(1.0, jnp.float32)

    def __call__(self, w, sigma, qk):
        return self.fn(w, sigma, qk)


AnyWeightFunction = Union[WeightFunction, CustomWeightFunction]

# The reference's defaults:
DEFAULT_TXT2IMG = WeightFunction(scale=0.1, sigma_mode="log1p_sigma", reduce_mode="max")
DEFAULT_INPAINT = WeightFunction(scale=0.15, sigma_mode="log1p_sigma", reduce_mode="max")
ZERO = WeightFunction(scale=0.0, sigma_mode="one", reduce_mode="one")


def as_weight_function(f: Optional[Union[AnyWeightFunction, Callable]]) -> AnyWeightFunction:
    """Coerce user input (None | WeightFunction | raw callable) to the API type."""
    if f is None:
        return DEFAULT_TXT2IMG
    if isinstance(f, (WeightFunction, CustomWeightFunction)):
        return f
    if callable(f):
        return CustomWeightFunction(fn=f)
    raise TypeError(f"not a weight function: {f!r}")
