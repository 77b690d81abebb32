"""LPIPS (Zhang et al. 2018, "The Unreasonable Effectiveness of Deep
Features as a Perceptual Metric") — JAX-native, AlexNet backbone.

The fidelity north star (BASELINE.json: LPIPS < 0.05 vs the reference's
committed outputs) needs this metric; no ``lpips``/``torchvision`` package
ships in this image, so the network is implemented here in JAX (NHWC,
MXU-friendly convs) with a loader for the standard torch weight files:

* a torchvision AlexNet ``state_dict`` (``features.{0,3,6,8,10}.weight``)
* the LPIPS linear-calibration ``state_dict``
  (``lin{0..4}.model.1.weight``, the official ``alex.pth``)

Semantics follow the reference implementation (v0.1): fixed input shift /
scale, features taken after each of the five ReLUs, channel-unit-
normalization with eps added to the norm, squared difference, 1x1 linear
weighting, spatial mean, sum over layers. The implementation is proven
against an in-test torch replica with shared random weights
(``tests/test_lpips.py``) — so only the weight files themselves are
missing in this environment, not metric capability.
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp

# LPIPS ScalingLayer constants (official v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet `features` conv specs: (out_ch, kernel, stride, pad)
_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# maxpool(3, 2) sits AFTER the relu of conv index in this set
_POOL_AFTER = (0, 1)


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _features(params: Dict, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
    """Five post-ReLU AlexNet feature maps. ``x``: (N, H, W, 3) in [-1, 1]."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    for i in range(5):
        _, _, stride, pad = _CONVS[i]
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], stride, pad)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return feats


def _unit_normalize(f: jnp.ndarray) -> jnp.ndarray:
    # official normalize_tensor: x / (||x||_ch + 1e-10)
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + 1e-10)


@functools.partial(jax.jit, static_argnames=())
def lpips_distance(params: Dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS(a, b) per sample. Inputs (N, H, W, 3) float in [-1, 1]."""
    fa = _features(params, a.astype(jnp.float32))
    fb = _features(params, b.astype(jnp.float32))
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(x) - _unit_normalize(y)) ** 2  # (N,H,W,C)
        w = params[f"lin{i}_w"]  # (C,) nonneg calibration weights
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def load_lpips_from_torch_state(alexnet_sd: Dict, lin_sd: Dict) -> Dict:
    """Convert torch state dicts to the JAX param dict.

    ``alexnet_sd``: torchvision AlexNet (only ``features.*`` used);
    ``lin_sd``: official LPIPS linear weights — accepts both
    ``lin{i}.model.1.weight`` (file layout) and ``lins.{i}.model.1.weight``
    (module layout) keys.
    """

    def npy(t):
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            np.float32,
        )

    params = {}
    feat_ix = (0, 3, 6, 8, 10)  # conv positions in torchvision features
    for i, j in enumerate(feat_ix):
        w = npy(alexnet_sd[f"features.{j}.weight"])  # (O, I, kh, kw)
        params[f"conv{i}_w"] = jnp.asarray(w.transpose(2, 3, 1, 0))  # HWIO
        params[f"conv{i}_b"] = jnp.asarray(npy(alexnet_sd[f"features.{j}.bias"]))
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lin_sd:
                w = npy(lin_sd[key])  # (1, C, 1, 1)
                params[f"lin{i}_w"] = jnp.asarray(w.reshape(-1))
                break
        else:
            raise KeyError(f"lin{i} weight not found in LPIPS state dict")
    return params


def load_lpips_from_files(backbone_path: str, lin_path: str) -> Dict:
    """Load from torch ``.pth`` files on disk (no network access)."""
    import torch

    alexnet_sd = torch.load(backbone_path, map_location="cpu",
                            weights_only=True)
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
    return load_lpips_from_torch_state(alexnet_sd, lin_sd)


def init_random_lpips(seed: int = 0) -> Dict:
    """Random-weight instance (testing / plumbing checks only — random
    features are NOT a calibrated perceptual metric)."""
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_CONVS):
        params[f"conv{i}_w"] = jnp.asarray(
            rng.standard_normal((k, k, in_ch, out_ch)).astype(np.float32)
            * (2.0 / (k * k * in_ch)) ** 0.5
        )
        params[f"conv{i}_b"] = jnp.asarray(
            rng.standard_normal(out_ch).astype(np.float32) * 0.01
        )
        params[f"lin{i}_w"] = jnp.asarray(
            rng.uniform(0.0, 1.0, out_ch).astype(np.float32)
        )
        in_ch = out_ch
    return params
