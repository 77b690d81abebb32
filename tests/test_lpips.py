"""LPIPS numerics proof: the JAX implementation must match a torch replica
of the official network (AlexNet features + unit-normalize + linear
calibration) with SHARED RANDOM weights — same method as the UNet/VAE/CLIP
parity proofs. Weight files aren't shippable here, so semantic parity of
the network itself is the provable part.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pww_tpu.metrics.lpips import (  # noqa: E402
    init_random_lpips,
    load_lpips_from_torch_state,
    lpips_distance,
)

_CONVS = (
    (3, 64, 11, 4, 2),
    (64, 192, 5, 1, 2),
    (192, 384, 3, 1, 1),
    (384, 256, 3, 1, 1),
    (256, 256, 3, 1, 1),
)
_FEAT_IX = (0, 3, 6, 8, 10)


def _random_torch_state(seed=0):
    g = torch.Generator().manual_seed(seed)
    alexnet_sd = {}
    for j, (cin, cout, k, _, _) in zip(_FEAT_IX, _CONVS):
        alexnet_sd[f"features.{j}.weight"] = torch.randn(
            (cout, cin, k, k), generator=g
        ) * (2.0 / (k * k * cin)) ** 0.5
        alexnet_sd[f"features.{j}.bias"] = torch.randn(cout, generator=g) * 0.01
    lin_sd = {
        f"lin{i}.model.1.weight": torch.rand(
            (1, _CONVS[i][1], 1, 1), generator=g
        )
        for i in range(5)
    }
    return alexnet_sd, lin_sd


def _torch_lpips(alexnet_sd, lin_sd, a, b):
    """Official LPIPS v0.1 forward, written from the paper/reference
    equations: scale layer, AlexNet feature slices after each ReLU (with
    maxpool(3,2) after slices 1 and 2), channel unit-norm (+1e-10 on the
    norm), squared diff, 1x1 linear weights, spatial mean, layer sum."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        out = []
        for i, (j, (_, _, _, s, p)) in enumerate(zip(_FEAT_IX, _CONVS)):
            x = F.conv2d(
                x, alexnet_sd[f"features.{j}.weight"],
                alexnet_sd[f"features.{j}.bias"], stride=s, padding=p,
            )
            x = F.relu(x)
            out.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, kernel_size=3, stride=2)
        return out

    def unit(f):
        n = torch.sqrt(torch.sum(f * f, dim=1, keepdim=True))
        return f / (n + 1e-10)

    total = 0.0
    for i, (x, y) in enumerate(zip(feats(a), feats(b))):
        d = (unit(x) - unit(y)) ** 2
        w = lin_sd[f"lin{i}.model.1.weight"]  # (1, C, 1, 1)
        total = total + (d * w).sum(dim=1).mean(dim=(1, 2))
    return total


def test_lpips_matches_torch_replica():
    alexnet_sd, lin_sd = _random_torch_state(0)
    params = load_lpips_from_torch_state(alexnet_sd, lin_sd)

    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    got = np.asarray(lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    want = _torch_lpips(
        alexnet_sd, lin_sd,
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2),
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_identity_is_zero_and_symmetric():
    params = init_random_lpips(0)
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    assert float(lpips_distance(params, a, a)[0]) == pytest.approx(0.0, abs=1e-6)
    d_ab = float(lpips_distance(params, a, b)[0])
    d_ba = float(lpips_distance(params, b, a)[0])
    assert d_ab == pytest.approx(d_ba, rel=1e-5)
    assert d_ab > 0


def test_lpips_nonstandard_size():
    # LPIPS accepts any spatial size >= the receptive minimum
    params = init_random_lpips(0)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 96, 128, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (1, 96, 128, 3)).astype(np.float32))
    assert np.isfinite(float(lpips_distance(params, a, b)[0]))
