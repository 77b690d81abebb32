"""Gaussian mask blur must match torchvision's GaussianBlur numerics
(reference uses kernel 39×39 with per-region sigma for soft region edges)."""
import numpy as np
import torch
import torch.nn.functional as F

from pww_tpu.ops.blur import gaussian_blur, gaussian_kernel_1d


def _torch_gaussian_blur(x: np.ndarray, ksize: int, sigma: float) -> np.ndarray:
    """Replicates torchvision.transforms.functional.gaussian_blur (separable
    sampled-Gaussian, reflect padding) with plain torch ops."""
    half = (ksize - 1) * 0.5
    grid = torch.linspace(-half, half, ksize)
    k1 = torch.exp(-0.5 * (grid / sigma) ** 2)
    k1 = k1 / k1.sum()
    kernel = torch.outer(k1, k1)[None, None]
    t = torch.from_numpy(x)[None, None]
    pad = ksize // 2
    t = F.pad(t, (pad, pad, pad, pad), mode="reflect")
    return F.conv2d(t, kernel)[0, 0].numpy()


def test_kernel_normalized():
    k = np.asarray(gaussian_kernel_1d(39, 4.0))
    assert abs(k.sum() - 1.0) < 1e-6
    assert k.argmax() == 19


def test_blur_matches_torchvision_semantics(rng):
    x = rng.standard_normal((64, 64)).astype(np.float32)
    for sigma in (1.0, 4.0, 12.0):
        want = _torch_gaussian_blur(x, 39, sigma)
        got = np.asarray(gaussian_blur(x, 39, sigma))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_blur_preserves_mass_roughly(rng):
    x = np.zeros((64, 64), np.float32)
    x[20:40, 20:40] = 1.0
    out = np.asarray(gaussian_blur(x, 39, 5.0))
    assert abs(out.sum() - x.sum()) / x.sum() < 0.05
    assert out.max() <= 1.0 + 1e-5
