"""FreeU (Si et al. 2023) tests.

Not in the reference (its UNet is stock diffusers 0.10); FreeU is a
parameter-free quality knob standard across the SD ecosystem. Semantics are
pinned against a literal numpy replica of the official ``Fourier_filter``
and diffusers' ``apply_freeu`` channel policy.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig
from pww_tpu.models.unet import fourier_filter
from pww_tpu.pipeline.pipeline import PwwPipeline


def _torch_style_fourier_filter(x_nchw, threshold, scale):
    """Literal replica of the official FreeU Fourier_filter (NCHW numpy)."""
    xf = np.fft.fftn(x_nchw, axes=(-2, -1))
    xf = np.fft.fftshift(xf, axes=(-2, -1))
    B, C, H, W = xf.shape
    mask = np.ones((B, C, H, W), np.float32)
    crow, ccol = H // 2, W // 2
    mask[
        ..., crow - threshold : crow + threshold,
        ccol - threshold : ccol + threshold,
    ] = scale
    xf = xf * mask
    xf = np.fft.ifftshift(xf, axes=(-2, -1))
    return np.fft.ifftn(xf, axes=(-2, -1)).real


@pytest.mark.parametrize("hw", [(8, 8), (7, 10)])
@pytest.mark.parametrize("threshold,scale", [(1, 0.9), (2, 0.2)])
def test_fourier_filter_matches_official(hw, threshold, scale):
    rng = np.random.default_rng(0)
    h, w = hw
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    got = np.asarray(fourier_filter(jnp.asarray(x), threshold, scale))
    want = _torch_style_fourier_filter(
        x.transpose(0, 3, 1, 2), threshold, scale
    ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fourier_filter_scale_one_is_identity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    got = np.asarray(fourier_filter(jnp.asarray(x), 1, 1.0))
    np.testing.assert_allclose(got, x, atol=1e-5)


def _gen(pipe, **over):
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kw = dict(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, guidance_scale=5.0, seed=0, output_type="np",
    )
    kw.update(over)
    return np.asarray(pipe.generate(**kw))


def test_pipeline_freeu_changes_output():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    base = _gen(pipe)
    on = _gen(pipe, freeu=True)
    assert np.isfinite(on).all()
    assert not np.array_equal(base, on)
    # neutral params reproduce the baseline up to fp32 FFT round-trip
    neutral = _gen(pipe, freeu=(1.0, 1.0, 1.0, 1.0))
    assert np.mean(np.abs(neutral.astype(np.float32) - base)) < 1.0
    # explicit tuple form runs
    custom = _gen(pipe, freeu=(1.5, 1.6, 0.9, 0.2))
    assert np.isfinite(custom).all()


def test_pipeline_freeu_bad_tuple_raises():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    with pytest.raises(ValueError, match="freeu"):
        _gen(pipe, freeu=(1.0, 1.0))


def test_freeu_config_save_load_roundtrip(tmp_path):
    """json round-trips tuples as lists: a saved config with freeu set must
    reload as a hashable tuple (UNetConfig is a static jit argument)."""
    import dataclasses

    from pww_tpu.pipeline.pipeline import PwwPipeline

    cfg = SDModelConfig.tiny()
    cfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, freeu=(1.1, 1.2, 0.9, 0.2))
    )
    pipe = PwwPipeline(config=cfg)
    d = str(tmp_path / "saved")
    pipe.save_pretrained(d)
    pipe2 = PwwPipeline.from_pretrained(d)
    assert pipe2.config.unet.freeu == (1.1, 1.2, 0.9, 0.2)
    assert isinstance(pipe2.config.unet.freeu, tuple)
    hash(pipe2.config.unet)
