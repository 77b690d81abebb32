"""Ensemble-of-expert-denoisers tests (diffusers SDXL base+refiner
``denoising_end``/``denoising_start`` semantics).

Not in the reference; the standard SDXL quality workflow: the base model
denoises the high-noise fraction of the trajectory, the refiner finishes it
without re-noising.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig
from pww_tpu.pipeline.pipeline import PwwPipeline


def _cm(side=64):
    cm = np.zeros((side, side, 3), np.uint8)
    cm[:, : side // 2] = (255, 0, 0)
    return cm


_KW = dict(
    prompt="a cat",
    color_context={(255, 0, 0): "cat,1.0"},
    guidance_scale=5.0,
    seed=0,
)


def test_split_trajectory_equals_full_run():
    """denoising_end=f then denoising_start=f on the SAME model must land on
    the full run's output (euler: stateless steps, exact continuation)."""
    pipe = PwwPipeline(
        config=SDModelConfig.tiny(), scheduler="euler", weights_dtype=None
    )
    kw = dict(_KW, color_map_image=_cm(), num_inference_steps=6)
    full = np.asarray(pipe.generate(output_type="np", **kw))
    lat = pipe.generate(denoising_end=0.5, return_latents=True, **kw)
    out = np.asarray(
        pipe.generate(
            init_latents=lat, denoising_start=0.5, output_type="np", **kw
        )
    )
    np.testing.assert_allclose(
        out.astype(np.int32), full.astype(np.int32), atol=1
    )


def test_xl_base_to_refiner_flow():
    base = PwwPipeline(config=SDModelConfig.tiny_xl(), weights_dtype=None)
    refiner = PwwPipeline(
        config=SDModelConfig.tiny_xl_refiner(), weights_dtype=None
    )
    kw = dict(_KW, color_map_image=_cm(), num_inference_steps=4)
    lat = base.generate(denoising_end=0.75, return_latents=True, **kw)
    assert np.isfinite(np.asarray(lat)).all()
    out = refiner.generate(
        init_latents=jnp.asarray(lat), denoising_start=0.75,
        output_type="np", **kw,
    )
    assert np.asarray(out).shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_denoising_arg_validation():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    kw = dict(_KW, color_map_image=_cm(), num_inference_steps=2)
    with pytest.raises(ValueError, match="denoising_start requires"):
        pipe.generate(denoising_start=0.5, **kw)
    with pytest.raises(ValueError, match=r"in \(0, 1\)"):
        pipe.generate(denoising_end=1.5, **kw)
    with pytest.raises(ValueError, match="callback"):
        pipe.generate(
            denoising_end=0.5, callback=lambda *a: None, **kw
        )
