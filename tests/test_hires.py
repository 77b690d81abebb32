"""Hires-fix (two-pass upscale) and latent-space img2img tests.

Not in the reference; A1111-style high-resolution workflow over the same
PwW conditioning (the color map is NEAREST-resized for the second pass so
regions keep applying).
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
    num_inference_steps=2,
    guidance_scale=5.0,
    seed=0,
)


@pytest.fixture(scope="module")
def pipe():
    return PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)


def test_init_latents_img2img(pipe):
    """Latent-space img2img: same scheduler trajectory as the image path,
    minus the VAE round-trip."""
    lat = np.asarray(
        pipe.generate(color_map_image=_cm(), return_latents=True, **_KW)
    )
    out = pipe.generate(
        color_map_image=_cm(), init_latents=jnp.asarray(lat),
        strength=0.5, output_type="np", **_KW,
    )
    assert np.asarray(out).shape == (1, 64, 64, 3)
    # strength 0 keeps the trajectory empty -> decode of the init latents
    out0 = pipe.generate(
        color_map_image=_cm(), init_latents=jnp.asarray(lat),
        strength=1e-9, output_type="np", **_KW,
    )
    assert np.isfinite(np.asarray(out0)).all()


def test_init_latents_validation(pipe):
    lat = np.zeros((1, 8, 8, 4), np.float32)
    with pytest.raises(ValueError, match="exclusive"):
        pipe.generate(
            color_map_image=_cm(), init_latents=lat,
            init_image=np.zeros((64, 64, 3), np.uint8), **_KW,
        )
    with pytest.raises(ValueError, match="shape"):
        pipe.generate(
            color_map_image=_cm(),
            init_latents=np.zeros((1, 4, 4, 4), np.float32), **_KW,
        )


@pytest.mark.parametrize("mode", ["latent", "image"])
def test_hires_fix_doubles_resolution(pipe, mode):
    out = pipe.generate_hires(
        color_map_image=_cm(64), hires_scale=2.0, hires_strength=0.6,
        hires_steps=2, upscale_mode=mode, output_type="np", **_KW,
    )
    assert np.asarray(out).shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_hires_fix_snaps_to_lattice(pipe):
    # 1.5x of 64 = 96, lattice = 8 * 2^(n_blocks-1); tiny config: 8*2 = 16
    out = pipe.generate_hires(
        color_map_image=_cm(64), hires_scale=1.5, hires_strength=0.6,
        hires_steps=2, output_type="np", **_KW,
    )
    assert np.asarray(out).shape == (1, 96, 96, 3)


def test_hires_fix_requires_color_map(pipe):
    with pytest.raises(ValueError, match="color_map_image"):
        pipe.generate_hires(prompt="a cat", color_context={})


def test_generate_hires_rejects_managed_kwargs(pipe):
    """Keys generate_hires manages itself (strength, init_*, return_latents,
    output_type-in-kwargs) raise a clear error instead of a TypeError from
    double keyword passing."""
    for bad, val in [
        ("strength", 0.4),
        ("init_latents", jnp.zeros((1, 8, 8, 4))),
        ("return_latents", True),
    ]:
        with pytest.raises(ValueError, match="generate_hires manages"):
            pipe.generate_hires(
                color_map_image=_cm(), hires_scale=1.0, **{**_KW, bad: val}
            )
