"""Legacy masked-blend inpainting (standard 4-channel checkpoints) +
A1111 mask_blur / masked-content modes.

Beyond-reference surface: the reference only supports 9-channel inpainting
UNets (`paint_with_words_inpaint.py`); A1111 / diffusers
``StableDiffusionInpaintPipelineLegacy`` inpaint ANY checkpoint by
re-noising the init image outside the mask at every step and restoring it
exactly at the end. That blend is what these tests pin down.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pww_tpu import PwwPipeline
from pww_tpu.config import SDModelConfig


@pytest.fixture(scope="module")
def pipe():
    return PwwPipeline(config=SDModelConfig.tiny())


def _mask(size=64):
    m = np.zeros((size, size), np.float32)
    m[16:48, 16:48] = 1.0
    return m


def _init(size=64):
    rng = np.random.default_rng(0)
    return (rng.random((size, size, 3)) * 255).astype(np.uint8)


def _kw(**kw):
    base = dict(prompt="a cat", num_inference_steps=3, strength=0.8,
                output_type="np")
    base.update(kw)
    return base


def test_legacy_inpaint_runs_on_4ch_checkpoint(pipe):
    out = np.asarray(pipe.generate(
        init_image=_init(), mask_image=_mask(), seed=0, **_kw()))
    assert out.shape[-3:] == (64, 64, 3)
    assert np.isfinite(out.astype(np.float64)).all()


def test_legacy_inpaint_unmasked_latents_pinned_to_init(pipe):
    """The final restore makes unmasked latents EXACTLY the init image's
    latents: with a shared VAE-sample rng, two different seeds must agree
    bit-for-bit outside the mask and differ inside it."""
    rng = jax.random.PRNGKey(42)
    m = _mask()
    kw = _kw(init_image=_init(), mask_image=m, rng=rng,
             return_latents=True)
    kw.pop("output_type")
    la = np.asarray(pipe.generate(seed=0, **kw))
    lb = np.asarray(pipe.generate(seed=1, **kw))
    sf = pipe.config.vae.scale_factor
    m_lat = np.asarray(jax.image.resize(
        jnp.asarray(m)[None, :, :, None],
        (1, 64 // sf, 64 // sf, 1), method="linear"))
    keep = np.broadcast_to(m_lat == 0.0, la.shape)
    repaint = np.broadcast_to(m_lat == 1.0, la.shape)
    np.testing.assert_array_equal(la[keep], lb[keep])
    assert not np.array_equal(la[repaint], lb[repaint])


def test_mask_blur_feathers_the_seam(pipe):
    hard = np.asarray(pipe.generate(
        init_image=_init(), mask_image=_mask(), seed=3, **_kw()))
    soft = np.asarray(pipe.generate(
        init_image=_init(), mask_image=_mask(), seed=3, mask_blur=4.0,
        **_kw()))
    assert soft.shape == hard.shape
    assert np.isfinite(soft.astype(np.float64)).all()
    assert not np.array_equal(hard, soft)


def test_masked_content_modes_differ(pipe):
    common = dict(init_image=_init(), mask_image=_mask(), seed=5)
    outs = {
        mode: np.asarray(pipe.generate(masked_content=mode, **common, **_kw()))
        for mode in ("original", "fill", "latent_noise", "latent_nothing")
    }
    for mode, img in outs.items():
        assert np.isfinite(img.astype(np.float64)).all(), mode
    assert not np.array_equal(outs["original"], outs["latent_noise"])
    assert not np.array_equal(outs["original"], outs["latent_nothing"])
    assert not np.array_equal(outs["original"], outs["fill"])


def test_masked_content_fill_works_on_9ch_checkpoint():
    pipe9 = PwwPipeline(config=SDModelConfig.tiny(in_channels=9))
    out = np.asarray(pipe9.generate(
        init_image=_init(), mask_image=_mask(), seed=0,
        masked_content="fill", mask_blur=2.0,
        **_kw(num_inference_steps=2, strength=1.0)))
    assert np.isfinite(out.astype(np.float64)).all()
    # latent_* modes are a latent-blend concept: 9-ch conditioning rejects
    with pytest.raises(ValueError, match="legacy"):
        pipe9.generate(init_image=_init(), mask_image=_mask(),
                       masked_content="latent_noise", **_kw())


def test_legacy_inpaint_with_callback_and_custom_wf(pipe):
    steps = []
    out = np.asarray(pipe.generate(
        init_image=_init(), mask_image=_mask(), seed=2,
        callback=lambda i, t, lat: steps.append(i),
        weight_function=lambda w, s, qk: w * jnp.log1p(s) * jnp.max(qk),
        color_map_image=np.full((64, 64, 3), [255, 0, 0], np.uint8),
        color_context={(255, 0, 0): "cat,1.0"},
        **_kw()))
    assert len(steps) >= 1
    assert np.isfinite(out.astype(np.float64)).all()


def test_mask_kwargs_validation(pipe):
    with pytest.raises(ValueError, match="masked_content"):
        pipe.generate(init_image=_init(), mask_image=_mask(),
                      masked_content="bogus", **_kw())
    with pytest.raises(ValueError, match="mask_image"):
        pipe.generate(mask_blur=3.0, **_kw())
    with pytest.raises(ValueError, match="mask_image"):
        pipe.generate(masked_content="fill", **_kw())


# -- inpaint_full_res (A1111 "inpaint area: only masked") --------------------


def test_expand_crop_region_geometry():
    from pww_tpu.pipeline.inpaint import expand_crop_region

    m = np.zeros((100, 200), np.float32)
    m[40:60, 90:110] = 1.0  # 20x20 box centered-ish
    x0, y0, x1, y1 = expand_crop_region(m, 10, 200, 100)
    # contains the padded bbox
    assert x0 <= 80 and x1 >= 120 and y0 <= 30 and y1 >= 70
    # aspect matches the 2:1 processing aspect
    assert abs((x1 - x0) / (y1 - y0) - 2.0) < 0.15
    assert 0 <= x0 < x1 <= 200 and 0 <= y0 < y1 <= 100

    # border clamp: mask in a corner still yields an in-bounds region
    m2 = np.zeros((100, 200), np.float32)
    m2[0:10, 0:10] = 1.0
    x0, y0, x1, y1 = expand_crop_region(m2, 30, 200, 100)
    assert x0 == 0 and y0 == 0 and x1 <= 200 and y1 <= 100
    assert x1 >= 40 and y1 >= 40

    # empty mask: whole image
    assert expand_crop_region(np.zeros((50, 60)), 8, 60, 50) == (0, 0, 60, 50)


def test_paste_region_blend_and_resize():
    from pww_tpu.pipeline.inpaint import paste_region

    full = np.zeros((64, 64, 3), np.uint8)
    patch = np.full((16, 16, 3), 200, np.uint8)  # will upscale to 32x32
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    mask[16:48, 16] = 0.5  # feathered column
    out = paste_region(full, patch, (16, 16, 48, 48), mask)
    assert out[0, 0].tolist() == [0, 0, 0]  # outside region untouched
    assert out[32, 32].tolist() == [200, 200, 200]  # inside fully pasted
    assert out[32, 16, 0] == 100  # fractional mask blends
    assert full[32, 32, 0] == 0  # input not mutated


def test_inpaint_full_res_pastes_outside_exactly(pipe):
    """Pixels where the mask is 0 must be BYTE-IDENTICAL to the init image
    (the paste blends only masked pixels), and masked pixels must change."""
    init = _init()
    m = _mask()
    out = np.asarray(pipe.generate(
        init_image=init, mask_image=m, seed=0, inpaint_full_res=True,
        inpaint_full_res_padding=8, **_kw()))[0]
    outside = m == 0.0
    np.testing.assert_array_equal(out[outside], init[outside])
    assert not np.array_equal(out[~outside], init[~outside])


def test_inpaint_full_res_with_blur_and_color_map(pipe):
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    init = _init()
    out = np.asarray(pipe.generate(
        init_image=init, mask_image=_mask(), seed=1, inpaint_full_res=True,
        mask_blur=3.0, color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        **_kw()))[0]
    assert out.shape == (64, 64, 3)
    # far corners (outside mask+blur reach) still exact
    np.testing.assert_array_equal(out[:4, :4], init[:4, :4])


def test_inpaint_full_res_validation(pipe):
    with pytest.raises(ValueError, match="inpaint_full_res"):
        pipe.generate(inpaint_full_res=True, **_kw())
    with pytest.raises(ValueError, match="return_latents"):
        pipe.generate(init_image=_init(), mask_image=_mask(),
                      inpaint_full_res=True, return_latents=True, **_kw())


def test_legacy_inpaint_rejects_denoising_end(pipe):
    """The final exact restore assumes a complete trajectory; an
    ensemble-of-denoisers split would hand the refiner clean unmasked
    pixels at the wrong noise level — reject the combination."""
    with pytest.raises(ValueError, match="denoising_end"):
        pipe.generate(
            init_image=_init(), mask_image=_mask(), seed=0,
            denoising_end=0.5, return_latents=True, **_kw())
