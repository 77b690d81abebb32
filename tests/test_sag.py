"""Self-Attention Guidance tests (Hong et al. 2023; diffusers
StableDiffusionSAGPipeline semantics).

Not in the reference. SAG masks the keys that receive the most mid-block
self-attention, blurs the implied x0 there, and pushes the prediction away
from the degraded reconstruction — one extra uncond forward per step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig
from pww_tpu.models.unet import UNet2DCondition
from pww_tpu.pipeline.pipeline import PwwPipeline


def _kw(**over):
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kw = dict(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, guidance_scale=5.0, seed=0, output_type="np",
    )
    kw.update(over)
    return kw


def test_mid_attn_probs_are_sown():
    import dataclasses

    cfg = dataclasses.replace(SDModelConfig.tiny().unet, sow_mid_attn=True)
    unet = UNet2DCondition(cfg)
    lat = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 77, SDModelConfig.tiny().clip.hidden_size))
    params = unet.init(jax.random.PRNGKey(0), lat, jnp.zeros((2,)), ctx)
    out, interm = unet.apply(
        params, lat, jnp.float32(1.0), ctx, mutable=["intermediates"]
    )
    probs = jax.tree_util.tree_leaves(interm)[0]
    # tiny: 2 blocks -> mid at 4x4 = 16 tokens, 4 heads
    assert probs.shape == (2, 4, 16, 16)
    np.testing.assert_allclose(
        np.asarray(probs.sum(-1)), 1.0, atol=1e-5
    )  # rows are softmax distributions
    assert out.shape == lat.shape


@pytest.mark.parametrize("scheduler", ["lms", "ddim"])
def test_sag_changes_output_and_is_deterministic(scheduler):
    pipe = PwwPipeline(
        config=SDModelConfig.tiny(), scheduler=scheduler, weights_dtype=None
    )
    base = np.asarray(pipe.generate(**_kw()))
    on = np.asarray(pipe.generate(sag_scale=0.75, **_kw()))
    assert np.isfinite(on).all()
    assert not np.array_equal(base, on)
    again = np.asarray(pipe.generate(sag_scale=0.75, **_kw()))
    np.testing.assert_array_equal(on, again)


def test_sag_restrictions():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    with pytest.raises(ValueError, match="custom weight"):
        pipe.generate(
            sag_scale=0.5,
            weight_function=lambda w, s, qk: 0.1 * w * qk.max(),
            **_kw(),
        )
    with pytest.raises(ValueError, match="callback"):
        pipe.generate(sag_scale=0.5, callback=lambda *a: None, **_kw())
    with pytest.raises(ValueError, match="DeepCache"):
        pipe.generate(sag_scale=0.5, cache_interval=3, **_kw())
    pipe.load_t2i_adapter(seed=2)
    with pytest.raises(ValueError, match="T2I-Adapter"):
        pipe.generate(
            sag_scale=0.5,
            adapter_image=np.zeros((64, 64, 3), np.uint8), **_kw(),
        )
