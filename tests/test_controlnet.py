"""ControlNet stage tests (tiny config, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig
from pww_tpu.models.controlnet import ControlNet
from pww_tpu.models.unet import UNet2DCondition
from pww_tpu.pipeline.pipeline import PwwPipeline


@pytest.fixture(scope="module")
def setup():
    cfg = SDModelConfig.tiny()
    cn = ControlNet(cfg.unet)
    h = w = 8
    sf = cfg.vae.scale_factor
    rng = jax.random.PRNGKey(0)
    params = cn.init(
        rng, jnp.zeros((1, h, w, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, cfg.clip.hidden_size)), jnp.zeros((1, h * sf, w * sf, 3)),
    )
    return cfg, cn, params, h, w, sf


def test_residual_count_matches_unet_skips(setup):
    cfg, cn, params, h, w, sf = setup
    lat = jnp.ones((1, h, w, 4))
    ctx = jnp.ones((1, 77, cfg.clip.hidden_size))
    hint = jnp.ones((1, h * sf, w * sf, 3))
    down, mid = cn.apply(params, lat, jnp.float32(1.0), ctx, hint)
    # skips: conv_in + layers_per_block per block + downsample between blocks
    n_blocks = len(cfg.unet.block_out_channels)
    want = 1 + n_blocks * cfg.unet.layers_per_block + (n_blocks - 1)
    assert len(down) == want
    # and the UNet accepts them
    unet = UNet2DCondition(cfg.unet)
    up = unet.init(jax.random.PRNGKey(1), lat, jnp.zeros((1,)), ctx)
    out = unet.apply(
        up, lat, jnp.float32(1.0), ctx,
        down_block_residuals=down, mid_block_residual=mid,
    )
    assert out.shape == lat.shape


def test_zero_init_residuals_are_zero(setup):
    """Fresh ControlNet must be a no-op (zero convs) — the defining property."""
    cfg, cn, params, h, w, sf = setup
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, cfg.clip.hidden_size))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (1, h * sf, w * sf, 3))
    down, mid = cn.apply(params, lat, jnp.float32(1.0), ctx, hint)
    for r in down:
        assert float(jnp.abs(r).max()) == 0.0
    assert float(jnp.abs(mid).max()) == 0.0


def test_pipeline_with_controlnet_runs():
    pipe = PwwPipeline(config=SDModelConfig.tiny()).load_controlnet()
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    hint = np.zeros((64, 64, 3), np.uint8)
    hint[20:40, 20:40] = 255
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        control_image=hint, controlnet_conditioning_scale=1.0,
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_control_image_without_controlnet_raises():
    pipe = PwwPipeline(config=SDModelConfig.tiny())
    with pytest.raises(ValueError, match="ControlNet"):
        pipe.generate(
            prompt="a cat", color_map_image=np.zeros((64, 64, 3), np.uint8),
            control_image=np.zeros((64, 64, 3), np.uint8),
            num_inference_steps=2,
        )


def test_controlnet_key_mapping():
    from pww_tpu.weights.loader import controlnet_key, t_conv

    k, tf = controlnet_key(("zero_conv_3", "conv", "kernel"), 4)
    assert k == "controlnet_down_blocks.3.weight" and tf is t_conv
    k, _ = controlnet_key(("zero_conv_mid", "conv", "bias"), 1)
    assert k == "controlnet_mid_block.bias"
    k, _ = controlnet_key(("cond_embedding", "blocks_2", "kernel"), 4)
    assert k == "controlnet_cond_embedding.blocks.2.weight"
    k, _ = controlnet_key(("cond_embedding", "conv_out", "conv", "kernel"), 4)
    assert k == "controlnet_cond_embedding.conv_out.weight"
    # non-controlnet paths fall through to the UNet table
    k, _ = controlnet_key(("down_0_resnet_0", "conv1", "kernel"), 4)
    assert k == "down_blocks.0.resnets.0.conv1.weight"

def _cm_and_hints():
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    h1 = np.zeros((64, 64, 3), np.uint8)
    h1[20:40, 20:40] = 255
    h2 = np.zeros((64, 64, 3), np.uint8)
    h2[5:15, 5:60] = 255
    return cm, h1, h2


def _gen(pipe, **over):
    cm, h1, h2 = _cm_and_hints()
    kw = dict(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="np",
    )
    kw.update(over)
    return np.asarray(pipe.generate(**kw))


def _denonzeroed(params):
    """Fresh ControlNets have zero output convs (no-op by design) — shift
    every weight so the net emits real residuals."""
    return jax.tree.map(lambda p: p + 0.02, params)


def test_multi_controlnet_runs_and_scales_compose():
    """Stacked nets: residuals sum (diffusers MultiControlNetModel); a
    zero-scaled second net must exactly reproduce the single-net output."""
    cm, h1, h2 = _cm_and_hints()
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    pipe.load_controlnet(seed=3)
    pipe.controlnet_params = _denonzeroed(pipe.controlnet_params)
    single_params = pipe.controlnet_params
    single = _gen(pipe, control_image=h1, controlnet_conditioning_scale=0.7)

    pipe.add_controlnet(seed=9)
    pipe.controlnet_params[1] = jax.tree.map(
        lambda p: p * 1.5 + 0.03, pipe.controlnet_params[1]
    )
    assert isinstance(pipe.controlnet_params, list)
    assert len(pipe.controlnet_params) == 2
    # second net scaled to zero -> identical to the single-net program
    both_zero2 = _gen(
        pipe, control_image=[h1, h2],
        controlnet_conditioning_scale=[0.7, 0.0],
    )
    np.testing.assert_array_equal(single, both_zero2)
    # live second net changes the image
    both = _gen(
        pipe, control_image=[h1, h2],
        controlnet_conditioning_scale=[0.7, 0.9],
    )
    assert np.isfinite(both).all()
    assert not np.array_equal(single, both)
    # one shared hint broadcasts to every net
    shared = _gen(pipe, control_image=h1,
                  controlnet_conditioning_scale=[0.7, 0.9])
    assert shared.shape == both.shape
    # restoring a single net goes back to the bare-tree form
    pipe.load_controlnet(params=single_params)
    again = _gen(pipe, control_image=h1, controlnet_conditioning_scale=0.7)
    np.testing.assert_array_equal(single, again)


def test_multi_controlnet_arg_count_mismatch_raises():
    cm, h1, h2 = _cm_and_hints()
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    pipe.load_controlnet(seed=3).add_controlnet(seed=9)
    with pytest.raises(ValueError, match="control"):
        _gen(pipe, control_image=[h1, h2, h2])
    with pytest.raises(ValueError, match="scales"):
        _gen(pipe, control_image=[h1, h2],
             controlnet_conditioning_scale=[1.0, 1.0, 1.0])


def test_control_image_list_without_stacking_raises():
    cm, h1, h2 = _cm_and_hints()
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    pipe.load_controlnet(seed=3)
    with pytest.raises(ValueError, match="add_controlnet"):
        _gen(pipe, control_image=[h1, h2])


def test_control_image_size_mismatch_raises():
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import PwwPipeline

    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    pipe.load_controlnet(seed=0)
    cm = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="processing resolution"):
        pipe.generate(
            prompt="a cat", color_map_image=cm,
            control_image=np.zeros((96, 96, 3), np.uint8),
            num_inference_steps=2, seed=0, output_type="np",
        )
