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