"""SD-2.x support: fixed head_dim attention, v-prediction, gelu CLIP."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig, UNetConfig
from pww_tpu.schedulers.schedules import make_scheduler


def test_heads_for_conventions():
    sd1 = UNetConfig.sd15()
    assert sd1.heads_for(320) == (8, 40)
    assert sd1.heads_for(1280) == (8, 160)
    sd2 = UNetConfig.sd21()
    assert sd2.heads_for(320) == (5, 64)
    assert sd2.heads_for(1280) == (20, 64)
    assert sd2.prediction_type == "v_prediction"


def test_config_from_checkpoint_sd2_style(tmp_path):
    import json
    import os

    from pww_tpu.weights.loader import config_from_checkpoint

    os.makedirs(tmp_path / "unet")
    json.dump(
        {"in_channels": 4, "block_out_channels": [320, 640, 1280, 1280],
         "attention_head_dim": [5, 10, 20, 20],
         "prediction_type": "v_prediction", "cross_attention_dim": 1024},
        open(tmp_path / "unet" / "config.json", "w"),
    )
    cfg = config_from_checkpoint(str(tmp_path))
    assert cfg.unet.attention_head_dim == 64
    assert cfg.unet.prediction_type == "v_prediction"
    assert cfg.unet.heads_for(640) == (10, 64)


def test_v_prediction_conversion_sigma_space(rng):
    """ε-equivalent of a v output must reproduce the exact x0 that v encodes:
    v = α·ε − σ_vp·x0 (VP convention). Check via the sigma-space formula."""
    sch = make_scheduler("lms").set_timesteps(10)
    i = 3
    s = float(sch.sigmas[i])
    # sample in sigma space: x = x0 + s·eps
    x0 = rng.standard_normal((2, 2)).astype(np.float32)
    eps = rng.standard_normal((2, 2)).astype(np.float32)
    x = x0 + s * eps
    # VP variables at this sigma: alpha = 1/sqrt(1+s²), sigma_vp = s·alpha
    a = 1.0 / np.sqrt(1 + s * s)
    v = a * eps - (s * a) * (x0)  # v-prediction definition on x_vp = a·x
    got = np.asarray(
        sch.to_epsilon(jnp.asarray(v), jnp.asarray(x), jnp.int32(i),
                       "v_prediction")
    )
    np.testing.assert_allclose(got, eps, atol=1e-4, rtol=1e-4)


def test_v_prediction_conversion_alpha_space(rng):
    sch = make_scheduler("ddim").set_timesteps(10)
    i = 4
    a_t = float(sch.alphas_cumprod_t[i])
    x0 = rng.standard_normal((2, 2)).astype(np.float32)
    eps = rng.standard_normal((2, 2)).astype(np.float32)
    x = np.sqrt(a_t) * x0 + np.sqrt(1 - a_t) * eps
    v = np.sqrt(a_t) * eps - np.sqrt(1 - a_t) * x0
    got = np.asarray(
        sch.to_epsilon(jnp.asarray(v), jnp.asarray(x), jnp.int32(i),
                       "v_prediction")
    )
    np.testing.assert_allclose(got, eps, atol=1e-5, rtol=1e-5)


def test_v_prediction_pipeline_end_to_end():
    from pww_tpu import PwwPipeline

    base = SDModelConfig.tiny()
    cfg = dataclasses.replace(
        base, unet=dataclasses.replace(base.unet, prediction_type="v_prediction")
    )
    pipe = PwwPipeline(config=cfg)
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out.astype(np.float32)).all()


def test_sd2_tiny_unet_forward():
    """head_dim-fixed attention forward works (per-block head counts)."""
    from pww_tpu.models.unet import UNet2DCondition

    cfg = UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        attention_head_dim=16, cross_attention_dim=32, norm_num_groups=8,
        down_block_has_attn=(True, False), sample_size=16,
    )
    unet = UNet2DCondition(cfg)
    p = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,)), jnp.zeros((1, 77, 32)))
    out = unet.apply(p, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                     jnp.zeros((1, 77, 32)))
    assert out.shape == (1, 8, 8, 4)
