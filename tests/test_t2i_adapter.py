"""T2I-Adapter tests (Mou et al. 2023; diffusers FullAdapter semantics).

Not in the reference; the lightweight structural-conditioning alternative to
ControlNet. TPU-first property under test: features are computed once per
generation (timestep-independent) and added after each down block's last
layer (`down_intrablock_additional_residuals`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig
from pww_tpu.models.t2i_adapter import (
    T2IAdapter,
    pixel_unshuffle,
    t2i_adapter_key,
)
from pww_tpu.pipeline.pipeline import PwwPipeline


def test_pixel_unshuffle_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    got = np.asarray(pixel_unshuffle(jnp.asarray(x), 4))
    want = (
        torch.nn.functional.pixel_unshuffle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 4
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want)


def test_adapter_feature_shapes_and_channels():
    ad = T2IAdapter(channels=(8, 16), num_res_blocks=2, downscale_factor=8)
    params = ad.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    feats = ad.apply(params, jnp.ones((2, 64, 64, 3)))
    assert [f.shape for f in feats] == [(2, 8, 8, 8), (2, 4, 4, 16)]


def test_key_mapping_covers_all_params_uniquely():
    ad = T2IAdapter(channels=(8, 16), num_res_blocks=2, downscale_factor=8)
    shapes = jax.eval_shape(
        ad.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    keys = set()
    for keypath, _ in flat:
        path = tuple(
            p.key if hasattr(p, "key") else str(p) for p in keypath
        )
        path = tuple(p for p in path if p != "params")
        k, tf = t2i_adapter_key(path)
        assert k not in keys, f"duplicate mapping {k}"
        keys.add(k)
    # 1 conv_in + stage0 (2 resnets) + stage1 (in_conv + 2 resnets),
    # each conv has weight+bias, each resnet two convs
    assert len(keys) == 2 * (1 + 2 * 2 + 1 + 2 * 2)


def test_diffusers_checkpoint_roundtrip():
    """Synthetic diffusers-format state dict → loader → identical forward."""
    ad = T2IAdapter(channels=(8, 16), num_res_blocks=2, downscale_factor=8)
    params = ad.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))

    # export flax params to the torch layout
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    state = {}
    for keypath, leaf in flat:
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        path = tuple(p for p in path if p != "params")
        k, tf = t2i_adapter_key(path)
        arr = np.asarray(leaf)
        if tf == "conv":
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        state[k] = arr

    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    pipe.load_t2i_adapter(source=state, channels=(8, 16))
    hint = jnp.asarray(
        np.random.default_rng(2).uniform(size=(1, 64, 64, 3)), jnp.float32
    )
    a = ad.apply(params, hint)
    # apply in f32 to isolate the key mapping from the pipeline's bf16
    # compute dtype
    b = ad.apply(pipe.t2i_adapter_params, hint)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-6
        )


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


def test_pipeline_with_adapter_end_to_end():
    """f32 pipeline so the scale-0 check isolates semantics: adding zero
    features is exact math; the only residue is XLA refusing bit-identical
    fusion across the two programs (±1 uint8). The bf16 default shows the
    same structure with wider reassociation noise."""
    pipe = PwwPipeline(
        config=SDModelConfig.tiny(), weights_dtype=None,
        compute_dtype=jnp.float32,
    )
    base = np.asarray(pipe.generate(**_kw())).astype(np.int32)
    pipe.load_t2i_adapter(seed=5)
    hint = np.zeros((64, 64, 3), np.uint8)
    hint[10:50, 10:20] = 255
    on = np.asarray(pipe.generate(**_kw(adapter_image=hint)))
    assert np.isfinite(on).all()
    # a live adapter moves the image far beyond fusion noise
    assert np.abs(on.astype(np.int32) - base).max() > 3
    # scale 0 -> adds exact zeros -> baseline up to fusion noise
    off = np.asarray(
        pipe.generate(
            **_kw(adapter_image=hint, adapter_conditioning_scale=0.0)
        )
    )
    np.testing.assert_allclose(off.astype(np.int32), base, atol=1)


def test_adapter_validation():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    hint = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="load_t2i_adapter"):
        pipe.generate(**_kw(adapter_image=hint))
    pipe.load_t2i_adapter(seed=5)
    with pytest.raises(ValueError, match="size"):
        pipe.generate(
            **_kw(adapter_image=np.zeros((32, 32, 3), np.uint8))
        )
    with pytest.raises(ValueError, match="T2I-Adapter"):
        pipe.generate(**_kw(adapter_image=hint, cache_interval=3))


def test_mono_adapter_hint():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    pipe.load_t2i_adapter(seed=5, in_channels=1)
    hint = np.zeros((64, 64, 3), np.uint8)  # rgb sketch -> mean to mono
    out = pipe.generate(**_kw(adapter_image=hint))
    assert np.isfinite(np.asarray(out)).all()
