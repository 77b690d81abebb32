"""Weight-loading tests.

The CLIP mapping is validated against a *real* torch reference: a tiny
``transformers.CLIPTextModel`` is instantiated, its state_dict converted
through our loader, and the Flax forward compared against the torch forward —
end-to-end proof of the key mapping, layout transposes, causal masking,
quick-GELU, and LN placement. UNet/VAE mappings are validated by synthetic
round-trip (inverse-transform a fake torch checkpoint, load, compare) plus
key-uniqueness checks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import CLIPTextConfig, SDModelConfig
from pww_tpu.models.clip import CLIPTextEncoder
from pww_tpu.models.unet import UNet2DCondition
from pww_tpu.models.vae import AutoencoderKL
from pww_tpu.weights.loader import (
    clip_key,
    fill_params,
    t_conv,
    t_dense,
    unet_key,
    vae_keys,
)


def _paths_and_shapes(shape_tree):
    flat = jax.tree_util.tree_flatten_with_path(shape_tree)[0]
    out = []
    for keypath, leaf in flat:
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        path = tuple(p for p in path if p != "params")
        out.append((path, tuple(leaf.shape)))
    return out


def _inverse(tf, arr):
    if tf is t_conv:
        return np.transpose(arr, (3, 2, 0, 1))
    if tf is t_dense:
        return np.transpose(arr, (1, 0))
    return arr


def test_clip_matches_transformers_torch():
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, max_position_embeddings=77,
    )
    enc = CLIPTextEncoder(cfg)
    ids = np.array([[0, 5, 9, 3] + [1] * 73], np.int64)
    shapes = jax.eval_shape(enc.init, jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32))
    params = fill_params(shapes, state, clip_key, name="clip")

    got = np.asarray(enc.apply(params, jnp.asarray(ids, jnp.int32)))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("which", ["unet", "vae"])
def test_synthetic_checkpoint_roundtrip(rng, which):
    cfg = SDModelConfig.tiny()
    key = jax.random.PRNGKey(0)
    if which == "unet":
        model = UNet2DCondition(cfg.unet)
        args = (
            jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 77, cfg.clip.hidden_size)),
        )
        key_fn, multi = unet_key, False
    else:
        model = AutoencoderKL(cfg.vae)
        args = (jnp.zeros((1, 16, 16, 3)),)
        key_fn, multi = vae_keys, True

    shapes = jax.eval_shape(model.init, key, *args)
    entries = _paths_and_shapes(shapes)

    # build fake torch-layout checkpoint via the inverse transforms
    state = {}
    expect = {}
    for path, shape in entries:
        keys, tf = key_fn(path, len(shape))
        k = keys[0] if multi else keys
        assert k not in state, f"duplicate checkpoint key {k} from {path}"
        arr = rng.standard_normal(shape).astype(np.float32)
        state[k] = _inverse(tf, arr)
        expect[path] = arr

    params = fill_params(shapes, state, key_fn, multi=multi, name=which)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, leaf in flat:
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        path = tuple(p for p in path if p != "params")
        np.testing.assert_array_equal(np.asarray(leaf), expect[path], err_msg=str(path))


def test_missing_keys_raise():
    cfg = SDModelConfig.tiny()
    model = AutoencoderKL(cfg.vae)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )
    with pytest.raises(KeyError):
        fill_params(shapes, {}, vae_keys, multi=True, name="vae")


def test_vae_new_attention_naming_accepted(rng):
    """diffusers >=0.17 renamed AttentionBlock params; both spellings load."""
    cfg = SDModelConfig.tiny()
    model = AutoencoderKL(cfg.vae)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )
    entries = _paths_and_shapes(shapes)
    state = {}
    for path, shape in entries:
        keys, tf = vae_keys(path, len(shape))
        arr = rng.standard_normal(shape).astype(np.float32)
        state[keys[-1]] = _inverse(tf, arr)  # use the NEW naming only
    params = fill_params(shapes, state, vae_keys, multi=True, name="vae")
    assert params is not None


def test_save_pretrained_roundtrip(tmp_path):
    """save_pretrained → from_pretrained must reproduce generations exactly."""
    import numpy as np

    from pww_tpu.pipeline.pipeline import PwwPipeline

    pipe = PwwPipeline(config=SDModelConfig.tiny())
    d = str(tmp_path / "ckpt")
    pipe.save_pretrained(d)

    pipe2 = PwwPipeline.from_pretrained(d)
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kw = dict(prompt="a cat", color_map_image=cm,
              color_context={(255, 0, 0): "cat,1.0"},
              num_inference_steps=2, seed=0, output_type="np")
    np.testing.assert_array_equal(pipe.generate(**kw), pipe2.generate(**kw))
