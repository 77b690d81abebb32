"""CLIP-skip (diffusers ``clip_skip`` / A1111 "CLIP skip") tests.

The reference has no clip-skip (its text encode is a plain
``text_encoder(input_ids)``, reference `paint_with_words.py:360-368`), but
anime-style checkpoints trained with the penultimate CLIP layer are a major
part of the SD ecosystem the reference serves via its LDM converter — skip
semantics are validated against real ``transformers`` hidden states:
``final_layer_norm(hidden_states[-(k+1)])`` (diffusers
``StableDiffusionPipeline.encode_prompt``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import CLIPTextConfig, SDModelConfig
from pww_tpu.models.clip import CLIPTextEncoder
from pww_tpu.pipeline.pipeline import PwwPipeline
from pww_tpu.weights.loader import clip_key, fill_params


def _tiny_pair(num_layers=4, projection_dim=None):
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=num_layers, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_layers=num_layers, num_heads=4, max_position_embeddings=77,
        projection_dim=projection_dim,
    )
    enc = CLIPTextEncoder(cfg)
    ids = np.array([[0, 5, 9, 3] + [1] * 73], np.int64)
    shapes = jax.eval_shape(
        enc.init, jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32)
    )
    params = fill_params(shapes, state, clip_key, name="clip")
    return model, enc, params, ids


@pytest.mark.parametrize("skip", [1, 2])
def test_final_skip_matches_transformers(skip):
    import torch

    model, enc, params, ids = _tiny_pair()
    got = np.asarray(
        enc.apply(params, jnp.asarray(ids, jnp.int32), skip_layers=skip)
    )
    with torch.no_grad():
        out = model(torch.from_numpy(ids), output_hidden_states=True)
        want = model.text_model.final_layer_norm(
            out.hidden_states[-(skip + 1)]
        ).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_penultimate_skip_matches_transformers():
    """SDXL-tower semantics: skip shifts the (un-normed) capture one earlier —
    diffusers XL uses ``hidden_states[-(clip_skip + 2)]``."""
    import torch

    model, enc, params, ids = _tiny_pair()
    got = np.asarray(
        enc.apply(
            params, jnp.asarray(ids, jnp.int32),
            output="penultimate", skip_layers=1,
        )
    )
    with torch.no_grad():
        out = model(torch.from_numpy(ids), output_hidden_states=True)
        want = out.hidden_states[-3].numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_skip_zero_is_default():
    _, enc, params, ids = _tiny_pair()
    a = enc.apply(params, jnp.asarray(ids, jnp.int32))
    b = enc.apply(params, jnp.asarray(ids, jnp.int32), skip_layers=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_skip_out_of_range_raises():
    _, enc, params, ids = _tiny_pair(num_layers=2)
    with pytest.raises(ValueError, match="skip_layers"):
        enc.apply(params, jnp.asarray(ids, jnp.int32), skip_layers=2)


def _gen_kwargs(**over):
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kw = dict(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, guidance_scale=5.0, seed=0,
        output_type="np",
    )
    kw.update(over)
    return kw


def test_pipeline_clip_skip_changes_output():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    a = np.asarray(pipe.generate(**_gen_kwargs()))
    b = np.asarray(pipe.generate(**_gen_kwargs(clip_skip=1)))
    assert np.isfinite(b).all()
    assert not np.array_equal(a, b)
    # text cache keys by clip_skip — repeat must reproduce exactly
    b2 = np.asarray(pipe.generate(**_gen_kwargs(clip_skip=1)))
    np.testing.assert_array_equal(b, b2)


def test_pipeline_clip_skip_on_xl():
    pipe = PwwPipeline(config=SDModelConfig.tiny_xl(), weights_dtype=None)
    a = np.asarray(pipe.generate(**_gen_kwargs()))
    b = np.asarray(pipe.generate(**_gen_kwargs(clip_skip=1)))
    assert np.isfinite(b).all()
    assert not np.array_equal(a, b)
