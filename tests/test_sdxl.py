"""SDXL family: dual-encoder conditioning, micro-conditioning, loaders.

Beyond the reference (SD-1.x only); parity target is diffusers'
StableDiffusionXLPipeline semantics — penultimate hidden states of both text
towers concatenated, bigG projected pooled embedding, and text_time
(size/crop) micro-conditioning added to the timestep embedding.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import CLIPTextConfig, SDModelConfig
from pww_tpu.models.clip import CLIPTextEncoder
from pww_tpu.pipeline.pipeline import PwwPipeline
from pww_tpu.weights.loader import clip_key, fill_params


@pytest.fixture(scope="module")
def pipe_xl():
    return PwwPipeline(config=SDModelConfig.tiny_xl())


def _cm(size=64):
    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    return cm


def test_clip2_matches_transformers_with_projection():
    """Penultimate hidden state + projected pooled embedding must match a
    real transformers.CLIPTextModelWithProjection forward (the SDXL
    text_encoder_2 contract)."""
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="gelu",
        projection_dim=24, eos_token_id=99,
    )
    torch.manual_seed(0)
    model = CLIPTextModelWithProjection(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_layers=3, num_heads=4, max_position_embeddings=77,
        hidden_act="gelu", projection_dim=24,
    )
    enc = CLIPTextEncoder(cfg)
    # EOS (max id, 99) mid-sequence, sub-eos padding after it
    ids = np.array([[1, 5, 9, 3, 99] + [7] * 72], np.int64)
    import functools

    shapes = jax.eval_shape(
        functools.partial(enc.init, output="penultimate_and_pooled"),
        jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
    )
    params = fill_params(shapes, state, clip_key, name="clip2")

    pen, pooled = enc.apply(
        params, jnp.asarray(ids, jnp.int32), output="penultimate_and_pooled"
    )
    with torch.no_grad():
        out = model(torch.from_numpy(ids), output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(pen), out.hidden_states[-2].numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.text_embeds.numpy(), atol=2e-5, rtol=1e-4
    )


def test_tiny_xl_txt2img_and_bias_effect(pipe_xl):
    kw = dict(prompt="a cat", color_map_image=_cm(),
              num_inference_steps=2, seed=0, output_type="np")
    a = pipe_xl.generate(color_context={(255, 0, 0): "cat,2.0"}, **kw)
    b = pipe_xl.generate(color_context={(255, 0, 0): "cat,0.0"}, **kw)
    assert a.shape == (1, 64, 64, 3)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 0


def test_tiny_xl_micro_conditioning_changes_output(pipe_xl):
    """SDXL's size/crop time_ids must reach the UNet (different
    original_size => different image, diffusers _get_add_time_ids)."""
    kw = dict(prompt="a cat", color_map_image=_cm(),
              color_context={(255, 0, 0): "cat,1.0"},
              num_inference_steps=2, seed=0, output_type="np")
    a = pipe_xl.generate(**kw)
    b = pipe_xl.generate(original_size=(2048, 2048), **kw)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 0


def test_tiny_xl_save_load_roundtrip(pipe_xl, tmp_path):
    """save_pretrained -> from_pretrained must reproduce XL generations
    (exercises the native-checkpoint XL config + clip2 param paths)."""
    kw = dict(prompt="a cat", color_map_image=_cm(),
              color_context={(255, 0, 0): "cat,1.5"},
              num_inference_steps=2, seed=3, output_type="np")
    want = pipe_xl.generate(**kw)
    d = str(tmp_path / "ckpt")
    pipe_xl.save_pretrained(d)
    pipe2 = PwwPipeline.from_pretrained(d)
    assert pipe2.config.is_xl
    got = pipe2.generate(**kw)
    np.testing.assert_array_equal(got, want)


def test_tiny_xl_generate_batch_and_deepcache(pipe_xl):
    reqs = [
        dict(prompt="a cat", color_map_image=_cm(),
             color_context={(255, 0, 0): "cat,1.5"}, seed=1),
        dict(prompt="a dog", color_map_image=_cm(),
             color_context={(255, 0, 0): "dog,0.5"}, seed=2),
    ]
    out = pipe_xl.generate_batch(reqs, num_inference_steps=2, output_type="np")
    assert out.shape == (2, 64, 64, 3)
    dc = pipe_xl.generate(
        prompt="a cat", color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,1.5"},
        num_inference_steps=4, seed=1, cache_interval=2, output_type="np",
    )
    assert dc.shape == (1, 64, 64, 3)


def test_config_from_checkpoint_detects_sdxl(tmp_path):
    """SDXL diffusers-layout config.json files -> is_xl config with
    transformer depths, text_time embedding and bigG projection dim."""
    from pww_tpu.weights.loader import config_from_checkpoint

    def w(sub, d):
        os.makedirs(tmp_path / sub, exist_ok=True)
        with open(tmp_path / sub / "config.json", "w") as f:
            json.dump(d, f)

    w("unet", {
        "block_out_channels": [320, 640, 1280],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D"],
        "attention_head_dim": [5, 10, 20],
        "transformer_layers_per_block": [1, 2, 10],
        "cross_attention_dim": 2048,
        "addition_embed_type": "text_time",
        "addition_time_embed_dim": 256,
        "projection_class_embeddings_input_dim": 2816,
        "sample_size": 128,
    })
    w("text_encoder", {"hidden_size": 768, "num_hidden_layers": 12,
                       "architectures": ["CLIPTextModel"]})
    w("text_encoder_2", {
        "hidden_size": 1280, "intermediate_size": 5120,
        "num_hidden_layers": 32, "num_attention_heads": 20,
        "hidden_act": "gelu", "projection_dim": 1280,
        "architectures": ["CLIPTextModelWithProjection"],
    })
    w("vae", {"scaling_factor": 0.13025,
              "block_out_channels": [128, 256, 512, 512]})

    cfg = config_from_checkpoint(str(tmp_path))
    assert cfg.is_xl
    assert cfg.clip2.hidden_size == 1280 and cfg.clip2.projection_dim == 1280
    assert cfg.unet.transformer_depth == (1, 2, 10)
    assert cfg.unet.down_block_has_attn == (False, True, True)
    assert cfg.unet.addition_embed_type == "text_time"
    assert cfg.unet.projection_class_embeddings_input_dim == 2816
    assert cfg.vae.scaling_factor == 0.13025
    # head_dim derived from per-block head counts: 320/5 = 64
    assert cfg.unet.attention_head_dim == 64


def test_tiny_xl_controlnet(pipe_xl):
    """ControlNet on the XL config: text_time conditioning in the control
    branch too (diffusers ControlNetModel for SDXL has its own add_embedding)."""
    pipe = PwwPipeline(config=SDModelConfig.tiny_xl())
    pipe.load_controlnet()
    cm = _cm()
    hint = np.zeros((64, 64, 3), np.uint8)
    hint[20:40, 20:40] = 255
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.5"},
        control_image=hint, num_inference_steps=2, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)
    # fresh zero-convs make the ControlNet a no-op by design; perturb them so
    # the residuals (and the XL add_embedding path feeding them) become visible
    pipe.controlnet_params = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.05 if "zero_conv" in "".join(
            str(getattr(k, "key", k)) for k in p
        ) else x,
        pipe.controlnet_params,
    )
    on = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.5"},
        control_image=hint, num_inference_steps=2, seed=0, output_type="np",
    )
    off = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.5"},
        control_image=hint, controlnet_conditioning_scale=0.0,
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert np.abs(on.astype(int) - off.astype(int)).mean() > 0


def test_tiny_xl_inpaint_nine_channel():
    """SDXL-inpainting (9-channel UNet) composes with the XL conditioning."""
    import dataclasses

    from PIL import Image

    cfg = SDModelConfig.tiny_xl()
    cfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, in_channels=9)
    )
    pipe = PwwPipeline(config=cfg)
    init = Image.fromarray(np.full((64, 64, 3), 120, np.uint8))
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    out = pipe.generate(
        prompt="a cat", color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,1.0"},
        init_image=init, mask_image=mask, strength=1.0,
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


# ---------------------------------------------------------------------------
# SDXL-refiner: single bigG tower, aesthetic-score micro-conditioning
# ---------------------------------------------------------------------------


def _refiner_pipe():
    from pww_tpu.pipeline.pipeline import PwwPipeline

    return PwwPipeline(config=SDModelConfig.tiny_xl_refiner(), weights_dtype=None)


def test_refiner_config_shapes():
    cfg = SDModelConfig.tiny_xl_refiner()
    assert cfg.xl_refiner and not cfg.is_xl
    assert cfg.needs_pooled
    assert cfg.num_time_ids == 5
    full = SDModelConfig.sdxl_refiner()
    assert full.num_time_ids == 5
    assert full.unet.cross_attention_dim == 1280
    assert full.pooled_dim == 1280


def test_refiner_generate_and_aesthetic_score_reaches_model():
    pipe = _refiner_pipe()
    kwargs = dict(
        prompt="a cat", color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,1.5"},
        num_inference_steps=2, seed=0, output_type="latent",
    )
    a = np.asarray(pipe.generate(aesthetic_score=6.0, **kwargs))
    b = np.asarray(pipe.generate(aesthetic_score=1.0, **kwargs))
    assert np.all(np.isfinite(a))
    assert not np.array_equal(a, b)  # the score conditions the UNet
    # PwW region strength changes the output too (bias is live on refiner)
    c = np.asarray(pipe.generate(
        prompt="a cat", color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,0.0"},
        num_inference_steps=2, seed=0, output_type="latent",
    ))
    assert not np.array_equal(a, c)


def test_refiner_img2img():
    from PIL import Image

    pipe = _refiner_pipe()
    init = Image.fromarray(
        (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    )
    out = pipe.generate(
        prompt="a cat", color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,1.0"},
        init_image=init, strength=0.5,
        num_inference_steps=4, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_refiner_save_load_roundtrip(tmp_path):
    pipe = _refiner_pipe()
    kwargs = dict(
        prompt="a cat", color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="np",
    )
    want = pipe.generate(**kwargs)
    d = str(tmp_path / "refiner")
    pipe.save_pretrained(d)
    from pww_tpu.pipeline.pipeline import PwwPipeline

    pipe2 = PwwPipeline.from_pretrained(d, weights_dtype=None)
    assert pipe2.config.xl_refiner
    np.testing.assert_array_equal(want, pipe2.generate(**kwargs))


def test_refiner_diffusers_layout_detection(tmp_path):
    """A diffusers dir with text_encoder_2 but NO text_encoder loads as a
    refiner: bigG in the clip slot, 5 time ids, weights from text_encoder_2."""
    import json
    import os

    import jax
    from safetensors.numpy import save_file

    from pww_tpu.models.clip import CLIPTextEncoder
    from pww_tpu.models.unet import UNet2DCondition
    from pww_tpu.models.vae import AutoencoderKL
    from pww_tpu.weights.loader import (clip_key, config_from_checkpoint,
                                        load_pipeline_checkpoint, unet_key,
                                        vae_keys)

    cfg = SDModelConfig.tiny_xl_refiner()
    root = tmp_path / "refiner_ckpt"
    for sub in ("unet", "vae", "text_encoder_2", "tokenizer_2"):
        os.makedirs(root / sub)
    (root / "unet" / "config.json").write_text(json.dumps({
        "in_channels": 4, "sample_size": 16,
        "block_out_channels": [32, 64], "layers_per_block": 1,
        "attention_head_dim": 4, "cross_attention_dim": 48,
        "norm_num_groups": 8,
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
        "transformer_layers_per_block": [0, 2],
        "addition_embed_type": "text_time", "addition_time_embed_dim": 8,
        "projection_class_embeddings_input_dim": 48 + 5 * 8,
    }))
    (root / "vae" / "config.json").write_text(json.dumps({
        "latent_channels": 4, "block_out_channels": [8, 16, 16, 32],
        "layers_per_block": 1, "norm_num_groups": 4,
        "scaling_factor": 0.13025,
    }))
    (root / "text_encoder_2" / "config.json").write_text(json.dumps({
        "vocab_size": 1000, "hidden_size": 48, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "max_position_embeddings": 77, "hidden_act": "gelu",
        "projection_dim": 48,
        "architectures": ["CLIPTextModelWithProjection"],
        "eos_token_id": 1,
    }))
    # minimal real-BPE tokenizer assets (refiner layout: tokenizer_2 only)
    from pww_tpu.tokenizer.clip_bpe import bytes_to_unicode

    base = list(bytes_to_unicode().values())
    vocab = {}
    for v in base:
        vocab[v] = len(vocab)
    for v in base:
        vocab[v + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (root / "tokenizer_2" / "vocab.json").write_text(json.dumps(vocab))
    (root / "tokenizer_2" / "merges.txt").write_text("#version: 0.2\n")

    got = config_from_checkpoint(str(root))
    assert got.xl_refiner and got.clip2 is None
    assert got.clip.projection_dim == 48
    assert got.num_time_ids == 5

    # synthesize torch-layout weights for every param our modules expect
    from pww_tpu.weights.loader import t_conv, t_dense

    def dump(module_shapes, key_fn, subdir, multi=False):
        rng = np.random.default_rng(0)
        state = {}
        flat = jax.tree_util.tree_flatten_with_path(module_shapes)[0]
        for kp, leaf in flat:
            path = tuple(p.key for p in kp if p.key != "params")
            keys, tf = key_fn(path, len(leaf.shape))
            key = keys[0] if multi else keys
            shape = list(leaf.shape)
            if tf is t_conv:  # flax HWIO -> torch OIHW
                shape = [shape[3], shape[2], shape[0], shape[1]]
            elif tf is t_dense:
                shape = [shape[1], shape[0]]
            state[key] = rng.standard_normal(shape).astype(np.float32) * 0.05
        save_file(state, str(root / subdir / "diffusion_pytorch_model.safetensors"))

    rngk = jax.random.PRNGKey(0)
    import functools

    import jax.numpy as jnp

    unet = UNet2DCondition(got.unet)
    dump(jax.eval_shape(
        unet.init, rngk, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 48)),
        added_cond={"text_embeds": jnp.zeros((1, 48)),
                    "time_ids": jnp.zeros((1, 5))},
    ), unet_key, "unet")
    vae = AutoencoderKL(got.vae)
    dump(jax.eval_shape(vae.init, rngk, jnp.zeros((1, 16, 16, 3))), vae_keys,
         "vae", multi=True)
    clip = CLIPTextEncoder(got.clip)
    dump(jax.eval_shape(
        functools.partial(clip.init, output="penultimate_and_pooled"),
        rngk, jnp.zeros((1, 77), jnp.int32),
    ), clip_key, "text_encoder_2")
    os.rename(root / "text_encoder_2" / "diffusion_pytorch_model.safetensors",
              root / "text_encoder_2" / "model.safetensors")

    config, params, tok, tok2 = load_pipeline_checkpoint(str(root))
    assert config.xl_refiner
    assert "clip2" not in params
    assert "text_projection" in params["clip"]["params"]
    assert tok.pad_token_id == 0  # OpenCLIP-style padding


def test_clip2_legacy_eos_token_id_2_pooled_position():
    """Real SD/SDXL text-encoder config.json files carry the legacy-wrong
    ``eos_token_id: 2`` (id 2 never appears in tokenized prompts);
    transformers special-cases it to ``argmax(input_ids)`` — the pooled
    embedding must come from the true EOS (the max id), not position 0."""
    import functools

    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="gelu",
        projection_dim=24, eos_token_id=2,
    )
    torch.manual_seed(0)
    model = CLIPTextModelWithProjection(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_layers=3, num_heads=4, max_position_embeddings=77,
        hidden_act="gelu", projection_dim=24, eos_token_id=2,
    )
    enc = CLIPTextEncoder(cfg)
    ids = np.array([[1, 5, 9, 3, 99] + [7] * 72], np.int64)  # no id 2
    shapes = jax.eval_shape(
        functools.partial(enc.init, output="penultimate_and_pooled"),
        jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
    )
    params = fill_params(shapes, state, clip_key, name="clip2")
    _, pooled = enc.apply(
        params, jnp.asarray(ids, jnp.int32), output="penultimate_and_pooled"
    )
    with torch.no_grad():
        out = model(torch.from_numpy(ids))
    np.testing.assert_allclose(
        np.asarray(pooled), out.text_embeds.numpy(), atol=2e-5, rtol=1e-4
    )
    # and it must differ from the broken position-0 read
    pooled0 = np.asarray(
        enc.apply(params, jnp.asarray(ids[:, ::-1].copy(), jnp.int32),
                  output="penultimate_and_pooled")[1]
    )
    assert np.abs(pooled0 - np.asarray(pooled)).max() > 1e-3
