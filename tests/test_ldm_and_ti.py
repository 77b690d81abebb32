"""LDM-converter renaming tables + textual-inversion injection tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from pww_tpu.config import SDModelConfig
from pww_tpu.weights.ldm_convert import _map_unet_key, _map_vae_key, convert_ldm_state_dict


@pytest.mark.parametrize(
    "src,want",
    [
        ("time_embed.0.weight", "time_embedding.linear_1.weight"),
        ("time_embed.2.bias", "time_embedding.linear_2.bias"),
        ("input_blocks.0.0.weight", "conv_in.weight"),
        ("input_blocks.1.0.in_layers.0.weight", "down_blocks.0.resnets.0.norm1.weight"),
        ("input_blocks.1.0.in_layers.2.weight", "down_blocks.0.resnets.0.conv1.weight"),
        ("input_blocks.1.0.emb_layers.1.weight", "down_blocks.0.resnets.0.time_emb_proj.weight"),
        ("input_blocks.1.0.out_layers.3.bias", "down_blocks.0.resnets.0.conv2.bias"),
        ("input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight",
         "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"),
        ("input_blocks.3.0.op.weight", "down_blocks.0.downsamplers.0.conv.weight"),
        ("input_blocks.4.0.skip_connection.weight", "down_blocks.1.resnets.0.conv_shortcut.weight"),
        ("input_blocks.10.0.in_layers.2.weight", "down_blocks.3.resnets.0.conv1.weight"),
        ("middle_block.0.in_layers.0.weight", "mid_block.resnets.0.norm1.weight"),
        ("middle_block.1.proj_in.weight", "mid_block.attentions.0.proj_in.weight"),
        ("middle_block.2.out_layers.3.weight", "mid_block.resnets.1.conv2.weight"),
        ("output_blocks.0.0.in_layers.0.weight", "up_blocks.0.resnets.0.norm1.weight"),
        ("output_blocks.2.1.conv.weight", "up_blocks.0.upsamplers.0.conv.weight"),
        ("output_blocks.5.2.conv.weight", "up_blocks.1.upsamplers.0.conv.weight"),
        ("output_blocks.5.1.transformer_blocks.0.ff.net.0.proj.weight",
         "up_blocks.1.attentions.2.transformer_blocks.0.ff.net.0.proj.weight"),
        ("output_blocks.4.1.transformer_blocks.0.attn1.to_q.weight",
         "up_blocks.1.attentions.1.transformer_blocks.0.attn1.to_q.weight"),
        ("output_blocks.11.0.out_layers.3.weight", "up_blocks.3.resnets.2.conv2.weight"),
        ("out.0.weight", "conv_norm_out.weight"),
        ("out.2.weight", "conv_out.weight"),
    ],
)
def test_ldm_unet_key_mapping(src, want):
    assert _map_unet_key(src) == want


@pytest.mark.parametrize(
    "src,want",
    [
        ("encoder.conv_in.weight", "encoder.conv_in.weight"),
        ("encoder.down.0.block.0.norm1.weight", "encoder.down_blocks.0.resnets.0.norm1.weight"),
        ("encoder.down.1.block.0.nin_shortcut.weight",
         "encoder.down_blocks.1.resnets.0.conv_shortcut.weight"),
        ("encoder.down.0.downsample.conv.weight",
         "encoder.down_blocks.0.downsamplers.0.conv.weight"),
        ("encoder.mid.block_1.conv1.weight", "encoder.mid_block.resnets.0.conv1.weight"),
        ("encoder.mid.attn_1.q.weight", "encoder.mid_block.attentions.0.query.weight"),
        ("encoder.mid.attn_1.proj_out.weight",
         "encoder.mid_block.attentions.0.proj_attn.weight"),
        ("encoder.norm_out.weight", "encoder.conv_norm_out.weight"),
        ("quant_conv.weight", "quant_conv.weight"),
        ("post_quant_conv.bias", "post_quant_conv.bias"),
        # decoder up-block order is reversed between LDM and diffusers
        ("decoder.up.3.block.0.conv1.weight", "decoder.up_blocks.0.resnets.0.conv1.weight"),
        ("decoder.up.0.block.2.conv2.weight", "decoder.up_blocks.3.resnets.2.conv2.weight"),
        ("decoder.up.1.upsample.conv.weight",
         "decoder.up_blocks.2.upsamplers.0.conv.weight"),
    ],
)
def test_ldm_vae_key_mapping(src, want):
    assert _map_vae_key(src) == want


def test_ldm_split_and_attn_conv_to_linear():
    state = {
        "model.diffusion_model.time_embed.0.weight": np.zeros((4, 2), np.float32),
        "first_stage_model.encoder.mid.attn_1.q.weight": np.zeros((8, 8, 1, 1), np.float32),
        "cond_stage_model.transformer.text_model.final_layer_norm.weight": np.zeros((4,), np.float32),
        "irrelevant.alpha": np.zeros((1,), np.float32),
    }
    unet, vae, clip = convert_ldm_state_dict(state)
    assert "time_embedding.linear_1.weight" in unet
    # 1x1 conv squeezed to linear (reference conv_attn_to_linear, :219-229)
    assert vae["encoder.mid_block.attentions.0.query.weight"].shape == (8, 8)
    assert "text_model.final_layer_norm.weight" in clip


def test_textual_inversion_injection():
    from pww_tpu.pipeline.pipeline import PwwPipeline
    from pww_tpu.weights.textual_inversion import load_learned_embed_in_clip
    import tempfile, os

    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    hidden = pipe.config.clip.hidden_size
    vec = np.random.default_rng(0).standard_normal((hidden,)).astype(np.float32)

    import torch

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "emb.bin")
        torch.save({"<my-cat>": torch.from_numpy(vec)}, path)
        new_clip, placeholder = load_learned_embed_in_clip(
            path, pipe.params["clip"], pipe.tokenizer
        )

    assert placeholder == "<my-cat>"
    table = new_clip["params"]["token_embedding"]["embedding"]
    old = pipe.params["clip"]["params"]["token_embedding"]["embedding"]
    assert table.shape[0] == old.shape[0] + 1
    np.testing.assert_allclose(np.asarray(table[-1]), vec, rtol=1e-6)
    # tokenizer now emits the new id for the placeholder
    tid = pipe.tokenizer.tokenize("a photo of <my-cat> here")
    assert pipe.tokenizer.added_tokens["<my-cat>"] in tid


def test_textual_inversion_generates_end_to_end():
    """TI injection must survive an actual generation (the embedding table
    grows, so the CLIP module/config must be rebuilt — regression for the
    nn.Embed shape-validation failure)."""
    import os
    import tempfile

    import torch

    from pww_tpu.pipeline.pipeline import PwwPipeline
    from pww_tpu.weights.textual_inversion import apply_textual_inversion

    pipe = PwwPipeline(config=SDModelConfig.tiny())
    vec = torch.randn(pipe.config.clip.hidden_size) * 0.01
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "emb.bin")
        torch.save({"<thing>": vec}, p)
        placeholder = apply_textual_inversion(pipe, p)

    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt=f"a photo of {placeholder}",
        color_map_image=cm,
        color_context={(255, 0, 0): f"{placeholder},1.0"},
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def _sd2_shaped_unet_sd(in_channels=4):
    return {
        "conv_in.weight": np.zeros((320, in_channels, 3, 3), np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight":
            np.zeros((320, 1024), np.float32),
    }


def _sd1_shaped_unet_sd(in_channels=4):
    return {
        "conv_in.weight": np.zeros((320, in_channels, 3, 3), np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight":
            np.zeros((320, 768), np.float32),
    }


def test_detect_ldm_config_families():
    """Config derivation from checkpoint shapes (VERDICT #4c): context dim
    768→SD-1.x, 1024→SD-2.x; global_step 110000 is the SD-2.1-768
    v-objective release and 220000 the 512-base epsilon model; anything
    else warns and defaults to v_prediction (diffusers' single-file
    fallback config for SD-2 shapes is stable-diffusion-2-1); 9-channel
    conv_in marks inpainting."""
    import warnings as _w

    from pww_tpu.weights.ldm_convert import detect_ldm_config

    cfg = detect_ldm_config({}, _sd1_shaped_unet_sd())
    assert cfg.unet.cross_attention_dim == 768
    assert cfg.unet.prediction_type == "epsilon"

    with pytest.warns(UserWarning, match="prediction_type"):
        cfg = detect_ldm_config(
            {"global_step": np.int64(875000)}, _sd2_shaped_unet_sd()
        )
    assert cfg.unet.cross_attention_dim == 1024
    assert cfg.unet.prediction_type == "v_prediction"
    assert cfg.clip.hidden_size == 1024 and cfg.clip.hidden_act == "gelu"

    with _w.catch_warnings():
        _w.simplefilter("error")  # recognized steps must NOT warn
        cfg = detect_ldm_config(
            {"global_step": np.int64(110000)}, _sd2_shaped_unet_sd()
        )
        assert cfg.unet.prediction_type == "v_prediction"
        assert cfg.unet.cross_attention_dim == 1024

        cfg = detect_ldm_config(
            {"global_step": np.int64(220000)}, _sd2_shaped_unet_sd()
        )
        assert cfg.unet.prediction_type == "epsilon"

    with pytest.warns(UserWarning, match="epsilon"):
        cfg = detect_ldm_config({}, _sd2_shaped_unet_sd())
    assert cfg.unet.prediction_type == "v_prediction"

    cfg = detect_ldm_config({}, _sd2_shaped_unet_sd(in_channels=9),
                            prediction_type="epsilon")
    assert cfg.unet.in_channels == 9
    assert cfg.unet.prediction_type == "epsilon"

    cfg = detect_ldm_config({}, _sd1_shaped_unet_sd(in_channels=9))
    assert cfg.unet.in_channels == 9


def test_open_clip_conversion_round_trip():
    """Pack an HF-style CLIP text state into the OpenCLIP single-file layout
    (packed qkv, ln_1/ln_2, c_fc/c_proj) and convert back — every tensor must
    land on its HF key bit-identically (SD-2.x cond_stage_model.model.*)."""
    from pww_tpu.weights.ldm_convert import _convert_open_clip

    rng = np.random.default_rng(0)
    d = 16
    hf = {
        "text_model.embeddings.token_embedding.weight": rng.standard_normal((50, d)),
        "text_model.embeddings.position_embedding.weight": rng.standard_normal((77, d)),
        "text_model.final_layer_norm.weight": rng.standard_normal((d,)),
        "text_model.final_layer_norm.bias": rng.standard_normal((d,)),
    }
    open_clip = {
        "token_embedding.weight": hf["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": hf["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": hf["text_model.final_layer_norm.weight"],
        "ln_final.bias": hf["text_model.final_layer_norm.bias"],
        "text_projection": rng.standard_normal((d, d)),  # must be ignored
        "logit_scale": np.float32(4.6),  # must be ignored
    }
    for i in range(2):
        base = f"text_model.encoder.layers.{i}."
        q, kk, vv = (rng.standard_normal((d, d)) for _ in range(3))
        qb, kb, vb = (rng.standard_normal((d,)) for _ in range(3))
        hf.update({
            base + "self_attn.q_proj.weight": q, base + "self_attn.k_proj.weight": kk,
            base + "self_attn.v_proj.weight": vv,
            base + "self_attn.q_proj.bias": qb, base + "self_attn.k_proj.bias": kb,
            base + "self_attn.v_proj.bias": vb,
            base + "self_attn.out_proj.weight": rng.standard_normal((d, d)),
            base + "self_attn.out_proj.bias": rng.standard_normal((d,)),
            base + "layer_norm1.weight": rng.standard_normal((d,)),
            base + "layer_norm1.bias": rng.standard_normal((d,)),
            base + "layer_norm2.weight": rng.standard_normal((d,)),
            base + "layer_norm2.bias": rng.standard_normal((d,)),
            base + "mlp.fc1.weight": rng.standard_normal((4 * d, d)),
            base + "mlp.fc1.bias": rng.standard_normal((4 * d,)),
            base + "mlp.fc2.weight": rng.standard_normal((d, 4 * d)),
            base + "mlp.fc2.bias": rng.standard_normal((d,)),
        })
        rb = f"transformer.resblocks.{i}."
        open_clip.update({
            rb + "attn.in_proj_weight": np.concatenate([q, kk, vv], axis=0),
            rb + "attn.in_proj_bias": np.concatenate([qb, kb, vb], axis=0),
            rb + "attn.out_proj.weight": hf[base + "self_attn.out_proj.weight"],
            rb + "attn.out_proj.bias": hf[base + "self_attn.out_proj.bias"],
            rb + "ln_1.weight": hf[base + "layer_norm1.weight"],
            rb + "ln_1.bias": hf[base + "layer_norm1.bias"],
            rb + "ln_2.weight": hf[base + "layer_norm2.weight"],
            rb + "ln_2.bias": hf[base + "layer_norm2.bias"],
            rb + "mlp.c_fc.weight": hf[base + "mlp.fc1.weight"],
            rb + "mlp.c_fc.bias": hf[base + "mlp.fc1.bias"],
            rb + "mlp.c_proj.weight": hf[base + "mlp.fc2.weight"],
            rb + "mlp.c_proj.bias": hf[base + "mlp.fc2.bias"],
        })
    got = _convert_open_clip(open_clip)
    assert set(got) == set(hf), set(got) ^ set(hf)
    for k in hf:
        np.testing.assert_array_equal(got[k], hf[k], err_msg=k)


def test_open_clip_keys_route_through_state_dict_split():
    state = {
        "cond_stage_model.model.ln_final.weight": np.zeros((8,), np.float32),
        "cond_stage_model.model.transformer.resblocks.0.ln_1.weight":
            np.zeros((8,), np.float32),
    }
    _, _, clip = convert_ldm_state_dict(state)
    assert "text_model.final_layer_norm.weight" in clip
    assert "text_model.encoder.layers.0.layer_norm1.weight" in clip


def test_extract_ema_prefers_ema_shadows():
    """--extract_ema must overlay model_ema.* shadows (squashed-dot names)
    onto model.diffusion_model.* (reference change_model_path.py:812-943)."""
    live = np.full((4, 2), 1.0, np.float32)
    ema = np.full((4, 2), 2.0, np.float32)
    state = {
        "model.diffusion_model.time_embed.0.weight": live,
        "model_ema.diffusion_modeltime_embed0weight": ema,
    }
    unet, _, _ = convert_ldm_state_dict(state, extract_ema=False)
    np.testing.assert_array_equal(unet["time_embedding.linear_1.weight"], live)
    unet, _, _ = convert_ldm_state_dict(state, extract_ema=True)
    np.testing.assert_array_equal(unet["time_embedding.linear_1.weight"], ema)


def test_find_tokenizer_assets(tmp_path):
    """Tokenizer discovery for single-file checkpoints: explicit dir, probe
    next to the checkpoint, loud warning fallback (VERDICT weak #4)."""
    import json as _json
    import warnings

    from pww_tpu.tokenizer.clip_bpe import bytes_to_unicode
    from pww_tpu.weights.ldm_convert import _find_tokenizer

    base = list(bytes_to_unicode().values())
    vocab = {v: i for i, v in enumerate(base)}
    for v in base:
        vocab[v + "</w>"] = len(vocab)
    vocab["ca"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    ckpt = tmp_path / "model.ckpt"
    ckpt.write_bytes(b"")
    (tmp_path / "tokenizer").mkdir()
    with open(tmp_path / "tokenizer" / "vocab.json", "w") as f:
        _json.dump(vocab, f)
    with open(tmp_path / "tokenizer" / "merges.txt", "w") as f:
        f.write("#version: 0.2\nc a\n")
    tok = _find_tokenizer(str(ckpt), None)  # probes the checkpoint's dir
    assert tok is not None and "ca" in tok.encoder

    lone = tmp_path / "elsewhere" / "model.ckpt"
    lone.parent.mkdir()
    lone.write_bytes(b"")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert _find_tokenizer(str(lone), None) is None
    assert any("toy tokenizer" in str(w.message) for w in rec)

    with pytest.raises(FileNotFoundError):
        _find_tokenizer(str(lone), str(tmp_path / "nope"))


def test_textual_inversion_training_loop():
    """Full TI TRAINING on the tiny config: loss decreases, only the
    placeholder rows move, the result saves/reloads through the standard
    injection path, and the trained token generates end-to-end."""
    import os
    import tempfile

    from PIL import Image

    from pww_tpu.pipeline.pipeline import PwwPipeline
    from pww_tpu.training import train_textual_inversion
    from pww_tpu.weights.textual_inversion import apply_textual_inversion

    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    before = np.asarray(pipe.params["clip"]["params"]["token_embedding"]["embedding"])
    rng = np.random.default_rng(0)
    images = [
        Image.fromarray((rng.random((64, 64, 3)) * 80 + 100).astype(np.uint8))
        for _ in range(2)
    ]
    result = train_textual_inversion(
        pipe, images, "<my-thing>", initializer_token="thing",
        num_steps=60, batch_size=2, learning_rate=1e-2, seed=0,
    )
    # loss goes down (compare first/last-quarter means; SGD is noisy)
    q = max(len(result.losses) // 4, 1)
    assert np.mean(result.losses[-q:]) < np.mean(result.losses[:q]), (
        np.mean(result.losses[:q]), np.mean(result.losses[-q:]))
    # frozen rows untouched, new row moved away from its init
    after = np.asarray(pipe.params["clip"]["params"]["token_embedding"]["embedding"])
    np.testing.assert_array_equal(after[: before.shape[0]], before)
    assert np.abs(result.embedding).sum() > 0
    assert not np.allclose(after[-1], before[pipe.tokenizer.tokenize("thing")[0]])

    # trained token drives generation (prompt AND color-context label)
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt=f"a photo of {result.placeholder}",
        color_map_image=cm,
        color_context={(255, 0, 0): f"{result.placeholder},1.0"},
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)

    # save -> inject into a FRESH pipeline via the standard path
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "learned_embeds.bin")
        result.save(p)
        pipe2 = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
        tok = apply_textual_inversion(pipe2, p)
    assert tok == "<my-thing>"
    emb2 = np.asarray(
        pipe2.params["clip"]["params"]["token_embedding"]["embedding"][-1]
    )
    np.testing.assert_allclose(emb2, result.embedding[0], rtol=1e-6)


def test_global_step_survives_state_dict_reading(tmp_path):
    """LDM checkpoints keep global_step OUTSIDE state_dict; the tensor filter
    must not eat it, or SD-2.x epsilon/v detection silently misfires
    (read_state_dict return_meta path)."""
    import torch

    from pww_tpu.weights.ldm_convert import detect_ldm_config
    from pww_tpu.weights.loader import read_state_dict

    p = str(tmp_path / "model.ckpt")
    torch.save({
        "state_dict": {"model.diffusion_model.time_embed.0.weight":
                       torch.zeros(4, 2)},
        "global_step": 110000,
    }, p)
    state, meta = read_state_dict(p, return_meta=True)
    assert meta == {"global_step": 110000}
    assert "model.diffusion_model.time_embed.0.weight" in state
    # global_step 110000 = the SD-2.1-768 v-objective release
    cfg = detect_ldm_config(meta, _sd2_shaped_unet_sd())
    assert cfg.unet.prediction_type == "v_prediction"
    # and without the header field, SD-2.x defaults to 768-v (with a warning)
    with pytest.warns(UserWarning, match="epsilon"):
        cfg = detect_ldm_config({}, _sd2_shaped_unet_sd())
    assert cfg.unet.prediction_type == "v_prediction"


def test_textual_inversion_reapply_overwrites_in_place():
    """Loading an updated embedding for an already-registered placeholder
    must overwrite its rows, not append orphan rows that no token id maps
    to (which would silently keep the stale vectors and grow vocab_size —
    a recompile — on every call)."""
    import os
    import tempfile

    import torch

    from pww_tpu.pipeline.pipeline import PwwPipeline
    from pww_tpu.weights.textual_inversion import load_learned_embed_in_clip

    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    hidden = pipe.config.clip.hidden_size
    rng = np.random.default_rng(3)
    v1 = rng.standard_normal((hidden,)).astype(np.float32)
    v2 = rng.standard_normal((hidden,)).astype(np.float32)

    with tempfile.TemporaryDirectory() as d:
        p1, p2 = os.path.join(d, "v1.bin"), os.path.join(d, "v2.bin")
        torch.save({"<cat>": torch.from_numpy(v1)}, p1)
        torch.save({"<cat>": torch.from_numpy(v2)}, p2)
        clip1, _ = load_learned_embed_in_clip(
            p1, pipe.params["clip"], pipe.tokenizer
        )
        clip2, _ = load_learned_embed_in_clip(p2, clip1, pipe.tokenizer)

    tid = pipe.tokenizer.convert_tokens_to_ids("<cat>")
    t1 = clip1["params"]["token_embedding"]["embedding"]
    t2 = clip2["params"]["token_embedding"]["embedding"]
    assert t2.shape == t1.shape  # no orphan growth
    np.testing.assert_allclose(np.asarray(t1[tid]), v1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t2[tid]), v2, rtol=1e-6)


def test_train_textual_inversion_rejects_xl_before_mutating():
    from pww_tpu.pipeline.pipeline import PwwPipeline
    from pww_tpu.training import train_textual_inversion

    pipe = PwwPipeline(config=SDModelConfig.tiny_xl())
    tok_before = dict(pipe.tokenizer.added_tokens)
    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(NotImplementedError, match="single-encoder"):
        train_textual_inversion(pipe, [img], "<thing>", num_steps=1)
    assert pipe.tokenizer.added_tokens == tok_before  # nothing mutated


def test_train_textual_inversion_invalidates_encode_cache():
    """A pre-training generate() caches the placeholder prompt's (BPE-
    decomposed) conditioning; training must invalidate it or the learned
    concept is silently absent from later generations."""
    from pww_tpu.pipeline.pipeline import PwwPipeline
    from pww_tpu.training import train_textual_inversion

    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    cm = np.zeros((64, 64, 3), np.uint8)
    kw = dict(color_map_image=cm, num_inference_steps=2, seed=0,
              output_type="np")
    before = np.asarray(pipe.generate(prompt="a photo of <thing>", **kw))
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(
        np.uint8)
    train_textual_inversion(pipe, [img], "<thing>", num_steps=2,
                            learning_rate=1.0)
    after = np.asarray(pipe.generate(prompt="a photo of <thing>", **kw))
    assert not np.array_equal(before, after)
