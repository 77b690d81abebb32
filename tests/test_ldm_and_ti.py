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
