"""IP-Adapter tests: CLIP vision parity (real torch), site enumeration,
checkpoint install round-trip, pipeline composition with PwW."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pww_tpu.config import CLIPVisionConfig, SDModelConfig, UNetConfig
from pww_tpu.models.clip_vision import (CLIPVisionEncoder, ImageProjection,
                                        preprocess_clip_image)
from pww_tpu.pipeline.pipeline import PwwPipeline
from pww_tpu.weights.ip_adapter import (attn2_sites, load_image_encoder,
                                        parse_ip_adapter_state, vision_key)
from pww_tpu.weights.loader import fill_params


def test_clip_vision_matches_transformers_torch():
    """Flax vision tower == transformers CLIPVisionModelWithProjection on the
    same (random) weights — proves the architecture and the key mapping."""
    import torch
    import transformers

    tcfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=24, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tmodel = transformers.CLIPVisionModelWithProjection(tcfg).eval()
    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
        image_size=32, patch_size=8, projection_dim=24, hidden_act="gelu",
    )
    enc = CLIPVisionEncoder(cfg)
    shapes = jax.eval_shape(
        enc.init, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3))
    )
    params = fill_params(shapes, state, vision_key, name="vision")

    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(pixel_values=torch.from_numpy(px)).image_embeds.numpy()
    got = np.asarray(enc.apply(params, jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_attn2_sites_sd15_enumeration():
    """SD-1.5: 16 cross-attention sites in diffusers attn-processor order —
    down blocks, then UP blocks, then mid (diffusers registers the up_blocks
    ModuleList before constructing mid_block)."""
    sites = attn2_sites(UNetConfig.sd15())
    assert len(sites) == 16
    assert sites[0] == ("down_0_attn_0", "blocks_0")
    assert sites[5] == ("down_2_attn_1", "blocks_0")
    assert sites[6] == ("up_1_attn_0", "blocks_0")  # up before mid
    assert sites[14] == ("up_3_attn_2", "blocks_0")
    assert sites[15] == ("mid_attn", "blocks_0")


def _synthetic_ip_state(cfg, num_tokens=4, embed_dim=16, seed=0):
    """kohya-format ip-adapter dict for every attn2 site of a config."""
    rng = np.random.default_rng(seed)
    d_ctx = cfg.unet.cross_attention_dim
    nh, hd = cfg.unet.heads_for(cfg.unet.block_out_channels[0])
    state = {
        "image_proj.proj.weight":
            rng.standard_normal((num_tokens * d_ctx, embed_dim)).astype(np.float32) * 0.1,
        "image_proj.proj.bias": np.zeros(num_tokens * d_ctx, np.float32),
        "image_proj.norm.weight": np.ones(d_ctx, np.float32),
        "image_proj.norm.bias": np.zeros(d_ctx, np.float32),
    }
    for i, (site, block) in enumerate(attn2_sites(cfg.unet)):
        # inner dim = num_heads*head_dim at the site's channel width; derive
        # from the site name's block index
        bi = int(site.split("_")[1]) if site != "mid_attn" else (
            len(cfg.unet.block_out_channels) - 1
        )
        if site.startswith("up_"):
            ch = tuple(reversed(cfg.unet.block_out_channels))[bi]
        else:
            ch = cfg.unet.block_out_channels[bi]
        nh, hd = cfg.unet.heads_for(ch)
        inner = nh * hd
        state[f"ip_adapter.{2 * i + 1}.to_k_ip.weight"] = (
            rng.standard_normal((inner, d_ctx)).astype(np.float32) * 0.05
        )
        state[f"ip_adapter.{2 * i + 1}.to_v_ip.weight"] = (
            rng.standard_normal((inner, d_ctx)).astype(np.float32) * 0.05
        )
    return state


def _cm():
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    return cm


def _kwargs(**kw):
    return dict(
        prompt="a cat", color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="latent", **kw,
    )


def test_load_ip_adapter_checkpoint_and_generate():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    base = np.asarray(pipe.generate(**_kwargs()))

    state = _synthetic_ip_state(pipe.config, embed_dim=16)
    pipe.load_ip_adapter(state, image_embed_dim=16)
    assert pipe.config.unet.ip_adapter_tokens == 4

    emb = np.random.default_rng(1).standard_normal((1, 16)).astype(np.float32)
    with_img = np.asarray(
        pipe.generate(ip_adapter_image=emb, **_kwargs())
    )
    assert not np.array_equal(base, with_img)
    # scale 0 turns the image branch off exactly (f32: + 0*x is a no-op)
    off = np.asarray(
        pipe.generate(ip_adapter_image=emb, ip_adapter_scale=0.0, **_kwargs())
    )
    np.testing.assert_array_equal(base, off)
    # the installed kernels came from the checkpoint (spot check one leaf)
    flat = jax.tree_util.tree_flatten_with_path(pipe.params["unet"])[0]
    kip = {
        tuple(p.key for p in kp if p.key != "params"): leaf
        for kp, leaf in flat if "to_k_ip" in str(kp)
    }
    assert len(kip) == len(attn2_sites(pipe.config.unet))
    path = ("down_0_attn_0", "blocks_0", "attn2", "to_k_ip", "kernel")
    np.testing.assert_allclose(
        np.asarray(kip[path]),
        state["ip_adapter.1.to_k_ip.weight"].T,
        rtol=1e-6,
    )


def test_ip_adapter_composes_with_pww_and_image_encoder():
    from PIL import Image

    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    vcfg = CLIPVisionConfig.tiny()
    enc = CLIPVisionEncoder(vcfg)
    enc_params = enc.init(
        jax.random.PRNGKey(3), jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    )
    pipe.load_ip_adapter(
        image_encoder=(enc, enc_params, vcfg),
        image_embed_dim=vcfg.projection_dim,
    )
    img = Image.fromarray(
        (np.random.default_rng(0).random((48, 48, 3)) * 255).astype(np.uint8)
    )
    a = np.asarray(pipe.generate(ip_adapter_image=img, **_kwargs()))
    b = np.asarray(pipe.generate(ip_adapter_image=None, **_kwargs()))
    assert not np.array_equal(a, b)  # the image conditions the output
    # PwW region strength still acts with the adapter attached
    c = np.asarray(pipe.generate(
        ip_adapter_image=img,
        prompt="a cat", color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,0.0"},
        num_inference_steps=2, seed=0, output_type="latent",
    ))
    assert not np.array_equal(a, c)


def test_ip_adapter_rejects_image_without_adapter():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    with pytest.raises(ValueError, match="load_ip_adapter"):
        pipe.generate(ip_adapter_image=np.zeros((1, 16), np.float32),
                      **_kwargs())


def test_preprocess_clip_image_normalization():
    x = np.asarray(preprocess_clip_image(
        np.full((10, 12, 3), 128, np.uint8), size=32
    ))
    assert x.shape == (1, 32, 32, 3)
    # 128/255 normalized by CLIP mean/std
    want = (128 / 255 - 0.48145466) / 0.26862954
    np.testing.assert_allclose(x[0, 0, 0, 0], want, rtol=1e-5)


def test_load_image_encoder_dir(tmp_path):
    """Synthetic transformers-layout image-encoder dir loads via the key map."""
    import json

    import torch
    import transformers

    tcfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=24, hidden_act="gelu",
    )
    tmodel = transformers.CLIPVisionModelWithProjection(tcfg)
    d = tmp_path / "image_encoder"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "image_size": 32, "patch_size": 8,
        "projection_dim": 24, "hidden_act": "gelu",
    }))
    torch.save(tmodel.state_dict(), str(d / "pytorch_model.bin"))
    vcfg, params = load_image_encoder(str(d))
    assert vcfg.num_positions == 17
    out = CLIPVisionEncoder(vcfg).apply(
        params, jnp.zeros((1, 32, 32, 3))
    )
    assert out.shape == (1, 24)


def _synthetic_plus_proj(embed_dim=24, dim=16, num_queries=6, depth=2,
                         heads=2, dim_head=64, out_dim=32, ff_mult=2, seed=3):
    """tencent-ailab plus-format image_proj group (resampler)."""
    rng = np.random.default_rng(seed)
    inner = heads * dim_head

    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    proj = {
        "latents": w(num_queries, dim),
        "proj_in.weight": w(dim, embed_dim),
        "proj_in.bias": np.zeros(dim, np.float32),
        "proj_out.weight": w(out_dim, dim),
        "proj_out.bias": np.zeros(out_dim, np.float32),
        "norm_out.weight": np.ones(out_dim, np.float32),
        "norm_out.bias": np.zeros(out_dim, np.float32),
    }
    for i in range(depth):
        proj[f"layers.{i}.0.norm1.weight"] = np.ones(dim, np.float32)
        proj[f"layers.{i}.0.norm1.bias"] = np.zeros(dim, np.float32)
        proj[f"layers.{i}.0.norm2.weight"] = np.ones(dim, np.float32)
        proj[f"layers.{i}.0.norm2.bias"] = np.zeros(dim, np.float32)
        proj[f"layers.{i}.0.to_q.weight"] = w(inner, dim)
        proj[f"layers.{i}.0.to_kv.weight"] = w(inner * 2, dim)
        proj[f"layers.{i}.0.to_out.weight"] = w(dim, inner)
        proj[f"layers.{i}.1.0.weight"] = np.ones(dim, np.float32)
        proj[f"layers.{i}.1.0.bias"] = np.zeros(dim, np.float32)
        proj[f"layers.{i}.1.1.weight"] = w(dim * ff_mult, dim)
        proj[f"layers.{i}.1.3.weight"] = w(dim, dim * ff_mult)
    return proj


def test_ip_adapter_plus_resampler_loads_and_runs():
    from pww_tpu.models.clip_vision import Resampler
    from pww_tpu.weights.ip_adapter import (is_plus_format, resampler_config,
                                            resampler_params)

    proj = _synthetic_plus_proj()
    assert is_plus_format(proj)
    rcfg = resampler_config(proj)
    assert rcfg["num_queries"] == 6 and rcfg["depth"] == 2
    assert rcfg["output_dim"] == 32 and rcfg["ff_mult"] == 2
    mod = Resampler(**rcfg)
    params = resampler_params(proj)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 17, 24)), jnp.float32
    )
    out = mod.apply(params, feats)
    assert out.shape == (2, 6, 32)
    assert np.isfinite(np.asarray(out)).all()
    # the resampler actually attends the features (not just the latents)
    out2 = mod.apply(params, feats * 3.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_ip_adapter_plus_pipeline_end_to_end():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    vcfg = CLIPVisionConfig.tiny()
    enc = CLIPVisionEncoder(vcfg)
    enc_params = enc.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)),
    )
    # plus proj over the encoder's HIDDEN width, output = cross_attention_dim
    proj = _synthetic_plus_proj(
        embed_dim=vcfg.hidden_size,
        out_dim=pipe.config.unet.cross_attention_dim,
    )
    state = {f"image_proj.{k}": v for k, v in proj.items()}
    # adapter K/V sized for 6 tokens? (token count is free: K/V act per token)
    for k, v in _synthetic_ip_state(pipe.config, embed_dim=8).items():
        if k.startswith("ip_adapter."):
            state[k] = v
    pipe.load_ip_adapter(
        state, image_encoder=(enc, enc_params, vcfg),
    )
    assert pipe._ip["plus"]
    assert pipe.config.unet.ip_adapter_tokens == 6
    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(2).random((40, 40, 3)) * 255).astype(np.uint8)
    )
    a = np.asarray(pipe.generate(ip_adapter_image=img, **_kwargs()))
    b = np.asarray(pipe.generate(ip_adapter_image=None, **_kwargs()))
    assert np.isfinite(a).all()
    assert not np.array_equal(a, b)


def test_ip_adapter_on_sdxl_family():
    """The site enumeration handles per-block transformer depths (XL) —
    adapter K/V install + generate on the tiny XL config."""
    pipe = PwwPipeline(config=SDModelConfig.tiny_xl(), weights_dtype=None)
    from pww_tpu.weights.ip_adapter import attn2_sites as sites_fn

    sites = sites_fn(pipe.config.unet)
    # tiny_xl: down_1_attn_0 (depth 2) + up_0_attn_{0,1} (depth 2 each)
    # + mid (depth 2) = 8 cross-attention sites
    assert len(sites) == 8
    assert sites[0] == ("down_1_attn_0", "blocks_0")
    assert sites[1] == ("down_1_attn_0", "blocks_1")
    state = _synthetic_ip_state(pipe.config, embed_dim=12)
    pipe.load_ip_adapter(state, image_embed_dim=12)
    emb = np.random.default_rng(4).standard_normal((1, 12)).astype(np.float32)
    out = pipe.generate(ip_adapter_image=emb, **_kwargs())
    assert np.isfinite(np.asarray(out)).all()


def test_ip_adapter_plus_raw_image_array_not_misclassified():
    """A raw (H, W, 3) numpy image has ndim 3 like precomputed plus patch
    features — it must route through preprocess+encode, not be treated as
    embeddings (which crashed in the resampler with a shape mismatch)."""
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    vcfg = CLIPVisionConfig.tiny()
    enc = CLIPVisionEncoder(vcfg)
    enc_params = enc.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)),
    )
    proj = _synthetic_plus_proj(
        embed_dim=vcfg.hidden_size,
        out_dim=pipe.config.unet.cross_attention_dim,
    )
    state = {f"image_proj.{k}": v for k, v in proj.items()}
    for k, v in _synthetic_ip_state(pipe.config, embed_dim=8).items():
        if k.startswith("ip_adapter."):
            state[k] = v
    pipe.load_ip_adapter(state, image_encoder=(enc, enc_params, vcfg))

    raw_float = np.random.default_rng(0).random((40, 40, 3)).astype(np.float32)
    raw_uint8 = (raw_float * 255).astype(np.uint8)
    for raw in (raw_float, raw_uint8):
        out = np.asarray(pipe.generate(ip_adapter_image=raw, **_kwargs()))
        assert np.isfinite(out).all()

    # genuinely precomputed (1, L, D) float features still bypass the encoder
    feats, _ = enc.apply(
        enc_params,
        jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)),
        output="hidden_and_pooled",
    )
    out = np.asarray(pipe.generate(ip_adapter_image=np.asarray(feats), **_kwargs()))
    assert np.isfinite(out).all()


def test_ip_adapter_bf16_precomputed_embeddings_bypass_encoder():
    """bf16 is the default compute dtype: (1, D) bf16 embeddings must
    classify as precomputed (np.issubdtype(bfloat16, floating) is False —
    the check must use jnp dtype lattice), not be routed to the image
    preprocessor."""
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    state = _synthetic_ip_state(pipe.config, embed_dim=16)
    pipe.load_ip_adapter(state)  # no image encoder attached
    emb = jnp.ones((1, 16), jnp.bfloat16) * 0.1
    out = np.asarray(pipe.generate(ip_adapter_image=emb, **_kwargs()))
    assert np.isfinite(out).all()


@pytest.mark.parametrize("hw", [(96, 64), (64, 96), (64, 64)])
def test_preprocess_matches_transformers_clip_image_processor(hw):
    """CLAUDE.md numerics rule: the IP-Adapter reference preprocessing is
    transformers CLIPImageProcessor — shortest-edge bicubic resize + center
    crop (a direct square resize squashes non-square references and shifts
    the image embedding)."""
    from transformers import CLIPImageProcessor

    from pww_tpu.models.clip_vision import preprocess_clip_image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    got = np.asarray(preprocess_clip_image(img, size=48))
    proc = CLIPImageProcessor(
        size={"shortest_edge": 48}, crop_size={"height": 48, "width": 48}
    )
    want = proc(img, return_tensors="np")["pixel_values"]
    np.testing.assert_allclose(
        got, want.transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-5
    )
