"""Independent torch-replica numerics proof for the UNet and VAE.

CLIP is proven against a real ``transformers.CLIPTextModel``
(`test_weights.py`); the UNet and VAE — the components that determine
fidelity to the reference substrate (reference
`paint_with_words/paint_with_words.py:8-15, 153-189`: diffusers
``UNet2DConditionModel`` + ``AutoencoderKL``) — are proven here against
minimal torch forward replicas written *from the diffusers-0.10.0
equations*, consuming a random diffusers-layout state dict by its literal
diffusers key names. The same state dict flows through
``pww_tpu.weights.loader`` into the Flax modules; outputs must match to fp
tolerance. This catches GroupNorm-epsilon, time-embedding ordering,
skip-concat-order, GEGLU-chunk-order, attention-scaling and key-mapping
bugs that weight round-trip tests cannot see.

Covered configs: SD-1.5 structure (4 stages, fixed head count, attn in all
but the innermost down block), SD-2.x head-dim convention
(``attention_head_dim``), SDXL structure (no-attn stage 0, per-block
transformer depth, text_time micro-conditioning), and the 9-channel inpaint
UNet; VAE encoder (incl. the asymmetric stride-2 downsample pad and the
single-head mid attention) and decoder.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pww_tpu.config import UNetConfig, VAEConfig
from pww_tpu.models.unet import UNet2DCondition
from pww_tpu.models.vae import AutoencoderKL
from pww_tpu.weights.loader import fill_params, t_conv, t_dense, unet_key, vae_keys

# ---------------------------------------------------------------------------
# synthetic diffusers-layout checkpoints from flax shapes
# ---------------------------------------------------------------------------


def _paths_and_shapes(shape_tree):
    flat = jax.tree_util.tree_flatten_with_path(shape_tree)[0]
    out = []
    for keypath, leaf in flat:
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        path = tuple(p for p in path if p != "params")
        out.append((path, tuple(leaf.shape)))
    return out


def _torch_shape(tf, flax_shape):
    if tf is t_conv:  # flax (kh, kw, I, O) -> torch (O, I, kh, kw)
        kh, kw, i, o = flax_shape
        return (o, i, kh, kw)
    if tf is t_dense:  # flax (in, out) -> torch (out, in)
        return (flax_shape[1], flax_shape[0])
    return flax_shape


def _synth_state(shapes, key_fn, rng, multi=False, scale=0.15):
    """Random torch-layout state dict keyed by diffusers names."""
    state = {}
    for path, shape in _paths_and_shapes(shapes):
        keys, tf = key_fn(path, len(shape))
        k = keys[0] if multi else keys  # multi: old (0.10.0) VAE attn naming
        assert k not in state, f"duplicate key {k}"
        state[k] = (rng.standard_normal(_torch_shape(tf, shape)) * scale).astype(
            np.float32
        )
    return state


# ---------------------------------------------------------------------------
# torch functional replicas (diffusers-0.10.0 equations, literal key names)
# ---------------------------------------------------------------------------


def _g(sd, k):
    return torch.from_numpy(sd[k])


def _conv(sd, p, x, stride=1, pad=1):
    return F.conv2d(x, _g(sd, p + ".weight"), _g(sd, p + ".bias"),
                    stride=stride, padding=pad)


def _lin(sd, p, x):
    return F.linear(x, _g(sd, p + ".weight"), _g(sd, p + ".bias"))


def _gn(sd, p, x, groups, eps):
    return F.group_norm(x, groups, _g(sd, p + ".weight"), _g(sd, p + ".bias"), eps)


def _ln(sd, p, x):
    return F.layer_norm(x, x.shape[-1:], _g(sd, p + ".weight"),
                        _g(sd, p + ".bias"), 1e-5)


def _t_embed(t, dim):
    # diffusers get_timestep_embedding: flip_sin_to_cos=True, shift=0
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _resnet(sd, p, x, temb, groups):
    # diffusers ResnetBlock2D (non-scale-shift): norm-silu-conv, +temb proj,
    # norm-silu-conv, 1x1 shortcut on channel change; resnet_eps=1e-5
    h = _conv(sd, p + ".conv1", F.silu(_gn(sd, p + ".norm1", x, groups, 1e-5)))
    h = h + _lin(sd, p + ".time_emb_proj", F.silu(temb))[:, :, None, None]
    h = _conv(sd, p + ".conv2", F.silu(_gn(sd, p + ".norm2", h, groups, 1e-5)))
    if p + ".conv_shortcut.weight" in sd:
        x = F.conv2d(x, _g(sd, p + ".conv_shortcut.weight"),
                     _g(sd, p + ".conv_shortcut.bias"))
    return x + h


def _pww_weight_for(pww, q_len):
    """Weight-tensor lookup with the reference's ``ORIG`` resize fallback
    (reference `paint_with_words/paint_with_words.py:93-103`)."""
    if q_len in pww["weights"]:
        return pww["weights"][q_len]
    w = pww.get("orig", 0)
    if isinstance(w, int):
        return 0
    img_h, img_w, nc = w.shape
    ratio = math.sqrt(img_h * img_w / q_len)
    w = F.interpolate(w.permute(2, 0, 1).unsqueeze(0), scale_factor=1 / ratio,
                      mode="bilinear", align_corners=True)
    w = F.interpolate(w.reshape(1, nc, -1), size=(q_len,),
                      mode="nearest").permute(2, 1, 0).squeeze()
    return w


def _attn(sd, p, x, ctx, heads, pww=None):
    # diffusers CrossAttention: bias-free q/k/v, biased out proj, 1/sqrt(dh).
    # ``pww`` replicates the reference's inj_forward cross-attention bias
    # (reference `paint_with_words.py:60-125`): the size-keyed weight tensor
    # feeds weight_function(w, sigma, raw scores), and the bias is added to
    # the raw logits BEFORE the 1/sqrt(dh) scale (`:112`). The reference
    # folds heads into batch before reducing; since its weight functions use
    # only global reductions (max/std) the (b, heads, q, kv) layout here is
    # numerically identical.
    q = F.linear(x, _g(sd, p + ".to_q.weight"))
    k = F.linear(ctx, _g(sd, p + ".to_k.weight"))
    v = F.linear(ctx, _g(sd, p + ".to_v.weight"))
    b, lq, d = q.shape
    dh = d // heads

    def split(t_):
        return t_.view(b, -1, heads, dh).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    s = q @ k.transpose(-1, -2)
    if pww is not None:
        w = _pww_weight_for(pww, lq)
        s = s + pww["fn"](w, pww["sigma"], s)
    s = s * (dh ** -0.5)
    o = s.softmax(-1) @ v
    o = o.permute(0, 2, 1, 3).reshape(b, lq, d)
    return F.linear(o, _g(sd, p + ".to_out.0.weight"), _g(sd, p + ".to_out.0.bias"))


def _tblock(sd, p, x, ctx, heads, pww=None):
    # BasicTransformerBlock: pre-LN self-attn, cross-attn, GEGLU ff.
    # PwW bias applies only to attn2 (cross): the reference's class-level
    # patch hits attn1 too, but with context=None it takes the zero-bias
    # fast path (reference `paint_with_words.py:71-72, 109-110`).
    h = _ln(sd, p + ".norm1", x)
    x = x + _attn(sd, p + ".attn1", h, h, heads)
    h = _ln(sd, p + ".norm2", x)
    x = x + _attn(sd, p + ".attn2", h, ctx, heads, pww=pww)
    h = _ln(sd, p + ".norm3", x)
    hg = _lin(sd, p + ".ff.net.0.proj", h)
    a, gate = hg.chunk(2, dim=-1)  # GEGLU: passthrough half, gelu-gated half
    return x + _lin(sd, p + ".ff.net.2", a * F.gelu(gate))


def _t2d(sd, p, x, ctx, heads, depth, groups, pww=None):
    # Transformer2DModel (use_linear_projection=False): GN(eps 1e-6),
    # 1x1 conv in, blocks over flattened space, 1x1 conv out, residual
    b, c, hh, ww = x.shape
    res = x
    z = _gn(sd, p + ".norm", x, groups, 1e-6)
    z = _conv(sd, p + ".proj_in", z, pad=0)
    z = z.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    for d in range(depth):
        z = _tblock(sd, p + f".transformer_blocks.{d}", z, ctx, heads, pww=pww)
    z = z.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    z = _conv(sd, p + ".proj_out", z, pad=0)
    return z + res


def torch_unet_forward(
    sd, x, t, ctx, *, channels, layers, groups, has_attn, heads_of,
    depth_of=lambda bi: 1, added=None, add_time_dim=None, intrablock=None,
    pww=None,
):
    """diffusers UNet2DConditionModel.forward, functional, NCHW."""
    c0 = channels[0]
    temb = _t_embed(t, c0)
    temb = _lin(sd, "time_embedding.linear_1", temb)
    temb = _lin(sd, "time_embedding.linear_2", F.silu(temb))
    if added is not None:
        # SDXL text_time micro-conditioning: fourier(time_ids) ++ pooled text
        tids = added["time_ids"]
        a = _t_embed(tids.reshape(-1), add_time_dim).reshape(tids.shape[0], -1)
        ain = torch.cat([added["text_embeds"], a], dim=-1)
        a1 = _lin(sd, "add_embedding.linear_1", ain)
        temb = temb + _lin(sd, "add_embedding.linear_2", F.silu(a1))

    x = _conv(sd, "conv_in", x)
    skips = [x]
    n = len(channels)
    for bi, ch in enumerate(channels):
        for li in range(layers):
            x = _resnet(sd, f"down_blocks.{bi}.resnets.{li}", x, temb, groups)
            if has_attn[bi]:
                x = _t2d(sd, f"down_blocks.{bi}.attentions.{li}", x, ctx,
                         heads_of(ch), depth_of(bi), groups, pww=pww)
                # T2I-Adapter intrablock residual, diffusers
                # CrossAttnDownBlock2D: after the last attn, INSIDE the skip
                if intrablock is not None and li == layers - 1:
                    x = x + intrablock[bi]
            skips.append(x)
        if bi < n - 1:
            x = _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv", x, stride=2)
            skips.append(x)
        # diffusers UNet level for attention-less DownBlock2D: added AFTER
        # the block (downsampler included), excluded from every skip
        if intrablock is not None and not has_attn[bi]:
            x = x + intrablock[bi]

    x = _resnet(sd, "mid_block.resnets.0", x, temb, groups)
    x = _t2d(sd, "mid_block.attentions.0", x, ctx, heads_of(channels[-1]),
             depth_of(n - 1), groups, pww=pww)
    x = _resnet(sd, "mid_block.resnets.1", x, temb, groups)

    rev = list(reversed(channels))
    up_attn = list(reversed(has_attn))
    for bi, ch in enumerate(rev):
        for li in range(layers + 1):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)  # [hidden, skip] channel order
            x = _resnet(sd, f"up_blocks.{bi}.resnets.{li}", x, temb, groups)
            if up_attn[bi]:
                x = _t2d(sd, f"up_blocks.{bi}.attentions.{li}", x, ctx,
                         heads_of(ch), depth_of(n - 1 - bi), groups, pww=pww)
        if bi < n - 1:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = _conv(sd, f"up_blocks.{bi}.upsamplers.0.conv", x)

    x = F.silu(_gn(sd, "conv_norm_out", x, groups, 1e-5))
    return _conv(sd, "conv_out", x)


def _vres(sd, p, x, groups):
    # VAE ResnetBlock2D: no temb; eps 1e-6
    h = _conv(sd, p + ".conv1", F.silu(_gn(sd, p + ".norm1", x, groups, 1e-6)))
    h = _conv(sd, p + ".conv2", F.silu(_gn(sd, p + ".norm2", h, groups, 1e-6)))
    if p + ".conv_shortcut.weight" in sd:
        x = F.conv2d(x, _g(sd, p + ".conv_shortcut.weight"),
                     _g(sd, p + ".conv_shortcut.bias"))
    return x + h


def _vattn(sd, p, x, groups):
    # diffusers-0.10.0 AttentionBlock (single head): biased linears,
    # 1/sqrt(C) scaling applied to the scores before softmax
    b, c, hh, ww = x.shape
    res = x
    z = _gn(sd, p + ".group_norm", x, groups, 1e-6)
    z = z.view(b, c, hh * ww).transpose(1, 2)
    q = _lin(sd, p + ".query", z)
    k = _lin(sd, p + ".key", z)
    v = _lin(sd, p + ".value", z)
    attn = ((q @ k.transpose(-1, -2)) * (c ** -0.5)).softmax(-1)
    z = _lin(sd, p + ".proj_attn", attn @ v)
    return res + z.transpose(1, 2).view(b, c, hh, ww)


def torch_vae_encode(sd, x, channels, layers, groups):
    h = _conv(sd, "encoder.conv_in", x)
    for bi, ch in enumerate(channels):
        for li in range(layers):
            h = _vres(sd, f"encoder.down_blocks.{bi}.resnets.{li}", h, groups)
        if bi < len(channels) - 1:
            # diffusers VAE Downsample2D: asymmetric (0,1,0,1) pad, VALID conv
            h = F.pad(h, (0, 1, 0, 1))
            h = _conv(sd, f"encoder.down_blocks.{bi}.downsamplers.0.conv", h,
                      stride=2, pad=0)
    h = _vres(sd, "encoder.mid_block.resnets.0", h, groups)
    h = _vattn(sd, "encoder.mid_block.attentions.0", h, groups)
    h = _vres(sd, "encoder.mid_block.resnets.1", h, groups)
    h = F.silu(_gn(sd, "encoder.conv_norm_out", h, groups, 1e-6))
    h = _conv(sd, "encoder.conv_out", h)
    return _conv(sd, "quant_conv", h, pad=0)


def torch_vae_decode(sd, z, channels, layers, groups):
    z = _conv(sd, "post_quant_conv", z, pad=0)
    rev = list(reversed(channels))
    h = _conv(sd, "decoder.conv_in", z)
    h = _vres(sd, "decoder.mid_block.resnets.0", h, groups)
    h = _vattn(sd, "decoder.mid_block.attentions.0", h, groups)
    h = _vres(sd, "decoder.mid_block.resnets.1", h, groups)
    for bi, ch in enumerate(rev):
        for li in range(layers + 1):
            h = _vres(sd, f"decoder.up_blocks.{bi}.resnets.{li}", h, groups)
        if bi < len(rev) - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv(sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv", h)
    h = F.silu(_gn(sd, "decoder.conv_norm_out", h, groups, 1e-6))
    return _conv(sd, "decoder.conv_out", h)


# ---------------------------------------------------------------------------
# the parity tests
# ---------------------------------------------------------------------------


def _run_unet_parity(cfg: UNetConfig, rng, ctx_dim, size=16,
                     added_pooled=None, intrablock=False):
    model = UNet2DCondition(cfg)
    b = 2
    sample = rng.standard_normal((b, size, size, cfg.in_channels)).astype(
        np.float32
    )
    t = np.array([3.0, 11.0], np.float32)
    ctx = rng.standard_normal((b, 7, ctx_dim)).astype(np.float32) * 0.3

    added_flax = None
    added_torch = None
    init_kwargs = {}
    intra_torch = None
    if intrablock:
        # T2I-Adapter features at each block's INJECTION resolution:
        # attention blocks take theirs pre-downsample; attention-less
        # blocks after the downsampler (diffusers adds at the UNet level)
        n_blocks = len(cfg.block_out_channels)
        feats = []
        for bi, ch in enumerate(cfg.block_out_channels):
            lvl = bi
            if not cfg.down_block_has_attn[bi] and bi < n_blocks - 1:
                lvl = bi + 1
            s = size // (2 ** lvl)
            feats.append(
                rng.standard_normal((b, s, s, ch)).astype(np.float32) * 0.2
            )
        init_kwargs["down_intrablock_residuals"] = tuple(
            jnp.asarray(f) for f in feats
        )
        intra_torch = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
    if added_pooled is not None:
        text_embeds = rng.standard_normal((b, added_pooled)).astype(np.float32)
        time_ids = np.array(
            [[512, 512, 0, 0, 512, 512], [640, 640, 7, 3, 512, 512]], np.float32
        )
        added_flax = {
            "text_embeds": jnp.asarray(text_embeds),
            "time_ids": jnp.asarray(time_ids),
        }
        added_torch = {
            "text_embeds": torch.from_numpy(text_embeds),
            "time_ids": torch.from_numpy(time_ids),
        }
        init_kwargs["added_cond"] = added_flax

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.asarray(sample),
        jnp.asarray(t), jnp.asarray(ctx), **init_kwargs,
    )
    state = _synth_state(shapes, unet_key, rng)
    params = fill_params(shapes, state, unet_key, name="unet")

    got = np.asarray(
        model.apply(params, jnp.asarray(sample), jnp.asarray(t),
                    jnp.asarray(ctx), **init_kwargs)
    )

    if cfg.attention_head_dim is not None:
        heads_of = lambda ch: ch // cfg.attention_head_dim  # noqa: E731
    else:
        heads_of = lambda ch: cfg.num_attention_heads  # noqa: E731
    with torch.no_grad():
        want = torch_unet_forward(
            state,
            torch.from_numpy(sample).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
            channels=cfg.block_out_channels,
            layers=cfg.layers_per_block,
            groups=cfg.norm_num_groups,
            has_attn=cfg.down_block_has_attn,
            heads_of=heads_of,
            depth_of=cfg.depth_for,
            added=added_torch,
            add_time_dim=cfg.addition_time_embed_dim,
            intrablock=intra_torch,
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_unet_matches_torch_replica_sd15_structure(rng):
    """SD-1.5 structure at tiny width: 4 stages, 2 layers/block, fixed head
    count, cross-attn everywhere but the innermost down block."""
    cfg = UNetConfig(
        block_out_channels=(32, 48, 64, 64), layers_per_block=2,
        num_attention_heads=4, cross_attention_dim=40, norm_num_groups=8,
        down_block_has_attn=(True, True, True, False), sample_size=16,
    )
    _run_unet_parity(cfg, rng, ctx_dim=40)


def test_unet_matches_torch_replica_sd2_head_dim(rng):
    """SD-2.x convention: fixed attention_head_dim (heads = ch // dim)."""
    cfg = UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        attention_head_dim=16, cross_attention_dim=48, norm_num_groups=8,
        down_block_has_attn=(True, True), sample_size=16,
    )
    _run_unet_parity(cfg, rng, ctx_dim=48)


def test_unet_matches_torch_replica_sdxl_structure(rng):
    """SDXL structure: no attention in stage 0, per-block transformer depth,
    text_time micro-conditioning through add_embedding."""
    cfg = UNetConfig(
        block_out_channels=(32, 48, 64), layers_per_block=1,
        attention_head_dim=16, cross_attention_dim=48, norm_num_groups=8,
        down_block_has_attn=(False, True, True),
        transformer_depth=(0, 1, 2),
        addition_embed_type="text_time", addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 6 * 8,
        sample_size=16,
    )
    _run_unet_parity(cfg, rng, ctx_dim=48, added_pooled=16)


def test_unet_matches_torch_replica_inpaint_9ch(rng):
    """9-channel inpainting UNet (runwayml layout): only conv_in differs."""
    cfg = UNetConfig(
        in_channels=9,
        block_out_channels=(32, 64), layers_per_block=1,
        num_attention_heads=4, cross_attention_dim=40, norm_num_groups=8,
        down_block_has_attn=(True, False), sample_size=16,
    )
    _run_unet_parity(cfg, rng, ctx_dim=40)


def test_vae_matches_torch_replica(rng):
    """AutoencoderKL: encoder moments (incl. quant_conv and the asymmetric
    downsample pad) and decoder reconstruction."""
    cfg = VAEConfig(
        block_out_channels=(8, 16, 16, 32), layers_per_block=1,
        norm_num_groups=4,
    )
    model = AutoencoderKL(cfg)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.asarray(img)
    )
    state = _synth_state(shapes, vae_keys, rng, multi=True)
    params = fill_params(shapes, state, vae_keys, multi=True, name="vae")

    moments = np.asarray(
        model.apply(params, jnp.asarray(img), method=AutoencoderKL.encode_moments)
    )
    with torch.no_grad():
        want_m = torch_vae_encode(
            state, torch.from_numpy(img).permute(0, 3, 1, 2),
            cfg.block_out_channels, cfg.layers_per_block, cfg.norm_num_groups,
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(moments, want_m, atol=1e-4, rtol=1e-4)

    z = moments[..., : cfg.latent_channels]
    dec = np.asarray(
        model.apply(params, jnp.asarray(z), method=AutoencoderKL.decode)
    )
    with torch.no_grad():
        want_d = torch_vae_decode(
            state, torch.from_numpy(z).permute(0, 3, 1, 2),
            cfg.block_out_channels, cfg.layers_per_block, cfg.norm_num_groups,
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(dec, want_d, atol=1e-4, rtol=1e-4)


def torch_controlnet_forward(
    sd, x, t, ctx, hint, *, channels, layers, groups, has_attn, heads_of,
    depth_of=lambda bi: 1, scale=1.0, pww=None,
):
    """diffusers ControlNetModel.forward, functional, NCHW: UNet-encoder
    copy + hint embedder + per-skip zero convs, residuals scaled."""
    c0 = channels[0]
    temb = _t_embed(t, c0)
    temb = _lin(sd, "time_embedding.linear_1", temb)
    temb = _lin(sd, "time_embedding.linear_2", F.silu(temb))

    x = _conv(sd, "conv_in", x)
    # conditioning embedder: conv_in -> silu -> 6 blocks (silu each,
    # strides 1,2,1,2,1,2) -> zero conv_out
    h = F.silu(_conv(sd, "controlnet_cond_embedding.conv_in", hint))
    for i in range(6):
        h = F.silu(_conv(sd, f"controlnet_cond_embedding.blocks.{i}", h,
                         stride=2 if i % 2 else 1))
    x = x + _conv(sd, "controlnet_cond_embedding.conv_out", h, pad=0)

    res = [x]
    n = len(channels)
    for bi, ch in enumerate(channels):
        for li in range(layers):
            x = _resnet(sd, f"down_blocks.{bi}.resnets.{li}", x, temb, groups)
            if has_attn[bi]:
                x = _t2d(sd, f"down_blocks.{bi}.attentions.{li}", x, ctx,
                         heads_of(ch), depth_of(bi), groups, pww=pww)
            res.append(x)
        if bi < n - 1:
            x = _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv", x, stride=2)
            res.append(x)

    x = _resnet(sd, "mid_block.resnets.0", x, temb, groups)
    x = _t2d(sd, "mid_block.attentions.0", x, ctx, heads_of(channels[-1]),
             depth_of(n - 1), groups, pww=pww)
    x = _resnet(sd, "mid_block.resnets.1", x, temb, groups)

    outs = tuple(
        _conv(sd, f"controlnet_down_blocks.{i}", r, pad=0) * scale
        for i, r in enumerate(res)
    )
    mid = _conv(sd, "controlnet_mid_block", x, pad=0) * scale
    return outs, mid


def test_controlnet_matches_torch_replica(rng):
    """First-class Flax ControlNet == the diffusers ControlNetModel
    equations through the checkpoint key mapping (random — not zero — zero-
    conv weights, so the projection mapping is actually exercised)."""
    from pww_tpu.models.controlnet import ControlNet
    from pww_tpu.weights.loader import controlnet_key

    cfg = UNetConfig(
        block_out_channels=(32, 48), layers_per_block=2,
        num_attention_heads=4, cross_attention_dim=40, norm_num_groups=8,
        down_block_has_attn=(True, False), sample_size=16,
    )
    model = ControlNet(cfg)
    b = 2
    sample = rng.standard_normal((b, 16, 16, 4)).astype(np.float32)
    t = np.array([3.0, 11.0], np.float32)
    ctx = rng.standard_normal((b, 7, 40)).astype(np.float32) * 0.3
    hint = rng.random((b, 128, 128, 3)).astype(np.float32)

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.asarray(sample),
        jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(hint),
    )
    from pww_tpu.weights.loader import fill_params

    state = _synth_state(shapes, controlnet_key, rng)
    params = fill_params(shapes, state, controlnet_key, name="controlnet")

    got_down, got_mid = model.apply(
        params, jnp.asarray(sample), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(hint), conditioning_scale=0.73,
    )
    with torch.no_grad():
        want_down, want_mid = torch_controlnet_forward(
            state,
            torch.from_numpy(sample).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
            torch.from_numpy(hint).permute(0, 3, 1, 2),
            channels=cfg.block_out_channels,
            layers=cfg.layers_per_block,
            groups=cfg.norm_num_groups,
            has_attn=cfg.down_block_has_attn,
            heads_of=lambda ch: cfg.num_attention_heads,
            scale=0.73,
        )
    assert len(got_down) == len(want_down)
    for g, w in zip(got_down, want_down):
        np.testing.assert_allclose(
            np.asarray(g), w.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=2e-4
        )
    np.testing.assert_allclose(
        np.asarray(got_mid), want_mid.permute(0, 2, 3, 1).numpy(),
        atol=2e-4, rtol=2e-4,
    )


def test_unet_t2i_intrablock_placement_sd15(rng):
    """T2I-Adapter residual placement vs the diffusers replica: attention
    blocks take the feature inside the skip (pre-downsample); the trailing
    attention-less block takes it after the block, excluded from skips
    (regression: it was added inside every block, double-counting it
    through the first up-block concat)."""
    cfg = UNetConfig(
        block_out_channels=(32, 48, 64, 64), layers_per_block=2,
        num_attention_heads=4, cross_attention_dim=40, norm_num_groups=8,
        down_block_has_attn=(True, True, True, False), sample_size=16,
    )
    _run_unet_parity(cfg, rng, ctx_dim=40, intrablock=True)


def test_unet_t2i_intrablock_placement_sdxl_downblock(rng):
    """SDXL block layout (leading attention-less DownBlock2D WITH a
    downsampler): its adapter feature lands after the downsampler, at the
    downsampled resolution, excluded from skips."""
    cfg = UNetConfig(
        block_out_channels=(32, 48, 64), layers_per_block=2,
        num_attention_heads=4, cross_attention_dim=40, norm_num_groups=8,
        down_block_has_attn=(False, True, True), sample_size=16,
    )
    _run_unet_parity(cfg, rng, ctx_dim=40, intrablock=True)


def test_loader_accepts_linear_projection_checkpoints(rng):
    """SD-2.x / SDXL diffusers checkpoints (use_linear_projection=True)
    store Transformer2D proj_in/proj_out as nn.Linear (O, I); the loader
    must lay them into our 1x1-conv HWIO kernels bit-identically to the
    conv-stored (O, I, 1, 1) form (regression: the conv transpose was
    applied by MODEL rank and crashed on the 2-D source)."""
    cfg = UNetConfig(
        block_out_channels=(32, 48), layers_per_block=1,
        num_attention_heads=4, cross_attention_dim=40, norm_num_groups=8,
        down_block_has_attn=(True, True), sample_size=16,
    )
    model = UNet2DCondition(cfg)
    sample = jnp.zeros((1, 16, 16, cfg.in_channels), jnp.float32)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), sample,
        jnp.zeros((1,), jnp.float32), jnp.zeros((1, 7, 40), jnp.float32),
    )
    state = _synth_state(shapes, unet_key, rng)
    lin_state = {
        k: (v[:, :, 0, 0]
            if v.ndim == 4 and v.shape[2:] == (1, 1)
            and (k.endswith("proj_in.weight") or k.endswith("proj_out.weight"))
            else v)
        for k, v in state.items()
    }
    assert any(v.ndim == 2 and k.endswith("proj_in.weight")
               for k, v in lin_state.items())
    p_conv = fill_params(shapes, state, unet_key, name="unet")
    p_lin = fill_params(shapes, lin_state, unet_key, name="unet")
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_conv),
        jax.tree_util.tree_leaves_with_path(p_lin),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))
