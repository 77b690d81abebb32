"""LDM/A1111 single-file checkpoint → Flax pipeline params.

TPU-native equivalent of the reference's vendored converter
(reference `change_model_path.py:51-943`, documented at `README.md:269-299`):
the same key-renaming tables (LDM ``model.diffusion_model.* /
first_stage_model.* / cond_stage_model.*`` → diffusers layout) re-derived,
then routed through :mod:`pww_tpu.weights.loader`'s diffusers→Flax mapping —
so ``.ckpt`` and single-file ``.safetensors`` models load directly.

EMA weights: pass ``extract_ema=True`` to prefer ``model_ema.*`` shadows,
mirroring the reference CLI's ``--extract_ema`` (change_model_path.py:828).
"""
from __future__ import annotations

import re
import warnings
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SDModelConfig
from .loader import (
    clip_key,
    fill_params,
    read_state_dict,
    t_id,
    unet_key,
    vae_keys,
)

# -- resnet / attention internals ------------------------------------------

_UNET_RES = {
    "in_layers.0": "norm1",
    "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2",
    "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}

_VAE_RES = {
    "norm1": "norm1",
    "conv1": "conv1",
    "norm2": "norm2",
    "conv2": "conv2",
    "nin_shortcut": "conv_shortcut",
}

_VAE_ATTN = {
    "norm": "group_norm",
    "q": "query",
    "k": "key",
    "v": "value",
    "proj_out": "proj_attn",
}


def _map_unet_key(key: str, layers_per_block: int = 2) -> Optional[str]:
    """``model.diffusion_model.X`` → diffusers UNet key (or None to skip)."""
    if key.startswith("time_embed.0."):
        return key.replace("time_embed.0.", "time_embedding.linear_1.")
    if key.startswith("time_embed.2."):
        return key.replace("time_embed.2.", "time_embedding.linear_2.")
    if key.startswith("input_blocks.0.0."):
        return key.replace("input_blocks.0.0.", "conv_in.")
    if key.startswith("out.0."):
        return key.replace("out.0.", "conv_norm_out.")
    if key.startswith("out.2."):
        return key.replace("out.2.", "conv_out.")

    per = layers_per_block + 1
    m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.+)", key)
    if m:
        i, sub, rest = int(m[1]), int(m[2]), m[3]
        block_id, layer = (i - 1) // per, (i - 1) % per
        if layer == layers_per_block:  # downsample slot
            assert rest.startswith("op."), key
            return f"down_blocks.{block_id}.downsamplers.0.conv.{rest[3:]}"
        if sub == 0:
            for src, dst in _UNET_RES.items():
                if rest.startswith(src + "."):
                    rest = dst + rest[len(src):]
                    break
            return f"down_blocks.{block_id}.resnets.{layer}.{rest}"
        return f"down_blocks.{block_id}.attentions.{layer}.{rest}"

    m = re.match(r"middle_block\.(\d+)\.(.+)", key)
    if m:
        sub, rest = int(m[1]), m[2]
        if sub in (0, 2):
            for src, dst in _UNET_RES.items():
                if rest.startswith(src + "."):
                    rest = dst + rest[len(src):]
                    break
            return f"mid_block.resnets.{0 if sub == 0 else 1}.{rest}"
        return f"mid_block.attentions.0.{rest}"

    m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.+)", key)
    if m:
        i, sub, rest = int(m[1]), int(m[2]), m[3]
        block_id, layer = i // per, i % per
        if rest.startswith("conv.") and sub >= 1 and layer == layers_per_block:
            # upsampler: last module of the block (index 1 w/o attn, 2 with)
            return f"up_blocks.{block_id}.upsamplers.0.{rest}"
        if sub == 0:
            for src, dst in _UNET_RES.items():
                if rest.startswith(src + "."):
                    rest = dst + rest[len(src):]
                    break
            return f"up_blocks.{block_id}.resnets.{layer}.{rest}"
        return f"up_blocks.{block_id}.attentions.{layer}.{rest}"
    return None


def _map_vae_key(key: str, num_blocks: int = 4) -> Optional[str]:
    """``first_stage_model.X`` → diffusers VAE key."""
    if key.startswith("quant_conv.") or key.startswith("post_quant_conv."):
        return key

    def side(prefix: str, k: str, decoder: bool) -> Optional[str]:
        if not k.startswith(prefix + "."):
            return None
        k = k[len(prefix) + 1:]
        if k.startswith("conv_in.") or k.startswith("conv_out."):
            return f"{prefix}.{k}"
        if k.startswith("norm_out."):
            return f"{prefix}.conv_norm_out.{k[len('norm_out.'):]}"
        m = re.match(r"(down|up)\.(\d+)\.block\.(\d+)\.(.+)", k)
        if m:
            i, j, rest = int(m[2]), int(m[3]), m[4]
            for src, dst in _VAE_RES.items():
                if rest.startswith(src + "."):
                    rest = dst + rest[len(src):]
                    break
            if decoder:  # LDM decoder.up is outermost-last; diffusers reversed
                i = num_blocks - 1 - i
            return f"{prefix}.{m[1]}_blocks.{i}.resnets.{j}.{rest}"
        m = re.match(r"down\.(\d+)\.downsample\.conv\.(.+)", k)
        if m:
            return f"{prefix}.down_blocks.{m[1]}.downsamplers.0.conv.{m[2]}"
        m = re.match(r"up\.(\d+)\.upsample\.conv\.(.+)", k)
        if m:
            i = num_blocks - 1 - int(m[1])
            return f"{prefix}.up_blocks.{i}.upsamplers.0.conv.{m[2]}"
        m = re.match(r"mid\.block_(\d)\.(.+)", k)
        if m:
            rest = m[2]
            for src, dst in _VAE_RES.items():
                if rest.startswith(src + "."):
                    rest = dst + rest[len(src):]
                    break
            return f"{prefix}.mid_block.resnets.{int(m[1]) - 1}.{rest}"
        m = re.match(r"mid\.attn_1\.(.+)", k)
        if m:
            rest = m[1]
            for src, dst in _VAE_ATTN.items():
                if rest.startswith(src + "."):
                    rest = dst + rest[len(src):]
                    break
            return f"{prefix}.mid_block.attentions.0.{rest}"
        return None

    return side("encoder", key, False) or side("decoder", key, True)


def _convert_open_clip(raw: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """OpenCLIP text tower (``cond_stage_model.model.*``, SD-2.x) → HF
    ``text_model.*`` keys, so the shared :func:`~.loader.clip_key` mapping
    applies. The packed ``attn.in_proj_{weight,bias}`` splits into q/k/v."""
    out: Dict[str, np.ndarray] = {}
    for k, v in raw.items():
        if k == "token_embedding.weight":
            out["text_model.embeddings.token_embedding.weight"] = v
        elif k == "positional_embedding":
            out["text_model.embeddings.position_embedding.weight"] = v
        elif k.startswith("ln_final."):
            out["text_model.final_layer_norm." + k[len("ln_final."):]] = v
        m = re.match(r"transformer\.resblocks\.(\d+)\.(.+)", k)
        if not m:
            continue
        layer, rest = m[1], m[2]
        base = f"text_model.encoder.layers.{layer}."
        if rest in ("attn.in_proj_weight", "attn.in_proj_bias"):
            q, kk, vv = np.split(v, 3, axis=0)
            leaf = "weight" if rest.endswith("weight") else "bias"
            out[base + f"self_attn.q_proj.{leaf}"] = q
            out[base + f"self_attn.k_proj.{leaf}"] = kk
            out[base + f"self_attn.v_proj.{leaf}"] = vv
        elif rest.startswith("attn.out_proj."):
            out[base + "self_attn.out_proj." + rest[len("attn.out_proj."):]] = v
        elif rest.startswith("ln_1."):
            out[base + "layer_norm1." + rest[len("ln_1."):]] = v
        elif rest.startswith("ln_2."):
            out[base + "layer_norm2." + rest[len("ln_2."):]] = v
        elif rest.startswith("mlp.c_fc."):
            out[base + "mlp.fc1." + rest[len("mlp.c_fc."):]] = v
        elif rest.startswith("mlp.c_proj."):
            out[base + "mlp.fc2." + rest[len("mlp.c_proj."):]] = v
    return out


# -- LDM-BERT (original latent-diffusion text tower) ------------------------
#
# TPU-native counterpart of the reference's ``convert_ldm_bert_checkpoint``
# (reference `change_model_path.py:742-792`): the x-transformers layout
# interleaves [norm, attn] / [norm, ff] pairs in one ModuleList, so layer i
# of the target model reads slots 2i (attention half) and 2i+1 (feed-forward
# half) — the reference's ``if i != 0: i += i`` stride-2 walk
# (`change_model_path.py:771-774`). q/k/v carry no bias (only ``.weight`` is
# copied, `:744-746`); out/fc/norms carry weight+bias.


def is_ldm_bert_sd(text_sd: Dict[str, np.ndarray]) -> bool:
    """True if a ``cond_stage_model.transformer.*``-stripped dict is an
    original-LDM BERT tower rather than a HF CLIP one (SD checkpoints nest a
    further ``text_model.`` level; LDM-BERT starts at ``token_emb``)."""
    return "token_emb.weight" in text_sd


def ldm_bert_key(path: Tuple[str, ...], rank: int) -> Tuple[str, "object"]:
    """Flax :class:`~..models.ldm_bert.LDMBertEncoder` param path → original
    LDM checkpoint key (``cond_stage_model.transformer.`` already stripped)."""
    from .loader import _leaf_key

    *mods, leaf = path
    if mods[0] == "embed_tokens":
        return "token_emb.weight", t_id
    if mods[0] == "embed_positions":
        return "pos_emb.emb.weight", t_id
    torch_leaf, tf = _leaf_key(leaf, rank)
    if mods[0] == "layer_norm":  # final post-stack norm
        return f"norm.{torch_leaf}", tf
    if mods[0] == "to_logits":
        return f"to_logits.{torch_leaf}", tf
    m = re.fullmatch(r"layers_(\d+)", mods[0])
    assert m, path
    i = int(m[1])
    sub = mods[1]
    if sub == "self_attn_layer_norm":
        return f"attn_layers.layers.{2 * i}.0.{torch_leaf}", tf
    if sub == "self_attn":
        proj = {"q_proj": "to_q", "k_proj": "to_k", "v_proj": "to_v",
                "out_proj": "to_out"}[mods[2]]
        return f"attn_layers.layers.{2 * i}.1.{proj}.{torch_leaf}", tf
    if sub == "final_layer_norm":
        return f"attn_layers.layers.{2 * i + 1}.0.{torch_leaf}", tf
    inner = {"fc1": "net.0.0", "fc2": "net.2"}[sub]
    return f"attn_layers.layers.{2 * i + 1}.1.{inner}.{torch_leaf}", tf


def convert_ldm_bert(
    text_sd: Dict[str, np.ndarray],
    num_heads: Optional[int] = None,
    head_dim: Optional[int] = None,
):
    """Original-LDM BERT state dict → (:class:`LDMBertConfig`, Flax params).

    Hyperparameters are inferred from tensor shapes the way the reference
    derives them from the yaml (`change_model_path.py:312-319`) — except the
    head split, which no tensor shape pins down: the reference inherits
    diffusers' LDMBertConfig defaults (8 heads × 64 dims), so ``head_dim``
    defaults to 64 when the attention inner dim divides by it, else 8 heads.
    PwW pipelines condition on CLIP (reference
    `paint_with_words/paint_with_words.py:171`); this path exists so
    original-LDM checkpoints convert completely, matching the reference CLI's
    scope (`change_model_path.py:926-937`).
    """
    from ..config import LDMBertConfig
    from ..models.ldm_bert import LDMBertEncoder

    vocab, d_model = (int(s) for s in text_sd["token_emb.weight"].shape)
    max_pos = int(text_sd["pos_emb.emb.weight"].shape[0])
    inner = int(text_sd["attn_layers.layers.0.1.to_q.weight"].shape[0])
    ffn = int(text_sd["attn_layers.layers.1.1.net.0.0.weight"].shape[0])
    slots = [
        int(m[1]) for k in text_sd
        if (m := re.match(r"attn_layers\.layers\.(\d+)\.", k))
    ]
    num_layers = (max(slots) + 1) // 2
    if head_dim is None and num_heads is None:
        head_dim = 64 if inner % 64 == 0 else inner // 8
    if num_heads is None:
        num_heads = inner // head_dim
    elif head_dim is None:
        head_dim = inner // num_heads
    if num_heads * head_dim != inner:
        raise ValueError(
            f"num_heads ({num_heads}) × head_dim ({head_dim}) != attention "
            f"inner dim {inner} inferred from to_q.weight"
        )
    config = LDMBertConfig(
        vocab_size=vocab, d_model=d_model, num_layers=num_layers,
        num_heads=num_heads, head_dim=head_dim, ffn_dim=ffn,
        max_position_embeddings=max_pos,
    )
    bert = LDMBertEncoder(config)
    ids = jnp.zeros((1, max_pos), jnp.int32)
    shapes = jax.eval_shape(
        lambda r, i: bert.init(r, i, return_logits=True),
        jax.random.PRNGKey(0), ids,
    )
    params = fill_params(shapes, text_sd, ldm_bert_key, name="ldm_bert")
    return config, params


def convert_ldm_state_dict(
    state: Dict[str, np.ndarray], extract_ema: bool = False
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Split + rename an LDM state dict into (unet, vae, clip) diffusers dicts."""
    if extract_ema:
        ema = {
            k[len("model_ema."):].replace(".", ""): k for k in state
            if k.startswith("model_ema.")
        }
        # model_ema keys flatten dots; match by squashed name
        remapped = {}
        for k in list(state):
            if k.startswith("model.diffusion_model."):
                flat = k[len("model."):].replace(".", "")
                if flat in ema:
                    remapped[k] = state[ema[flat]]
        state = {**state, **remapped}

    unet, vae, clip = {}, {}, {}
    for k, v in state.items():
        if k.startswith("model.diffusion_model."):
            nk = _map_unet_key(k[len("model.diffusion_model."):])
            if nk:
                unet[nk] = v
        elif k.startswith("first_stage_model."):
            nk = _map_vae_key(k[len("first_stage_model."):])
            if nk:
                # LDM VAE attention q/k/v/proj are 1x1 convs; diffusers linear
                if any(
                    s in nk for s in (".query.", ".key.", ".value.", ".proj_attn.")
                ) and v.ndim == 4:
                    v = v[:, :, 0, 0]
                vae[nk] = v
        elif k.startswith("cond_stage_model.transformer."):
            clip[k[len("cond_stage_model.transformer."):]] = v
    open_clip = {
        k[len("cond_stage_model.model."):]: v
        for k, v in state.items() if k.startswith("cond_stage_model.model.")
    }
    if open_clip and not clip:
        clip = _convert_open_clip(open_clip)
    return unet, vae, clip


def detect_ldm_config(
    ckpt_meta: Dict,
    unet_sd: Dict[str, np.ndarray],
    prediction_type: str = "auto",
) -> SDModelConfig:
    """Derive the model family from checkpoint tensor shapes.

    The reference builds configs from ``v1-inference.yaml``
    (`change_model_path.py:231-320`, SD-1.x only); deriving from shapes also
    covers SD-2.x single files: cross-attention context dim 768 → SD-1.x,
    1024 → SD-2.x, where ``global_step == 110000`` marks the 512-base
    epsilon model and anything else the 768-v v-prediction model (the same
    heuristic diffusers' single-file loader uses). ``ckpt_meta`` carries the
    checkpoint's non-tensor header fields (``read_state_dict(...,
    return_meta=True)``) — global_step sits OUTSIDE state_dict.
    ``prediction_type`` may force "epsilon"/"v_prediction" explicitly.
    """
    import dataclasses

    in_channels = int(unet_sd["conv_in.weight"].shape[1])
    ctx_dim = None
    for k, v in unet_sd.items():
        if k.endswith("attn2.to_k.weight"):
            ctx_dim = int(v.shape[1])
            break
    from ..config import UNetConfig

    if ctx_dim == 1024:
        if prediction_type == "auto":
            step = ckpt_meta.get("global_step")
            step = int(np.asarray(step)) if step is not None else None
            # Canonical releases: global_step 110000 is SD-2.1-768 (the
            # v-objective model diffusers' converter special-cases for
            # upcast attention); 220000 is SD-2.1-base (512, epsilon).
            # Anything else — including safetensors single files, which
            # carry no global_step at all — defaults to v_prediction like
            # diffusers' single-file loader (its fallback config for an
            # SD-2-shaped checkpoint is stable-diffusion-2-1), with a
            # warning since a 512-base fine-tune would need the override.
            if step == 220000:
                v_pred = False
            else:
                if step != 110000:
                    warnings.warn(
                        "SD-2.x checkpoint with no recognized global_step "
                        f"({step}): assuming v_prediction (the SD-2.1-768 "
                        "family). Pass prediction_type='epsilon' for "
                        "512-base models."
                    )
                v_pred = True
        else:
            v_pred = prediction_type == "v_prediction"
        config = SDModelConfig.sd21(v_prediction=v_pred)
        if in_channels != config.unet.in_channels:
            config = dataclasses.replace(
                config,
                unet=dataclasses.replace(config.unet, in_channels=in_channels),
            )
        return config
    config = SDModelConfig(unet=UNetConfig.sd15(in_channels=in_channels))
    if prediction_type not in ("auto", config.unet.prediction_type):
        config = dataclasses.replace(
            config,
            unet=dataclasses.replace(
                config.unet, prediction_type=prediction_type
            ),
        )
    return config


def _find_tokenizer(path: str, tokenizer_path: Optional[str]):
    """Real BPE assets for a single-file checkpoint, or a LOUD toy fallback.

    Accepts an explicit dir (``vocab.json``+``merges.txt``) or an openai/CLIP
    ``bpe_simple_vocab_16e6.txt.gz``; otherwise probes the checkpoint's own
    directory for either. The reference always has a hub tokenizer
    (`paint_with_words.py:170`) — a silent hash-based fallback would make
    region labels match garbage ids.
    """
    import os
    import warnings

    from ..tokenizer.clip_bpe import CLIPTokenizer

    candidates = []
    if tokenizer_path:
        candidates.append(tokenizer_path)
    ckpt_dir = os.path.dirname(os.path.abspath(path))
    candidates += [ckpt_dir, os.path.join(ckpt_dir, "bpe_simple_vocab_16e6.txt.gz")]
    for c in candidates:
        try:
            if c.endswith(".gz") and os.path.exists(c):
                return CLIPTokenizer.from_bpe_gz(c)
            if os.path.isdir(c):
                return CLIPTokenizer.from_dir(c)
        except FileNotFoundError:
            continue
    if tokenizer_path:
        raise FileNotFoundError(
            f"no tokenizer assets (vocab.json+merges.txt or *.txt.gz) found "
            f"at {tokenizer_path!r}"
        )
    warnings.warn(
        "single-file checkpoint carries no tokenizer assets and none were "
        "found next to it: falling back to the hash-based toy tokenizer. "
        "Region labels will NOT match real CLIP ids — pass tokenizer_path= "
        "(a dir with vocab.json+merges.txt, or bpe_simple_vocab_16e6.txt.gz).",
        stacklevel=3,
    )
    return None


def load_ldm_checkpoint(
    path: str,
    extract_ema: bool = False,
    prediction_type: str = "auto",
    tokenizer_path: Optional[str] = None,
):
    """Single-file ``.ckpt``/``.safetensors`` → (config, params, tokenizer)."""
    from ..models.clip import CLIPTextEncoder
    from ..models.unet import UNet2DCondition
    from ..models.vae import AutoencoderKL
    from ..tokenizer.clip_bpe import toy_tokenizer

    state, ckpt_meta = read_state_dict(path, return_meta=True)
    unet_sd, vae_sd, clip_sd = convert_ldm_state_dict(state, extract_ema)
    if is_ldm_bert_sd(clip_sd):
        # Original-LDM (BERT-conditioned) checkpoint: the text tower converts
        # via convert_ldm_bert, but PwW pipelines condition on CLIP — exactly
        # the reference's split, where LDM-BERT feeds only the plain
        # LDMTextToImagePipeline (change_model_path.py:926-937) and
        # pww_load_tools always loads CLIPTextModel (paint_with_words.py:171).
        raise ValueError(
            f"{path} is an original latent-diffusion checkpoint (LDM-BERT "
            "text encoder, not CLIP). Its text tower converts with "
            "pww_tpu.weights.ldm_convert.convert_ldm_bert(clip_sd), but the "
            "PwW pipeline requires a CLIP-conditioned SD checkpoint — same "
            "scope as the reference (change_model_path.py:926-937 routes "
            "LDM-BERT only into the plain LDM pipeline, never into PwW)."
        )

    # global_step lives OUTSIDE state_dict in LDM checkpoints — the tensor
    # filter drops it, so the v-prediction heuristic reads the header meta.
    config = detect_ldm_config(ckpt_meta, unet_sd, prediction_type)
    rng = jax.random.PRNGKey(0)

    unet = UNet2DCondition(config.unet)
    lat = jnp.zeros((1, 8, 8, config.unet.in_channels))
    ctx = jnp.zeros((1, 77, config.unet.cross_attention_dim))
    unet_shapes = jax.eval_shape(unet.init, rng, lat, jnp.zeros((1,)), ctx)
    unet_params = fill_params(unet_shapes, unet_sd, unet_key, name="unet(ldm)")

    vae = AutoencoderKL(config.vae)
    img = jnp.zeros((1, 16, 16, 3))
    vae_shapes = jax.eval_shape(vae.init, rng, img)
    vae_params = fill_params(vae_shapes, vae_sd, vae_keys, multi=True, name="vae(ldm)")

    clip = CLIPTextEncoder(config.clip)
    ids = jnp.zeros((1, 77), jnp.int32)
    clip_shapes = jax.eval_shape(clip.init, rng, ids)
    clip_params = fill_params(clip_shapes, clip_sd, clip_key, name="clip(ldm)")

    params = {"unet": unet_params, "vae": vae_params, "clip": clip_params}
    tokenizer = _find_tokenizer(path, tokenizer_path)
    if tokenizer is None:
        tokenizer = toy_tokenizer(config.clip.vocab_size)
    return config, params, tokenizer


# ---------------------------------------------------------------------------
# CLI (parity with the reference converter's interface,
# reference change_model_path.py:812-943)
# ---------------------------------------------------------------------------


def _cli():
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert an LDM/A1111 .ckpt or .safetensors checkpoint "
        "to a pww-tpu Flax params file."
    )
    ap.add_argument("--checkpoint_path", required=True)
    ap.add_argument("--dump_path", required=True,
                    help="output directory (params.msgpack + config.json)")
    ap.add_argument("--extract_ema", action="store_true")
    ap.add_argument(
        "--prediction_type", default="auto",
        choices=["auto", "epsilon", "v_prediction"],
        help="auto: derive from shapes + global_step (SD-2.x 768-v vs "
        "512-base); override for exotic checkpoints",
    )
    ap.add_argument(
        "--tokenizer_dir", default=None,
        help="dir with vocab.json+merges.txt (or a bpe_simple_vocab_16e6"
        ".txt.gz file) to bundle real tokenizer assets",
    )
    ap.add_argument(
        "--scheduler_type", default="lms",
        choices=["lms", "euler", "euler_ancestral", "ddim", "pndm",
                 "dpmpp_2m", "heun", "unipc"],
        help="recorded as the default scheduler for the converted model",
    )
    ap.add_argument(
        "--text_encoder_only", action="store_true",
        help="convert and dump ONLY the text tower of an original-LDM "
        "(BERT-conditioned) checkpoint, which has no PwW-runnable UNet/VAE "
        "(reference scope: change_model_path.py:926-937 routes LDM-BERT "
        "only into the plain LDM pipeline). SD checkpoints don't need this.",
    )
    args = ap.parse_args()

    import dataclasses
    import json
    import os

    import flax.serialization
    import jax

    if args.text_encoder_only:
        state = read_state_dict(args.checkpoint_path)
        _, _, text_sd = convert_ldm_state_dict(state, args.extract_ema)
        if not is_ldm_bert_sd(text_sd):
            ap.error(
                "--text_encoder_only is for original-LDM (BERT-conditioned) "
                "checkpoints; this one has a CLIP tower — run the standard "
                "conversion instead."
            )
        config, params = convert_ldm_bert(text_sd)
        os.makedirs(args.dump_path, exist_ok=True)
        with open(os.path.join(args.dump_path, "params.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(
                jax.tree.map(lambda x: jax.device_get(x), params)
            ))
        with open(os.path.join(args.dump_path, "config.json"), "w") as f:
            json.dump(
                {
                    "ldm_bert": dataclasses.asdict(config),
                    "source": os.path.basename(args.checkpoint_path),
                },
                f, indent=2,
            )
        print(f"wrote {args.dump_path}/params.msgpack + config.json "
              "(LDM-BERT text tower only)")
        return

    config, params, tokenizer = load_ldm_checkpoint(
        args.checkpoint_path, extract_ema=args.extract_ema,
        prediction_type=args.prediction_type,
        tokenizer_path=args.tokenizer_dir,
    )
    os.makedirs(args.dump_path, exist_ok=True)
    from ..tokenizer.clip_bpe import save_tokenizer_assets

    save_tokenizer_assets(tokenizer, os.path.join(args.dump_path, "tokenizer"))
    with open(os.path.join(args.dump_path, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(
            jax.tree.map(lambda x: jax.device_get(x), params)
        ))
    with open(os.path.join(args.dump_path, "config.json"), "w") as f:
        json.dump(
            {
                "model": dataclasses.asdict(config),
                "scheduler_type": args.scheduler_type,
                "source": os.path.basename(args.checkpoint_path),
                "extract_ema": args.extract_ema,
            },
            f, indent=2,
        )
    print(f"wrote {args.dump_path}/params.msgpack + config.json")


if __name__ == "__main__":
    _cli()
