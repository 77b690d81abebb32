"""Checkpoint loading: diffusers-layout SD checkpoints → Flax param pytrees.

The reference defers to ``*.from_pretrained`` (reference
`paint_with_words/paint_with_words.py:149-189`); here the mapping is explicit:
for every parameter in our Flax modules we derive the corresponding
diffusers/transformers state-dict key plus the layout transform
(torch OIHW conv → flax HWIO; torch (out,in) linear → flax (in,out)).

Works with ``.safetensors`` (preferred, no torch needed) and torch ``.bin``
pickles (CPU torch). Config is read from the checkpoint's ``config.json``
files so 4-channel SD and 9-channel inpainting UNets both load
(reference `paint_with_words_inpaint.py:216-227` channel check).
"""
from __future__ import annotations

import functools
import json
import os
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (CLIPTextConfig, SchedulerConfig, SDModelConfig,
                      UNetConfig, VAEConfig)

# ---------------------------------------------------------------------------
# state-dict reading
# ---------------------------------------------------------------------------


def read_state_dict(path: str, return_meta: bool = False):
    """Load a single checkpoint file into numpy arrays.

    With ``return_meta=True`` also returns non-tensor header fields the
    tensor filter would otherwise drop (currently ``global_step`` — the
    SD-2.x epsilon-vs-v detection heuristic needs it).
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path)
        return (state, {}) if return_meta else state
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    meta = {}
    if "global_step" in sd:
        try:
            meta["global_step"] = int(sd["global_step"])
        except (TypeError, ValueError):
            pass
    if "state_dict" in sd:
        sd = sd["state_dict"]
    state = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return (state, meta) if return_meta else state


def _find_weights_file(subdir: str) -> str:
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
    ):
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weights file in {subdir}")


# ---------------------------------------------------------------------------
# transforms: torch layout -> flax layout
# ---------------------------------------------------------------------------


def t_conv(x: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) → (kh, kw, I, O)."""
    return np.transpose(x, (2, 3, 1, 0))


def t_dense(x: np.ndarray) -> np.ndarray:
    """(out, in) → (in, out)."""
    return np.transpose(x, (1, 0))


def t_id(x: np.ndarray) -> np.ndarray:
    return x


# ---------------------------------------------------------------------------
# flax-path → diffusers-key mapping
# ---------------------------------------------------------------------------

_LEAF = {
    # (our leaf name) -> (torch leaf name, transform-for-weight)
    "kernel": ("weight", None),  # transform decided by param rank
    "bias": ("bias", t_id),
    "scale": ("weight", t_id),  # Group/LayerNorm scale
    "embedding": ("weight", t_id),  # nn.Embed
}


def _leaf_key(leaf: str, rank: int) -> Tuple[str, Callable]:
    torch_leaf, tf = _LEAF[leaf]
    if tf is None:
        tf = t_conv if rank == 4 else (t_dense if rank == 2 else t_id)
    return torch_leaf, tf


def _unet_module_key(name: str) -> str:
    """Translate one of our UNet flax module names to its diffusers prefix."""
    m = re.fullmatch(r"down_(\d+)_resnet_(\d+)", name)
    if m:
        return f"down_blocks.{m[1]}.resnets.{m[2]}"
    m = re.fullmatch(r"down_(\d+)_attn_(\d+)", name)
    if m:
        return f"down_blocks.{m[1]}.attentions.{m[2]}"
    m = re.fullmatch(r"down_(\d+)_downsample", name)
    if m:
        return f"down_blocks.{m[1]}.downsamplers.0"
    m = re.fullmatch(r"up_(\d+)_resnet_(\d+)", name)
    if m:
        return f"up_blocks.{m[1]}.resnets.{m[2]}"
    m = re.fullmatch(r"up_(\d+)_attn_(\d+)", name)
    if m:
        return f"up_blocks.{m[1]}.attentions.{m[2]}"
    m = re.fullmatch(r"up_(\d+)_upsample", name)
    if m:
        return f"up_blocks.{m[1]}.upsamplers.0"
    m = re.fullmatch(r"mid_resnet_(\d+)", name)
    if m:
        return f"mid_block.resnets.{m[1]}"
    if name == "mid_attn":
        return "mid_block.attentions.0"
    m = re.fullmatch(r"blocks_(\d+)", name)
    if m:
        return f"transformer_blocks.{m[1]}"
    # transformer internals
    fixed = {
        "to_out": "to_out.0",
        "ff": "ff",
        "proj_in": "proj_in",
        "proj_out": "proj_out",
    }
    return fixed.get(name, name)


def unet_key(path: Tuple[str, ...], rank: int) -> Tuple[str, Callable]:
    """('down_0_attn_1', 'blocks_0', 'attn2', 'to_q', 'kernel') →
    ('down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_q.weight', t)."""
    *mods, leaf = path
    parts = []
    for i, m in enumerate(mods):
        # FeedForward GEGLU naming: ff.proj_in -> ff.net.0.proj, ff.proj_out -> ff.net.2
        if i > 0 and mods[i - 1] == "ff":
            parts.append({"proj_in": "net.0.proj", "proj_out": "net.2"}[m])
        else:
            parts.append(_unet_module_key(m))
    torch_leaf, tf = _leaf_key(leaf, rank)
    return ".".join(parts + [torch_leaf]), tf


def clip_key(path: Tuple[str, ...], rank: int) -> Tuple[str, Callable]:
    *mods, leaf = path
    if mods and mods[0] == "token_embedding":
        return "text_model.embeddings.token_embedding.weight", t_id
    if leaf == "position_embedding":
        return "text_model.embeddings.position_embedding.weight", t_id
    if mods and mods[0] == "text_projection":
        # CLIPTextModelWithProjection stores the head at the TOP level
        # (not under text_model.) — SDXL text_encoder_2
        torch_leaf, tf = _leaf_key(leaf, rank)
        return f"text_projection.{torch_leaf}", tf
    parts = []
    for m in mods:
        mm = re.fullmatch(r"layers_(\d+)", m)
        parts.append(f"encoder.layers.{mm[1]}" if mm else m)
    torch_leaf, tf = _leaf_key(leaf, rank)
    return "text_model." + ".".join(parts + [torch_leaf]), tf


_VAE_ATTN = {"norm": "group_norm", "q": "query", "k": "key", "v": "value",
             "proj_out": "proj_attn"}
_VAE_ATTN_NEW = {"norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v",
                 "proj_out": "to_out.0"}


def vae_keys(path: Tuple[str, ...], rank: int) -> Tuple[Tuple[str, ...], Callable]:
    """Returns candidate diffusers keys (old + new attention naming)."""
    *mods, leaf = path
    torch_leaf, tf = _leaf_key(leaf, rank)

    def translate(attn_map) -> str:
        parts = []
        in_attn = False
        top = mods[0] if mods else ""
        for i, m in enumerate(mods):
            if m in ("encoder", "decoder"):
                parts.append(m)
                continue
            if m == "quant_conv" or m == "post_quant_conv":
                return f"{m}.{torch_leaf}"  # top-level in diffusers
            mm = re.fullmatch(r"down_(\d+)_resnet_(\d+)", m)
            if mm:
                parts.append(f"down_blocks.{mm[1]}.resnets.{mm[2]}")
                continue
            mm = re.fullmatch(r"down_(\d+)_downsample", m)
            if mm:
                parts.append(f"down_blocks.{mm[1]}.downsamplers.0.conv")
                continue
            mm = re.fullmatch(r"up_(\d+)_resnet_(\d+)", m)
            if mm:
                parts.append(f"up_blocks.{mm[1]}.resnets.{mm[2]}")
                continue
            mm = re.fullmatch(r"up_(\d+)_upsample", m)
            if mm:
                parts.append(f"up_blocks.{mm[1]}.upsamplers.0.conv")
                continue
            mm = re.fullmatch(r"mid_resnet_(\d+)", m)
            if mm:
                parts.append(f"mid_block.resnets.{mm[1]}")
                continue
            if m == "mid_attn":
                parts.append("mid_block.attentions.0")
                in_attn = True
                continue
            if in_attn and m in attn_map:
                parts.append(attn_map[m])
                continue
            parts.append(m)
        return ".".join(parts + [torch_leaf])

    return (translate(_VAE_ATTN), translate(_VAE_ATTN_NEW)), tf


def controlnet_key(path: Tuple[str, ...], rank: int) -> Tuple[str, Callable]:
    """Our ControlNet flax paths → diffusers ControlNetModel keys."""
    *mods, leaf = path
    torch_leaf, tf = _leaf_key(leaf, rank)
    m0 = mods[0] if mods else ""
    m = re.fullmatch(r"zero_conv_(\d+)", m0)
    if m:
        return f"controlnet_down_blocks.{m[1]}.{torch_leaf}", tf
    if m0 == "zero_conv_mid":
        return f"controlnet_mid_block.{torch_leaf}", tf
    if m0 == "cond_embedding":
        inner = mods[1]
        if inner == "conv_in":
            return f"controlnet_cond_embedding.conv_in.{torch_leaf}", tf
        if inner == "conv_out":
            return f"controlnet_cond_embedding.conv_out.{torch_leaf}", tf
        mm = re.fullmatch(r"blocks_(\d+)", inner)
        return f"controlnet_cond_embedding.blocks.{mm[1]}.{torch_leaf}", tf
    return unet_key(path, rank)


def load_controlnet_checkpoint(path: str, config) -> dict:
    """diffusers ControlNetModel dir/file → Flax param pytree."""
    from ..models.controlnet import ControlNet

    if os.path.isdir(path):
        state = read_state_dict(_find_weights_file(path))
    else:
        state = read_state_dict(path)
    cn = ControlNet(config.unet)
    h = w = 2 ** (len(config.unet.block_out_channels) - 1)
    sf = config.vae.scale_factor
    shapes = jax.eval_shape(
        cn.init, jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, config.unet.in_channels)), jnp.zeros((1,)),
        jnp.zeros((1, config.clip.max_position_embeddings,
                   config.unet.cross_attention_dim)),
        jnp.zeros((1, h * sf, w * sf, 3)),
    )
    return fill_params(shapes, state, controlnet_key, name="controlnet")


# ---------------------------------------------------------------------------
# generic tree filling
# ---------------------------------------------------------------------------


def fill_params(
    target_shapes,
    state: Dict[str, np.ndarray],
    key_fn: Callable[[Tuple[str, ...], int], Any],
    multi: bool = False,
    strict: bool = True,
    name: str = "",
):
    """Walk a flax param-shape tree; pull+transform each tensor from ``state``."""
    flat = jax.tree_util.tree_flatten_with_path(target_shapes)[0]
    treedef = jax.tree_util.tree_structure(target_shapes)
    leaves = []
    missing = []
    for keypath, shape_leaf in flat:
        path = tuple(
            p.key if hasattr(p, "key") else str(p) for p in keypath
        )
        # drop the top-level 'params' collection name
        path = tuple(p for p in path if p != "params")
        rank = len(shape_leaf.shape)
        keys, tf = key_fn(path, rank)
        if not multi:
            keys = (keys,)
        src = None
        for k in keys:
            if k in state:
                src = state[k]
                break
        if src is None:
            missing.append((path, keys))
            leaves.append(jnp.zeros(shape_leaf.shape, shape_leaf.dtype))
            continue
        try:
            arr = tf(src)
            raw = False
        except ValueError:
            # rank mismatch between checkpoint and model: diffusers
            # ``use_linear_projection=True`` (SD-2.x, SDXL) stores
            # Transformer2D proj_in/proj_out as nn.Linear (O, I) while our
            # module is a 1x1 conv (rank-4 HWIO kernel), so the conv
            # transpose cannot apply — keep the raw tensor and let the
            # rank-fix below lay it out.
            arr = np.asarray(src)
            raw = True
        # torch convs sometimes store 1x1 convs as linear (proj_in variants)
        if arr.shape != tuple(shape_leaf.shape):
            if arr.ndim == 2 and len(shape_leaf.shape) == 4:
                # raw torch Linear is (O, I); an already-transformed dense
                # kernel is (I, O) -> both to HWIO (1, 1, I, O)
                arr = (np.transpose(arr) if raw else arr)[None, None]
            elif arr.ndim == 4 and len(shape_leaf.shape) == 2 and arr.shape[:2] == (1, 1):
                arr = arr[0, 0]
        if arr.shape != tuple(shape_leaf.shape):
            raise ValueError(
                f"{name}: shape mismatch at {'.'.join(path)}: checkpoint "
                f"{arr.shape} vs model {tuple(shape_leaf.shape)} (keys {keys})"
            )
        leaves.append(jnp.asarray(arr, shape_leaf.dtype))
    if missing and strict:
        lines = "; ".join(".".join(p) + "←" + "|".join(k) for p, k in missing[:8])
        raise KeyError(f"{name}: {len(missing)} params missing from checkpoint: {lines}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# config + full-pipeline loading
# ---------------------------------------------------------------------------


def _read_json(path: str) -> Optional[dict]:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def init_added_cond(config: SDModelConfig) -> Optional[dict]:
    """The ``added_cond`` dict shape the UNet's init/eval_shape needs for
    this config (SDXL-base/refiner text_time micro-conditioning and/or the
    LCM guidance-embedding input); None when neither applies."""
    added = None
    if config.needs_pooled:
        added = {
            "text_embeds": jnp.zeros((1, config.pooled_dim)),
            "time_ids": jnp.zeros((1, config.num_time_ids)),
        }
    if config.unet.time_cond_proj_dim is not None:
        added = dict(added or {})
        added["timestep_cond"] = jnp.zeros(
            (1, config.unet.time_cond_proj_dim)
        )
    return added


def config_from_checkpoint(model_path: str) -> SDModelConfig:
    """Derive SDModelConfig from the checkpoint's config.json files.

    An SDXL-refiner layout (text_encoder_2 present, text_encoder absent,
    diffusers requires_aesthetics_score) maps to ``xl_refiner=True`` with
    the bigG tower in the single ``clip`` slot.
    """
    unet_cfg = _read_json(os.path.join(model_path, "unet", "config.json")) or {}
    clip_cfg = _read_json(os.path.join(model_path, "text_encoder", "config.json"))
    vae_cfg = _read_json(os.path.join(model_path, "vae", "config.json")) or {}

    # diffusers' "attention_head_dim" actually stores per-block HEAD COUNTS
    # (int 8 for SD-1.x; list [5,10,20,20] for SD-2.x where head_dim=64)
    blocks = tuple(unet_cfg.get("block_out_channels", (320, 640, 1280, 1280)))
    ahd = unet_cfg.get("attention_head_dim", 8)
    if isinstance(ahd, (list, tuple)):
        num_heads, head_dim = 8, blocks[0] // ahd[0]
    else:
        num_heads, head_dim = ahd, None
    tdepth = unet_cfg.get("transformer_layers_per_block")
    if isinstance(tdepth, int):
        tdepth = (tdepth,) * len(blocks)
    unet = UNetConfig(
        in_channels=unet_cfg.get("in_channels", 4),
        out_channels=unet_cfg.get("out_channels", 4),
        sample_size=unet_cfg.get("sample_size", 64),
        block_out_channels=blocks,
        layers_per_block=unet_cfg.get("layers_per_block", 2),
        num_attention_heads=num_heads,
        attention_head_dim=head_dim,
        prediction_type=unet_cfg.get("prediction_type", "epsilon"),
        cross_attention_dim=unet_cfg.get("cross_attention_dim", 768),
        norm_num_groups=unet_cfg.get("norm_num_groups", 32),
        down_block_has_attn=tuple(
            t == "CrossAttnDownBlock2D"
            for t in unet_cfg.get(
                "down_block_types",
                ("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
            )
        ),
        transformer_depth=None if tdepth is None else tuple(tdepth),
        addition_embed_type=unet_cfg.get("addition_embed_type"),
        addition_time_embed_dim=unet_cfg.get("addition_time_embed_dim", 256),
        projection_class_embeddings_input_dim=unet_cfg.get(
            "projection_class_embeddings_input_dim"
        ),
        time_cond_proj_dim=unet_cfg.get("time_cond_proj_dim"),
    )

    def _clip_config(d, default_act="quick_gelu"):
        return CLIPTextConfig(
            vocab_size=d.get("vocab_size", 49408),
            hidden_size=d.get("hidden_size", 768),
            intermediate_size=d.get("intermediate_size", 3072),
            num_layers=d.get("num_hidden_layers", 12),
            num_heads=d.get("num_attention_heads", 12),
            max_position_embeddings=d.get("max_position_embeddings", 77),
            hidden_act=d.get("hidden_act", default_act),
            projection_dim=(
                d.get("projection_dim") if d.get("architectures", [""])[0]
                == "CLIPTextModelWithProjection" else None
            ),
            eos_token_id=d.get("eos_token_id", 49407),
        )

    clip2_cfg = _read_json(
        os.path.join(model_path, "text_encoder_2", "config.json")
    )
    xl_refiner = clip_cfg is None and clip2_cfg is not None
    if xl_refiner:
        clip = _clip_config(clip2_cfg, "gelu")
        clip2 = None
    else:
        clip = _clip_config(clip_cfg or {})
        clip2 = None if clip2_cfg is None else _clip_config(clip2_cfg, "gelu")
    vae = VAEConfig(
        latent_channels=vae_cfg.get("latent_channels", 4),
        block_out_channels=tuple(vae_cfg.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=vae_cfg.get("layers_per_block", 2),
        norm_num_groups=vae_cfg.get("norm_num_groups", 32),
        scaling_factor=vae_cfg.get("scaling_factor", 0.18215),
    )
    idx = _read_json(os.path.join(model_path, "model_index.json")) or {}
    return SDModelConfig(
        clip=clip, unet=unet, vae=vae, clip2=clip2,
        force_zeros_for_empty_prompt=idx.get(
            "force_zeros_for_empty_prompt", True
        ),
        xl_refiner=xl_refiner,
    )


def _load_native_checkpoint(model_path: str):
    """Load a dir produced by the ldm_convert CLI (params.msgpack + config.json)."""
    from ..config import (CLIPTextConfig, SchedulerConfig, UNetConfig,
                          VAEConfig)
    from ..models.clip import CLIPTextEncoder
    from ..models.unet import UNet2DCondition
    from ..models.vae import AutoencoderKL
    from ..tokenizer.clip_bpe import CLIPTokenizer, toy_tokenizer

    with open(os.path.join(model_path, "config.json")) as f:
        meta = json.load(f)
    m = meta["model"]
    u = dict(m["unet"])
    u["block_out_channels"] = tuple(u["block_out_channels"])
    u["down_block_has_attn"] = tuple(u["down_block_has_attn"])
    if u.get("transformer_depth") is not None:
        u["transformer_depth"] = tuple(u["transformer_depth"])
    if u.get("freeu") is not None:
        # json round-trips tuples as lists; UNetConfig must stay hashable
        # (it is a static jit argument)
        u["freeu"] = tuple(u["freeu"])
    config = SDModelConfig(
        clip=CLIPTextConfig(**m["clip"]),
        unet=UNetConfig(**u),
        vae=VAEConfig(
            **{**m["vae"], "block_out_channels": tuple(m["vae"]["block_out_channels"])}
        ),
        clip2=(
            CLIPTextConfig(**m["clip2"]) if m.get("clip2") is not None else None
        ),
        scheduler=(
            SchedulerConfig(**m["scheduler"]) if m.get("scheduler")
            else SchedulerConfig()
        ),
        force_zeros_for_empty_prompt=m.get("force_zeros_for_empty_prompt", True),
        xl_refiner=m.get("xl_refiner", False),
    )
    rng = jax.random.PRNGKey(0)
    clip = CLIPTextEncoder(config.clip)
    unet = UNet2DCondition(config.unet)
    vae = AutoencoderKL(config.vae)
    h = w = 2 ** (len(config.unet.block_out_channels) - 1)
    added = init_added_cond(config)
    shapes = {
        "unet": jax.eval_shape(
            unet.init, rng, jnp.zeros((1, h, w, config.unet.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, config.clip.max_position_embeddings,
                       config.unet.cross_attention_dim)),
            added_cond=added,
        ),
        "vae": jax.eval_shape(
            vae.init, rng,
            jnp.zeros((1, config.vae.scale_factor * 2,
                       config.vae.scale_factor * 2, config.vae.in_channels)),
        ),
        "clip": jax.eval_shape(
            (
                functools.partial(clip.init, output="penultimate_and_pooled")
                if config.xl_refiner else clip.init
            ),
            rng,
            jnp.zeros((1, config.clip.max_position_embeddings), jnp.int32),
        ),
    }
    if config.is_xl:
        clip2 = CLIPTextEncoder(config.clip2)
        shapes["clip2"] = jax.eval_shape(
            functools.partial(clip2.init, output="penultimate_and_pooled"),
            rng,
            jnp.zeros((1, config.clip2.max_position_embeddings), jnp.int32),
        )
    import flax.serialization as ser

    with open(os.path.join(model_path, "params.msgpack"), "rb") as f:
        params = ser.from_bytes(
            jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), f.read()
        )
    params = jax.tree.map(jnp.asarray, params)
    try:
        tokenizer = CLIPTokenizer.from_dir(model_path)
    except FileNotFoundError:
        tokenizer = toy_tokenizer(config.clip.vocab_size)
    tokenizer_2 = None
    if config.is_xl:
        t2dir = os.path.join(model_path, "tokenizer_2")
        tokenizer_2 = (
            CLIPTokenizer.from_dir(t2dir) if os.path.isdir(t2dir) else tokenizer
        )
    return config, params, tokenizer, tokenizer_2


def load_pipeline_checkpoint(model_path: str):
    """Load (config, params, tokenizer, tokenizer_2) from a checkpoint.

    ``tokenizer_2`` is None for single-encoder models. Diffusers-layout dirs
    (incl. SDXL with text_encoder_2/tokenizer_2), native ``params.msgpack``
    dumps, and single-file LDM ``.ckpt``/``.safetensors`` (routed through
    :mod:`pww_tpu.weights.ldm_convert` — A1111-style models, reference
    `change_model_path.py` / `README.md:269-299`) are supported.
    """
    if os.path.isfile(model_path):
        from .ldm_convert import load_ldm_checkpoint

        return (*load_ldm_checkpoint(model_path), None)

    msgpack = os.path.join(model_path, "params.msgpack")
    if os.path.exists(msgpack):
        return _load_native_checkpoint(model_path)

    from ..models.clip import CLIPTextEncoder
    from ..models.unet import UNet2DCondition
    from ..models.vae import AutoencoderKL
    from ..tokenizer.clip_bpe import CLIPTokenizer

    config = config_from_checkpoint(model_path)
    rng = jax.random.PRNGKey(0)

    unet = UNet2DCondition(config.unet)
    lat = jnp.zeros((1, 8, 8, config.unet.in_channels))
    ctx = jnp.zeros((1, config.clip.max_position_embeddings, config.unet.cross_attention_dim))
    unet_shapes = jax.eval_shape(
        unet.init, rng, lat, jnp.zeros((1,)), ctx,
        added_cond=init_added_cond(config),
    )
    unet_state = read_state_dict(_find_weights_file(os.path.join(model_path, "unet")))
    unet_params = fill_params(unet_shapes, unet_state, unet_key, name="unet")

    clip = CLIPTextEncoder(config.clip)
    ids = jnp.zeros((1, config.clip.max_position_embeddings), jnp.int32)
    if config.xl_refiner:
        # single bigG tower lives in text_encoder_2; pooled head included
        clip_shapes = jax.eval_shape(
            functools.partial(clip.init, output="penultimate_and_pooled"),
            rng, ids,
        )
        clip_state = read_state_dict(
            _find_weights_file(os.path.join(model_path, "text_encoder_2"))
        )
    else:
        clip_shapes = jax.eval_shape(clip.init, rng, ids)
        clip_state = read_state_dict(
            _find_weights_file(os.path.join(model_path, "text_encoder"))
        )
    clip_params = fill_params(clip_shapes, clip_state, clip_key, name="clip")

    vae = AutoencoderKL(config.vae)
    img = jnp.zeros((1, config.vae.scale_factor * 2, config.vae.scale_factor * 2, 3))
    vae_shapes = jax.eval_shape(vae.init, rng, img)
    vae_state = read_state_dict(_find_weights_file(os.path.join(model_path, "vae")))
    vae_params = fill_params(vae_shapes, vae_state, vae_keys, multi=True, name="vae")

    if config.xl_refiner and os.path.isdir(
        os.path.join(model_path, "tokenizer_2")
    ) and not os.path.isdir(os.path.join(model_path, "tokenizer")):
        # refiner layout ships only tokenizer_2 (OpenCLIP-style, pads with 0)
        tokenizer = CLIPTokenizer.from_dir(
            os.path.join(model_path, "tokenizer_2")
        )
        tokenizer.pad_token_id = 0
    else:
        tokenizer = CLIPTokenizer.from_dir(model_path)
    params = {"unet": unet_params, "clip": clip_params, "vae": vae_params}

    tokenizer_2 = None
    if config.is_xl:
        clip2 = CLIPTextEncoder(config.clip2)
        ids2 = jnp.zeros((1, config.clip2.max_position_embeddings), jnp.int32)
        clip2_shapes = jax.eval_shape(
            functools.partial(clip2.init, output="penultimate_and_pooled"),
            rng, ids2,
        )
        clip2_state = read_state_dict(
            _find_weights_file(os.path.join(model_path, "text_encoder_2"))
        )
        params["clip2"] = fill_params(
            clip2_shapes, clip2_state, clip_key, name="clip2"
        )
        t2dir = os.path.join(model_path, "tokenizer_2")
        tokenizer_2 = (
            CLIPTokenizer.from_dir(t2dir) if os.path.isdir(t2dir) else tokenizer
        )
        if hasattr(tokenizer_2, "__dict__") and tokenizer_2 is not tokenizer:
            # OpenCLIP-style tokenizer_2 pads with "!" (id 0), not EOS
            tokenizer_2.pad_token_id = 0
    return config, params, tokenizer, tokenizer_2
