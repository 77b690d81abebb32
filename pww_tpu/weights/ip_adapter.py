"""IP-Adapter checkpoint loading (Ye et al. 2023, tencent-ailab format).

An ``ip-adapter_sd15.bin``/``.safetensors`` holds two groups:

- ``image_proj``: the linear+norm projection of the CLIP image embedding to
  N context tokens (``proj.weight/bias``, ``norm.weight/bias``);
- ``ip_adapter``: per-cross-attention ``to_k_ip.weight`` / ``to_v_ip.weight``
  keyed by the index of the attention processor in diffusers'
  ``unet.attn_processors`` enumeration. That enumeration follows module
  REGISTRATION order — ``down_blocks``, then ``up_blocks``, then
  ``mid_block`` (the ModuleList attributes are created before the mid block
  in diffusers' ``__init__``) — with attn1 before attn2 inside each
  transformer block, so cross-attention sites carry odd indices 1, 3, 5, …

This module reproduces that enumeration over OUR flax module names and
installs the adapter kernels into the parameter pytree of an
``ip_adapter_tokens``-enabled UNet.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UNetConfig
from .loader import read_state_dict, t_dense


def attn2_sites(cfg: UNetConfig) -> List[Tuple[str, str]]:
    """(site_module, block_module) pairs in diffusers attn-processor order:
    down blocks, UP blocks, then mid (see module docstring)."""
    sites: List[Tuple[str, str]] = []
    n_blocks = len(cfg.block_out_channels)

    def add(site: str, depth: int) -> None:
        for d in range(depth):
            sites.append((site, f"blocks_{d}"))

    for bi in range(n_blocks):
        if cfg.down_block_has_attn[bi]:
            for li in range(cfg.layers_per_block):
                add(f"down_{bi}_attn_{li}", cfg.depth_for(bi))
    for bi in range(n_blocks):
        if cfg.up_block_has_attn[bi]:
            depth = cfg.depth_for(n_blocks - 1 - bi)
            for li in range(cfg.layers_per_block + 1):
                add(f"up_{bi}_attn_{li}", depth)
    add("mid_attn", cfg.depth_for(n_blocks - 1))
    return sites


def parse_ip_adapter_state(state: Dict[str, np.ndarray]):
    """Split a raw checkpoint into (proj_group, {site_index: (k, v)})."""
    proj = {}
    sites: Dict[int, Dict[str, np.ndarray]] = {}
    for key, val in state.items():
        if key.startswith("image_proj."):
            proj[key[len("image_proj."):]] = np.asarray(val, np.float32)
        elif key.startswith("ip_adapter."):
            rest = key[len("ip_adapter."):]
            idx_s, leaf = rest.split(".", 1)
            sites.setdefault(int(idx_s), {})[leaf] = np.asarray(
                val, np.float32
            )
        else:
            raise ValueError(f"unrecognized ip-adapter key {key!r}")
    return proj, sites


def load_ip_adapter_file(path: str):
    return parse_ip_adapter_state(read_state_dict(path))


def image_proj_params(proj: Dict[str, np.ndarray]) -> dict:
    """checkpoint ``image_proj`` group → ImageProjection param pytree."""
    return {
        "params": {
            "proj": {
                "kernel": jnp.asarray(t_dense(proj["proj.weight"])),
                "bias": jnp.asarray(proj["proj.bias"]),
            },
            "norm": {
                "scale": jnp.asarray(proj["norm.weight"]),
                "bias": jnp.asarray(proj["norm.bias"]),
            },
        }
    }


def num_tokens_from_proj(
    proj: Dict[str, np.ndarray], cross_attention_dim: int
) -> int:
    return proj["proj.weight"].shape[0] // cross_attention_dim


def install_ip_adapter(
    unet_params,
    ip_shapes,
    cfg: UNetConfig,
    sites_state: Dict[int, Dict[str, np.ndarray]],
    weights_dtype=None,
):
    """Build the ip-enabled UNet param tree: existing leaves + adapter K/V.

    ``ip_shapes``: ``jax.eval_shape`` of the ip-enabled module's init.
    Checkpoint indices map as ``attn2 site i ↔ index 2*i + 1`` (attn1/attn2
    alternate in the diffusers enumeration). Raises if a site has no
    checkpoint entry or an entry has no site.
    """
    order = attn2_sites(cfg)
    by_path: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}
    used = set()
    for i, (site, block) in enumerate(order):
        idx = 2 * i + 1
        if idx not in sites_state:
            raise KeyError(
                f"ip-adapter checkpoint has no entry {idx} for site "
                f"{site}/{block} ({len(sites_state)} entries present)"
            )
        by_path[(site, block, "attn2")] = sites_state[idx]
        used.add(idx)
    extra = set(sites_state) - used
    if extra:
        raise KeyError(
            f"ip-adapter checkpoint entries {sorted(extra)} have no matching "
            f"attention site (model has {len(order)} cross-attention sites)"
        )

    old_flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(unet_params)[0]:
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        old_flat[path] = leaf

    flat, treedef = jax.tree_util.tree_flatten_with_path(ip_shapes)
    leaves = []
    for keypath, shape_leaf in flat:
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        if path in old_flat:
            leaves.append(old_flat[path])
            continue
        if path[-2] not in ("to_k_ip", "to_v_ip") or path[-1] != "kernel":
            raise KeyError(f"unexpected new parameter {path}")
        site_key = tuple(p for p in path if p != "params")[:3]
        leaf_name = "to_k_ip.weight" if path[-2] == "to_k_ip" else "to_v_ip.weight"
        arr = t_dense(by_path[site_key][leaf_name])
        if arr.shape != tuple(shape_leaf.shape):
            raise ValueError(
                f"ip-adapter shape mismatch at {path}: checkpoint "
                f"{arr.shape} vs model {tuple(shape_leaf.shape)}"
            )
        out = jnp.asarray(arr)
        if weights_dtype is not None:
            out = out.astype(weights_dtype)
        leaves.append(out)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def vision_key(path: Tuple[str, ...], rank: int) -> Tuple[str, object]:
    """Our CLIPVisionEncoder flax paths → transformers
    CLIPVisionModelWithProjection state-dict keys."""
    import re

    from .loader import _leaf_key

    *mods, leaf = path
    if mods and mods[0] == "visual_projection":
        torch_leaf, tf = _leaf_key(leaf, rank)
        return f"visual_projection.{torch_leaf}", tf
    if leaf == "class_embedding":
        return "vision_model.embeddings.class_embedding", lambda x: x
    if leaf == "position_embedding":
        return "vision_model.embeddings.position_embedding.weight", lambda x: x
    if mods and mods[0] == "patch_embedding":
        torch_leaf, tf = _leaf_key(leaf, rank)
        return f"vision_model.embeddings.patch_embedding.{torch_leaf}", tf
    parts = []
    for m in mods:
        mm = re.fullmatch(r"layers_(\d+)", m)
        if mm:
            parts.append(f"encoder.layers.{mm[1]}")
        elif m == "pre_layernorm":
            parts.append("pre_layrnorm")  # transformers' historical typo
        elif m == "post_layernorm":
            parts.append("post_layernorm")
        else:
            parts.append(m)
    torch_leaf, tf = _leaf_key(leaf, rank)
    return "vision_model." + ".".join(parts + [torch_leaf]), tf


def load_image_encoder(path: str):
    """diffusers/transformers image-encoder dir → (config, params)."""
    import json
    import os

    from ..config import CLIPVisionConfig
    from ..models.clip_vision import CLIPVisionEncoder
    from .loader import _find_weights_file, fill_params

    with open(os.path.join(path, "config.json")) as f:
        d = json.load(f)
    cfg = CLIPVisionConfig(
        hidden_size=d.get("hidden_size", 1280),
        intermediate_size=d.get("intermediate_size", 5120),
        num_layers=d.get("num_hidden_layers", 32),
        num_heads=d.get("num_attention_heads", 16),
        image_size=d.get("image_size", 224),
        patch_size=d.get("patch_size", 14),
        hidden_act=d.get("hidden_act", "gelu"),
        projection_dim=d.get("projection_dim", 1024),
    )
    enc = CLIPVisionEncoder(cfg)
    shapes = jax.eval_shape(
        enc.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )
    state = read_state_dict(_find_weights_file(path))
    return cfg, fill_params(shapes, state, vision_key, name="image_encoder")


def is_plus_format(proj: Dict[str, np.ndarray]) -> bool:
    return "latents" in proj


def resampler_params(proj: Dict[str, np.ndarray]) -> dict:
    """checkpoint plus-format ``image_proj`` group → Resampler param pytree.

    tencent-ailab naming: ``layers.{i}.0`` = PerceiverAttention
    (norm1/norm2/to_q/to_kv/to_out), ``layers.{i}.1`` = Sequential
    [LayerNorm, Linear, GELU, Linear] (keys 0/1/3).
    """
    p = {
        "latents": jnp.asarray(proj["latents"]),
        "proj_in": {
            "kernel": jnp.asarray(t_dense(proj["proj_in.weight"])),
            "bias": jnp.asarray(proj["proj_in.bias"]),
        },
        "proj_out": {
            "kernel": jnp.asarray(t_dense(proj["proj_out.weight"])),
            "bias": jnp.asarray(proj["proj_out.bias"]),
        },
        "norm_out": {
            "scale": jnp.asarray(proj["norm_out.weight"]),
            "bias": jnp.asarray(proj["norm_out.bias"]),
        },
    }
    depth = 0
    while f"layers.{depth}.0.to_q.weight" in proj:
        depth += 1
    for i in range(depth):
        a = f"layers.{i}.0."
        f = f"layers.{i}.1."
        p[f"layers_{i}_attn"] = {
            "norm1": {"scale": jnp.asarray(proj[a + "norm1.weight"]),
                      "bias": jnp.asarray(proj[a + "norm1.bias"])},
            "norm2": {"scale": jnp.asarray(proj[a + "norm2.weight"]),
                      "bias": jnp.asarray(proj[a + "norm2.bias"])},
            "to_q": {"kernel": jnp.asarray(t_dense(proj[a + "to_q.weight"]))},
            "to_kv": {"kernel": jnp.asarray(t_dense(proj[a + "to_kv.weight"]))},
            "to_out": {"kernel": jnp.asarray(t_dense(proj[a + "to_out.weight"]))},
        }
        p[f"layers_{i}_ff_norm"] = {
            "scale": jnp.asarray(proj[f + "0.weight"]),
            "bias": jnp.asarray(proj[f + "0.bias"]),
        }
        p[f"layers_{i}_ff_in"] = {
            "kernel": jnp.asarray(t_dense(proj[f + "1.weight"]))
        }
        p[f"layers_{i}_ff_out"] = {
            "kernel": jnp.asarray(t_dense(proj[f + "3.weight"]))
        }
    return {"params": p}


def resampler_config(proj: Dict[str, np.ndarray]) -> dict:
    """Derive Resampler hyperparameters from the checkpoint shapes."""
    num_queries, dim = proj["latents"].shape
    depth = 0
    while f"layers.{depth}.0.to_q.weight" in proj:
        depth += 1
    inner = proj["layers.0.0.to_q.weight"].shape[0]
    output_dim = proj["proj_out.weight"].shape[0]
    ff_mult = proj["layers.0.1.1.weight"].shape[0] // dim
    return dict(
        dim=dim, output_dim=output_dim, num_queries=num_queries,
        depth=depth, dim_head=64, heads=inner // 64, ff_mult=ff_mult,
    )
