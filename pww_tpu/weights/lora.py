"""LoRA (Low-Rank Adaptation) loading and merging.

Beyond-the-reference capability: the reference repo has no LoRA support —
its ecosystem applies LoRA either through the A1111 webui or through
diffusers attention processors, both of which pay the low-rank matmuls at
every step. Here LoRA is merged into the parameter pytree **before** jit:

    W' = W + scale * (alpha / r) * up @ down

so the compiled denoise program is byte-identical to the no-LoRA one and
the adaptation costs zero at runtime — the TPU-first formulation (a merged
weight hits the MXU exactly like the base weight; an unmerged adapter would
add two skinny matmuls per site that XLA cannot fuse into the main GEMM).

Supported checkpoint formats (``.safetensors`` / torch ``.bin``):

- **kohya-ss / A1111** (the SD-ecosystem standard): flat keys
  ``lora_unet_<module>.lora_down.weight`` / ``.lora_up.weight`` / ``.alpha``
  with ``lora_te_`` (SD) or ``lora_te1_``/``lora_te2_`` (SDXL) text-encoder
  prefixes; includes LoCon-style conv entries (3x3 resnet convs, 1x1
  transformer proj convs).
- **diffusers / peft**: ``unet.<module>.lora_A.weight`` / ``lora_B.weight``
  (peft), ``<module>.lora.down.weight`` / ``.lora.up.weight`` (legacy
  diffusers), and the attention-processor form
  ``unet.<module>.processor.to_q_lora.down.weight``.

Merging is exact in f32 regardless of the stored weights dtype: the delta is
computed in f32 and added to the f32-upcast weight, then cast back.
"""
from __future__ import annotations

import re
import warnings
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .loader import clip_key, read_state_dict, unet_key

# ---------------------------------------------------------------------------
# parsing: checkpoint state dict -> canonical {(tower, flat_module): entry}
# ---------------------------------------------------------------------------

_KOHYA_TOWER = {"lora_unet": "unet", "lora_te": "clip",
                "lora_te1": "clip", "lora_te2": "clip2"}
_DIFFUSERS_TOWER = {"unet": "unet", "text_encoder": "clip",
                    "text_encoder_2": "clip2"}
# attention-processor naming: `processor.to_q_lora.down` -> module `to_q`
_PROCESSOR_LORA = {"to_q_lora": "to_q", "to_k_lora": "to_k",
                   "to_v_lora": "to_v", "to_out_lora": "to_out_0"}


@dataclass
class LoraEntry:
    down: np.ndarray  # (r, in) or (r, I, kh, kw)
    up: np.ndarray  # (out, r) or (O, r, 1, 1)
    alpha: Optional[float] = None

    @property
    def rank(self) -> int:
        return self.down.shape[0]

    @property
    def factor(self) -> float:
        return 1.0 if self.alpha is None else self.alpha / self.rank


@dataclass
class LoraWeights:
    """Parsed LoRA: ``{tower: {flat_module_name: LoraEntry}}``.

    ``flat_module_name`` is the kohya-style flattened diffusers module path
    (dots -> underscores, no tower prefix), e.g.
    ``down_blocks_0_attentions_1_transformer_blocks_0_attn2_to_q``.
    """

    towers: Dict[str, Dict[str, LoraEntry]] = field(default_factory=dict)

    def __len__(self) -> int:
        return sum(len(v) for v in self.towers.values())


def _canon_diffusers_module(mod: str) -> str:
    """diffusers module path -> kohya-style flat name."""
    # processor form: `<attn path>.processor.to_q_lora` -> `<attn path>.to_q`
    parts = mod.split(".")
    if len(parts) >= 2 and parts[-2] == "processor":
        parts = parts[:-2] + [_PROCESSOR_LORA.get(parts[-1], parts[-1])]
    return "_".join(parts)


def parse_lora_state(state: Dict[str, np.ndarray]) -> LoraWeights:
    """Group a raw LoRA state dict into per-module (down, up, alpha) entries."""
    towers: Dict[str, Dict[str, LoraEntry]] = {}
    partial: Dict[Tuple[str, str], dict] = {}
    unrecognized = []

    def slot(tower: str, mod: str) -> dict:
        return partial.setdefault((tower, mod), {})

    for key, val in state.items():
        m = re.fullmatch(
            r"(lora_unet|lora_te1|lora_te2|lora_te)_(.+)\.(lora_down\.weight"
            r"|lora_up\.weight|alpha)", key)
        if m:
            tower, mod, leaf = _KOHYA_TOWER[m[1]], m[2], m[3]
            which = {"lora_down.weight": "down", "lora_up.weight": "up",
                     "alpha": "alpha"}[leaf]
            slot(tower, mod)[which] = val
            continue
        m = re.fullmatch(
            r"(?:(unet|text_encoder_2|text_encoder)\.)?(.+?)\."
            r"(lora_A\.weight|lora_B\.weight|lora\.down\.weight"
            r"|lora\.up\.weight|down\.weight|up\.weight)", key)
        if m:
            tower = _DIFFUSERS_TOWER[m[1] or "unet"]
            mod = _canon_diffusers_module(m[2])
            leaf = m[3]
            which = "down" if ("down" in leaf or "lora_A" in leaf) else "up"
            slot(tower, mod)[which] = val
            continue
        unrecognized.append(key)

    if unrecognized:
        warnings.warn(
            f"lora: {len(unrecognized)} unrecognized keys ignored "
            f"(first few: {unrecognized[:4]})"
        )
    for (tower, mod), d in partial.items():
        if "down" not in d or "up" not in d:
            warnings.warn(f"lora: module {tower}/{mod} missing down or up half; skipped")
            continue
        alpha = d.get("alpha")
        towers.setdefault(tower, {})[mod] = LoraEntry(
            down=np.asarray(d["down"], np.float32),
            up=np.asarray(d["up"], np.float32),
            alpha=None if alpha is None else float(np.asarray(alpha)),
        )
    return LoraWeights(towers)


def load_lora_file(path: str) -> LoraWeights:
    """Read + parse a LoRA checkpoint file."""
    return parse_lora_state(read_state_dict(path))


# ---------------------------------------------------------------------------
# merging
# ---------------------------------------------------------------------------


def _delta_for(entry: LoraEntry, target_shape: Tuple[int, ...]) -> np.ndarray:
    """Dense f32 delta in OUR flax layout for the target parameter."""
    down, up = entry.down, entry.up
    if down.ndim == 4 or up.ndim == 4:
        # conv LoRA: down (r, I, kh, kw), up (O, r, 1, 1)  [torch OIHW]
        r = down.shape[0]
        o = up.shape[0]
        delta = np.einsum(
            "or,rihw->oihw", up.reshape(o, r), down.reshape(r, *down.shape[1:])
        )
        delta = np.transpose(delta, (2, 3, 1, 0))  # OIHW -> HWIO
        if len(target_shape) == 2:
            # our param is a Dense where torch had a 1x1 conv
            delta = delta[0, 0]
    else:
        delta = up @ down  # (out, in) torch layout
        if len(target_shape) == 4:
            # our param is a 1x1 Conv where the lora stored linear matrices
            delta = np.transpose(delta)[None, None]  # (1,1,I,O)
        else:
            delta = np.transpose(delta)  # (in, out) flax layout
    if delta.shape != tuple(target_shape):
        raise ValueError(
            f"lora delta shape {delta.shape} does not match target "
            f"{tuple(target_shape)} (rank {entry.rank})"
        )
    return np.float32(entry.factor) * delta


def _flat_key(key_fn, path: Tuple[str, ...], rank: int) -> Optional[str]:
    """Our flax param path -> kohya-style flat module name (sans `.weight`)."""
    key, _tf = key_fn(path, rank)
    if not key.endswith(".weight"):
        return None
    # kohya te names KEEP the text_model prefix — no stripping needed
    return key[: -len(".weight")].replace(".", "_")


def merge_lora_tower(
    params, entries: Dict[str, LoraEntry], key_fn, scale: float,
    saved: Optional[dict] = None,
):
    """Merge one tower's LoRA entries into a param pytree.

    Returns ``(new_params, n_applied, touched)`` where ``touched`` maps the
    flax key-path tuple to the ORIGINAL leaf (for exact unload). If ``saved``
    is given, leaves already present in it are not re-saved (multi-LoRA).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    applied = set()
    touched = {}
    out = []
    for keypath, leaf in flat:
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        path = tuple(p for p in path if p != "params")
        mod = None
        if path and path[-1] == "kernel" and hasattr(leaf, "shape"):
            mod = _flat_key(key_fn, path, len(leaf.shape))
        if mod is None or mod not in entries:
            out.append(leaf)
            continue
        delta = _delta_for(entries[mod], leaf.shape)
        if saved is None or path not in saved:
            touched[path] = leaf
        out.append(
            (leaf.astype(jnp.float32) + scale * delta).astype(leaf.dtype)
        )
        applied.add(mod)
    missing = set(entries) - applied
    if missing:
        warnings.warn(
            f"lora: {len(missing)} modules had no matching parameter "
            f"(first few: {sorted(missing)[:4]})"
        )
    return jax.tree_util.tree_unflatten(treedef, out), len(applied), touched


_TOWER_KEYFN = {"unet": unet_key, "clip": clip_key, "clip2": clip_key}


def merge_lora(
    params: Dict, lora: LoraWeights, scale: float = 1.0,
    saved: Optional[Dict[str, dict]] = None,
) -> Tuple[Dict, int, Dict[str, dict]]:
    """Merge a parsed LoRA into a full pipeline param dict.

    ``params`` is the pipeline's ``{"unet": ..., "clip": ..., ["clip2": ...]}``
    tree. Returns ``(new_params, n_applied, touched)``; ``touched`` holds the
    pre-merge leaves per tower so the pipeline can restore them exactly.
    """
    new_params = dict(params)
    total = 0
    all_touched: Dict[str, dict] = {}
    for tower, entries in lora.towers.items():
        if tower not in params:
            if entries:
                warnings.warn(
                    f"lora: checkpoint has {tower} entries but the pipeline "
                    f"has no {tower} params (wrong model family?); skipped"
                )
            continue
        tree, n, touched = merge_lora_tower(
            params[tower], entries, _TOWER_KEYFN[tower], scale,
            saved=None if saved is None else saved.get(tower),
        )
        new_params[tower] = tree
        total += n
        all_touched[tower] = touched
    return new_params, total, all_touched


def restore_params(params: Dict, saved: Dict[str, dict]) -> Dict:
    """Put back the pre-LoRA leaves recorded by :func:`merge_lora`."""
    out = dict(params)
    for tower, touched in saved.items():
        if not touched:
            continue
        flat, treedef = jax.tree_util.tree_flatten_with_path(out[tower])
        leaves = []
        for keypath, leaf in flat:
            path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
            path = tuple(p for p in path if p != "params")
            leaves.append(touched.get(path, leaf))
        out[tower] = jax.tree_util.tree_unflatten(treedef, leaves)
    return out
