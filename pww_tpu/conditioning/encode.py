"""Prompt + color-context encoding → typed PwW conditioning.

TPU-native replacement for the reference's ``_encode_text_color_inputs``
(reference `paint_with_words/paint_with_words.py:315-388`): the same inputs
produce a :class:`~pww_tpu.types.PwwState` plus cond/uncond text embeddings,
with the rasterization running as one jit'd stage and CFG batched as
``concat([uncond, cond])`` instead of two dicts for two UNet calls.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.weight_functions import AnyWeightFunction, as_weight_function
from ..types import PwwState
from .color_context import Region, separate_image_context, token_match_matrix
from .rasterize import rasterize_pyramid


@dataclasses.dataclass
class EncodedInputs:
    """Everything the denoise loop needs, CFG-batched (row 0 = uncond)."""

    text_states: jnp.ndarray  # (2, T, D): [uncond, cond]
    pww: PwwState  # weights have batch dim 2 with zero uncond rows
    regions: List[Region]
    prompt_ids: List[int]
    width: int
    height: int
    pooled: Optional[jnp.ndarray] = None  # (2, D_pool) SDXL pooled embeds


def _apply_prompt_weights(text_states, tok_w, dual_split_dim):
    """Scale [uncond, cond] hidden states by their per-token multipliers.

    Dual-encoder states are scaled per tower (the concat split at
    ``dual_split_dim``) since each tower tokenized the prompt independently.
    All-ones weight vectors are skipped (bitwise no-op for plain prompts).
    """
    from .prompt_weighting import apply_token_weights

    def scale_row(row, w):
        if w is None or (w == 1.0).all():
            return row
        return apply_token_weights(row, w)

    if dual_split_dim is None:
        rows = [
            scale_row(text_states[0], tok_w.get("1u")),
            scale_row(text_states[1], tok_w.get("1c")),
        ]
        return jnp.stack(rows)
    d = dual_split_dim
    rows = []
    for i, half in (("u", 0), ("c", 1)):
        h1 = scale_row(text_states[half, :, :d], tok_w.get(f"1{i}"))
        h2 = scale_row(text_states[half, :, d:], tok_w.get(f"2{i}"))
        rows.append(jnp.concatenate([h1, h2], axis=-1))
    return jnp.stack(rows)


def _window_ids(tokenizer, text: str, max_len: int):
    """A1111-style long-prompt windows: the untruncated token stream is
    split into ``max_len - 2``-token chunks, each wrapped in BOS/EOS and
    padded — every window is a valid CLIP input; hidden states are
    concatenated along the sequence axis afterwards."""
    raw = tokenizer(text, truncation=False)["input_ids"]
    bos, eos = raw[0], raw[-1]
    inner = raw[1:-1]
    cap = max_len - 2
    n_win = max(1, -(-len(inner) // cap))
    pad = getattr(tokenizer, "pad_token_id", eos)
    wins = []
    for w in range(n_win):
        ids = [bos] + inner[w * cap : (w + 1) * cap] + [eos]
        wins.append(ids + [pad] * (max_len - len(ids)))
    return wins


def encode_text_color_inputs(
    encode_text: Callable[[jnp.ndarray], jnp.ndarray],
    tokenizer,
    color_map: Optional[np.ndarray],  # (H, W, 3) uint8 or None
    color_context: Dict,
    prompt: str,
    negative_prompt: str = "",
    weight_function: Optional[AnyWeightFunction] = None,
    text_cache: Optional[Dict] = None,
    tokenizer_2=None,
    zero_empty_negative: bool = False,  # SDXL force_zeros_for_empty_prompt
    prompt_weighting: bool = False,  # A1111 (word:1.2) emphasis syntax
    clip_skip: int = 0,  # take hidden states k layers early (A1111 n-1)
    long_prompts: bool = False,  # >77-token windowed encoding (A1111 style)
    dual_split_dim: Optional[int] = None,  # tower-1 width of concat XL states
) -> EncodedInputs:
    """Host prologue: parse, tokenize, rasterize, CLIP-encode.

    ``encode_text``: jitted CLIP apply taking (B, 77) int32 ids. For dual-
    encoder models (SDXL) it takes ``(ids, ids2)`` — ``ids2`` tokenized with
    ``tokenizer_2`` — and returns ``(text_states, pooled)``.
    ``text_cache``: optional dict caching CLIP outputs by (prompt, negative)
    — repeated serving prompts skip the text encoder entirely.
    ``prompt_weighting``: interpret A1111 emphasis syntax; the per-token
    multipliers scale the encoder output hidden states (per tower, for dual-
    encoder models — ``dual_split_dim`` gives tower 1's hidden width).
    """
    max_len = tokenizer.model_max_length
    tok_w = {}  # per-(tokenizer, row) weight vectors, keyed "1"/"2" + "u"/"c"
    cond_wins = uncond_wins = None
    if long_prompts:
        if prompt_weighting:
            raise ValueError(
                "long_prompts and prompt_weighting cannot be combined"
            )
        cond_wins = _window_ids(tokenizer, prompt, max_len)
        uncond_wins = _window_ids(tokenizer, negative_prompt, max_len)
        n_win = max(len(cond_wins), len(uncond_wins))
        empty = _window_ids(tokenizer, "", max_len)[0]
        cond_wins += [empty] * (n_win - len(cond_wins))
        uncond_wins += [empty] * (n_win - len(uncond_wins))
        prompt_ids = [t for w in cond_wins for t in w]
        uncond_ids = [t for w in uncond_wins for t in w]
        n_text = n_win * max_len
    elif prompt_weighting:
        from .prompt_weighting import weighted_prompt_ids

        prompt_ids, tok_w["1c"] = weighted_prompt_ids(tokenizer, prompt)
        uncond_ids, tok_w["1u"] = weighted_prompt_ids(
            tokenizer, negative_prompt
        )
        n_text = max_len
    else:
        # padding="max_length": stock transformers tokenizers treat a bare
        # padding=True as pad-to-LONGEST (a no-op for one string), which
        # would yield ragged uncond/prompt id lists; our tokenizer accepts
        # both spellings. Pad explicitly afterwards as a belt-and-braces
        # for minimal tokenizer stand-ins.
        def _padded(text):
            ids = tokenizer(
                text, max_length=max_len, truncation=True,
                padding="max_length",
            )["input_ids"]
            if len(ids) < max_len:
                pad = getattr(tokenizer, "pad_token_id",
                              tokenizer.eos_token_id)
                ids = list(ids) + [pad] * (max_len - len(ids))
            return ids

        prompt_ids = _padded(prompt)
        uncond_ids = _padded(negative_prompt)
        n_text = max_len

    regions, width, height = separate_image_context(
        color_map, dict(color_context), tokenizer
    )
    match = token_match_matrix(regions, prompt_ids, n_text)

    masks = np.stack([r.mask for r in regions])  # (R, H, W)
    blur = np.array(
        [r.blur_sigma if r.blur_sigma else 0.0 for r in regions], np.float32
    )
    has_blur = bool((blur > 0).any())
    pyramid, orig = rasterize_pyramid(
        jnp.asarray(masks),
        jnp.asarray(match),
        jnp.asarray(blur) if has_blur else None,
        height=height,
        width=width,
    )

    # CFG batch: row 0 uncond (zero weights — reference passes int 0), row 1 cond.
    def cfg_pair(x: jnp.ndarray) -> jnp.ndarray:
        z = jnp.zeros_like(x)
        return jnp.stack([z, x])

    weights = {k: cfg_pair(v) for k, v in pyramid.items()}
    weight_orig = cfg_pair(orig)

    cache_key = (
        prompt, negative_prompt, prompt_weighting, clip_skip, long_prompts
    )
    pooled = None
    if text_cache is not None and cache_key in text_cache:
        text_states, pooled = text_cache[cache_key]
    elif long_prompts:
        # encode every window in one CLIP batch, rows
        # [u_0..u_{n-1}, c_0..c_{n-1}], then concatenate the hidden states
        # along the sequence axis. Pooled (XL) comes from the FIRST window.
        n_win = len(cond_wins)
        ids = jnp.asarray(uncond_wins + cond_wins, jnp.int32)
        if tokenizer_2 is not None:
            ml2 = tokenizer_2.model_max_length
            u2 = _window_ids(tokenizer_2, negative_prompt, ml2)
            c2 = _window_ids(tokenizer_2, prompt, ml2)
            e2 = _window_ids(tokenizer_2, "", ml2)[0]
            u2 += [e2] * (n_win - len(u2))
            c2 += [e2] * (n_win - len(c2))
            if len(u2) != n_win or len(c2) != n_win:
                raise ValueError(
                    "tokenizer_2 produced more windows than tokenizer; "
                    "prompt too long for matched dual-tower windowing"
                )
            ids2 = jnp.asarray(u2 + c2, jnp.int32)
            out = encode_text(ids, ids2, **(
                {"clip_skip": clip_skip} if clip_skip else {}
            ))
        else:
            out = encode_text(ids, **(
                {"clip_skip": clip_skip} if clip_skip else {}
            ))
        text_states, pooled = out if isinstance(out, tuple) else (out, None)
        d = text_states.shape[-1]
        text_states = text_states.reshape(2, n_win * text_states.shape[1], d)
        if pooled is not None:
            pooled = jnp.stack([pooled[0], pooled[n_win]])
        if zero_empty_negative and negative_prompt == "" and pooled is not None:
            text_states = text_states.at[0].set(0.0)
            pooled = pooled.at[0].set(0.0)
        if text_cache is not None:
            if len(text_cache) > 256:
                text_cache.pop(next(iter(text_cache)))
            text_cache[cache_key] = (text_states, pooled)
    else:
        ids = jnp.asarray([uncond_ids, prompt_ids], jnp.int32)
        if tokenizer_2 is not None:
            ml2 = tokenizer_2.model_max_length
            if prompt_weighting:
                from .prompt_weighting import weighted_prompt_ids

                c2, tok_w["2c"] = weighted_prompt_ids(tokenizer_2, prompt)
                u2, tok_w["2u"] = weighted_prompt_ids(
                    tokenizer_2, negative_prompt
                )
            else:
                u2 = tokenizer_2(
                    negative_prompt, max_length=ml2, truncation=True,
                    padding="max_length",
                )["input_ids"]
                c2 = tokenizer_2(
                    prompt, max_length=ml2, truncation=True,
                    padding="max_length",
                )["input_ids"]
            ids2 = jnp.asarray([u2, c2], jnp.int32)
            out = encode_text(ids, ids2, **(
                {"clip_skip": clip_skip} if clip_skip else {}
            ))
        else:  # (2, T, D) or ((2,T,D), (2,Dp))
            out = encode_text(ids, **(
                {"clip_skip": clip_skip} if clip_skip else {}
            ))
        text_states, pooled = out if isinstance(out, tuple) else (out, None)
        if prompt_weighting:
            text_states = _apply_prompt_weights(
                text_states, tok_w, dual_split_dim
            )
        if zero_empty_negative and negative_prompt == "" and pooled is not None:
            # SDXL-base default: empty negative prompt -> all-zero uncond
            # text + pooled embeddings (force_zeros_for_empty_prompt=true)
            text_states = text_states.at[0].set(0.0)
            pooled = pooled.at[0].set(0.0)
        if text_cache is not None:
            if len(text_cache) > 256:
                text_cache.pop(next(iter(text_cache)))
            text_cache[cache_key] = (text_states, pooled)

    pww = PwwState(
        weights=weights,
        weight_orig=weight_orig,
        sigma=jnp.float32(0.0),
        weight_fn=as_weight_function(weight_function),
    )
    return EncodedInputs(
        text_states=text_states,
        pww=pww,
        regions=regions,
        prompt_ids=list(prompt_ids),
        width=width,
        height=height,
        pooled=pooled,
    )
