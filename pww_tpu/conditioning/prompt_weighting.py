"""A1111-style prompt attention weighting — ``(word:1.2)``, ``((word))``,
``[word]``.

Beyond-the-reference capability (the reference passes prompts verbatim to
CLIP). Opt-in via ``generate(prompt_weighting=True)`` so default behavior
stays reference-exact: parentheses in a plain prompt are only interpreted
when the caller asks for it.

Semantics follow the de-facto A1111 webui standard (the canonical public
algorithm, like the CLIP BPE itself):

- ``(text)`` multiplies the enclosed tokens' emphasis by 1.1; nesting
  compounds (``((text))`` → 1.21); ``[text]`` divides by 1.1;
  ``(text:1.5)`` sets an explicit multiplier; ``\\(`` escapes a literal
  parenthesis.
- The multipliers scale the CLIP **output** hidden states of the affected
  tokens, then the whole sequence is rescaled so its mean matches the
  unweighted mean (A1111's normalization, which keeps the overall magnitude
  the text encoder was trained for).

The weighted token-id sequence is also what region labels are matched
against, so ``(cat:1.4)`` still matches a ``"cat,0.5"`` color context.
"""
from __future__ import annotations

import re
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

_ATTENTION = re.compile(
    r"\\\(|\\\)|\\\[|\\\]|\\\\|\\|\(|\[|:\s*([+-]?[.\d]+)\s*\)|\)|\]"
    r"|[^\\()\[\]:]+|:"
)

_ROUND_MULT = 1.1
_SQUARE_MULT = 1.0 / 1.1


def parse_prompt_attention(text: str) -> List[List]:
    """``"a (big:1.5) cat"`` → ``[["a ", 1.0], ["big", 1.5], [" cat", 1.0]]``.

    Stack-based parser with the A1111 rules; unbalanced open brackets apply
    their default multiplier to the rest of the prompt.
    """
    res: List[List] = []
    round_stack: List[int] = []
    square_stack: List[int] = []

    def multiply_range(start: int, mult: float) -> None:
        for item in res[start:]:
            item[1] *= mult

    for m in _ATTENTION.finditer(text):
        tok = m.group(0)
        weight = m.group(1)
        if tok.startswith("\\"):
            res.append([tok[1:], 1.0])
        elif tok == "(":
            round_stack.append(len(res))
        elif tok == "[":
            square_stack.append(len(res))
        elif weight is not None and round_stack:
            multiply_range(round_stack.pop(), float(weight))
        elif tok == ")" and round_stack:
            multiply_range(round_stack.pop(), _ROUND_MULT)
        elif tok == "]" and square_stack:
            multiply_range(square_stack.pop(), _SQUARE_MULT)
        else:
            # A1111's re_attention: unmatched ')' / ']' / ':1.5)' sequences
            # fall through as literal text, so malformed prompts tokenize
            # exactly like the webui.
            res.append([tok, 1.0])
    for pos in round_stack:
        multiply_range(pos, _ROUND_MULT)
    for pos in square_stack:
        multiply_range(pos, _SQUARE_MULT)
    if not res:
        return [["", 1.0]]
    # merge adjacent equal-weight fragments
    merged: List[List] = [res[0]]
    for frag, w in res[1:]:
        if w == merged[-1][1]:
            merged[-1][0] += frag
        else:
            merged.append([frag, w])
    return merged


def weighted_prompt_ids(
    tokenizer, text: str
) -> Tuple[List[int], np.ndarray]:
    """Tokenize a weighted prompt → (padded input_ids, per-token weights).

    Fragment tokens are concatenated (specials stripped per fragment),
    truncated to the model length, wrapped in BOS/EOS and padded; BOS/EOS/pad
    positions carry weight 1.0.
    """
    max_len = tokenizer.model_max_length
    body_ids: List[int] = []
    body_w: List[float] = []
    for frag, w in parse_prompt_attention(text):
        ids = tokenizer(frag)["input_ids"]
        ids = [
            i for i in ids
            if i not in (tokenizer.bos_token_id, tokenizer.eos_token_id)
        ]
        # Guard against pad-id leakage from tokenizers that pad by default —
        # but only strip TRAILING pads: OpenCLIP towers pad with id 0, which
        # is also the legitimate non-word-final "!" token ("hey!?" encodes to
        # [..., 0, '?</w>']), so filtering id 0 everywhere would silently
        # drop real tokens and shift every later position.
        pad = getattr(tokenizer, "pad_token_id", None)
        if pad is not None and pad != tokenizer.eos_token_id:
            while ids and ids[-1] == pad:
                ids.pop()
        body_ids.extend(ids)
        body_w.extend([w] * len(ids))
    body_ids = body_ids[: max_len - 2]
    body_w = body_w[: max_len - 2]

    pad_id = getattr(tokenizer, "pad_token_id", tokenizer.eos_token_id)
    ids = [tokenizer.bos_token_id] + body_ids + [tokenizer.eos_token_id]
    ids += [pad_id] * (max_len - len(ids))
    weights = [1.0] + body_w + [1.0]
    weights += [1.0] * (max_len - len(weights))
    return ids, np.asarray(weights, np.float32)


def apply_token_weights(
    states: jnp.ndarray, weights: np.ndarray
) -> jnp.ndarray:
    """Scale one prompt's hidden states (T, D) by per-token weights, then
    restore the pre-scaling mean (A1111 normalization)."""
    x = states.astype(jnp.float32)
    orig_mean = x.mean()
    x = x * jnp.asarray(weights)[:, None]
    x = x * (orig_mean / x.mean())
    return x.astype(states.dtype)
