"""Textual-inversion embedding injection.

Reference recipe (reference TI notebook cells 1-5, `README.md:301-307`): load a
learned embedding ``.bin``, ``tokenizer.add_tokens(placeholder)``, resize the
CLIP embedding matrix, write the embedding row, then run PwW normally. Here the
same happens functionally: a new params pytree with the embedding table
extended — injected *before* jit so the compiled pipeline sees a static vocab.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def read_learned_embedding(path: str) -> Dict[str, np.ndarray]:
    """Read a TI embedding file (diffusers ``{token: vec}`` or A1111
    ``{"string_to_param": {"*": vecs}}`` formats)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        raw = load_file(path)
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
    if "string_to_param" in raw:  # A1111 format
        name = raw.get("name", "<embedding>")
        vecs = raw["string_to_param"]["*"]
        vecs = vecs.detach().numpy() if hasattr(vecs, "detach") else np.asarray(vecs)
        return {name: vecs}
    out = {}
    for k, v in raw.items():
        if hasattr(v, "detach"):
            v = v.detach().float().numpy()
        out[k] = np.asarray(v)
    return out


def load_learned_embed_in_clip(
    path: str,
    clip_params,
    tokenizer,
    token: Optional[str] = None,
) -> Tuple[dict, str]:
    """Inject a learned embedding; returns (new clip params, placeholder token).

    API-parity with the reference notebook's ``load_learned_embed_in_clip``.
    Multi-vector embeddings register ``token``, ``token_1``, … placeholders.
    """
    embeds = read_learned_embedding(path)
    trained_token = list(embeds.keys())[0]
    vecs = embeds[trained_token]
    if vecs.ndim == 1:
        vecs = vecs[None]
    token = token or trained_token

    table = clip_params["params"]["token_embedding"]["embedding"]
    if vecs.shape[-1] != table.shape[-1]:
        raise ValueError(
            f"embedding dim {vecs.shape[-1]} != CLIP hidden {table.shape[-1]}"
        )

    names = [token] + [f"{token}_{i}" for i in range(1, len(vecs))]
    ids = []
    for name in names:
        tokenizer.add_tokens(name)
        ids.append(int(tokenizer.convert_tokens_to_ids(name)))

    # Write each vector at its token's id — NOT a blind append: re-applying
    # an updated embedding for an already-registered placeholder must
    # overwrite the existing rows in place (an append would create orphan
    # rows no token id maps to, silently keeping the stale vectors and
    # growing vocab_size — a recompile — on every call).
    table = jnp.asarray(table)
    new_size = max(table.shape[0], max(ids) + 1)
    new_table = table if new_size == table.shape[0] else jnp.concatenate(
        [table,
         jnp.zeros((new_size - table.shape[0], table.shape[-1]), table.dtype)]
    )
    new_table = new_table.at[jnp.asarray(ids)].set(
        jnp.asarray(vecs, table.dtype)
    )
    new_params = {
        **clip_params,
        "params": {
            **clip_params["params"],
            "token_embedding": {"embedding": new_table},
        },
    }
    return new_params, " ".join(names)


def apply_textual_inversion(pipeline, path: str, token: Optional[str] = None) -> str:
    """Convenience: mutate a :class:`PwwPipeline` in place; returns placeholder.

    The embedding table grows, so the (static-shape) CLIP module and config
    are rebuilt with the new vocab size — flax validates param shapes against
    the module at apply time.
    """
    import dataclasses

    from ..models.clip import CLIPTextEncoder

    new_clip, placeholder = load_learned_embed_in_clip(
        path, pipeline.params["clip"], pipeline.tokenizer, token
    )
    new_vocab = new_clip["params"]["token_embedding"]["embedding"].shape[0]
    clip_cfg = dataclasses.replace(pipeline.config.clip, vocab_size=new_vocab)
    pipeline.config = dataclasses.replace(pipeline.config, clip=clip_cfg)
    pipeline.clip = CLIPTextEncoder(clip_cfg, dtype=pipeline.compute_dtype)
    pipeline.params = {**pipeline.params, "clip": new_clip}
    if hasattr(pipeline, "invalidate_encode_caches"):
        pipeline.invalidate_encode_caches()  # embeddings changed
    return placeholder
