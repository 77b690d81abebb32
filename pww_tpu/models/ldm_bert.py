"""Flax LDM-BERT text encoder (original latent-diffusion conditioning).

TPU-native counterpart of the reference converter's LDM-BERT branch
(reference `change_model_path.py:742-792`), which rebuilds diffusers 0.10.0's
``LDMBertModel`` from an original CompVis latent-diffusion checkpoint's
x-transformers text tower and routes it into the plain
``LDMTextToImagePipeline`` (`change_model_path.py:926-937`). PwW itself
conditions on CLIP (reference `paint_with_words/paint_with_words.py:171`);
this encoder exists so original-LDM single files survive conversion with
nothing dropped — the same scope the reference CLI gives it.

Architecture (re-derived from the reference's copy loops rather than any
model source): learned token + absolute position embeddings summed with no
embedding LayerNorm; N pre-LN encoder layers — bidirectional self-attention
whose q/k/v projections map ``d_model → num_heads·head_dim`` WITHOUT bias
(the reference copies only ``.weight`` for q/k/v but weight+bias for the out
projection, `change_model_path.py:743-750`) and whose inner dim is decoupled
from ``d_model`` (8×64=512 vs d_model 1280 at defaults); exact-erf GELU MLP;
a final LayerNorm after the stack. The reference also copies an unused
``to_logits`` head (`change_model_path.py:790`) — kept here behind
``return_logits`` so converted checkpoints round-trip completely.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import LDMBertConfig
from ..ops.attention import merge_heads, pww_attention, split_heads


class LDMBertAttention(nn.Module):
    config: LDMBertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        inner = cfg.inner_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v_proj")(x)
        q, k, v = (split_heads(t, cfg.num_heads) for t in (q, k, v))
        out = merge_heads(pww_attention(q, k, v, causal=False))
        return nn.Dense(cfg.d_model, dtype=self.dtype, name="out_proj")(out)


class LDMBertEncoderLayer(nn.Module):
    config: LDMBertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            name="self_attn_layer_norm",
        )(x)
        x = x + LDMBertAttention(cfg, self.dtype, name="self_attn")(
            h.astype(self.dtype)
        )
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            name="final_layer_norm",
        )(x)
        h = nn.Dense(cfg.ffn_dim, dtype=self.dtype, name="fc1")(
            h.astype(self.dtype)
        )
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.d_model, dtype=self.dtype, name="fc2")(h)
        return x + h


class LDMBertEncoder(nn.Module):
    """Returns the last hidden state, (B, L, d_model).

    ``return_logits=True`` additionally applies the (forward-unused but
    checkpoint-present) ``to_logits`` head and returns
    ``(hidden, (B, L, vocab))`` — used by the converter so every reference-
    converted tensor has a home.
    """

    config: LDMBertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, return_logits: bool = False):
        cfg = self.config
        tok = nn.Embed(
            cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="embed_tokens"
        )(input_ids)
        pos_table = nn.Embed(
            cfg.max_position_embeddings, cfg.d_model, dtype=self.dtype,
            name="embed_positions",
        )
        pos = pos_table(jnp.arange(input_ids.shape[-1])[None, :])
        x = tok + pos
        for i in range(cfg.num_layers):
            x = LDMBertEncoderLayer(cfg, self.dtype, name=f"layers_{i}")(x)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm"
        )(x)
        if return_logits:
            logits = nn.Dense(
                cfg.vocab_size, dtype=self.dtype, name="to_logits"
            )(x.astype(self.dtype))
            return x, logits
        return x
