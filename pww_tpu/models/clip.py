"""Flax CLIP text encoder (SD 1.x text conditioning).

The reference loads ``transformers.CLIPTextModel`` from the HF hub (reference
`paint_with_words/paint_with_words.py:171`); the TPU build owns this layer so
the whole encode step jits. Architecture = CLIP ViT-L/14 text tower: learned
token + position embeddings, pre-LN transformer with causal self-attention and
quick-GELU MLP, final LayerNorm. Output is the full last-hidden-state sequence
(what SD uses as ``encoder_hidden_states``).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import CLIPTextConfig
from ..ops.attention import merge_heads, pww_attention, split_heads


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: Any  # CLIPTextConfig or CLIPVisionConfig (hidden_size/num_heads)
    dtype: Any = jnp.float32
    causal: bool = True  # text tower is causal; the vision tower is not

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        d = cfg.hidden_size
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        q, k, v = (split_heads(t, cfg.num_heads) for t in (q, k, v))
        out = merge_heads(pww_attention(q, k, v, causal=self.causal))
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPMLP(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = quick_gelu(h) if cfg.hidden_act == "quick_gelu" else jax.nn.gelu(h, approximate=False)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)


class CLIPEncoderLayer(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    causal: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm1")(x)
        x = x + CLIPAttention(
            cfg, self.dtype, self.causal, name="self_attn"
        )(h.astype(self.dtype))
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm2")(x)
        x = x + CLIPMLP(cfg, self.dtype, name="mlp")(h.astype(self.dtype))
        return x


class CLIPTextEncoder(nn.Module):
    """Returns the last hidden state, (B, L, hidden_size).

    ``output="penultimate_and_pooled"`` (SDXL conditioning) instead returns
    ``(hidden_states[-2], text_projection(final[eos]))``: the hidden state
    entering the last layer (no final LayerNorm — transformers'
    ``output_hidden_states`` convention) plus the projected pooled embedding
    taken at the argmax token id (the EOS position, CLIP convention).

    ``skip_layers=k`` (A1111 "CLIP skip", diffusers ``clip_skip``): take the
    hidden state ``k`` layers earlier. For ``output="final"`` this is
    ``final_layer_norm(hidden_states[-(k+1)])`` — diffusers
    ``StableDiffusionPipeline.encode_prompt`` semantics (A1111's
    "CLIP skip = n" equals ``skip_layers = n - 1``). For the penultimate
    modes it shifts the capture to ``hidden_states[-(k+2)]``, matching
    diffusers' SDXL ``clip_skip`` handling. The pooled projection always
    uses the full tower.
    """

    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        output: str = "final",
        skip_layers: int = 0,
    ):
        cfg = self.config
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos_table = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        x = tok + pos_table[None, : input_ids.shape[1]].astype(self.dtype)
        if not 0 <= skip_layers < cfg.num_layers:
            raise ValueError(
                f"skip_layers={skip_layers} out of range for "
                f"{cfg.num_layers}-layer tower"
            )
        penultimate = None
        skipped = None  # hidden_states[-(skip_layers+1)], for output="final"
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1 - skip_layers:
                penultimate = x
            x = CLIPEncoderLayer(cfg, self.dtype, name=f"layers_{i}")(x)
            if i == cfg.num_layers - 1 - skip_layers:
                skipped = x
        ln = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="final_layer_norm"
        )
        if output == "final":
            return ln(skipped).astype(self.dtype)
        final = ln(x).astype(self.dtype)  # pooled always uses the full tower
        if output == "penultimate":
            return penultimate
        if output != "penultimate_and_pooled":
            raise ValueError(f"unknown output mode {output!r}")
        if cfg.projection_dim is None:
            raise ValueError(
                "pooled output requires CLIPTextConfig.projection_dim"
            )
        if cfg.eos_token_id is not None and cfg.eos_token_id != 2:
            # first EOS occurrence — robust to added/TI token ids > EOS id
            # (transformers CLIPTextModelWithProjection semantics)
            eos_pos = jnp.argmax(
                (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1
            )
        else:
            # CLIP: EOS = max id. eos_token_id == 2 is the legacy-wrong
            # value shipped in SD/SDXL text-encoder config.json files (id 2
            # never appears in tokenized prompts); transformers special-
            # cases it to this argmax fallback, and so must we, or the
            # pooled embedding is read from position 0 (BOS) on every
            # prompt.
            eos_pos = jnp.argmax(input_ids, axis=-1)
        pooled = final[jnp.arange(final.shape[0]), eos_pos]
        pooled = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype,
            name="text_projection",
        )(pooled)
        return penultimate, pooled
