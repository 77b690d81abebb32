"""Flax UNet2DCondition with first-class paint-with-words bias threading.

Replaces the diffusers ``UNet2DConditionModel`` the reference loads and
monkeypatches (reference `paint_with_words/paint_with_words.py:174-195`).
Architecture matches SD-1.x so converted checkpoints drop in:

  conv_in → [CrossAttnDownBlock2D ×3, DownBlock2D] → mid(CrossAttn) →
  [UpBlock2D, CrossAttnUpBlock2D ×3] → GroupNorm/SiLU/conv_out

TPU-first choices: NHWC layout (XLA's preferred conv layout on TPU), bf16
compute with f32 norms/softmax, the PwW bias delivered as a typed
:class:`~pww_tpu.types.PwwState` operand instead of a patched forward, and
Pallas flash attention for the (bias-free) self-attention sites.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import UNetConfig
from ..ops.attention import merge_heads, pww_attention, split_heads
from ..ops.group_norm import FusedGroupNorm
from ..ops.layer_norm import FusedLayerNorm
from ..ops.weight_functions import CustomWeightFunction
from ..types import PwwState


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal embedding, SD convention (flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, t_emb: jnp.ndarray, cond: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if cond is not None:
            # guidance-scale conditioning (LCM-distilled checkpoints):
            # diffusers TimestepEmbedding.cond_proj — a bias-free projection
            # of the Fourier-embedded guidance weight added to the timestep
            # embedding before the MLP.
            t_emb = t_emb + nn.Dense(
                t_emb.shape[-1], use_bias=False, dtype=self.dtype,
                name="cond_proj",
            )(cond)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(nn.silu(h))


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32
    fused_norm: bool = True
    conv_lowering: str = "xla"  # UNetConfig.conv_lowering

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        from ..ops.conv import Conv2D

        c_in = x.shape[-1]
        h = FusedGroupNorm(
            self.groups, 1e-5, act="silu", out_dtype=self.dtype,
            use_fused=self.fused_norm, name="norm1",
        )(x)
        h = Conv2D(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            lowering=self.conv_lowering, name="conv1",
        )(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = FusedGroupNorm(
            self.groups, 1e-5, act="silu", out_dtype=self.dtype,
            use_fused=self.fused_norm, name="norm2",
        )(h, add=t)
        h = Conv2D(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            lowering=self.conv_lowering, name="conv2",
        )(h)
        if c_in != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class FeedForwardGEGLU(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        hg = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(hg, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(
            h * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(self.dtype)
        )


class CrossAttention(nn.Module):
    """q from hidden states; k,v from (optionally) a context sequence.

    With a :class:`PwwState` and a context, applies the PwW additive logit
    bias exactly as the reference's ``inj_forward`` does (pre-scale add,
    per-sample qk reduction) — but as a plain function argument.
    """

    num_heads: int
    head_dim: int
    use_flash: bool = False
    use_fused_cross: bool = True
    ip_adapter: bool = False  # decoupled image-prompt K/V (IP-Adapter)
    sow_probs: bool = False  # SAG: sow softmax probs (self-attn sites only)
    xattn_block_q: int = 1024  # UNetConfig.xattn_block_q
    flash_min_seq: int = 1024  # UNetConfig.flash_min_seq
    flash_block: int = 1024  # UNetConfig.flash_block
    xattn_variant: str = "fused"  # UNetConfig.xattn_variant
    flash_pad_heads: bool = True  # UNetConfig.flash_pad_heads
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        pww: Optional[PwwState] = None,
        ip=None,  # Optional[IpState]
    ) -> jnp.ndarray:
        inner = self.num_heads * self.head_dim
        is_self = context is None
        ctx = x if is_self else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        q, k, v = (split_heads(t, self.num_heads) for t in (q, k, v))

        bias_w = None
        weight_fn = None
        sigma = None
        if pww is not None and not is_self:
            bias_w = pww.bias_for(x.shape[1])
            weight_fn = pww.weight_fn
            sigma = pww.sigma

        if is_self and self.sow_probs:
            # SAG (Hong et al. 2023): expose the attention distribution so
            # the denoise loop can mask-and-blur the salient regions. Dense
            # formulation — the sown site is the mid block (tiny L).
            scale = 1.0 / math.sqrt(self.head_dim)
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q.astype(jnp.float32),
                k.astype(jnp.float32),
            ) * scale
            probs = jax.nn.softmax(s, axis=-1)
            self.sow("intermediates", "attn_probs", probs)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", probs, v.astype(jnp.float32)
            ).astype(self.dtype)
        elif is_self and self.use_flash and q.shape[2] >= self.flash_min_seq:
            from ..ops.flash_attention import flash_self_attention

            out = flash_self_attention(q, k, v, block=self.flash_block,
                                       pad_heads=self.flash_pad_heads)
        elif (
            bias_w is not None
            and self.use_fused_cross
            and q.shape[2] >= 256
            and not isinstance(weight_fn, CustomWeightFunction)
        ):
            # single-HBM-pass fused kernels: blocked Pallas reduce (per-block
            # QKᵀ partials, scores stay in VMEM) + Pallas bias+softmax+V
            # epilogue
            from ..ops.cross_attention_kernel import (
                fused_pww_cross_attention,
                fused_pww_reduce,
                pww_cross_attention_reduce,
            )

            if self.xattn_variant == "two_pass":
                r = pww_cross_attention_reduce(q, k, weight_fn)
            else:
                r = fused_pww_reduce(
                    q, k, weight_fn, block_q=self.xattn_block_q
                )
            coef = weight_fn.sigma_coef(sigma) * r
            out = fused_pww_cross_attention(
                q, k, v, bias_w, coef, block_q=self.xattn_block_q,
                grid_order="q" if self.xattn_variant == "fused" else "bh",
            )
        else:
            out = pww_attention(
                q, k, v, bias_w=bias_w, weight_fn=weight_fn, sigma=sigma
            )
        if self.ip_adapter and not is_self:
            # IP-Adapter decoupled cross-attention (Ye et al. 2023): a second
            # attention over the image-prompt tokens with separate key/value
            # projections, added to the text branch. The PwW bias stays on
            # the TEXT branch only (region weights are per-text-token).
            if ip is None:
                raise ValueError(
                    "ip_adapter_tokens is set: pass an IpState operand"
                )
            tok = ip.tokens.astype(self.dtype)
            k_ip = nn.Dense(
                inner, use_bias=False, dtype=self.dtype, name="to_k_ip"
            )(tok)
            v_ip = nn.Dense(
                inner, use_bias=False, dtype=self.dtype, name="to_v_ip"
            )(tok)
            out_ip = pww_attention(
                q, split_heads(k_ip, self.num_heads),
                split_heads(v_ip, self.num_heads),
            )
            out = out + ip.scale.astype(self.dtype) * out_ip
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(merge_heads(out))


class TransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    use_flash: bool = False
    use_fused_cross: bool = True
    tome_ratio: float = 0.0  # >0: ToMe merge around attn1 (approximation)
    ip_adapter: bool = False
    sow_probs: bool = False  # SAG: expose attn1 probabilities
    xattn_block_q: int = 1024
    flash_min_seq: int = 1024
    flash_block: int = 1024
    xattn_variant: str = "fused"
    flash_pad_heads: bool = True
    dtype: Any = jnp.float32
    fused_ln: bool = True

    @nn.compact
    def __call__(self, x, context, pww, grid=None, ip=None):
        dim = x.shape[-1]
        h = FusedLayerNorm(1e-5, out_dtype=self.dtype,
                           use_fused=self.fused_ln, name="norm1")(x)
        attn1 = CrossAttention(
            self.num_heads, self.head_dim, self.use_flash,
            sow_probs=self.sow_probs, flash_min_seq=self.flash_min_seq,
            flash_block=self.flash_block,
            flash_pad_heads=self.flash_pad_heads,
            dtype=self.dtype, name="attn1",
        )
        if self.tome_ratio > 0.0 and grid is not None:
            # ToMe (tomesd default policy): merge the most-similar tokens
            # before self-attention, broadcast the outputs back after. The
            # metric is the block input x; attn2 (PwW-biased, per-position)
            # and the MLP run unmerged.
            from ..ops.tome import build_token_merge

            gh, gw = grid
            merge, unmerge, _ = build_token_merge(x, gh, gw, self.tome_ratio)
            x = x + unmerge(attn1(merge(h)))
        else:
            x = x + attn1(h)
        h = FusedLayerNorm(1e-5, out_dtype=self.dtype,
                           use_fused=self.fused_ln, name="norm2")(x)
        x = x + CrossAttention(
            self.num_heads, self.head_dim, self.use_flash,
            use_fused_cross=self.use_fused_cross, ip_adapter=self.ip_adapter,
            xattn_block_q=self.xattn_block_q,
            flash_min_seq=self.flash_min_seq,
            flash_block=self.flash_block,
            xattn_variant=self.xattn_variant,
            dtype=self.dtype, name="attn2",
        )(h, context=context, pww=pww, ip=ip)
        h = FusedLayerNorm(1e-5, out_dtype=self.dtype,
                           use_fused=self.fused_ln, name="norm3")(x)
        x = x + FeedForwardGEGLU(dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """GroupNorm → 1x1 proj → transformer blocks over flattened space → 1x1 proj."""

    num_heads: int
    head_dim: int
    depth: int = 1
    use_flash: bool = False
    use_fused_cross: bool = True
    tome_ratio: float = 0.0
    tome_min_tokens: int = 4096
    ip_adapter: bool = False
    sow_probs: bool = False  # SAG: expose block 0's attn1 probabilities
    xattn_block_q: int = 1024
    flash_min_seq: int = 1024
    flash_block: int = 1024
    xattn_variant: str = "fused"
    flash_pad_heads: bool = True
    groups: int = 32
    dtype: Any = jnp.float32
    fused_norm: bool = True
    fused_ln: bool = True

    @nn.compact
    def __call__(self, x, context, pww, ip=None):
        b, h, w, c = x.shape
        residual = x
        z = FusedGroupNorm(
            self.groups, 1e-6, out_dtype=self.dtype,
            use_fused=self.fused_norm, name="norm",
        )(x)
        z = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(z)
        z = z.reshape(b, h * w, c)
        # ToMe only at the full-resolution sites (tomesd max_downsample=1)
        tome = self.tome_ratio if h * w >= self.tome_min_tokens else 0.0
        for i in range(self.depth):
            z = TransformerBlock(
                self.num_heads, self.head_dim, self.use_flash,
                self.use_fused_cross, tome, self.ip_adapter,
                self.sow_probs and i == 0,
                self.xattn_block_q, self.flash_min_seq,
                self.flash_block, self.xattn_variant,
                self.flash_pad_heads, self.dtype,
                fused_ln=self.fused_ln,
                name=f"blocks_{i}",
            )(z, context, pww, grid=(h, w), ip=ip)
        z = z.reshape(b, h, w, c)
        z = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(z)
        return z + residual


class Downsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.resize import upsample_nearest_2x

        return nn.Conv(
            self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
        )(upsample_nearest_2x(x))


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """FreeU skip-connection spectral modulation (Si et al. 2023,
    ``Fourier_filter``): frequencies inside the centered ``threshold`` box of
    the shifted 2-D spectrum are multiplied by ``scale`` (<1 damps the
    low-frequency component of the skip). NHWC; FFT over the spatial axes."""
    dtype = x.dtype
    xf = jnp.fft.fftshift(
        jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2)), axes=(1, 2)
    )
    h, w = x.shape[1], x.shape[2]
    rows = jnp.arange(h) - h // 2
    cols = jnp.arange(w) - w // 2
    box = (
        (rows >= -threshold) & (rows < threshold)
    )[:, None] & ((cols >= -threshold) & (cols < threshold))[None, :]
    xf = xf * jnp.where(box, scale, 1.0)[None, :, :, None]
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    return jnp.fft.ifftn(xf, axes=(1, 2)).real.astype(dtype)


class UNet2DCondition(nn.Module):
    """SD UNet; ``pww`` carries the paint-with-words bias pyramid."""

    config: UNetConfig
    dtype: Any = jnp.float32

    def _down_block(self, x, bi, ch, temb, ctx, pww, skips, ip=None,
                    intrablock=None):
        cfg = self.config
        has_attn = cfg.down_block_has_attn[bi]
        for li in range(cfg.layers_per_block):
            x = ResnetBlock(
                ch, cfg.norm_num_groups, self.dtype,
                fused_norm=cfg.fused_group_norm,
                conv_lowering=cfg.conv_lowering,
                name=f"down_{bi}_resnet_{li}",
            )(x, temb)
            if has_attn:
                nh, hd = cfg.heads_for(ch)
                x = Transformer2D(
                    nh, hd, depth=cfg.depth_for(bi),
                    use_flash=cfg.flash_attention,
                    use_fused_cross=cfg.fused_cross_attention,
                    tome_ratio=cfg.tome_ratio,
                    tome_min_tokens=cfg.tome_min_tokens,
                    ip_adapter=cfg.ip_adapter_tokens is not None,
                    xattn_block_q=cfg.xattn_block_q,
                    flash_min_seq=cfg.flash_min_seq,
                    flash_block=cfg.flash_block,
                    xattn_variant=cfg.xattn_variant,
                    flash_pad_heads=cfg.flash_pad_heads,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    fused_norm=cfg.fused_group_norm,
                    fused_ln=cfg.fused_layer_norm,
                    name=f"down_{bi}_attn_{li}",
                )(x, ctx, pww, ip=ip)
            if (intrablock is not None and has_attn
                    and li == cfg.layers_per_block - 1):
                # T2I-Adapter feature on an ATTENTION block: added after the
                # last attn, INCLUDED in the skip and fed through the
                # downsampler (diffusers CrossAttnDownBlock2D
                # additional_residuals semantics). Attention-less blocks get
                # theirs added after the whole block — excluded from skips —
                # in the caller (diffusers adds it at the UNet level there).
                x = x + intrablock.astype(x.dtype)
            skips.append(x)
        return x

    def _up_block(self, x, bi, ch, temb, ctx, pww, skips, ip=None):
        cfg = self.config
        has_attn = cfg.up_block_has_attn[bi]
        depth = cfg.depth_for(len(cfg.block_out_channels) - 1 - bi)
        for li in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            if cfg.freeu is not None and bi < 2:
                # FreeU (diffusers apply_freeu semantics): gain on the first
                # half of the backbone channels, low-freq damping on the skip,
                # at the two deepest decoder stages only.
                b1, b2, s1, s2 = cfg.freeu
                b, s = (b1, s1) if bi == 0 else (b2, s2)
                half = x.shape[-1] // 2
                x = jnp.concatenate([x[..., :half] * b, x[..., half:]], axis=-1)
                skip = fourier_filter(skip, threshold=1, scale=s)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock(
                ch, cfg.norm_num_groups, self.dtype,
                fused_norm=cfg.fused_group_norm,
                conv_lowering=cfg.conv_lowering,
                name=f"up_{bi}_resnet_{li}",
            )(x, temb)
            if has_attn:
                nh, hd = cfg.heads_for(ch)
                x = Transformer2D(
                    nh, hd, depth=depth,
                    use_flash=cfg.flash_attention,
                    use_fused_cross=cfg.fused_cross_attention,
                    tome_ratio=cfg.tome_ratio,
                    tome_min_tokens=cfg.tome_min_tokens,
                    ip_adapter=cfg.ip_adapter_tokens is not None,
                    xattn_block_q=cfg.xattn_block_q,
                    flash_min_seq=cfg.flash_min_seq,
                    flash_block=cfg.flash_block,
                    xattn_variant=cfg.xattn_variant,
                    flash_pad_heads=cfg.flash_pad_heads,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    fused_norm=cfg.fused_group_norm,
                    fused_ln=cfg.fused_layer_norm,
                    name=f"up_{bi}_attn_{li}",
                )(x, ctx, pww, ip=ip)
        return x

    def _head(self, x):
        cfg = self.config
        x = FusedGroupNorm(
            cfg.norm_num_groups, 1e-5, act="silu", out_dtype=self.dtype,
            use_fused=cfg.fused_group_norm, name="conv_norm_out",
        )(x)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C_in) NHWC latents
        timesteps: jnp.ndarray,  # (B,) or scalar
        encoder_hidden_states: jnp.ndarray,  # (B, L_text, D_ctx)
        pww: Optional[PwwState] = None,
        down_block_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_residual: Optional[jnp.ndarray] = None,
        down_intrablock_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        cache_mode: Optional[str] = None,  # None | "collect" | "use"
        cached_feature: Optional[jnp.ndarray] = None,
        added_cond: Optional[dict] = None,  # SDXL: {"text_embeds", "time_ids"}
        ip=None,  # Optional[IpState]: IP-Adapter image-prompt tokens
    ) -> jnp.ndarray:
        """Forward pass; optional DeepCache shallow execution.

        DeepCache (Ma et al. 2023) exploits temporal redundancy of the DEEP
        features across adjacent denoise steps: ``cache_mode="collect"`` also
        returns the feature entering the last (full-resolution) up block;
        ``cache_mode="use"`` skips everything between down block 0 and that
        point, substituting ``cached_feature`` — only conv_in, down block 0,
        the last up block, and the head execute.
        """
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb_dim = cfg.block_out_channels[0] * cfg.time_embed_mult
        t_cond = None
        if cfg.time_cond_proj_dim is not None:
            # LCM-distilled models: the guidance scale is an input (folded
            # into the consistency function during distillation), delivered
            # through added_cond like the SDXL micro-conditioning so it
            # threads/shards with the batch.
            if added_cond is None or "timestep_cond" not in added_cond:
                raise ValueError(
                    "time_cond_proj_dim is set: pass added_cond="
                    '{"timestep_cond": (B, time_cond_proj_dim)} '
                    "(the embedded guidance scale)"
                )
            t_cond = added_cond["timestep_cond"].astype(self.dtype)
        temb = TimestepEmbedding(temb_dim, self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype), cond=t_cond
        )
        if cfg.addition_embed_type == "text_time":
            # SDXL micro-conditioning: pooled text embedding + fourier
            # embeddings of (orig_h, orig_w, crop_top, crop_left, tgt_h,
            # tgt_w), concatenated and run through a second TimestepEmbedding
            # MLP, added to the timestep embedding.
            if added_cond is None:
                raise ValueError(
                    'addition_embed_type="text_time" requires added_cond='
                    '{"text_embeds": (B, D_pool), "time_ids": (B, 6)}'
                )
            time_ids = added_cond["time_ids"]
            add_t = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(time_ids.shape[0], -1)
            add_in = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), add_t], axis=-1
            )
            temb = temb + TimestepEmbedding(
                temb_dim, self.dtype, name="add_embedding"
            )(add_in.astype(self.dtype))
        ctx = encoder_hidden_states.astype(self.dtype)

        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(sample.astype(self.dtype))

        n_blocks = len(cfg.block_out_channels)
        rev_channels = list(reversed(cfg.block_out_channels))

        if cache_mode == "use":
            if down_block_residuals is not None or mid_block_residual is not None:
                raise ValueError("DeepCache shallow pass + ControlNet residuals "
                                 "is not supported")
            if cached_feature is None:
                raise ValueError('cache_mode="use" requires cached_feature')
            # shallow pass: down block 0 produces the skips the last up block
            # consumes; the deep trunk is replaced by the cached feature.
            skips = [x]
            self._down_block(
                x, 0, cfg.block_out_channels[0], temb, ctx, pww, skips, ip=ip
            )
            x = cached_feature.astype(self.dtype)
            bi = n_blocks - 1
            x = self._up_block(
                x, bi, rev_channels[bi], temb, ctx, pww, skips, ip=ip
            )
            return self._head(x)

        # ---- down ----
        skips = [x]
        for bi, ch in enumerate(cfg.block_out_channels):
            intra = (None if down_intrablock_residuals is None
                     else down_intrablock_residuals[bi])
            x = self._down_block(
                x, bi, ch, temb, ctx, pww, skips, ip=ip, intrablock=intra,
            )
            if bi < n_blocks - 1:
                x = Downsample(ch, self.dtype, name=f"down_{bi}_downsample")(x)
                skips.append(x)
            if intra is not None and not cfg.down_block_has_attn[bi]:
                # attention-less DownBlock2D: diffusers adds the adapter
                # feature AFTER the block (downsampler included) and it is
                # EXCLUDED from every skip — adding it inside the block
                # would double-count it through the first up-block concat.
                x = x + intra.astype(x.dtype)

        # ---- ControlNet residual injection (additive, diffusers semantics) ----
        if down_block_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_block_residuals)]

        # ---- mid ----
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                        fused_norm=cfg.fused_group_norm,
                conv_lowering=cfg.conv_lowering,
                        name="mid_resnet_0")(x, temb)
        nh, hd = cfg.heads_for(ch)
        x = Transformer2D(
            nh, hd, depth=cfg.depth_for(n_blocks - 1),
            use_flash=cfg.flash_attention,
            use_fused_cross=cfg.fused_cross_attention,
            tome_ratio=cfg.tome_ratio,
            tome_min_tokens=cfg.tome_min_tokens,
            ip_adapter=cfg.ip_adapter_tokens is not None,
            sow_probs=cfg.sow_mid_attn,
            xattn_block_q=cfg.xattn_block_q,
            flash_min_seq=cfg.flash_min_seq,
            flash_block=cfg.flash_block,
            xattn_variant=cfg.xattn_variant,
            flash_pad_heads=cfg.flash_pad_heads,
            groups=cfg.norm_num_groups, dtype=self.dtype,
            fused_norm=cfg.fused_group_norm,
            fused_ln=cfg.fused_layer_norm, name="mid_attn",
        )(x, ctx, pww, ip=ip)
        x = ResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                        fused_norm=cfg.fused_group_norm,
                conv_lowering=cfg.conv_lowering,
                        name="mid_resnet_1")(x, temb)
        if mid_block_residual is not None:
            x = x + mid_block_residual

        # ---- up ----
        cache_feature = None
        for bi, ch in enumerate(rev_channels):
            x = self._up_block(x, bi, ch, temb, ctx, pww, skips, ip=ip)
            if bi < n_blocks - 1:
                x = Upsample(ch, self.dtype, name=f"up_{bi}_upsample")(x)
                if bi == n_blocks - 2:
                    cache_feature = x  # input to the last (full-res) up block

        out = self._head(x)
        if cache_mode == "collect":
            return out, cache_feature
        return out
