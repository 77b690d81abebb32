"""Flax ControlNet sharing the PwW-biased attention blocks.

The reference integrates ControlNet+PwW only through an external A1111-webui
submodule (reference `.gitmodules:1-3`, `README.md:365-450`, assets in
`contents/cn_pww/`); the extension combines ControlNet conditioning residuals
with the PwW attention bias. Here ControlNet is a first-class model: the
standard ControlNet architecture (UNet encoder copy + zero-initialized
projection convs + a conditioning embedder for the hint image), emitting the
``down_block_residuals`` / ``mid_block_residual`` operands that
:class:`~pww_tpu.models.unet.UNet2DCondition` already accepts. Its
cross-attention takes the same :class:`PwwState`, so region control and
structural control compose inside one compiled step.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import UNetConfig
from ..types import PwwState
from .unet import (
    Downsample,
    ResnetBlock,
    TimestepEmbedding,
    Transformer2D,
    timestep_embedding,
)


class ZeroConv(nn.Module):
    """1x1 conv initialized to zero — ControlNet's 'do nothing at init'."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv",
        )(x)


class ControlNetConditioningEmbedding(nn.Module):
    """Embed the (B, H, W, 3) hint image down to the latent grid."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hint):
        x = nn.Conv(16, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(hint)
        x = nn.silu(x)
        for i, ch in enumerate((16, 32, 96)):
            nxt = (32, 96, 256)[i]
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"blocks_{2*i}")(x)
            x = nn.silu(x)
            x = nn.Conv(
                nxt, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                name=f"blocks_{2*i+1}",
            )(x)
            x = nn.silu(x)
        return ZeroConv(self.out_channels, self.dtype, name="conv_out")(x)


class ControlNet(nn.Module):
    """Returns (down_block_residuals tuple, mid_block_residual)."""

    config: UNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, h, w, C) latents
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        hint: jnp.ndarray,  # (B, 8h, 8w, 3) conditioning image in [0, 1]
        pww: Optional[PwwState] = None,
        conditioning_scale: float = 1.0,
        added_cond: Optional[dict] = None,  # SDXL text_time micro-conditioning
    ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb_dim = cfg.block_out_channels[0] * cfg.time_embed_mult
        temb = TimestepEmbedding(
            temb_dim, self.dtype, name="time_embedding",
        )(t_emb.astype(self.dtype))
        if cfg.addition_embed_type == "text_time":
            if added_cond is None:
                raise ValueError(
                    'text_time ControlNet requires added_cond (SDXL)'
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
        x = x + ControlNetConditioningEmbedding(
            cfg.block_out_channels[0], self.dtype, name="cond_embedding"
        )(hint.astype(self.dtype))

        residuals = [ZeroConv(x.shape[-1], self.dtype, name="zero_conv_0")(x)]
        zc = 1
        for bi, ch in enumerate(cfg.block_out_channels):
            has_attn = cfg.down_block_has_attn[bi]
            for li in range(cfg.layers_per_block):
                x = ResnetBlock(
                    ch, cfg.norm_num_groups, self.dtype,
                    fused_norm=cfg.fused_group_norm,
                    name=f"down_{bi}_resnet_{li}",
                )(x, temb)
                if has_attn:
                    nh, hd = cfg.heads_for(ch)
                    x = Transformer2D(
                        nh, hd, depth=cfg.depth_for(bi),
                        use_flash=cfg.flash_attention,
                        use_fused_cross=cfg.fused_cross_attention,
                        xattn_block_q=cfg.xattn_block_q,
                        flash_min_seq=cfg.flash_min_seq,
                        flash_block=cfg.flash_block,
                        xattn_variant=cfg.xattn_variant,
                        groups=cfg.norm_num_groups,
                        fused_norm=cfg.fused_group_norm,
                        fused_ln=cfg.fused_layer_norm,
                        dtype=self.dtype, name=f"down_{bi}_attn_{li}",
                    )(x, ctx, pww)
                residuals.append(
                    ZeroConv(x.shape[-1], self.dtype, name=f"zero_conv_{zc}")(x)
                )
                zc += 1
            if bi < len(cfg.block_out_channels) - 1:
                x = Downsample(ch, self.dtype, name=f"down_{bi}_downsample")(x)
                residuals.append(
                    ZeroConv(x.shape[-1], self.dtype, name=f"zero_conv_{zc}")(x)
                )
                zc += 1

        ch = cfg.block_out_channels[-1]
        x = ResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                        fused_norm=cfg.fused_group_norm,
                        name="mid_resnet_0")(x, temb)
        nh, hd = cfg.heads_for(ch)
        x = Transformer2D(
            nh, hd, depth=cfg.depth_for(len(cfg.block_out_channels) - 1),
            use_flash=cfg.flash_attention,
            use_fused_cross=cfg.fused_cross_attention,
            xattn_block_q=cfg.xattn_block_q,
            flash_min_seq=cfg.flash_min_seq,
            flash_block=cfg.flash_block,
            xattn_variant=cfg.xattn_variant,
            groups=cfg.norm_num_groups, dtype=self.dtype,
            fused_norm=cfg.fused_group_norm,
            fused_ln=cfg.fused_layer_norm,
            name="mid_attn",
        )(x, ctx, pww)
        x = ResnetBlock(ch, cfg.norm_num_groups, self.dtype,
                        fused_norm=cfg.fused_group_norm,
                        name="mid_resnet_1")(x, temb)
        mid = ZeroConv(ch, self.dtype, name="zero_conv_mid")(x)

        scale = jnp.asarray(conditioning_scale, self.dtype)
        return (
            tuple(r * scale for r in residuals),
            mid * scale,
        )
