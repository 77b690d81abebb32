"""PwwPipeline — the end-to-end paint-with-words pipeline, one compiled scan.

Replaces the reference's four entry points (``paint_with_words``,
``paint_with_words_inpaint`` and the two diffusers-pipeline subclasses,
reference `paint_with_words/paint_with_words.py:391-842`,
`paint_with_words_inpaint.py:137-575`) with a single class whose modes share
one denoise loop. TPU-native structure:

  * prologue (host + jit): tokenize, rasterize bias pyramid, CLIP-encode,
    draw/encode latents;
  * denoise: ``jax.lax.scan`` over steps — cond/uncond batched in ONE UNet
    call (the reference runs two sequential forwards per step, reference
    ``:483-499``), scheduler fully device-side, zero host round-trips;
  * epilogue: VAE decode, uint8 on device, single D2H copy.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SDModelConfig
from ..conditioning.encode import EncodedInputs, encode_text_color_inputs
from ..conditioning.seeding import make_noise, regional_seed_latents
from ..models.clip import CLIPTextEncoder
from ..models.unet import UNet2DCondition
from ..models.vae import AutoencoderKL, sample_from_moments
from ..ops.weight_functions import AnyWeightFunction, as_weight_function
from ..schedulers.schedules import Schedule, make_scheduler
from ..types import PwwState

LATENT_SCALE = 0.18215  # SD-1.x/2.x VAE scaling (reference paint_with_words.py:49,
# 463). SDXL ships 0.13025 — always read VAEConfig.scaling_factor; this
# constant remains only as the historical default.


# --------------------------------------------------------------------------
# Compiled stages (module-level so jit caches persist across pipeline calls;
# flax Modules and Schedule/PwwState static fields hash into the cache key).
# --------------------------------------------------------------------------


def _apply_controlnets(
    controlnet, params, lat, t, text, hints, pww, scales, added_cond, dtype
):
    """Residuals from one or more attached ControlNets, summed.

    ``params``/``hints``/``scales`` may be single values (one net) or
    parallel tuples (diffusers ``MultiControlNetModel`` semantics: each net
    sees its own hint and conditioning scale; down/mid residuals are summed
    before entering the UNet). The tuple length is static, so the loop
    unrolls into one fused program."""
    if not isinstance(params, tuple):
        params, hints, scales = (params,), (hints,), (scales,)
    down = mid = None
    for p, h, s in zip(params, hints, scales):
        d, m = controlnet.apply(
            p, lat, t, text, h.astype(dtype), pww=pww,
            conditioning_scale=s, added_cond=added_cond,
        )
        if down is None:
            down, mid = list(d), m
        else:
            down = [a + b for a, b in zip(down, d)]
            mid = mid + m
    return down, mid


def _cfg_eps_fns(
    unet, unet_params, text_states, n, controlnet, controlnet_params,
    control_hint, controlnet_scale, extra_channels, added_cond=None,
    ip=None, adapter_residuals=None,
):
    """(batched, split) classifier-free-guidance UNet evaluators.

    Each takes ``(lat_in, t, pww_t)`` with ``lat_in`` already in the UNet's
    compute dtype and returns ``(out_uncond, out_text)`` in float32. Shared by
    ``run_denoise`` and ``run_denoise_segment`` so the callback path has the
    exact same CFG semantics as the scan path.
    """
    compute_dtype = unet.dtype

    def unet_eps_batched(lat_in, t, pww_t):
        lat2 = jnp.concatenate([lat_in, lat_in], axis=0)
        down_res = mid_res = None
        if controlnet is not None:
            hint2 = jax.tree.map(
                lambda h: jnp.concatenate([h, h], axis=0), control_hint
            )
            down_res, mid_res = _apply_controlnets(
                controlnet, controlnet_params, lat2, t, text_states,
                hint2, pww_t, controlnet_scale, added_cond, compute_dtype,
            )
        if extra_channels is not None:
            ec = jnp.concatenate([extra_channels] * 2, axis=0)
            lat2 = jnp.concatenate([lat2, ec.astype(compute_dtype)], axis=-1)
        ar2 = None
        if adapter_residuals is not None:
            ar2 = tuple(
                jnp.concatenate([a, a], axis=0) for a in adapter_residuals
            )
        eps = unet.apply(
            unet_params, lat2, t, text_states, pww=pww_t,
            down_block_residuals=down_res, mid_block_residual=mid_res,
            down_intrablock_residuals=ar2,
            added_cond=added_cond, ip=ip,
        )
        return eps[:n].astype(jnp.float32), eps[n:].astype(jnp.float32)

    def unet_eps_split(lat_in, t, pww_t):
        """Two sequential forwards, uncond with NO bias at all — the
        reference's exact semantics (zero weight-fn for the uncond pass,
        `paint_with_words.py:491-499`). Used for custom weight functions
        whose bias need not vanish at w = 0."""
        cond_pww = pww_t.replace(
            weights={k: v[n:] for k, v in pww_t.weights.items()},
            weight_orig=None if pww_t.weight_orig is None
            else pww_t.weight_orig[n:],
        )
        eps = []
        for half, p in ((slice(0, n), None), (slice(n, 2 * n), cond_pww)):
            down_res = mid_res = None
            li = lat_in
            if controlnet is not None:
                down_res, mid_res = _apply_controlnets(
                    controlnet, controlnet_params, li, t, text_states[half],
                    control_hint, p, controlnet_scale,
                    None if added_cond is None
                    else {k: v[half] for k, v in added_cond.items()},
                    compute_dtype,
                )
            if extra_channels is not None:
                li = jnp.concatenate(
                    [li, extra_channels.astype(compute_dtype)], axis=-1
                )
            eps.append(
                unet.apply(
                    unet_params, li, t, text_states[half], pww=p,
                    down_block_residuals=down_res, mid_block_residual=mid_res,
                    down_intrablock_residuals=adapter_residuals,
                    added_cond=None if added_cond is None
                    else {k: v[half] for k, v in added_cond.items()},
                    ip=None if ip is None
                    else ip.replace(tokens=ip.tokens[half]),
                ).astype(jnp.float32)
            )
        return eps[0], eps[1]

    return unet_eps_batched, unet_eps_split



def _fold_step_rng(step_rng, i):
    """Per-step key(s): one key, or a (B, 2) batch of per-sample keys
    (generate_batch's per-request ancestral streams)."""
    if step_rng.ndim == 2:
        return jax.vmap(lambda s: jax.random.fold_in(s, i))(step_rng)
    return jax.random.fold_in(step_rng, i)


def _denoise_scan(
    unet: UNet2DCondition,
    unet_params,
    latents: jnp.ndarray,  # (N, h, w, C)
    text_states: jnp.ndarray,  # (2N, T, D) rows [uncond*N, cond*N]
    pww: PwwState,  # weights batched (2N, ...)
    schedule: Schedule,
    guidance_scale: jnp.ndarray,
    extra_channels: Optional[jnp.ndarray] = None,  # (N, h, w, E) inpaint concat
    controlnet=None,  # static ControlNet module
    controlnet_params=None,
    control_hint: Optional[jnp.ndarray] = None,  # (N, H, W, 3)
    controlnet_scale: jnp.ndarray = 1.0,
    step_rng: Optional[jax.Array] = None,  # ancestral-sampler noise key
    t_start: int = 0,
    cfg_batched: bool = True,
    cache_interval: int = 1,
    added_cond: Optional[dict] = None,  # SDXL (2N-batched text_embeds/time_ids)
    ip=None,  # Optional[IpState] (2N-batched image-prompt tokens)
    t_end: Optional[int] = None,  # exclusive stop step (ensemble-of-denoisers)
    adapter_residuals=None,  # T2I-Adapter features (N-batched tuple)
    sag_scale=None,  # Self-Attention Guidance strength (None = off)
    blend_mask=None,  # (N, h, w, 1) fractional latent mask; 1 = repaint
    blend_init=None,  # (N, h, w, C) scaled init latents (legacy inpaint)
    blend_noise=None,  # (N, h, w, C) the init's noise draw
) -> jnp.ndarray:
    """Full denoise loop as one scan. Returns final latents (N, h, w, C).

    ``blend_mask``/``blend_init``/``blend_noise`` enable legacy masked-blend
    inpainting for standard 4-channel checkpoints (A1111 / diffusers
    ``StableDiffusionInpaintPipelineLegacy`` semantics): before every UNet
    call the unmasked region is reset onto the init image's forward-noised
    trajectory at that step's level, and after the last step it is restored
    exactly — only ``blend_mask`` ≈ 1 pixels are repainted. Fractional mask
    values feather the seam (A1111 ``mask_blur``).

    Latents and scheduler state are carried in float32 (accumulation
    precision); the UNet runs in its own compute dtype (bf16 on TPU).

    ``cache_interval > 1`` enables DeepCache (Ma et al. 2023): every
    ``cache_interval``-th step runs the full UNet and caches the deep-trunk
    feature; the steps in between run only the shallow layers (conv_in, down
    block 0, last up block) against the cached feature. An opt-in
    APPROXIMATION — outputs differ slightly from the exact trajectory.
    """
    n = latents.shape[0]
    latents = latents.astype(jnp.float32)
    compute_dtype = unet.dtype
    unet_eps_batched, unet_eps_split = _cfg_eps_fns(
        unet, unet_params, text_states, n, controlnet, controlnet_params,
        control_hint, controlnet_scale, extra_channels, added_cond, ip,
        adapter_residuals,
    )
    prediction_type = unet.config.prediction_type

    def body(carry, i):
        lat, sch_state = carry
        if blend_mask is not None:
            # legacy masked-blend: pin the unmasked region to the init's
            # forward-diffused trajectory at this step's noise level
            init_t = schedule.add_noise(blend_init, blend_noise, i)
            lat = init_t * (1.0 - blend_mask) + lat * blend_mask
        sigma = schedule.sigma(i)
        t = schedule.timesteps[i]
        lat_in = schedule.scale_model_input(lat, i).astype(compute_dtype)
        fn = unet_eps_batched if cfg_batched else unet_eps_split
        out_uncond, out_text = fn(lat_in, t, pww.with_sigma(sigma))
        # v-prediction (SD-2.x): convert each half to epsilon before CFG
        eps_uncond = schedule.to_epsilon(out_uncond, lat, i, prediction_type)
        eps_text = schedule.to_epsilon(out_text, lat, i, prediction_type)
        eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
        k = None if step_rng is None else _fold_step_rng(step_rng, i)
        lat, sch_state = schedule.step(eps, i, lat, sch_state, rng=k)
        return (lat, sch_state), None

    def body_sag(carry, i):
        # Self-Attention Guidance (Hong et al. 2023; diffusers
        # StableDiffusionSAGPipeline semantics): mask the salient keys of
        # the UNCOND mid-block self-attention, blur the implied x0 there,
        # re-noise, run one extra uncond forward on the degraded latents,
        # and push the prediction AWAY from it.
        lat, sch_state = carry
        sigma = schedule.sigma(i)
        t = schedule.timesteps[i]
        lat_in = schedule.scale_model_input(lat, i).astype(compute_dtype)
        pww_t = pww.with_sigma(sigma)
        lat2 = jnp.concatenate([lat_in, lat_in], axis=0)
        eps2, interm = unet.apply(
            unet_params, lat2, t, text_states, pww=pww_t,
            added_cond=added_cond, ip=ip, mutable=["intermediates"],
        )
        probs = jax.tree_util.tree_leaves(interm)[0]  # (2n, heads, L, L) f32
        out_uncond = eps2[:n].astype(jnp.float32)
        out_text = eps2[n:].astype(jnp.float32)
        eps_uncond = schedule.to_epsilon(out_uncond, lat, i, prediction_type)
        eps_text = schedule.to_epsilon(out_text, lat, i, prediction_type)
        eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)

        # -- mask from the uncond attention: mean over heads, total
        #    attention RECEIVED per key > 1 (diffusers sag_masking)
        mask = probs[:n].mean(axis=1).sum(axis=1) > 1.0  # (n, L)
        h_lat, w_lat = lat.shape[1], lat.shape[2]
        down = 2 ** (len(unet.config.block_out_channels) - 1)
        mh, mw = h_lat // down, w_lat // down
        mask2d = mask.reshape(n, mh, mw).astype(jnp.float32)[..., None]
        mask_up = jax.image.resize(
            mask2d, (n, h_lat, w_lat, 1), method="nearest"
        )
        x0_u = schedule.pred_x0(eps_uncond, lat, i)
        from ..ops.blur import gaussian_blur

        blurred = jnp.moveaxis(
            gaussian_blur(jnp.moveaxis(x0_u, -1, 1), 9, 1.0), 1, -1
        )
        degraded = blurred * mask_up + x0_u * (1.0 - mask_up)
        deg_lat = schedule.add_noise(degraded, eps_uncond, i)
        deg_in = schedule.scale_model_input(deg_lat, i).astype(compute_dtype)
        pww_u = pww_t.replace(
            weights={k2: v[:n] for k2, v in pww_t.weights.items()},
            weight_orig=None if pww_t.weight_orig is None
            else pww_t.weight_orig[:n],
        )
        eps_deg = unet.apply(
            unet_params, deg_in, t, text_states[:n], pww=pww_u,
            added_cond=None if added_cond is None
            else {k2: v[:n] for k2, v in added_cond.items()},
            ip=None if ip is None else ip.replace(tokens=ip.tokens[:n]),
            mutable=["intermediates"],
        )[0].astype(jnp.float32)
        eps_deg = schedule.to_epsilon(eps_deg, deg_lat, i, prediction_type)
        eps = eps + sag_scale * (eps_uncond - eps_deg)
        k = None if step_rng is None else _fold_step_rng(step_rng, i)
        lat, sch_state = schedule.step(eps, i, lat, sch_state, rng=k)
        return (lat, sch_state), None

    if blend_mask is not None and sag_scale is not None:
        raise ValueError("sag_scale is not supported with legacy masked-"
                         "blend inpainting")
    if blend_mask is not None and cache_interval > 1:
        raise ValueError("cache_interval > 1 is not supported with legacy "
                         "masked-blend inpainting")
    if blend_mask is not None and t_end is not None:
        raise ValueError(
            "denoising_end is not supported with legacy masked-blend "
            "inpainting: the final exact restore assumes the trajectory ran "
            "to completion, and a refiner continuation cannot carry the mask"
        )
    if sag_scale is not None:
        if not cfg_batched:
            raise ValueError(
                "sag_scale requires the batched CFG path (no custom weight "
                "functions)"
            )
        if controlnet is not None or adapter_residuals is not None:
            raise ValueError(
                "sag_scale is not supported with ControlNet or T2I-Adapter"
            )
        if extra_channels is not None:
            raise ValueError(
                "sag_scale is not supported with inpainting (9-channel UNets)"
            )
        if cache_interval > 1:
            raise ValueError("sag_scale is not supported with DeepCache")
        sch_state = schedule.init_state(latents.shape, latents.dtype)
        steps = jnp.arange(
            t_start, schedule.num_steps if t_end is None else t_end
        )
        (latents, sch_state), _ = jax.lax.scan(
            body_sag, (latents, sch_state), steps
        )
        return latents, sch_state

    if cache_interval > 1:
        if controlnet is not None:
            raise ValueError("cache_interval > 1 is not supported with ControlNet")
        if adapter_residuals is not None:
            raise ValueError(
                "cache_interval > 1 is not supported with a T2I-Adapter (the "
                "deep-trunk features the cache reuses include the adapter "
                "residuals of the cached step)"
            )
        if not cfg_batched:
            raise ValueError(
                "cache_interval > 1 requires the batched CFG path; custom "
                "weight functions run split CFG and cannot deep-cache"
            )

        def unet_eps_deepcache(lat_in, t, pww_t, feat, full):
            lat2 = jnp.concatenate([lat_in, lat_in], axis=0)
            if extra_channels is not None:
                ec = jnp.concatenate([extra_channels] * 2, axis=0)
                lat2 = jnp.concatenate([lat2, ec.astype(compute_dtype)], axis=-1)

            def run_full(lat2):
                eps, f = unet.apply(
                    unet_params, lat2, t, text_states, pww=pww_t,
                    cache_mode="collect", added_cond=added_cond, ip=ip,
                )
                return eps, f.astype(feat.dtype)

            def run_shallow(lat2):
                eps = unet.apply(
                    unet_params, lat2, t, text_states, pww=pww_t,
                    cache_mode="use", cached_feature=feat,
                    added_cond=added_cond, ip=ip,
                )
                return eps, feat

            eps, f = jax.lax.cond(full, run_full, run_shallow, lat2)
            return eps[:n].astype(jnp.float32), eps[n:].astype(jnp.float32), f

        def body_cached(carry, i):
            lat, sch_state, feat = carry
            sigma = schedule.sigma(i)
            t = schedule.timesteps[i]
            lat_in = schedule.scale_model_input(lat, i).astype(compute_dtype)
            full = ((i - t_start) % cache_interval) == 0
            out_uncond, out_text, feat = unet_eps_deepcache(
                lat_in, t, pww.with_sigma(sigma), feat, full
            )
            eps_uncond = schedule.to_epsilon(out_uncond, lat, i, prediction_type)
            eps_text = schedule.to_epsilon(out_text, lat, i, prediction_type)
            eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
            k = None if step_rng is None else _fold_step_rng(step_rng, i)
            lat, sch_state = schedule.step(eps, i, lat, sch_state, rng=k)
            return (lat, sch_state, feat), None

        feat0 = jnp.zeros(
            (2 * n, latents.shape[1], latents.shape[2],
             unet.config.block_out_channels[1]),
            compute_dtype,
        )
        sch_state = schedule.init_state(latents.shape, latents.dtype)
        steps = jnp.arange(
            t_start, schedule.num_steps if t_end is None else t_end
        )
        (latents, sch_state, _), _ = jax.lax.scan(
            body_cached, (latents, sch_state, feat0), steps
        )
        return latents, sch_state

    sch_state = schedule.init_state(latents.shape, latents.dtype)
    steps = jnp.arange(t_start, schedule.num_steps if t_end is None else t_end)
    (latents, sch_state), _ = jax.lax.scan(body, (latents, sch_state), steps)
    if blend_mask is not None:
        # exact restore: unmasked pixels are the original image's latents
        latents = blend_init * (1.0 - blend_mask) + latents * blend_mask
    return latents, sch_state


run_denoise = functools.partial(
    jax.jit,
    static_argnames=("unet", "controlnet", "t_start", "cfg_batched",
                     "cache_interval", "t_end"),
)(_denoise_scan)


def _decode_uint8(vae: AutoencoderKL, vae_params, latents: jnp.ndarray):
    """Latents → uint8 RGB (reference `_pil_from_latents`, :48-57)."""
    img = vae.apply(
        vae_params, latents / vae.config.scaling_factor,
        method=AutoencoderKL.decode,
    )
    img = jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    return jnp.round(img * 255.0).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("unet", "vae", "controlnet", "t_start", "cfg_batched",
                     "cache_interval", "t_end"),
)
def run_denoise_decode(
    unet,
    unet_params,
    vae,
    vae_params,
    latents,
    text_states,
    pww,
    schedule,
    guidance_scale,
    extra_channels=None,
    controlnet=None,
    controlnet_params=None,
    control_hint=None,
    controlnet_scale=1.0,
    step_rng=None,
    t_start: int = 0,
    cfg_batched: bool = True,
    cache_interval: int = 1,
    added_cond=None,
    ip=None,
    t_end=None,
    adapter_residuals=None,
    sag_scale=None,
    blend_mask=None,
    blend_init=None,
    blend_noise=None,
):
    """Denoise scan + VAE decode + uint8 conversion as ONE compiled program —
    a single device dispatch per image (the separate-stage path pays one
    extra dispatch round-trip, which is pure latency on remote/tunneled
    backends and serving hot paths)."""
    latents, _ = _denoise_scan(
        unet, unet_params, latents, text_states, pww, schedule,
        guidance_scale, extra_channels, controlnet, controlnet_params,
        control_hint, controlnet_scale, step_rng, t_start, cfg_batched,
        cache_interval, added_cond, ip, t_end, adapter_residuals, sag_scale,
        blend_mask, blend_init, blend_noise,
    )
    return _decode_uint8(vae, vae_params, latents)


@functools.partial(
    jax.jit,
    static_argnames=("unet", "controlnet", "seg_len", "cfg_batched"),
)
def run_denoise_segment(
    unet,
    unet_params,
    latents,
    text_states,
    pww,
    schedule,
    guidance_scale,
    sch_state,
    start_index,  # traced device scalar: segment start step
    extra_channels=None,
    controlnet=None,
    controlnet_params=None,
    control_hint=None,
    controlnet_scale=1.0,
    step_rng=None,
    seg_len: int = 1,
    cfg_batched: bool = True,
    added_cond=None,
    ip=None,
    adapter_residuals=None,
    blend_mask=None,
    blend_init=None,
    blend_noise=None,
):
    """A ``seg_len``-step slice of the denoise loop with explicit scheduler
    state — lets the host observe latents between segments (per-step
    ``callback`` support, reference `paint_with_words.py:823-826`). The start
    index is traced, so all equal-length segments share ONE compilation.
    The legacy masked-blend inpaint reset runs per step like the plain
    scan's; the caller applies the FINAL exact restore after the last
    segment (the segment can't know it is last)."""
    n = latents.shape[0]
    latents = latents.astype(jnp.float32)
    compute_dtype = unet.dtype
    unet_eps_batched, unet_eps_split = _cfg_eps_fns(
        unet, unet_params, text_states, n, controlnet, controlnet_params,
        control_hint, controlnet_scale, extra_channels, added_cond, ip,
        adapter_residuals,
    )
    prediction_type = unet.config.prediction_type

    def body(carry, i):
        lat, st = carry
        if blend_mask is not None:
            init_t = schedule.add_noise(blend_init, blend_noise, i)
            lat = init_t * (1.0 - blend_mask) + lat * blend_mask
        lat_in = schedule.scale_model_input(lat, i).astype(compute_dtype)
        fn = unet_eps_batched if cfg_batched else unet_eps_split
        out_uncond, out_text = fn(
            lat_in, schedule.timesteps[i], pww.with_sigma(schedule.sigma(i))
        )
        eps_uncond = schedule.to_epsilon(out_uncond, lat, i, prediction_type)
        eps_text = schedule.to_epsilon(out_text, lat, i, prediction_type)
        eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
        k = None if step_rng is None else _fold_step_rng(step_rng, i)
        lat, st = schedule.step(eps, i, lat, st, rng=k)
        return (lat, st), None

    steps = jnp.arange(seg_len) + start_index
    (latents, sch_state), _ = jax.lax.scan(body, (latents, sch_state), steps)
    return latents, sch_state


run_decode = functools.partial(jax.jit, static_argnames=("vae",))(_decode_uint8)


@functools.partial(jax.jit, static_argnames=("vae",))
def run_encode_image(vae: AutoencoderKL, vae_params, image: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] image → posterior moments (mean used via sample elsewhere)."""
    return vae.apply(vae_params, image, method=AutoencoderKL.encode_moments)


@functools.partial(jax.jit, static_argnames=("adapter",))
def run_t2i_adapter(adapter, adapter_params, hint: jnp.ndarray):
    """Hint image → per-down-block conditioning features (runs once per
    generation; the features are timestep-independent)."""
    return adapter.apply(adapter_params, hint)


@functools.partial(jax.jit, static_argnames=("clip", "skip_layers"))
def run_encode_text(
    clip: CLIPTextEncoder, clip_params, ids: jnp.ndarray,
    skip_layers: int = 0,
) -> jnp.ndarray:
    return clip.apply(clip_params, ids, skip_layers=skip_layers)


@functools.partial(jax.jit, static_argnames=("clip", "clip2", "skip_layers"))
def run_encode_text_xl(
    clip: CLIPTextEncoder, clip2: CLIPTextEncoder,
    clip_params, clip2_params, ids: jnp.ndarray, ids2: jnp.ndarray,
    skip_layers: int = 0,
):
    """SDXL dual-encoder conditioning: penultimate hidden states of both
    towers concatenated (→ 2048-dim context) + the bigG projected pooled
    embedding (diffusers StableDiffusionXLPipeline.encode_prompt semantics)."""
    h1 = clip.apply(clip_params, ids, output="penultimate",
                    skip_layers=skip_layers)
    h2, pooled = clip2.apply(clip2_params, ids2,
                             output="penultimate_and_pooled",
                             skip_layers=skip_layers)
    return jnp.concatenate([h1, h2], axis=-1), pooled


@functools.partial(jax.jit, static_argnames=("clip", "skip_layers"))
def run_encode_text_refiner(
    clip: CLIPTextEncoder, clip_params, ids: jnp.ndarray,
    skip_layers: int = 0,
):
    """SDXL-refiner conditioning: the SINGLE bigG tower's penultimate hidden
    states (1280-dim context) + its projected pooled embedding (diffusers
    StableDiffusionXLImg2ImgPipeline.encode_prompt with one encoder)."""
    return clip.apply(clip_params, ids, output="penultimate_and_pooled",
                      skip_layers=skip_layers)


class PwwPipeline:
    """Stable-Diffusion paint-with-words pipeline (txt2img / img2img / inpaint).

    Compiled sub-programs are cached per (resolution, steps, scheduler,
    weight-function) signature, so serving repeated shapes costs no retraces —
    unlike the reference's Gradio path which reloads every model per request
    (reference `gradio_pww.py:31-45`).
    """

    def __init__(
        self,
        config: SDModelConfig = None,
        params: Optional[Dict] = None,
        tokenizer=None,
        tokenizer_2=None,  # SDXL second tokenizer (defaults to `tokenizer`)
        scheduler: str = "lms",
        compute_dtype=jnp.bfloat16,
        weights_dtype=jnp.bfloat16,
        mesh=None,  # jax.sharding.Mesh with ("dp","tp") axes for multi-chip
        profile: bool = False,  # record per-phase timings in self.timers
        seed: int = 0,
    ):
        self.config = config or SDModelConfig.sd15()
        self.compute_dtype = compute_dtype
        self.unet = UNet2DCondition(self.config.unet, dtype=compute_dtype)
        self.clip = CLIPTextEncoder(self.config.clip, dtype=compute_dtype)
        self.clip2 = (
            CLIPTextEncoder(self.config.clip2, dtype=compute_dtype)
            if self.config.is_xl else None
        )
        self.vae = AutoencoderKL(self.config.vae, dtype=compute_dtype)
        self.scheduler = make_scheduler(scheduler, self.config.scheduler)
        if tokenizer is None:
            from ..tokenizer.clip_bpe import toy_tokenizer

            if self.config.clip.vocab_size > 2048:
                # A full-size CLIP config with the hash-based toy tokenizer
                # would generate without error but match region labels to
                # garbage token ids — make the fallback impossible to miss.
                import warnings

                warnings.warn(
                    "No tokenizer given for a full-size CLIP config "
                    f"(vocab_size={self.config.clip.vocab_size}): falling back "
                    "to the hash-based toy tokenizer, which does NOT produce "
                    "real CLIP token ids — prompts and color-context labels "
                    "will not match the checkpoint's training vocabulary. "
                    "Pass tokenizer=CLIPTokenizer.from_dir(<checkpoint dir>) "
                    "or load via PwwPipeline.from_pretrained().",
                    stacklevel=3,
                )
            tokenizer = toy_tokenizer(self.config.clip.vocab_size)
        self.tokenizer = tokenizer
        self.tokenizer_2 = (
            (tokenizer_2 or tokenizer) if self.config.is_xl else None
        )
        self.controlnet = None
        self.controlnet_params = None
        self._text_cache: Dict = {}
        self._encode_cache: Dict = {}
        import threading

        self._encode_lock = threading.Lock()
        self.profile = profile
        from ..utils.profiling import PhaseTimer

        self.timers = PhaseTimer()
        if params is None:
            params = self.init_params(seed)
        if weights_dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(weights_dtype)
                if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                params,
            )
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.params = params

    # -- construction ---------------------------------------------------------
    def init_params(self, seed: int = 0) -> Dict:
        """Random-init parameter pytrees (bench/test path; no checkpoint)."""
        cfg = self.config
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
        # conv/dense param shapes are spatial-size independent: init tiny.
        h = w = 2 ** (len(cfg.unet.block_out_channels) - 1)
        ids = jnp.zeros((1, cfg.clip.max_position_embeddings), jnp.int32)
        if cfg.xl_refiner:
            clip_p = self.clip.init(k1, ids, output="penultimate_and_pooled")
        else:
            clip_p = self.clip.init(k1, ids)
        ctx = jnp.zeros(
            (1, cfg.clip.max_position_embeddings, cfg.unet.cross_attention_dim),
            jnp.float32,
        )
        lat = jnp.zeros((1, h, w, cfg.unet.in_channels), jnp.float32)
        from ..weights.loader import init_added_cond

        added = init_added_cond(cfg)
        unet_p = self.unet.init(k2, lat, jnp.zeros((1,)), ctx, added_cond=added)
        img = jnp.zeros(
            (1, cfg.vae.scale_factor * 2, cfg.vae.scale_factor * 2,
             cfg.vae.in_channels),
            jnp.float32,
        )
        vae_p = self.vae.init(k3, img)
        params = {"unet": unet_p, "clip": clip_p, "vae": vae_p}
        if cfg.is_xl:
            ids2 = jnp.zeros((1, cfg.clip2.max_position_embeddings), jnp.int32)
            params["clip2"] = self.clip2.init(
                k4, ids2, output="penultimate_and_pooled"
            )
        return params

    @classmethod
    def from_pretrained(
        cls, model_path: str, scheduler: Optional[str] = None, **kwargs
    ) -> "PwwPipeline":
        """Load a converted / diffusers-layout checkpoint directory.

        ``scheduler=None`` (default) restores the checkpoint's recorded
        ``scheduler_type`` (written by :meth:`save_pretrained` and the
        converter CLI's ``--scheduler_type``), falling back to "lms"; an
        explicit value overrides the record."""
        import json as _json
        import os as _os

        from ..weights.loader import load_pipeline_checkpoint

        config, params, tokenizer, tokenizer_2 = load_pipeline_checkpoint(
            model_path
        )
        if scheduler is None:
            scheduler = "lms"
            cj = _os.path.join(model_path, "config.json")
            if _os.path.isdir(model_path) and _os.path.exists(cj):
                try:
                    with open(cj) as f:
                        scheduler = _json.load(f).get("scheduler_type", "lms")
                except (OSError, ValueError):
                    pass
        return cls(
            config=config, params=params, tokenizer=tokenizer,
            tokenizer_2=tokenizer_2, scheduler=scheduler, **kwargs,
        )

    def save_pretrained(self, path: str) -> None:
        """Write the pipeline to ``path`` in the native format
        (params.msgpack + config.json [+ tokenizer assets if real BPE]);
        reloadable via :meth:`from_pretrained`."""
        import dataclasses
        import json
        import os

        import flax.serialization

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(
                jax.tree.map(lambda x: jax.device_get(x), self.params)
            ))
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(
                {"model": dataclasses.asdict(self.config),
                 "scheduler_type": self.scheduler.kind},
                f, indent=2,
            )
        from ..tokenizer.clip_bpe import save_tokenizer_assets

        save_tokenizer_assets(self.tokenizer, os.path.join(path, "tokenizer"))
        if self.tokenizer_2 is not None:
            save_tokenizer_assets(
                self.tokenizer_2, os.path.join(path, "tokenizer_2")
            )

    # -- controlnet ------------------------------------------------------------
    def load_controlnet(self, source=None, params=None, seed: int = 0):
        """Attach a ControlNet stage (BASELINE config #4, reference C19).

        ``source``: a diffusers controlnet checkpoint dir, or None to random-
        init (tests/bench). The ControlNet shares the UNet's config family and
        the PwW-biased attention, so region + structural control compose.
        Replaces any previously attached nets; use :meth:`add_controlnet` to
        stack several (multi-ControlNet).
        """
        from ..models.controlnet import ControlNet

        self.controlnet = ControlNet(self.config.unet, dtype=self.compute_dtype)
        if params is not None:
            self.controlnet_params = params
        elif source is not None:
            from ..weights.loader import load_controlnet_checkpoint

            self.controlnet_params = load_controlnet_checkpoint(
                source, self.config
            )
        else:
            h = w = 2 ** (len(self.config.unet.block_out_channels) - 1)
            sf = self.config.vae.scale_factor
            from ..weights.loader import init_added_cond

            added = init_added_cond(self.config)
            self.controlnet_params = self.controlnet.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, h, w, self.config.unet.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1, self.config.clip.max_position_embeddings,
                           self.config.unet.cross_attention_dim)),
                jnp.zeros((1, h * sf, w * sf, 3)),
                added_cond=added,
            )
        return self

    # -- t2i-adapter -----------------------------------------------------------
    def load_t2i_adapter(
        self, source=None, params=None, in_channels: int = 3,
        channels=None, num_res_blocks: int = 2, seed: int = 0,
    ):
        """Attach a T2I-Adapter (Mou et al. 2023; diffusers ``T2IAdapter``
        full variant). Lighter than ControlNet: the adapter sees only the
        hint image, so its features are computed ONCE per generation outside
        the denoise scan and added after each down block's last layer.

        ``source``: a diffusers adapter checkpoint (``.safetensors``/``.bin``
        path or raw state dict); None random-inits (tests/bench).
        """
        from ..models.t2i_adapter import T2IAdapter, t2i_adapter_key

        channels = tuple(channels or self.config.unet.block_out_channels)
        self.t2i_adapter = T2IAdapter(
            channels=channels, num_res_blocks=num_res_blocks,
            downscale_factor=self.config.vae.scale_factor,
            in_channels=in_channels, dtype=self.compute_dtype,
        )
        sf = self.config.vae.scale_factor
        side = sf * 8
        if params is not None:
            self.t2i_adapter_params = params
        elif source is not None:
            from ..weights.loader import fill_params, t_conv, t_id

            if isinstance(source, dict):
                state = {k: np.asarray(v) for k, v in source.items()}
            else:
                from ..weights.loader import read_state_dict

                state = read_state_dict(source)
            # tolerate both bare and "adapter."-prefixed key layouts
            if not any(k.startswith("adapter.") for k in state):
                state = {f"adapter.{k}": v for k, v in state.items()}

            def key_fn(path, rank):
                k, tf = t2i_adapter_key(path)
                return k, (t_conv if tf == "conv" else t_id)

            shapes = jax.eval_shape(
                self.t2i_adapter.init, jax.random.PRNGKey(0),
                jnp.zeros((1, side, side, in_channels)),
            )
            self.t2i_adapter_params = fill_params(
                shapes, state, key_fn, name="t2i_adapter"
            )
        else:
            self.t2i_adapter_params = self.t2i_adapter.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, side, side, in_channels)),
            )
        return self

    def add_controlnet(self, source=None, params=None, seed: int = 1):
        """Stack an ADDITIONAL ControlNet (multi-ControlNet, diffusers
        ``MultiControlNetModel`` semantics): each attached net gets its own
        ``control_image`` and ``controlnet_conditioning_scale`` entry at
        ``generate(...)`` time and the residuals are summed. All nets must
        share the pipeline's model family (same architecture)."""
        if getattr(self, "controlnet", None) is None:
            return self.load_controlnet(source=source, params=params, seed=seed)
        prev = self.controlnet_params
        prev = list(prev) if isinstance(prev, list) else [prev]
        self.load_controlnet(source=source, params=params, seed=seed)
        self.controlnet_params = prev + [self.controlnet_params]
        return self

    # -- lora ------------------------------------------------------------------
    def load_lora(self, source, scale: float = 1.0) -> int:
        """Merge a LoRA checkpoint into the pipeline weights (pre-jit).

        ``source``: a ``.safetensors``/``.bin`` path, a raw state dict, or a
        parsed :class:`~pww_tpu.weights.lora.LoraWeights`. kohya-ss/A1111 and
        diffusers/peft key formats are both accepted. The low-rank update is
        merged into the parameter pytree — the compiled denoise program is
        unchanged, so LoRA costs zero at runtime. Call repeatedly to stack
        adapters with independent scales. Returns the number of modules
        applied; :meth:`unload_loras` restores the pristine weights exactly.
        """
        from ..weights.lora import (LoraWeights, load_lora_file, merge_lora,
                                    parse_lora_state)

        if isinstance(source, str):
            lora = load_lora_file(source)
        elif isinstance(source, LoraWeights):
            lora = source
        else:
            lora = parse_lora_state(source)
        if not hasattr(self, "_lora_saved"):
            self._lora_saved: Dict = {}
        params, n, touched = merge_lora(
            self.params, lora, scale=scale, saved=self._lora_saved
        )
        for tower, leaves in touched.items():
            self._lora_saved.setdefault(tower, {}).update(leaves)
        if self.mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, self.mesh)
        self.params = params
        if any(t in touched and touched[t] for t in ("clip", "clip2")):
            self.invalidate_encode_caches()  # text-encoder weights changed
        return n

    # -- ip-adapter ------------------------------------------------------------
    def load_ip_adapter(
        self,
        source=None,
        image_encoder=None,  # dir path | (CLIPVisionEncoder, params, cfg)
        num_tokens: int = 4,
        scale: float = 1.0,
        image_embed_dim: int = 1024,  # OpenCLIP ViT-H projection (no ckpt)
        seed: int = 0,
    ):
        """Attach an IP-Adapter (image-prompt conditioning, Ye et al. 2023).

        ``source``: an ``ip-adapter*.bin``/``.safetensors`` path, a raw state
        dict, a parsed ``(image_proj, sites)`` pair, or None to random-init
        the adapter (tests/bench). The UNet gains decoupled ``to_k_ip`` /
        ``to_v_ip`` projections at every cross-attention site; PwW region
        bias keeps acting on the text branch, so region control and image
        prompts compose. ``image_encoder``: a CLIP vision checkpoint dir (or
        preloaded triple) for encoding reference images; omit it to pass
        precomputed ``image_embeds`` to ``generate`` instead.
        """
        import dataclasses

        from ..models.clip_vision import CLIPVisionEncoder, ImageProjection
        from ..types import IpState
        from ..weights import ip_adapter as ipw
        from ..weights.loader import init_added_cond

        cfg = self.config
        proj_state = sites_state = None
        plus = False
        rcfg = None
        if source is not None:
            if isinstance(source, str):
                proj_state, sites_state = ipw.load_ip_adapter_file(source)
            elif isinstance(source, tuple):
                proj_state, sites_state = source
            else:
                proj_state, sites_state = ipw.parse_ip_adapter_state(source)
            plus = ipw.is_plus_format(proj_state)
            if plus:
                # IP-Adapter-plus: perceiver resampler over the encoder's
                # penultimate patch tokens
                rcfg = ipw.resampler_config(proj_state)
                if rcfg["output_dim"] != cfg.unet.cross_attention_dim:
                    raise ValueError(
                        f"ip-adapter-plus output dim {rcfg['output_dim']} != "
                        f"cross_attention_dim {cfg.unet.cross_attention_dim}"
                    )
                num_tokens = rcfg["num_queries"]
                image_embed_dim = proj_state["proj_in.weight"].shape[1]
            else:
                num_tokens = ipw.num_tokens_from_proj(
                    proj_state, cfg.unet.cross_attention_dim
                )
                image_embed_dim = proj_state["proj.weight"].shape[1]

        unet_cfg = dataclasses.replace(
            cfg.unet, ip_adapter_tokens=num_tokens
        )
        new_unet = UNet2DCondition(unet_cfg, dtype=self.compute_dtype)
        h = w = 2 ** (len(cfg.unet.block_out_channels) - 1)
        dummy_ip = IpState(
            tokens=jnp.zeros((1, num_tokens, cfg.unet.cross_attention_dim)),
            scale=jnp.float32(1.0),
        )
        init_args = (
            jax.random.PRNGKey(seed),
            jnp.zeros((1, h, w, cfg.unet.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, cfg.clip.max_position_embeddings,
                       cfg.unet.cross_attention_dim)),
        )
        init_kwargs = dict(added_cond=init_added_cond(cfg), ip=dummy_ip)
        if sites_state is not None:
            ip_shapes = jax.eval_shape(
                new_unet.init, *init_args, **init_kwargs
            )
            unet_params = ipw.install_ip_adapter(
                self.params["unet"], ip_shapes, unet_cfg, sites_state,
            )
        else:
            rand = new_unet.init(*init_args, **init_kwargs)
            old_flat = {
                tuple(str(getattr(p, "key", p)) for p in kp): leaf
                for kp, leaf in
                jax.tree_util.tree_flatten_with_path(self.params["unet"])[0]
            }
            flat, treedef = jax.tree_util.tree_flatten_with_path(rand)
            unet_params = jax.tree_util.tree_unflatten(
                treedef,
                [
                    old_flat.get(
                        tuple(str(getattr(p, "key", p)) for p in kp), leaf
                    )
                    for kp, leaf in flat
                ],
            )

        if plus:
            from ..models.clip_vision import Resampler

            proj_module = Resampler(**rcfg, dtype=self.compute_dtype)
            proj_params = ipw.resampler_params(proj_state)
        else:
            proj_module = ImageProjection(
                cfg.unet.cross_attention_dim, num_tokens,
                dtype=self.compute_dtype,
            )
            if proj_state is not None:
                proj_params = ipw.image_proj_params(proj_state)
            else:
                proj_params = proj_module.init(
                    jax.random.PRNGKey(seed + 1),
                    jnp.zeros((1, image_embed_dim)),
                )

        enc_triple = None
        if isinstance(image_encoder, str):
            vcfg, enc_params = ipw.load_image_encoder(image_encoder)
            enc_triple = (
                CLIPVisionEncoder(vcfg, dtype=self.compute_dtype),
                enc_params, vcfg,
            )
        elif image_encoder is not None:
            enc_triple = tuple(image_encoder)

        if self.mesh is not None:
            from ..parallel.mesh import shard_params

            unet_params = shard_params(unet_params, self.mesh)
        self.unet = new_unet
        self.config = dataclasses.replace(cfg, unet=unet_cfg)
        self.params = {**self.params, "unet": unet_params}
        self._ip = {
            "proj": proj_module, "proj_params": proj_params,
            "num_tokens": num_tokens, "scale": scale,
            "image_encoder": enc_triple, "embed_dim": image_embed_dim,
            "plus": plus,
        }
        return self

    def _ip_state(self, image, n: int, scale=None):
        """Build the (2N-batched) IpState: cond rows from the reference
        image's CLIP embedding, uncond rows from the zero embedding (the
        IP-Adapter reference's unconditional image input)."""
        from ..types import IpState

        d = self._ip
        plus = d.get("plus", False)

        def encode(img_or_zeros):
            from ..models.clip_vision import preprocess_clip_image

            enc, enc_params, vcfg = d["image_encoder"]
            px = (
                jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
                if img_or_zeros is None
                else preprocess_clip_image(img_or_zeros, vcfg.image_size)
            )
            if plus:
                # plus variant consumes the penultimate patch tokens; the
                # unconditional input is the ZERO IMAGE through the encoder
                # (tencent-ailab IPAdapterPlus semantics)
                feats, _ = enc.apply(enc_params, px, output="hidden_and_pooled")
                return feats
            return enc.apply(enc_params, px)

        # Precomputed embeddings are (1, D) (standard) / (1, L, D) (plus)
        # float arrays whose last dim is the image-encoder embed width. An
        # (H, W, 3) raw image also has ndim 3, so ndim alone cannot
        # distinguish it from plus-variant patch features — require the
        # leading batch dim, the embed width, and a float dtype before
        # bypassing the CLIP encoder.
        def _is_precomputed(x):
            nd = getattr(x, "ndim", None)
            if nd != (3 if plus else 2):
                return False
            if x.shape[0] != 1 or x.shape[-1] != d["embed_dim"]:
                return False
            # jnp.issubdtype (not np.): bfloat16 embeddings — the default
            # compute dtype — must classify as floating, and dtype inspection
            # must not force a device-to-host fetch.
            dt = getattr(x, "dtype", None)
            return dt is not None and jnp.issubdtype(dt, jnp.floating)

        precomputed = hasattr(image, "ndim") and _is_precomputed(image)
        if precomputed:
            emb = jnp.asarray(image)
            emb_uncond = jnp.zeros_like(emb) if not plus else None
            if plus:
                emb_uncond = (
                    encode(None) if d["image_encoder"] is not None
                    else jnp.zeros_like(emb)
                )
        elif image is None and d["image_encoder"] is None:
            if plus:
                emb = jnp.zeros((1, 1, d["embed_dim"]))
            else:
                emb = jnp.zeros((1, d["embed_dim"]))
            emb_uncond = emb
        elif d["image_encoder"] is None:
            raise ValueError(
                "no image encoder attached: load_ip_adapter(..., "
                "image_encoder=<dir>) or pass precomputed image embeddings "
                "((1, D) standard / (1, L, D) plus)"
            )
        else:
            emb = encode(image)
            emb_uncond = encode(None) if plus else jnp.zeros_like(emb)
        proj = d["proj"]
        cond = proj.apply(d["proj_params"], emb.astype(jnp.float32))
        uncond = proj.apply(d["proj_params"], emb_uncond.astype(jnp.float32))
        tokens = jnp.concatenate(
            [jnp.repeat(uncond, n, 0), jnp.repeat(cond, n, 0)]
        )
        return IpState(
            tokens=tokens,
            scale=jnp.float32(d["scale"] if scale is None else scale),
        )

    def unload_loras(self) -> None:
        """Restore the exact pre-LoRA weights saved by :meth:`load_lora`."""
        saved = getattr(self, "_lora_saved", None)
        if not saved:
            return
        from ..weights.lora import restore_params

        params = restore_params(self.params, saved)
        if self.mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, self.mesh)
        self.params = params
        self._lora_saved = {}
        self.invalidate_encode_caches()

    def _unet_for(
        self, tome_ratio: float, freeu=None, sow_mid_attn: bool = False
    ) -> UNet2DCondition:
        """The UNet module for per-call ToMe ratio / FreeU params (defaults =
        ``self.unet``).

        Modules are lightweight config holders — a distinct ratio just keys a
        distinct compiled program in the jit cache, exactly like DeepCache's
        ``cache_interval`` static arg.
        """
        if freeu is True:
            # published per-family defaults (FreeU README): (b1, b2, s1, s2)
            freeu = (
                (1.3, 1.4, 0.9, 0.2) if self.config.is_xl
                else (1.5, 1.6, 0.9, 0.2)
            )
        elif freeu is not None:
            freeu = tuple(float(v) for v in freeu)
            if len(freeu) != 4:
                raise ValueError("freeu must be (b1, b2, s1, s2) or True")
        if not tome_ratio and freeu is None and not sow_mid_attn:
            return self.unet
        import dataclasses

        cfg = dataclasses.replace(
            self.config.unet, tome_ratio=float(tome_ratio), freeu=freeu,
            sow_mid_attn=sow_mid_attn,
        )
        return UNet2DCondition(cfg, dtype=self.compute_dtype)

    # -- stages ----------------------------------------------------------------
    def encode_text(
        self,
        ids: jnp.ndarray,
        ids2: Optional[jnp.ndarray] = None,
        clip_skip: int = 0,
    ):
        if self.config.xl_refiner:
            return run_encode_text_refiner(
                self.clip, self.params["clip"], ids, skip_layers=clip_skip
            )
        if self.clip2 is None:
            return run_encode_text(
                self.clip, self.params["clip"], ids, skip_layers=clip_skip
            )
        if ids2 is None:
            ids2 = ids
        return run_encode_text_xl(
            self.clip, self.clip2, self.params["clip"], self.params["clip2"],
            ids, ids2, skip_layers=clip_skip,
        )

    def invalidate_encode_caches(self) -> None:
        """Drop cached text states / encode prologues after an encoder
        weight change (LoRA, TI, ``update_params``). Takes ``_encode_lock``
        so a concurrently running encode (Batcher worker) finishes — and
        inserts its now-stale entry — BEFORE the clear, instead of after it
        (which would serve pre-update conditioning forever)."""
        with self._encode_lock:
            self._text_cache.clear()
            self._encode_cache.clear()

    def _encode_cache_key(
        self, prompt, color_map, color_context, negative_prompt,
        weight_function, prompt_weighting, clip_skip, long_prompts,
    ):
        """Hashable key for one encode prologue; None disables caching."""
        try:
            import hashlib

            cm_key = None
            if color_map is not None:
                arr = np.ascontiguousarray(color_map)
                cm_key = (arr.shape, str(arr.dtype),
                          hashlib.sha1(arr.tobytes()).hexdigest())
            ctx_key = tuple(
                sorted((repr(k), str(v))
                       for k, v in (color_context or {}).items())
            )
            # The weight function participates by OBJECT, not repr():
            # structured WeightFunctions are frozen dataclasses (value
            # hash/eq); raw callables and CustomWeightFunction hash by
            # identity, and keeping the object alive inside the stored key
            # prevents CPython id() reuse from ever aliasing a dead lambda's
            # cache entry to a new, different one.
            key = (prompt, negative_prompt, cm_key, ctx_key,
                   weight_function, bool(prompt_weighting),
                   int(clip_skip), bool(long_prompts))
            hash(key)  # exotic unhashable callables -> skip the cache
            return key
        except Exception:  # unhashable exotic inputs -> just skip the cache
            return None

    def encode_inputs(
        self,
        prompt: str,
        color_map: Optional[np.ndarray],
        color_context: Dict,
        negative_prompt: str = "",
        weight_function: Optional[AnyWeightFunction] = None,
        prompt_weighting: bool = False,
        clip_skip: int = 0,
        long_prompts: bool = False,
    ) -> EncodedInputs:
        # Device-side encode cache: the bias pyramid + masks are a ~2 MB
        # host→device upload per call — ~60 ms over the remote-chip tunnel —
        # and identical across seed sweeps / repeated serving requests
        # (exactly the reference's multi-sample gradio workflow,
        # `gradio_pww.py:31-45`). EncodedInputs is treated as immutable
        # downstream. Invalidated with _text_cache whenever encoder weights
        # change (TI/LoRA).
        import warnings as _warnings

        key = self._encode_cache_key(
            prompt, color_map, color_context, negative_prompt,
            weight_function, prompt_weighting, clip_skip, long_prompts,
        )
        # One lock serializes the whole encode: it guards the cache dict
        # (the Batcher worker and user threads encode concurrently) AND the
        # catch_warnings block, which swaps process-global warning filters
        # and is not thread-safe on its own.
        with self._encode_lock:
            if key is not None and key in self._encode_cache:
                enc, warns = self._encode_cache.pop(key)
                self._encode_cache[key] = (enc, warns)  # LRU: refresh recency
            else:
                with _warnings.catch_warnings(record=True) as rec:
                    _warnings.simplefilter("always")
                    enc = self._encode_inputs_uncached(
                        prompt, color_map, color_context, negative_prompt,
                        weight_function, prompt_weighting, clip_skip,
                        long_prompts,
                    )
                warns = [(str(r.message), r.category) for r in rec]
                if key is not None:
                    if len(self._encode_cache) >= 32:  # drop least-recent
                        self._encode_cache.pop(next(iter(self._encode_cache)))
                    self._encode_cache[key] = (enc, warns)
        for msg, cat in warns:  # reference warns on EVERY call
            _warnings.warn(msg, cat, stacklevel=2)
        return enc

    def _encode_inputs_uncached(
        self,
        prompt: str,
        color_map: Optional[np.ndarray],
        color_context: Dict,
        negative_prompt: str = "",
        weight_function: Optional[AnyWeightFunction] = None,
        prompt_weighting: bool = False,
        clip_skip: int = 0,
        long_prompts: bool = False,
    ) -> EncodedInputs:
        return encode_text_color_inputs(
            self.encode_text,
            self.tokenizer,
            color_map,
            color_context,
            prompt,
            negative_prompt,
            weight_function,
            text_cache=self._text_cache,
            tokenizer_2=self.tokenizer_2,
            zero_empty_negative=(
                self.config.needs_pooled
                and self.config.force_zeros_for_empty_prompt
            ),
            prompt_weighting=prompt_weighting,
            clip_skip=clip_skip,
            long_prompts=long_prompts,
            dual_split_dim=(
                self.config.clip.hidden_size if self.config.is_xl else None
            ),
        )

    def _tile_cfg(self, enc: EncodedInputs, n: int):
        """(2, ...) CFG pair → (2N, ...) rows [uncond*N, cond*N]."""
        if n == 1:
            return enc.text_states, enc.pww, enc.pooled

        def tile(x):
            return jnp.concatenate(
                [jnp.repeat(x[:1], n, 0), jnp.repeat(x[1:], n, 0)], axis=0
            )

        pww = enc.pww.replace(
            weights={k: tile(v) for k, v in enc.pww.weights.items()},
            weight_orig=None
            if enc.pww.weight_orig is None
            else tile(enc.pww.weight_orig),
        )
        pooled = None if enc.pooled is None else tile(enc.pooled)
        return tile(enc.text_states), pww, pooled

    # -- generation --------------------------------------------------------------
    def generate(
        self,
        prompt: str = "",
        color_map_image=None,  # PIL.Image | (H,W,3) uint8 array | None
        color_context: Optional[Dict] = None,
        num_inference_steps: int = 30,
        guidance_scale: float = 7.5,
        seed: int = 0,
        weight_function: Optional[AnyWeightFunction] = None,
        negative_prompt: str = "",
        init_image=None,  # img2img when set
        init_latents=None,  # img2img from scaled latents (skips VAE encode)
        denoising_end=None,  # run only the first fraction of the trajectory
        denoising_start=None,  # resume a trajectory at this fraction
        strength: float = 0.5,
        mask_image=None,  # inpaint when set (with init_image)
        mask_blur: float = 0.0,  # gaussian sigma (px) feathering the mask
        masked_content: str = "original",  # A1111: original | fill |
        #   latent_noise | latent_nothing (latent_* need a 4-ch checkpoint)
        inpaint_full_res: bool = False,  # A1111 "inpaint area: only masked"
        inpaint_full_res_padding: int = 32,  # context px around the mask
        control_image=None,  # ControlNet hint (requires load_controlnet first)
        controlnet_conditioning_scale: float = 1.0,
        adapter_image=None,  # T2I-Adapter hint (requires load_t2i_adapter)
        adapter_conditioning_scale: float = 1.0,
        callback=None,  # callback(step_index, timestep, latents) every callback_steps
        callback_steps: int = 1,
        num_samples: int = 1,
        noise_mode: str = "jax",
        vae_sample_mode: str = "sample",  # "mean" = deterministic posterior
        output_type: str = "pil",
        latents: Optional[jnp.ndarray] = None,  # pre-drawn initial noise
        return_latents: bool = False,
        sharding: str = "batch",  # "batch" (dp over samples) | "spatial"
        rng: Optional[jax.Array] = None,
        cache_interval: int = 1,  # DeepCache: >1 = opt-in approximation
        tome_ratio: float = 0.0,  # ToMe token merging: >0 = opt-in approx
        freeu=None,  # FreeU: True (family defaults) or (b1, b2, s1, s2)
        sag_scale: float = 0.0,  # Self-Attention Guidance strength (0 = off)
        original_size: Optional[Tuple[int, int]] = None,  # SDXL micro-cond
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        aesthetic_score: float = 6.0,  # SDXL-refiner micro-conditioning
        negative_aesthetic_score: float = 2.5,
        prompt_weighting: bool = False,  # A1111 (word:1.2) emphasis syntax
        clip_skip: int = 0,  # text states k layers early (A1111 skip = k+1)
        long_prompts: bool = False,  # >77-token windowed prompts (A1111)
        prompt_editing: bool = False,  # [from:to:when] / [a|b] schedules
        ip_adapter_image=None,  # reference image (needs load_ip_adapter)
        ip_adapter_scale: Optional[float] = None,
    ):
        """Unified txt2img / img2img / inpaint entry point.

        Mirrors the reference kwargs (`paint_with_words.py:391-413`); the
        functional facades in :mod:`pww_tpu.pipeline.facade` preserve the
        exact reference signatures on top of this.
        """
        cfg = self.config
        unet = self._unet_for(tome_ratio, freeu, sow_mid_attn=sag_scale > 0)
        color_map = _to_numpy_image(color_map_image)
        ifr_state = None
        if inpaint_full_res:
            # A1111 "inpaint area: only masked": crop the mask's padded,
            # aspect-matched bounding box, inpaint the crop AT THE FULL
            # processing resolution (same shapes → the compiled program is
            # reused), then downscale and paste back, blended by the
            # feathered mask. Beyond-reference surface.
            if mask_image is None or init_image is None:
                raise ValueError(
                    "inpaint_full_res requires init_image and mask_image"
                )
            if return_latents:
                raise ValueError(
                    "inpaint_full_res pastes decoded pixels back into the "
                    "init image; return_latents is unsupported"
                )
            from PIL import Image as _PILImage

            from .inpaint import blur_mask, expand_crop_region

            init_np = _to_numpy_image(init_image)  # (H, W, 3) uint8
            fh, fw = init_np.shape[:2]
            mask_np = self._prepare_pixel_mask(mask_image, init_np[None], 0.0)
            # blur ONCE at native resolution (feathers both the in-crop
            # blend and the final paste), then hand the inner pass the
            # already-feathered mask
            mask_full = blur_mask(mask_np, float(mask_blur))
            mask_blur = 0.0
            # The crop region expands from the BLURRED mask's support (as
            # A1111 does): a feather wider than the padding must still land
            # inside the crop, or the paste-back blend would cut it off at
            # the region edge with a visible seam.
            x0, y0, x1, y1 = expand_crop_region(
                (mask_full > 1e-3).astype(np.float32),
                int(inpaint_full_res_padding), fw, fh,
            )

            def _up(arr, resample):
                return np.asarray(
                    _PILImage.fromarray(arr).resize((fw, fh), resample)
                )

            init_image = _up(init_np[y0:y1, x0:x1], _PILImage.LANCZOS)
            mask_image = np.clip(np.asarray(
                _PILImage.fromarray(
                    mask_full[y0:y1, x0:x1], mode="F"
                ).resize((fw, fh), _PILImage.BILINEAR)
            ), 0.0, 1.0)
            if color_map is not None:
                if color_map.shape[:2] != (fh, fw):
                    color_map = np.asarray(
                        _PILImage.fromarray(color_map).resize(
                            (fw, fh), _PILImage.NEAREST
                        )
                    )
                color_map = _up(color_map[y0:y1, x0:x1], _PILImage.NEAREST)

            def _crop_hint(img):
                a = _to_numpy_image(img)
                if a.shape[:2] != (fh, fw):
                    a = np.asarray(
                        _PILImage.fromarray(a).resize(
                            (fw, fh), _PILImage.LANCZOS
                        )
                    )
                return _up(a[y0:y1, x0:x1], _PILImage.LANCZOS)

            if control_image is not None:
                control_image = (
                    [_crop_hint(c) for c in control_image]
                    if isinstance(control_image, (list, tuple))
                    else _crop_hint(control_image)
                )
            if adapter_image is not None:
                adapter_image = _crop_hint(adapter_image)
            ifr_state = (init_np, mask_full, (x0, y0, x1, y1))
        import contextlib

        phase = self.timers.phase if self.profile else (
            lambda name, sync=None: contextlib.nullcontext()
        )
        edit_sched = None
        if prompt_editing:
            from ..conditioning.prompt_editing import (
                combined_schedule, has_editing,
            )

            if has_editing(prompt) or has_editing(negative_prompt):
                edit_sched = combined_schedule(
                    prompt, negative_prompt, num_inference_steps
                )
                # segment 1's rendering drives everything prompt-derived
                # outside the denoise loop (size, PwW regions, seeding)
                prompt, negative_prompt = edit_sched[0][1], edit_sched[0][2]
        with phase("encode"):
            enc = self.encode_inputs(
                prompt,
                color_map,
                color_context or {},
                negative_prompt,
                weight_function,
                prompt_weighting=prompt_weighting,
                clip_skip=clip_skip,
                long_prompts=long_prompts,
            )
        if color_map is not None:
            height, width = enc.height, enc.width
        elif init_latents is not None:
            height = init_latents.shape[1] * cfg.vae.scale_factor
            width = init_latents.shape[2] * cfg.vae.scale_factor
        else:
            height, width = _image_hw(init_image, default=(512, 512))
        sf = cfg.vae.scale_factor
        h_lat, w_lat = height // sf, width // sf

        schedule = self.scheduler.set_timesteps(num_inference_steps)
        n = num_samples
        latent_shape = (n, h_lat, w_lat, cfg.vae.latent_channels)

        inpaint = mask_image is not None
        if inpaint and init_image is None:
            raise ValueError("inpainting requires init_image alongside mask_image")
        if masked_content not in ("original", "fill", "latent_noise",
                                  "latent_nothing"):
            raise ValueError(
                "masked_content must be one of original/fill/latent_noise/"
                f"latent_nothing, got {masked_content!r}"
            )
        if (masked_content != "original" or mask_blur) and not inpaint:
            raise ValueError(
                "mask_blur/masked_content require mask_image (inpainting)"
            )
        # Standard 4-channel checkpoints inpaint via the legacy masked-blend
        # (A1111 / diffusers InpaintPipelineLegacy): per-step re-noised init
        # outside the mask, exact restore at the end. 9-channel checkpoints
        # keep the reference's conditioned-UNet path.
        legacy_inpaint = inpaint and cfg.unet.in_channels == cfg.vae.latent_channels
        if masked_content in ("latent_noise", "latent_nothing") and not legacy_inpaint:
            raise ValueError(
                f"masked_content={masked_content!r} applies to the legacy "
                "masked-blend path (standard 4-channel checkpoints); a "
                "9-channel inpainting UNet conditions on the real masked "
                "image — use 'original' or 'fill'"
            )
        blend_mask = blend_init_lat = blend_noise_arr = None
        if init_latents is not None and (init_image is not None or inpaint):
            raise ValueError(
                "init_latents is exclusive with init_image/mask_image"
            )
        if denoising_start is not None and init_latents is None:
            raise ValueError("denoising_start requires init_latents (the "
                             "partially denoised trajectory to resume)")
        for frac, nm in ((denoising_end, "denoising_end"),
                         (denoising_start, "denoising_start")):
            if frac is not None and not 0.0 < frac < 1.0:
                raise ValueError(f"{nm} must be in (0, 1), got {frac}")
        if callback is not None and (
            denoising_end is not None or denoising_start is not None
        ):
            raise ValueError(
                "denoising_end/denoising_start are not supported with "
                "per-step callbacks"
            )
        extra = None
        t_start = 0

        def _steps_at_or_above(frac):
            # diffusers ensemble-of-expert-denoisers cutoff (SDXL
            # base+refiner): train-timestep cutoff round(T - frac*T); steps
            # with t >= cutoff belong to the FIRST expert.
            T = cfg.scheduler.num_train_timesteps
            cutoff = int(round(T - frac * T))
            return int((np.asarray(schedule.timesteps) >= cutoff).sum())

        if init_latents is not None:
            # latent-space img2img (hires-fix second pass): the caller already
            # has SCALED latents (what return_latents yields) — skip the VAE
            # encode, truncate by strength and re-noise like the image path.
            init_lat = jnp.asarray(init_latents, jnp.float32)
            if init_lat.shape != latent_shape:
                raise ValueError(
                    f"init_latents shape {init_lat.shape} != {latent_shape}"
                )
            if denoising_start is not None:
                t_start = _steps_at_or_above(denoising_start)
            else:
                t_start = _t_start_from_strength(
                    num_inference_steps, strength, cfg.scheduler.steps_offset
                )
            if t_start > 0 and schedule.kind in ("pndm", "heun", "unipc",
                                                 "dpmpp_2m", "dpmpp_2m_sde"):
                raise ValueError(
                    f"img2img strength truncation is not supported with the "
                    f"{schedule.kind} scheduler; use lms/euler/ddim"
                )
            if denoising_start is not None:
                # resume the SAME trajectory: the latents already sit at
                # t_start's noise level — no re-noising.
                latents = init_lat
            else:
                noise = make_noise(seed, init_lat.shape, noise_mode)
                latents = schedule.add_noise(
                    init_lat, noise, jnp.int32(t_start)
                )
        elif init_image is None:
            if latents is not None:  # caller-supplied noise (reference
                # pipeline-class `latents:` kwarg, paint_with_words.py:647)
                latents = jnp.asarray(latents)
                if latents.shape != latent_shape:
                    raise ValueError(
                        f"latents shape {latents.shape} != {latent_shape}"
                    )
            else:
                latents = make_noise(seed, latent_shape, noise_mode)
                latents = regional_seed_latents(latents, enc.regions, noise_mode)
            latents = latents * schedule.init_noise_sigma
        else:
            # SYNC DISCIPLINE: generate_batch's img2img branch mirrors this
            # prep op-for-op so batched requests bit-match single ones —
            # edits here must land there too (tests/test_batch_img2img.py
            # gates the parity).
            init = _preprocess_image(init_image)  # (1, H', W', 3) in [-1, 1]
            proc_mask = None
            if inpaint:
                # one pixel-space mask (init-sized, optionally feathered)
                # feeds BOTH inpaint paths
                proc_mask = self._prepare_pixel_mask(mask_image, init, mask_blur)
                if masked_content == "fill":
                    from .inpaint import fill_masked_region

                    init = jnp.asarray(
                        fill_masked_region(
                            np.asarray(init[0]), proc_mask >= 0.5
                        ),
                        jnp.float32,
                    )[None]
            t_start = _t_start_from_strength(
                num_inference_steps, strength, cfg.scheduler.steps_offset
            )
            if t_start > 0 and schedule.kind in ("pndm", "heun", "unipc",
                                                 "dpmpp_2m", "dpmpp_2m_sde"):
                # pndm/heun: scan visits don't map 1:1 to trajectory steps;
                # unipc/dpmpp_2m: the multistep corrector/blend tables at
                # index t_start assume a populated history, but a truncated
                # start carries zero-initialized state (lms is fine: a zero
                # derivative history contributes zero terms, matching the
                # reference's truncated-start behavior).
                raise ValueError(
                    f"img2img strength truncation is not supported with the "
                    f"{schedule.kind} scheduler; use lms/euler/ddim"
                )
            moments = run_encode_image(self.vae, self.params["vae"], init)
            key = rng if rng is not None else jax.random.PRNGKey(seed)
            k_sample, k_noise = jax.random.split(key)
            # The reference samples the posterior with UNSEEDED global torch
            # RNG (reference `paint_with_words.py:460-463`, inpaint.py:194) —
            # irreproducible by construction. "sample" (default) draws with
            # jax RNG from the seed; "mean" uses the deterministic posterior
            # mean (the composition-proof meeting point, and what careful
            # deployments want — the posterior std is ~1e-2 of the latent
            # scale for trained SD VAEs).
            if vae_sample_mode == "mean":
                init_lat = (
                    jnp.split(moments, 2, axis=-1)[0] * cfg.vae.scaling_factor
                )
            elif vae_sample_mode == "sample":
                init_lat = (
                    sample_from_moments(moments, k_sample)
                    * cfg.vae.scaling_factor
                )
            else:
                raise ValueError(
                    f"vae_sample_mode must be 'sample' or 'mean', got "
                    f"{vae_sample_mode!r}"
                )
            init_lat = jnp.repeat(init_lat, n, axis=0)
            if legacy_inpaint:
                # masked-blend inpaint for standard checkpoints: fractional
                # latent mask (feathered seam), optional latent-space
                # masked-content fills, per-step blend inside the scan
                sf = cfg.vae.scale_factor
                m_lat = jax.image.resize(
                    jnp.asarray(proc_mask, jnp.float32)[None, :, :, None],
                    (1, init.shape[1] // sf, init.shape[2] // sf, 1),
                    method="linear",
                )
                blend_mask = jnp.repeat(jnp.clip(m_lat, 0.0, 1.0), n, 0)
                if masked_content == "latent_noise":
                    # A1111: masked area starts from fresh unit noise (the
                    # draw is jax-native; deterministic per seed/rng)
                    hole = (blend_mask >= 0.5).astype(jnp.float32)
                    init_lat = (
                        init_lat * (1.0 - hole)
                        + jax.random.normal(k_noise, init_lat.shape) * hole
                    )
                elif masked_content == "latent_nothing":
                    init_lat = init_lat * (1.0 - (blend_mask >= 0.5))
                noise = make_noise(seed, init_lat.shape, noise_mode)
                latents = schedule.add_noise(init_lat, noise, jnp.int32(t_start))
                blend_init_lat = init_lat
                blend_noise_arr = noise
            elif inpaint:
                # reference inpaint noises VAE latents at the strength-offset
                # step even at strength 1.0 (reference inpaint.py:180-198)
                noise = make_noise(seed, init_lat.shape, noise_mode)
                latents = schedule.add_noise(init_lat, noise, jnp.int32(t_start))
                extra = self._prepare_inpaint_channels(init, proc_mask, n)
                expected = (
                    cfg.vae.latent_channels + extra.shape[-1]
                )
                if cfg.unet.in_channels != expected:
                    raise ValueError(
                        f"UNet expects {cfg.unet.in_channels} input channels but "
                        f"latents+mask+masked_image = {expected}; pass an "
                        f"inpainting checkpoint (9-channel UNet)."
                    )
            else:
                noise = make_noise(seed, init_lat.shape, noise_mode)
                latents = schedule.add_noise(init_lat, noise, jnp.int32(t_start))

        controlnet = controlnet_params = hint = None
        cn_scale = jnp.float32(1.0)
        if control_image is not None:
            if getattr(self, "controlnet", None) is None:
                raise ValueError(
                    "control_image given but no ControlNet loaded; call "
                    "pipeline.load_controlnet(...) first"
                )
            controlnet = self.controlnet

            sf_ = cfg.vae.scale_factor
            proc_hw = (latents.shape[1] * sf_, latents.shape[2] * sf_)

            def _prep_hint(img):
                arr = _to_numpy_image(img).astype(np.float32) / 255.0
                if arr.ndim >= 3 and arr.shape[-3:-1] != proc_hw:
                    # validate like adapter_image: a mismatched hint would
                    # otherwise die during jit tracing with an opaque XLA
                    # shape error at the ControlNet residual add (e.g. a
                    # raw 500x500 canny map against a %32-floored 480x480
                    # img2img render — the PROCESSING resolution is the
                    # latent grid × vae scale, not the raw input dims)
                    raise ValueError(
                        f"control_image size {arr.shape[-3:-1]} != "
                        f"processing resolution {proc_hw}; resize the hint"
                    )
                h = jnp.asarray(arr)[None] if arr.ndim == 3 else jnp.asarray(arr)
                return jnp.repeat(h, n, axis=0)

            cps = self.controlnet_params
            if isinstance(cps, list):  # multi-ControlNet (add_controlnet)
                k = len(cps)
                imgs = (
                    list(control_image)
                    if isinstance(control_image, (list, tuple))
                    else [control_image] * k
                )
                if len(imgs) != k:
                    raise ValueError(
                        f"{k} ControlNets attached but {len(imgs)} control "
                        f"images given"
                    )
                s = controlnet_conditioning_scale
                scales = list(s) if isinstance(s, (list, tuple)) else [s] * k
                if len(scales) != k:
                    raise ValueError(
                        f"{k} ControlNets attached but {len(scales)} "
                        f"conditioning scales given"
                    )
                controlnet_params = tuple(cps)
                hint = tuple(_prep_hint(im) for im in imgs)
                cn_scale = tuple(jnp.float32(x) for x in scales)
            else:
                if isinstance(control_image, (list, tuple)):
                    raise ValueError(
                        "a list of control images requires stacked "
                        "ControlNets; call pipeline.add_controlnet(...)"
                    )
                controlnet_params = cps
                hint = _prep_hint(control_image)
                cn_scale = jnp.float32(controlnet_conditioning_scale)

        adapter_res = None
        if adapter_image is not None:
            if getattr(self, "t2i_adapter", None) is None:
                raise ValueError(
                    "adapter_image given but no T2I-Adapter loaded; call "
                    "pipeline.load_t2i_adapter(...) first"
                )
            arr = _to_numpy_image(adapter_image).astype(np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            cin = self.t2i_adapter.in_channels
            if cin == 1 and arr.shape[-1] == 3:
                arr = arr.mean(-1, keepdims=True)  # mono hint (sketch/depth)
            sf_a = cfg.vae.scale_factor
            proc_hw_a = (latents.shape[1] * sf_a, latents.shape[2] * sf_a)
            if arr.shape[:2] != proc_hw_a:
                # the processing resolution is the latent grid × vae scale —
                # for img2img that's the %32-floored init dims, not the raw
                # input (or color-map) size
                raise ValueError(
                    f"adapter_image size {arr.shape[:2]} != processing "
                    f"resolution {proc_hw_a}"
                )
            a_hint = jnp.repeat(jnp.asarray(arr)[None], n, axis=0)
            feats = run_t2i_adapter(
                self.t2i_adapter, self.t2i_adapter_params, a_hint
            )
            s = jnp.float32(adapter_conditioning_scale)
            adapter_res = tuple(f.astype(jnp.float32) * s for f in feats)

        text_states, pww, pooled = self._tile_cfg(enc, n)
        added_cond = None
        if cfg.needs_pooled:
            # micro-conditioning (diffusers _get_add_time_ids defaults:
            # original = target = render size, crop (0, 0))
            o_h, o_w = original_size or (height, width)
            c_t, c_l = crops_coords_top_left
            if cfg.xl_refiner:
                # refiner time_ids end in the aesthetic score, with the
                # NEGATIVE score on the uncond half (diffusers
                # requires_aesthetics_score semantics)
                tid_c = jnp.asarray(
                    [o_h, o_w, c_t, c_l, aesthetic_score], jnp.float32
                )
                tid_u = jnp.asarray(
                    [o_h, o_w, c_t, c_l, negative_aesthetic_score], jnp.float32
                )
                time_ids = jnp.concatenate(
                    [jnp.tile(tid_u[None], (n, 1)), jnp.tile(tid_c[None], (n, 1))]
                )
            else:
                t_h, t_w = target_size or (height, width)
                tid = jnp.asarray(
                    [o_h, o_w, c_t, c_l, t_h, t_w], jnp.float32
                )
                time_ids = jnp.tile(tid[None], (2 * n, 1))
            added_cond = {
                "text_embeds": pooled.astype(jnp.float32),
                "time_ids": time_ids,
            }
        if cfg.unet.time_cond_proj_dim is not None:
            # LCM-distilled model: guidance is an INPUT (folded into the
            # consistency function at distillation time) — embed w and
            # neutralize the external CFG combine.
            w_emb = guidance_scale_embedding(
                guidance_scale, cfg.unet.time_cond_proj_dim
            )
            added_cond = dict(added_cond or {})
            added_cond["timestep_cond"] = jnp.tile(w_emb[None], (2 * n, 1))
            guidance_scale = 1.0
        ip = None
        if cfg.unet.ip_adapter_tokens is not None:
            ip = self._ip_state(ip_adapter_image, n, ip_adapter_scale)
        elif ip_adapter_image is not None:
            raise ValueError(
                "ip_adapter_image given but no adapter attached: call "
                "pipe.load_ip_adapter(...) first"
            )
        if self.mesh is not None:
            from ..parallel.mesh import replicate, shard_batch, shard_spatial

            if sharding == "spatial":
                # single-image parallelism: latent height over dp (high-res)
                latents = shard_spatial(latents, self.mesh)
                blend_mask = None if blend_mask is None else shard_spatial(blend_mask, self.mesh)
                blend_init_lat = None if blend_init_lat is None else shard_spatial(blend_init_lat, self.mesh)
                blend_noise_arr = None if blend_noise_arr is None else shard_spatial(blend_noise_arr, self.mesh)
                text_states = replicate(text_states, self.mesh)
                pww = replicate(pww, self.mesh)
                if added_cond is not None:
                    added_cond = replicate(added_cond, self.mesh)
                if ip is not None:
                    ip = replicate(ip, self.mesh)
            else:
                latents = shard_batch(latents, self.mesh)
                blend_mask = None if blend_mask is None else shard_batch(blend_mask, self.mesh)
                blend_init_lat = None if blend_init_lat is None else shard_batch(blend_init_lat, self.mesh)
                blend_noise_arr = None if blend_noise_arr is None else shard_batch(blend_noise_arr, self.mesh)
                extra = None if extra is None else shard_batch(extra, self.mesh)
                text_states = shard_batch(text_states, self.mesh)
                pww = pww.replace(
                    weights={
                        k: shard_batch(v, self.mesh)
                        for k, v in pww.weights.items()
                    },
                    weight_orig=None if pww.weight_orig is None
                    else shard_batch(pww.weight_orig, self.mesh),
                )
                if added_cond is not None:
                    added_cond = {
                        k: shard_batch(v, self.mesh)
                        for k, v in added_cond.items()
                    }
                if ip is not None:
                    ip = ip.replace(tokens=shard_batch(ip.tokens, self.mesh))
        denoise_kwargs = dict(
            added_cond=added_cond,
            ip=ip,
            extra_channels=extra,
            blend_mask=blend_mask,
            blend_init=blend_init_lat,
            blend_noise=blend_noise_arr,
            controlnet=controlnet,
            controlnet_params=controlnet_params,
            control_hint=hint,
            controlnet_scale=cn_scale,
            adapter_residuals=adapter_res,
            sag_scale=jnp.float32(sag_scale) if sag_scale > 0 else None,
            step_rng=(
                jax.random.PRNGKey(seed ^ 0x5EED)
                if schedule.needs_rng else None
            ),
        )
        if denoising_end is not None:
            denoise_kwargs["t_end"] = _steps_at_or_above(denoising_end)
        # Custom weight functions get the reference's exact two-forward CFG
        # (uncond bias-free); the structured family is mathematically
        # identical batched, so it takes the fast single-call path.
        from ..ops.weight_functions import CustomWeightFunction

        cfg_batched = not isinstance(pww.weight_fn, CustomWeightFunction)
        if cache_interval > 1 and callback is not None:
            raise ValueError(
                "cache_interval > 1 is not supported with per-step callbacks"
            )
        if edit_sched is not None and len(edit_sched) == 1:
            edit_sched = None  # constant schedule: plain path
        if edit_sched is not None:
            if cache_interval > 1:
                raise ValueError(
                    "prompt_editing is not supported with DeepCache "
                    "(cache_interval > 1): the cached trunk would go stale "
                    "at a switch point"
                )
            if sag_scale > 0:
                raise ValueError(
                    "prompt_editing is not supported with sag_scale"
                )
            if denoising_end is not None or denoising_start is not None:
                raise ValueError(
                    "prompt_editing is not supported with "
                    "denoising_end/denoising_start"
                )

        def _cond_for(pos_v, neg_v):
            """(text_states, pww, added_cond) for one edit-schedule row —
            the exact transform the base prompt got (encode → CFG tile →
            pooled micro-cond → mesh placement). Encodes are LRU-cached,
            so repeated rows and repeated calls are free."""
            enc_v = self.encode_inputs(
                pos_v, color_map, color_context or {}, neg_v,
                weight_function, prompt_weighting=prompt_weighting,
                clip_skip=clip_skip, long_prompts=long_prompts,
            )
            ts_v, pww_v, pooled_v = self._tile_cfg(enc_v, n)
            ac_v = added_cond
            if added_cond is not None and pooled_v is not None:
                ac_v = dict(added_cond)
                ac_v["text_embeds"] = pooled_v.astype(jnp.float32)
            if self.mesh is not None:
                from ..parallel.mesh import replicate, shard_batch

                if sharding == "spatial":
                    ts_v = replicate(ts_v, self.mesh)
                    pww_v = replicate(pww_v, self.mesh)
                    if ac_v is not None:
                        ac_v = replicate(ac_v, self.mesh)
                else:
                    ts_v = shard_batch(ts_v, self.mesh)
                    pww_v = pww_v.replace(
                        weights={
                            k: shard_batch(v, self.mesh)
                            for k, v in pww_v.weights.items()
                        },
                        weight_orig=None if pww_v.weight_orig is None
                        else shard_batch(pww_v.weight_orig, self.mesh),
                    )
                    if ac_v is not None:
                        ac_v = {
                            k: shard_batch(v, self.mesh)
                            for k, v in ac_v.items()
                        }
            return ts_v, pww_v, ac_v

        def to_output(images: np.ndarray):
            if ifr_state is not None:
                from .inpaint import paste_region

                full, m_full, region = ifr_state
                images = np.stack([
                    paste_region(full, im, region, m_full) for im in images
                ])
            if output_type == "np":
                return images
            from PIL import Image

            pil = [Image.fromarray(im) for im in images]
            return pil[0] if n == 1 else pil

        # Fused single-dispatch path: denoise + decode in one program. Off
        # when the caller needs latents (return_latents) or per-phase timings
        # (profile=True keeps denoise/decode separable).
        fused = (
            edit_sched is None and callback is None
            and not return_latents and not self.profile
        )
        if output_type == "device" and (not fused or ifr_state is not None):
            raise ValueError(
                'output_type="device" requires the fused denoise+decode '
                "path: no return_latents/callback/profile/prompt_editing/"
                "inpaint_full_res (those need host post-processing)"
            )
        if fused:
            with phase("denoise+decode"):
                images_dev = run_denoise_decode(
                    unet, self.params["unet"], self.vae,
                    self.params["vae"], latents, text_states, pww,
                    schedule, jnp.float32(guidance_scale), t_start=t_start,
                    cfg_batched=cfg_batched, cache_interval=cache_interval,
                    **denoise_kwargs,
                )
                if output_type == "device":
                    # un-fetched uint8 device array (same contract as
                    # generate_batch): dispatch is async, so a caller can
                    # enqueue the NEXT call's compute before paying this
                    # one's D2H transfer — the sustained-throughput mode
                    # bench.py's pipelined headline point measures.
                    return images_dev
                images = np.asarray(images_dev)
            return to_output(images)
        if edit_sched is not None:
            # prompt editing: the denoise loop splits at the schedule's
            # switch points; each slice runs with its own conditioning
            # while the scheduler state carries through (multistep
            # histories persist across a switch, matching A1111). Slices
            # are cut to power-of-two lengths so the number of distinct
            # compiled programs stays O(log steps).
            denoise_kwargs.pop("sag_scale", None)
            sch_state = schedule.init_state(latents.shape, jnp.float32)
            latents = latents.astype(jnp.float32)
            bounds, conds = [], []
            # Alternation yields one schedule row PER STEP for only a few
            # distinct prompts — memoize the tiled/sharded conditioning by
            # (prompt, negative) so ``[cat|dog]`` at 150 steps allocates 2
            # device conditioning sets, not 150.
            cond_memo: Dict = {}
            for end, pos_v, neg_v in edit_sched:
                # switch points are in sampler-step units; the loop below
                # walks SCAN-VISIT indices (pndm/heun visit some steps
                # twice), so map before comparing — both visits of one
                # step share its conditioning, and the final bound lands
                # on num_steps so seg_ix can never run off the list.
                vend = schedule.visit_of_step(end)
                if vend > t_start:  # rows fully before t_start never run
                    bounds.append(vend)
                    if (pos_v, neg_v) not in cond_memo:
                        cond_memo[pos_v, neg_v] = _cond_for(pos_v, neg_v)
                    conds.append(cond_memo[pos_v, neg_v])
            i, seg_ix = t_start, 0
            with phase("denoise"):
                while i < schedule.num_steps:
                    while bounds[seg_ix] <= i:
                        seg_ix += 1
                    stop = bounds[seg_ix]
                    if callback is not None:
                        nxt = i + callback_steps - (i - t_start) % callback_steps
                        stop = min(stop, nxt)
                    j = i + (1 << ((stop - i).bit_length() - 1))
                    ts_v, pww_v, ac_v = conds[seg_ix]
                    latents, sch_state = run_denoise_segment(
                        unet, self.params["unet"], latents, ts_v, pww_v,
                        schedule, jnp.float32(guidance_scale), sch_state,
                        jnp.int32(i), seg_len=j - i, cfg_batched=cfg_batched,
                        **{**denoise_kwargs, "added_cond": ac_v},
                    )
                    if callback is not None and (
                        j == schedule.num_steps
                        or (j - t_start) % callback_steps == 0
                    ):
                        callback(j - 1, float(schedule.timesteps[j - 1]), latents)
                    i = j
        elif callback is None:
            with phase("denoise"):
                latents, _ = run_denoise(
                    unet, self.params["unet"], latents, text_states, pww,
                    schedule, jnp.float32(guidance_scale), t_start=t_start,
                    cfg_batched=cfg_batched, cache_interval=cache_interval,
                    **denoise_kwargs,
                )
                if self.profile:
                    jax.block_until_ready(latents)
        else:
            # segmented scan: host observes latents every callback_steps
            if denoise_kwargs.pop("sag_scale", None) is not None:
                raise ValueError(
                    "sag_scale is not supported with per-step callbacks"
                )
            sch_state = schedule.init_state(latents.shape, jnp.float32)
            latents = latents.astype(jnp.float32)
            i = t_start
            while i < schedule.num_steps:
                j = min(i + callback_steps, schedule.num_steps)
                latents, sch_state = run_denoise_segment(
                    unet, self.params["unet"], latents, text_states, pww,
                    schedule, jnp.float32(guidance_scale), sch_state,
                    jnp.int32(i), seg_len=j - i, cfg_batched=cfg_batched,
                    **denoise_kwargs,
                )
                callback(j - 1, float(schedule.timesteps[j - 1]), latents)
                i = j
        if (
            (edit_sched is not None or callback is not None)
            and denoise_kwargs.get("blend_mask") is not None
        ):
            # segmented paths end outside the scan: apply the exact final
            # restore the one-scan path does internally
            bm = denoise_kwargs["blend_mask"]
            latents = denoise_kwargs["blend_init"] * (1.0 - bm) + latents * bm
        if return_latents:
            return latents
        with phase("decode"):
            images = run_decode(self.vae, self.params["vae"], latents)
            images = np.asarray(images)
        return to_output(images)

    __call__ = generate

    def generate_hires(
        self,
        prompt: str = "",
        color_map_image=None,
        color_context: Optional[Dict] = None,
        hires_scale: float = 2.0,
        hires_strength: float = 0.7,
        hires_steps: Optional[int] = None,
        upscale_mode: str = "latent",  # "latent" (bilinear) | "image" (lanczos)
        output_type: str = "pil",
        **kwargs,
    ):
        """Two-pass hires fix (A1111 semantics): generate at the native
        resolution, upscale by ``hires_scale``, then img2img-refine at
        ``hires_strength``. ``upscale_mode="latent"`` upscales the SCALED
        latents bilinearly and skips the VAE round-trip (A1111's "Latent"
        upscaler); ``"image"`` decodes, Lanczos-upscales the pixels, and
        re-encodes. The color map is NEAREST-resized so PwW regions keep
        applying at the higher resolution. Target dims snap to the UNet's
        lattice (scale_factor · 2^(n_blocks−1)).
        """
        cfg = self.config
        cm = _to_numpy_image(color_map_image)
        if cm is None:
            raise ValueError("generate_hires requires color_map_image")
        if upscale_mode not in ("latent", "image"):
            raise ValueError('upscale_mode must be "latent" or "image"')
        h0, w0 = cm.shape[:2]
        mult = cfg.vae.scale_factor * 2 ** (
            len(cfg.unet.block_out_channels) - 1
        )
        h2 = max(mult, int(round(h0 * hires_scale / mult)) * mult)
        w2 = max(mult, int(round(w0 * hires_scale / mult)) * mult)
        from PIL import Image as PILImage

        cm2 = np.asarray(
            PILImage.fromarray(cm).resize((w2, h2), PILImage.NEAREST)
        )
        steps2 = hires_steps or kwargs.get("num_inference_steps", 30)
        managed = {
            "strength": "hires_strength",
            "init_image": None,
            "init_latents": None,
            "return_latents": None,
        }
        for key, alt in managed.items():
            if key in kwargs:
                hint = f" — use {alt} instead" if alt else ""
                raise ValueError(
                    f"generate_hires manages {key!r} itself (the second pass "
                    f"is an img2img refinement){hint}"
                )
        common = dict(kwargs)
        common.pop("num_inference_steps", None)

        if upscale_mode == "latent":
            base_lat = self.generate(
                prompt=prompt, color_map_image=cm,
                color_context=color_context, return_latents=True, **common,
                num_inference_steps=kwargs.get("num_inference_steps", 30),
            )
            sf = cfg.vae.scale_factor
            up = jax.image.resize(
                jnp.asarray(base_lat, jnp.float32),
                (base_lat.shape[0], h2 // sf, w2 // sf, base_lat.shape[-1]),
                method="bilinear",
            )
            return self.generate(
                prompt=prompt, color_map_image=cm2,
                color_context=color_context, init_latents=up,
                strength=hires_strength, num_inference_steps=steps2,
                output_type=output_type, **common,
            )

        if kwargs.get("num_samples", 1) != 1:
            raise ValueError(
                'upscale_mode="image" supports num_samples=1; use "latent"'
            )
        base = self.generate(
            prompt=prompt, color_map_image=cm, color_context=color_context,
            output_type="np", **common,
            num_inference_steps=kwargs.get("num_inference_steps", 30),
        )
        up_img = PILImage.fromarray(np.asarray(base)[0]).resize(
            (w2, h2), PILImage.LANCZOS
        )
        return self.generate(
            prompt=prompt, color_map_image=cm2, color_context=color_context,
            init_image=up_img, strength=hires_strength,
            num_inference_steps=steps2, output_type=output_type, **common,
        )

    def _prewarm_text_cache(self, requests: Sequence[Dict]) -> None:
        """Batch the text-encoder forward across a ``generate_batch`` group.

        The per-request encode prologue dispatches one (2, 77) CLIP call per
        request — K serial device round-trips on the serving critical path
        (~40-60 ms each over a remote/tunneled backend, so ~0.4 s of an
        8-request cycle). Collect the group's UNCACHED (prompt, negative)
        pairs, run ONE (2K, 77) CLIP forward, and seed ``_text_cache`` so
        the per-request ``encode_inputs`` loop below hits cache.

        Standard single-tower path only (no prompt weighting / long prompts
        / clip_skip / dual-encoder XL towers): other requests simply take
        the per-request encode unchanged. The pair count is bucketed to the
        next power of two (padding with ("", "") pairs whose outputs are
        dropped) so a serving deployment compiles at most log2(max_batch)
        extra CLIP shapes, not one per partial-group size.
        """
        if self.clip2 is not None or self.config.xl_refiner:
            return
        pairs = []
        for r in requests:
            if (r.get("prompt_weighting") or r.get("long_prompts")
                    or int(r.get("clip_skip", 0))):
                continue
            pairs.append(
                (str(r.get("prompt", "")), str(r.get("negative_prompt", "")))
            )
        with self._encode_lock:
            todo = []
            for p in dict.fromkeys(pairs):  # dedup, keep order
                if (p[0], p[1], False, 0, False) not in self._text_cache:
                    todo.append(p)
            if len(todo) < 2:
                return  # the (2,77) per-request program already covers this
            max_len = self.tokenizer.model_max_length
            pad_id = getattr(self.tokenizer, "pad_token_id",
                             getattr(self.tokenizer, "eos_token_id", 0))

            def _padded(text):
                ids = self.tokenizer(
                    text, max_length=max_len, truncation=True,
                    padding="max_length",
                )["input_ids"]
                return list(ids) + [pad_id] * (max_len - len(ids))

            k = 1 << (len(todo) - 1).bit_length()  # next power of two
            rows = []
            for p, n_ in todo + [("", "")] * (k - len(todo)):
                rows.append(_padded(n_))  # row order matches encode.py:
                rows.append(_padded(p))  # [uncond, cond] per pair
            out = self.encode_text(jnp.asarray(rows, jnp.int32))
            states, pooled = out if isinstance(out, tuple) else (out, None)
            for i, (p, n_) in enumerate(todo):
                if len(self._text_cache) > 256:
                    self._text_cache.pop(next(iter(self._text_cache)))
                self._text_cache[(p, n_, False, 0, False)] = (
                    states[2 * i:2 * i + 2],
                    None if pooled is None else pooled[2 * i:2 * i + 2],
                )

    def generate_batch(
        self,
        requests: Sequence[Dict],
        num_inference_steps: int = 30,
        guidance_scale: float = 7.5,
        weight_function: Optional[AnyWeightFunction] = None,
        noise_mode: str = "jax",
        output_type: str = "pil",
        cache_interval: int = 1,
        tome_ratio: float = 0.0,
        freeu=None,  # FreeU: True (family defaults) or (b1, b2, s1, s2)
        sag_scale: float = 0.0,  # Self-Attention Guidance (0 = off)
        ip_adapter_image=None,  # one reference image shared by the batch
        strength: float = 0.5,  # img2img noise level (shared: sets t_start)
    ):
        """Heterogeneous-prompt batch: N independent PwW requests, ONE compiled
        denoise call (BASELINE config #5: batched multi-prompt PwW).

        Each request dict: ``prompt``, ``color_map_image``, ``color_context``,
        ``seed``, optional ``negative_prompt``; img2img/inpaint requests add
        ``init_image`` (and ``mask_image``/``mask_blur``/``masked_content``).
        All requests in a batch share resolution, steps, guidance, the
        (static) weight function, and — for img2img — ``strength`` (it sets
        the compile-static ``t_start``) and the img2img/inpaint mode; the
        serving batcher groups by that compatibility key. Per-request init
        images and masks are fine: init latents/noise/blend state are
        per-sample rows of the batched scan, exactly as in :meth:`generate`
        (reference `paint_with_words.py:435-460`,
        `paint_with_words_inpaint.py:20-134`). The reference serves
        multi-request work as a serial host loop reloading models each time
        (reference `gradio_pww.py:31-45`).
        """
        wf = as_weight_function(weight_function)
        self._prewarm_text_cache(requests)
        encs = []
        for r in requests:
            cm = _to_numpy_image(r.get("color_map_image"))
            encs.append(
                self.encode_inputs(
                    r.get("prompt", ""), cm, r.get("color_context") or {},
                    r.get("negative_prompt", ""), wf,
                    prompt_weighting=bool(r.get("prompt_weighting", False)),
                    clip_skip=int(r.get("clip_skip", 0)),
                    long_prompts=bool(r.get("long_prompts", False)),
                )
            )
        # mode uniformity: txt2img / img2img / inpaint cannot mix in one
        # compiled program (latent channels and t_start differ)
        has_init = [r.get("init_image") is not None for r in requests]
        has_mask = [r.get("mask_image") is not None for r in requests]
        if any(has_init) and not all(has_init):
            raise ValueError(
                "all requests in a batch must agree on img2img (init_image)"
            )
        if any(has_mask):
            if not all(has_mask):
                raise ValueError(
                    "all requests in a batch must agree on inpainting "
                    "(mask_image)"
                )
            if not all(has_init):
                raise ValueError(
                    "inpainting requires init_image alongside mask_image"
                )
        img2img = all(has_init) and len(requests) > 0
        inpaint = img2img and all(has_mask)

        # Per-request validation that generate performs unconditionally
        # (pipeline.py:1500-1521) — a txt2img request carrying mask_blur /
        # masked_content is a caller error and must raise, not be silently
        # ignored by the img2img branch below.
        legacy_inpaint = (
            inpaint
            and self.config.unet.in_channels == self.config.vae.latent_channels
        )
        for r in requests:
            mc = r.get("masked_content", "original")
            if mc not in ("original", "fill", "latent_noise",
                          "latent_nothing"):
                raise ValueError(
                    "masked_content must be one of original/fill/"
                    f"latent_noise/latent_nothing, got {mc!r}"
                )
            if (mc != "original" or r.get("mask_blur")) and not inpaint:
                raise ValueError(
                    "mask_blur/masked_content require mask_image "
                    "(inpainting)"
                )
            if (mc in ("latent_noise", "latent_nothing")
                    and inpaint and not legacy_inpaint):
                raise ValueError(
                    f"masked_content={mc!r} applies to the legacy "
                    "masked-blend path (standard 4-channel checkpoints)"
                )

        # Resolution per request: for img2img the %32-FLOORED init image sets
        # the processing resolution exactly as in `generate` (latents take
        # `_preprocess_image`'s shape, pipeline.py:1595,1674; a color map
        # whose grid differs only drives the bias via bias_for()'s ORIG
        # resize fallback) — a 500x500 map + 500x500 init runs at 480x480,
        # it must not be rejected. txt2img keeps the raw encode dims.
        dims = []
        for r, e in zip(requests, encs):
            if r.get("init_image") is not None:
                ih, iw = _image_hw(r["init_image"], default=(512, 512))
                dims.append((ih - ih % 32, iw - iw % 32))
            else:
                dims.append((e.height, e.width))
        h0, w0 = dims[0]
        t0 = encs[0].text_states.shape[1]
        for d in dims[1:]:
            if d != (h0, w0):
                raise ValueError("all requests in a batch must share resolution")
        for e in encs[1:]:
            if e.text_states.shape[1] != t0:
                raise ValueError(
                    "all requests in a batch must share the text length "
                    "(long_prompts window counts differ)"
                )
        # The PwW weight pyramids are keyed by the color-map grid, which can
        # differ between requests even when the processing resolution agrees
        # (e.g. a 64x64 map vs a 128x128 map on the same img2img init) —
        # they cannot ride one program. The serving batcher keys groups by
        # the map grid; reject direct callers with a real error, not a
        # KeyError from the concat below.
        keys0 = set(encs[0].pww.weights.keys())
        for e in encs[1:]:
            if set(e.pww.weights.keys()) != keys0:
                raise ValueError(
                    "all requests in a batch must share the color-map grid "
                    "(the PwW weight pyramids have different spatial keys)"
                )

        n = len(requests)
        # rows: [uncond_0..uncond_{n-1}, cond_0..cond_{n-1}]
        text_states = jnp.concatenate(
            [e.text_states[:1] for e in encs] + [e.text_states[1:] for e in encs]
        )
        keys = encs[0].pww.weights.keys()
        weights = {
            k: jnp.concatenate(
                [e.pww.weights[k][:1] for e in encs]
                + [e.pww.weights[k][1:] for e in encs]
            )
            for k in keys
        }
        added_cond = None
        if self.config.needs_pooled:
            pooled = jnp.concatenate(
                [e.pooled[:1] for e in encs] + [e.pooled[1:] for e in encs]
            )
            # Micro-conditioning sizes follow generate's per-request rule
            # (pipeline.py: color-map dims when a map is present, else the
            # RAW un-floored init dims for img2img, else the encode dims) so
            # a batched SDXL request carries the exact time_ids it would get
            # served alone — NOT the %32-floored batch processing dims.
            tid_dims = []
            for r, e in zip(requests, encs):
                if (r.get("init_image") is not None
                        and r.get("color_map_image") is None):
                    tid_dims.append(
                        _image_hw(r["init_image"], default=(512, 512))
                    )
                else:
                    tid_dims.append((e.height, e.width))
            if self.config.xl_refiner:
                tid_c = jnp.asarray(
                    [[h, w, 0, 0, 6.0] for h, w in tid_dims], jnp.float32
                )
                tid_u = jnp.asarray(
                    [[h, w, 0, 0, 2.5] for h, w in tid_dims], jnp.float32
                )
                time_ids = jnp.concatenate([tid_u, tid_c])
            else:
                tid = jnp.asarray(
                    [[h, w, 0, 0, h, w] for h, w in tid_dims], jnp.float32
                )
                time_ids = jnp.concatenate([tid, tid])
            added_cond = {
                "text_embeds": pooled.astype(jnp.float32),
                "time_ids": time_ids,
            }
        # Per-request full-res maps so bias_for()'s ORIG resize fallback works
        # in serving too (e.g. a 500x500 map whose rounded pyramid key differs
        # from the actual latent attention size, reference :96-101). Resolution
        # equality across the group is enforced above, so shapes agree.
        worigs = [e.pww.weight_orig for e in encs]
        if all(w is None for w in worigs):
            weight_orig = None
        else:
            # A request without a color map has an all-zero pyramid; give it
            # a zero ORIG row too instead of silently dropping the fallback
            # for the requests that DO carry one.
            tmpl = next(w for w in worigs if w is not None)
            worigs = [jnp.zeros_like(tmpl) if w is None else w
                      for w in worigs]
            weight_orig = jnp.concatenate(
                [w[:1] for w in worigs] + [w[1:] for w in worigs]
            )
        pww = PwwState(
            weights=weights, weight_orig=weight_orig, sigma=jnp.float32(0.0),
            weight_fn=wf,
        )

        if self.config.unet.time_cond_proj_dim is not None:
            # LCM-distilled model in the serving batch path: embedded guidance
            w_emb = guidance_scale_embedding(
                guidance_scale, self.config.unet.time_cond_proj_dim
            )
            added_cond = dict(added_cond or {})
            added_cond["timestep_cond"] = jnp.tile(w_emb[None], (2 * n, 1))
            guidance_scale = 1.0

        schedule = self.scheduler.set_timesteps(num_inference_steps)
        sf = self.config.vae.scale_factor
        shape = (1, h0 // sf, w0 // sf, self.config.vae.latent_channels)
        cfg = self.config
        t_start = 0
        extra = None
        blend_mask = blend_init_lat = blend_noise_arr = None
        if img2img:
            # Per-request init/mask, shared strength → shared (compile-static)
            # t_start. SYNC DISCIPLINE: this prep mirrors generate's
            # img2img/inpaint prep op-for-op (pipeline.py:1595-1680 —
            # reference `paint_with_words.py:435-460` truncation,
            # `paint_with_words_inpaint.py:180-198` noising) so a batched
            # request bit-matches the same request served alone; any edit to
            # either copy must land in both — tests/test_batch_img2img.py
            # gates the parity.
            t_start = _t_start_from_strength(
                num_inference_steps, strength, cfg.scheduler.steps_offset
            )
            if t_start > 0 and schedule.kind in ("pndm", "heun", "unipc",
                                                 "dpmpp_2m", "dpmpp_2m_sde"):
                raise ValueError(
                    f"img2img strength truncation is not supported with the "
                    f"{schedule.kind} scheduler; use lms/euler/ddim"
                )
            init_rows, mask_rows = [], []
            for r in requests:
                mc = r.get("masked_content", "original")
                init = _preprocess_image(r["init_image"])
                if init.shape[1:3] != (h0, w0):
                    raise ValueError(
                        "all requests in a batch must share resolution "
                        f"(init image gives {init.shape[1]}x{init.shape[2]}, "
                        f"batch is {h0}x{w0})"
                    )
                pm = None
                if inpaint:
                    pm = self._prepare_pixel_mask(
                        r["mask_image"], init, float(r.get("mask_blur", 0.0))
                    )
                    if mc == "fill":
                        from .inpaint import fill_masked_region

                        init = jnp.asarray(
                            fill_masked_region(np.asarray(init[0]), pm >= 0.5),
                            jnp.float32,
                        )[None]
                init_rows.append(init)
                mask_rows.append(pm)
            # Per-request batch-1 VAE encodes, NOT one batched encode: XLA
            # picks different conv reduction schedules per batch size, so a
            # batched encode's latents would drift from the single path
            # before the scan even starts — per-request encodes keep the
            # initial latents bit-identical to `generate` (the batched scan
            # itself still reassociates; see test_batch_img2img.py). All n
            # calls hit the same compiled program (already built by any
            # prior `generate`) and dispatch asynchronously, so the tunnel
            # cost is one round-trip, not n.
            lat_rows, extra_rows = [], []
            bm_rows, bi_rows, bn_rows = [], [], []
            for i, r in enumerate(requests):
                seed = int(r.get("seed", 0))
                k_sample, k_noise = jax.random.split(jax.random.PRNGKey(seed))
                moments = run_encode_image(
                    self.vae, self.params["vae"], init_rows[i]
                )
                init_lat = (
                    sample_from_moments(moments, k_sample)
                    * cfg.vae.scaling_factor
                )
                noise = make_noise(seed, shape, noise_mode)
                if legacy_inpaint:
                    m_lat = jax.image.resize(
                        jnp.asarray(mask_rows[i], jnp.float32)[None, :, :, None],
                        (1, h0 // sf, w0 // sf, 1), method="linear",
                    )
                    bm = jnp.clip(m_lat, 0.0, 1.0)
                    mc = r.get("masked_content", "original")
                    if mc == "latent_noise":
                        hole = (bm >= 0.5).astype(jnp.float32)
                        init_lat = (
                            init_lat * (1.0 - hole)
                            + jax.random.normal(k_noise, init_lat.shape) * hole
                        )
                    elif mc == "latent_nothing":
                        init_lat = init_lat * (1.0 - (bm >= 0.5))
                    bm_rows.append(bm)
                    bi_rows.append(init_lat)
                    bn_rows.append(noise)
                elif inpaint:
                    extra_rows.append(
                        self._prepare_inpaint_channels(
                            init_rows[i], mask_rows[i], 1
                        )
                    )
                lat_rows.append(
                    schedule.add_noise(init_lat, noise, jnp.int32(t_start))
                )
            latents = jnp.concatenate(lat_rows)
            if extra_rows:
                extra = jnp.concatenate(extra_rows)
                expected = cfg.vae.latent_channels + extra.shape[-1]
                if cfg.unet.in_channels != expected:
                    raise ValueError(
                        f"UNet expects {cfg.unet.in_channels} input channels "
                        f"but latents+mask+masked_image = {expected}; pass an "
                        "inpainting checkpoint (9-channel UNet)."
                    )
            if bm_rows:
                blend_mask = jnp.concatenate(bm_rows)
                blend_init_lat = jnp.concatenate(bi_rows)
                blend_noise_arr = jnp.concatenate(bn_rows)
        else:
            lats = []
            for r, e in zip(requests, encs):
                lat = make_noise(int(r.get("seed", 0)), shape, noise_mode)
                lats.append(regional_seed_latents(lat, e.regions, noise_mode))
            latents = jnp.concatenate(lats) * schedule.init_noise_sigma

        from ..ops.weight_functions import CustomWeightFunction

        ip = None
        if self.config.unet.ip_adapter_tokens is not None:
            ip = self._ip_state(ip_adapter_image, n)
        if self.mesh is not None:
            # Serving on a pod: the request batch (and its CFG pair rows)
            # shards over dp exactly like generate's num_samples path —
            # shard_batch falls back to replication when dp doesn't divide
            # the group size, so ragged serving groups still run.
            from ..parallel.mesh import shard_batch

            latents = shard_batch(latents, self.mesh)
            text_states = shard_batch(text_states, self.mesh)
            pww = pww.replace(
                weights={
                    k: shard_batch(v, self.mesh)
                    for k, v in pww.weights.items()
                },
                weight_orig=None if pww.weight_orig is None
                else shard_batch(pww.weight_orig, self.mesh),
            )
            extra = None if extra is None else shard_batch(extra, self.mesh)
            blend_mask = (
                None if blend_mask is None
                else shard_batch(blend_mask, self.mesh)
            )
            blend_init_lat = (
                None if blend_init_lat is None
                else shard_batch(blend_init_lat, self.mesh)
            )
            blend_noise_arr = (
                None if blend_noise_arr is None
                else shard_batch(blend_noise_arr, self.mesh)
            )
            if added_cond is not None:
                added_cond = {
                    k: shard_batch(v, self.mesh)
                    for k, v in added_cond.items()
                }
            if ip is not None:
                ip = ip.replace(tokens=shard_batch(ip.tokens, self.mesh))
        images_dev = run_denoise_decode(
            self._unet_for(tome_ratio, freeu, sow_mid_attn=sag_scale > 0),
            self.params["unet"], self.vae,
            self.params["vae"],
            latents, text_states, pww,
            schedule, jnp.float32(guidance_scale), ip=ip,
            extra_channels=extra,
            t_start=t_start,
            cfg_batched=not isinstance(wf, CustomWeightFunction),
            cache_interval=cache_interval,
            sag_scale=jnp.float32(sag_scale) if sag_scale > 0 else None,
            added_cond=added_cond,
            blend_mask=blend_mask,
            blend_init=blend_init_lat,
            blend_noise=blend_noise_arr,
            step_rng=(
                # (n, 2) per-request keys: each row's ancestral/SDE/LCM step
                # noise comes from the exact stream `generate` would use for
                # that request's seed (PRNGKey(seed ^ 0x5EED)) — a shared key
                # would make serving output depend on batch composition.
                jnp.stack([
                    jax.random.PRNGKey(int(r.get("seed", 0)) ^ 0x5EED)
                    for r in requests
                ]) if schedule.needs_rng else None
            ),
        )
        if output_type == "device":
            # un-fetched uint8 device array: JAX dispatch is async, so the
            # caller can enqueue the NEXT batch's compute before paying this
            # one's D2H transfer (the serving Batcher's overlap path —
            # the transfer is ~250 ms/batch on the tunneled chip).
            return images_dev
        images = np.asarray(images_dev)
        if output_type == "np":
            return images
        from PIL import Image

        return [Image.fromarray(im) for im in images]

    def _prepare_pixel_mask(self, mask_image, init, mask_blur: float) -> np.ndarray:
        """(H, W) float32 mask in [0, 1] at the preprocessed init's size,
        optionally gaussian-feathered (A1111 ``mask_blur``; beyond-reference).
        Array masks keep the reference's [0, 1] range validation
        (reference `paint_with_words_inpaint.py:74-99`)."""
        from PIL import Image

        from .inpaint import blur_mask

        ih, iw = int(init.shape[1]), int(init.shape[2])
        m = mask_image
        if isinstance(m, Image.Image):
            m = m.convert("L")
            if m.size != (iw, ih):
                m = m.resize((iw, ih), Image.NEAREST)
            m = np.asarray(m, np.float32) / 255.0
        else:
            m = np.asarray(m, np.float32)
            if m.ndim == 3:
                m = m[..., 0]
            if m.min() < 0.0 or m.max() > 1.0:
                raise ValueError("mask should be in [0, 1] range")
            if m.shape != (ih, iw):
                pil = Image.fromarray((m * 255).astype(np.uint8))
                m = np.asarray(
                    pil.resize((iw, ih), Image.NEAREST), np.float32
                ) / 255.0
        return blur_mask(np.clip(m, 0.0, 1.0), float(mask_blur))

    def _prepare_inpaint_channels(self, init, mask_image, n: int) -> jnp.ndarray:
        """mask + VAE(masked image) latents, concat channels (reference
        `paint_with_words_inpaint.py:20-134`)."""
        from .inpaint import prepare_mask_and_masked_image

        # The init image was %32-floored by _preprocess_image; the reference
        # tolerates a mask at the original size by interpolating it to the
        # latent grid independently (inpaint.py:211-214) — match that by
        # resizing the mask to the preprocessed init's dims first.
        ih, iw = int(init.shape[1]), int(init.shape[2])
        mh, mw = _image_hw(mask_image, default=(ih, iw))
        if (mh, mw) != (ih, iw):
            from PIL import Image

            m = mask_image
            if not isinstance(m, Image.Image):
                m = np.asarray(m)
                if m.dtype != np.uint8:
                    m = (np.clip(m, 0, 1) * 255).astype(np.uint8)
                m = Image.fromarray(m)
            mask_image = m.convert("L").resize((iw, ih), Image.NEAREST)
        mask, masked = prepare_mask_and_masked_image(init, mask_image)
        sf = self.config.vae.scale_factor
        h_lat, w_lat = mask.shape[1] // sf, mask.shape[2] // sf
        from ..ops.resize import resize_nearest

        mask_lat = resize_nearest(mask[..., 0], h_lat, w_lat)[..., None]
        moments = run_encode_image(self.vae, self.params["vae"], masked)
        masked_lat = (
            jnp.split(moments, 2, axis=-1)[0] * self.config.vae.scaling_factor
        )
        mask_lat = jnp.repeat(mask_lat, n, 0)
        masked_lat = jnp.repeat(masked_lat, n, 0)
        return jnp.concatenate(
            [mask_lat, masked_lat], axis=-1
        ).astype(self.compute_dtype)


# --------------------------------------------------------------------------
# host-side helpers
# --------------------------------------------------------------------------


def _to_numpy_image(img) -> Optional[np.ndarray]:
    if img is None:
        return None
    if isinstance(img, np.ndarray):
        return img
    return np.array(img)


def _image_hw(img, default: Tuple[int, int]) -> Tuple[int, int]:
    if img is None:
        return default
    arr = _to_numpy_image(img)
    return arr.shape[0], arr.shape[1]


def _preprocess_image(img) -> jnp.ndarray:
    """PIL/array → (1, H, W, 3) float in [-1, 1], H/W floored to multiple of 32
    (reference ``preprocess``, `paint_with_words.py:28-35`)."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    w, h = img.size
    w, h = w - w % 32, h - h % 32
    img = img.resize((w, h), resample=Image.LANCZOS)
    x = np.asarray(img, np.float32)[None] / 255.0
    return jnp.asarray(2.0 * x - 1.0)


def _t_start_from_strength(num_steps: int, strength: float, offset: int) -> int:
    """Reference's timestep truncation (`paint_with_words.py:435-440`)."""
    init_timestep = min(int(num_steps * strength) + offset, num_steps)
    return max(num_steps - init_timestep + offset, 0)


def guidance_scale_embedding(w: float, dim: int) -> jnp.ndarray:
    """Fourier embedding of the guidance scale for LCM-distilled UNets.

    diffusers ``get_guidance_scale_embedding`` semantics: embed
    ``(w − 1)·1000`` with log-spaced frequencies, sin block then cos block,
    zero-padded if ``dim`` is odd.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = jnp.float32((w - 1.0) * 1000.0) * freqs
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)])
    if dim % 2 == 1:
        emb = jnp.pad(emb, (0, 1))
    return emb
