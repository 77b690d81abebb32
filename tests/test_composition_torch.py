"""End-to-end composition proof: the reference's WHOLE generation loop,
replicated in torch, against ``PwwPipeline.generate`` on shared weights.

Every link of the fidelity chain is proven piecewise elsewhere (attention
core `test_attention.py`, UNet/VAE `test_model_parity_torch.py`, CLIP vs
real transformers `test_weights.py`, LMS vs scipy `test_schedulers.py`,
initial noise bit-matched to ``torch.manual_seed`` via ``noise_mode=
"torch"``). This file proves the COMPOSITION: the reference's full
generation path (reference `paint_with_words/paint_with_words.py:391-510`
— encode → weight pyramid → [regional seeding] → per-step sigma → two
sequential UNet forwards with the dict-smuggled bias / zero weight-fns →
CFG → LMS step → VAE decode to uint8) is re-implemented here literally in
torch/scipy on a tiny config, consuming the SAME synthetic diffusers-layout
state dict the pipeline loads, and the pipeline's output must match to fp
tolerance — txt2img, the regional-seeding variant, and the img2img
strength-truncation variant.

With no real SD checkpoints in this environment this is the strongest
end-to-end fidelity proof that can exist here.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from scipy import integrate

from pww_tpu.config import SDModelConfig
from pww_tpu.pipeline.pipeline import PwwPipeline
from pww_tpu.tokenizer.clip_bpe import toy_tokenizer
from pww_tpu.weights.loader import clip_key, fill_params, unet_key, vae_keys

from test_model_parity_torch import (
    _synth_state,
    torch_unet_forward,
    torch_vae_decode,
)

STEPS = 5
GUIDANCE = 7.5
SIZE = 64  # image px; latent 8x8 with the tiny VAE's 8x downsampling


# ---------------------------------------------------------------------------
# torch-side replicas of the reference's host pipeline
# ---------------------------------------------------------------------------


class TorchLMS:
    """diffusers-0.10.0 ``LMSDiscreteScheduler``, re-derived: scaled-linear
    betas (reference `paint_with_words.py:197-202`), float linspace
    timesteps, integrated Lagrange coefficients via scipy, 4-term history,
    ``zip``-truncated to the derivatives actually accumulated."""

    ORDER = 4

    def __init__(self, num_steps, beta_start=0.00085, beta_end=0.012,
                 num_train=1000):
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train,
                            dtype=np.float64) ** 2
        ac = np.cumprod(1.0 - betas)
        sig_full = np.sqrt((1 - ac) / ac)
        self.timesteps = np.linspace(0, num_train - 1, num_steps)[::-1].copy()
        self.sigmas = np.concatenate(
            [np.interp(self.timesteps, np.arange(num_train), sig_full), [0.0]]
        ).astype(np.float32)
        self.init_noise_sigma = float(self.sigmas.max())
        self.derivatives = []

    def scale_model_input(self, sample, i):
        return sample / float((self.sigmas[i] ** 2 + 1) ** 0.5)

    def add_noise(self, original, noise, i):
        return original + noise * float(self.sigmas[i])

    def _coeff(self, order, t, j):
        def poly(tau):
            p = 1.0
            for k in range(order):
                if k != j:
                    p *= (tau - self.sigmas[t - k]) / (
                        self.sigmas[t - j] - self.sigmas[t - k]
                    )
            return p

        return integrate.quad(poly, self.sigmas[t], self.sigmas[t + 1],
                              epsrel=1e-4)[0]

    def step(self, eps, i, sample):
        # epsilon prediction: derivative == eps (pred_x0 = sample - sigma*eps)
        self.derivatives.append(eps)
        if len(self.derivatives) > self.ORDER:
            self.derivatives.pop(0)
        order = min(i + 1, self.ORDER)
        coeffs = [self._coeff(order, i, j) for j in range(order)]
        return sample + sum(
            c * d for c, d in zip(coeffs, reversed(self.derivatives))
        )


def _always_round(x):
    # reference `paint_with_words.py:18-26`
    intx = int(x)
    if intx % 2 == 0:
        return intx if x < intx + 0.5 else intx + 1
    return round(x)


def _torch_weight_pyramid(tok, cm, color_context, prompt_ids, extra_sigmas):
    """Literal replica of `_image_context_seperator` +
    `_tokens_img_attention_weight` over ratios 1/8/16/32/64 (reference
    `paint_with_words.py:207-276, 343-357`). ``color_context`` must already
    have seeds/sigmas stripped. Returns ({q_len: (q_len, 77)}, orig, ctxs).
    """
    seperated = []
    for idx, (color, v) in enumerate(color_context.items()):
        strength = float(v.split(",")[-1])
        label = ",".join(v.split(",")[:-1])
        v_ids = tok(label, max_length=tok.model_max_length,
                    truncation=True)["input_ids"][1:-1]
        mask = torch.tensor((cm == np.array(color)).all(-1),
                            dtype=torch.float32) * strength
        if idx in extra_sigmas:
            sigma = extra_sigmas[idx]
            k = 39
            xs = torch.arange(k, dtype=torch.float32) - (k - 1) / 2
            g1 = torch.exp(-(xs ** 2) / (2 * sigma ** 2))
            g1 = g1 / g1.sum()
            kern = g1[:, None] @ g1[None, :]
            mask = F.conv2d(mask[None, None], kern[None, None],
                            padding=k // 2)[0, 0]
        seperated.append((v_ids, mask))

    h, w = cm.shape[:2]
    token_lis = list(prompt_ids)

    def level(ratio, original_shape=False):
        h_r, w_r = _always_round(h / ratio), _always_round(w / ratio)
        out = torch.zeros((h_r * w_r, len(token_lis)))
        for v_ids, mask in seperated:
            for idx in range(len(token_lis)):
                if token_lis[idx : idx + len(v_ids)] == v_ids:
                    down = F.interpolate(mask[None, None], size=(h_r, w_r),
                                         mode="bilinear", align_corners=True)
                    out[:, idx : idx + len(v_ids)] += (
                        down.reshape(-1, 1).repeat(1, len(v_ids))
                    )
        if original_shape:
            return out.reshape(h_r, w_r, len(token_lis))
        return out

    weights = {}
    for ratio in (8, 16, 32, 64):
        lv = level(ratio)
        weights[lv.shape[0]] = lv
    return weights, level(1, original_shape=True), seperated


def _extract_seeds_sigmas(color_context):
    """reference `paint_with_words.py:279-297` (ignore_seed = -1)."""
    stripped, extra_seeds, extra_sigmas = {}, {}, {}
    for i, (k, ctx) in enumerate(color_context.items()):
        parts = ctx.split(",")
        if len(parts) > 2:
            try:
                seed = int(parts[-2])
                extra_sigmas[i] = float(parts[-1])
                parts = parts[:-2]
            except ValueError:
                seed = int(parts[-1])
                parts = parts[:-1]
            if seed != -1:
                extra_seeds[i] = seed
        stripped[k] = ",".join(parts)
    return stripped, extra_seeds, extra_sigmas


def torch_reference_generate(
    fix, prompt, cm, color_context, seed, steps=STEPS, guidance=GUIDANCE,
    init_latents=None, strength=0.5,
):
    """The reference's `paint_with_words(...)` body
    (`paint_with_words.py:391-510`), functional, on the shared tiny state."""
    tok = fix["tok"]
    ucfg = fix["cfg"].unet

    color_context, extra_seeds, extra_sigmas = _extract_seeds_sigmas(
        dict(color_context)
    )
    prompt_ids = tok(prompt, max_length=77, truncation=True,
                     padding="max_length")["input_ids"]
    uncond_ids = tok("", max_length=77, truncation=True,
                     padding="max_length")["input_ids"]
    with torch.no_grad():
        cond = fix["clip_model"](
            torch.tensor([prompt_ids])
        ).last_hidden_state
        uncond = fix["clip_model"](
            torch.tensor([uncond_ids])
        ).last_hidden_state
    weights, orig, seperated = _torch_weight_pyramid(
        tok, cm, color_context, prompt_ids, extra_sigmas
    )

    sched = TorchLMS(steps)
    h8, w8 = cm.shape[0] // 8, cm.shape[1] // 8
    latent_size = (1, 4, h8, w8)
    if init_latents is None:
        t_start = 0
        latents = torch.randn(latent_size, generator=torch.manual_seed(seed))
        if extra_seeds:
            # regional seeding (reference `paint_with_words.py:446-455`)
            multi = [
                torch.randn(latent_size, generator=torch.manual_seed(s))
                for s in extra_seeds.values()
            ]
            masks = [
                F.interpolate(
                    (seperated[k][1] > 0).float()[None, None],
                    size=latent_size[-2:], mode="bilinear",
                )
                for k in extra_seeds.keys()
            ]
            foreground = (sum(masks) > 0).squeeze()
            summed = sum(l * m for l, m in zip(multi, masks))
            latents[:, :, foreground] = summed[:, :, foreground]
        latents = latents * sched.init_noise_sigma
    else:
        # img2img truncation (reference `paint_with_words.py:431-441,458-468`)
        init_timestep = min(int(steps * strength), steps)
        t_start = max(steps - init_timestep, 0)
        noise = torch.randn(latent_size, generator=torch.manual_seed(seed))
        latents = sched.add_noise(torch.as_tensor(init_latents), noise,
                                  t_start)

    # reference default weight function (`paint_with_words.py:402-405`)
    def weight_fn(w, sigma, qk):
        return 0.1 * w * math.log(sigma + 1) * qk.max()

    ukw = dict(
        channels=ucfg.block_out_channels, layers=ucfg.layers_per_block,
        groups=ucfg.norm_num_groups, has_attn=ucfg.down_block_has_attn,
        heads_of=lambda ch: ucfg.num_attention_heads,
    )
    with torch.no_grad():
        for i in range(t_start, steps):
            sigma = float(sched.sigmas[i])
            t = torch.tensor([sched.timesteps[i]], dtype=torch.float32)
            lat_in = sched.scale_model_input(latents, i)
            eps_text = torch_unet_forward(
                fix["state_unet"], lat_in, t, cond,
                pww={"weights": weights, "orig": orig, "sigma": sigma,
                     "fn": weight_fn},
                **ukw,
            )
            # uncond pass: weights int 0 + zero fn == plain attention
            # (reference `paint_with_words.py:491-499`)
            eps_uncond = torch_unet_forward(
                fix["state_unet"], lat_in, t, uncond, pww=None, **ukw,
            )
            eps = eps_uncond + guidance * (eps_text - eps_uncond)
            latents = sched.step(eps, i, latents)

        # `_pil_from_latents` (reference `paint_with_words.py:48-57`)
        vcfg = fix["cfg"].vae
        img = torch_vae_decode(
            fix["state_vae"], latents / vcfg.scaling_factor,
            vcfg.block_out_channels, vcfg.layers_per_block,
            vcfg.norm_num_groups,
        )
    img = ((img / 2 + 0.5).clamp(0, 1).permute(0, 2, 3, 1).numpy())
    return latents.numpy(), (img * 255).round().astype(np.uint8)[0]


def torch_reference_generate_inpaint(
    fix, prompt, cm, color_context, seed, init_image, mask_image,
    steps=STEPS, guidance=GUIDANCE, strength=0.8,
):
    """The reference's `paint_with_words_inpaint(...)` body, functional:
    `prepare_mask_and_masked_image` + `prepare_mask_latents` + the 9-channel
    per-step concat loop (reference
    `paint_with_words/paint_with_words_inpaint.py:20-134, 171-266`).

    The reference samples BOTH VAE posteriors (init image, masked image)
    with unseeded global torch RNG — irreproducible by construction — so
    both sides of this proof use the posterior mean (`vae_sample_mode=
    "mean"` on the pipeline side; the reference's masked-image sample is
    within posterior noise of this, see pww_tpu/pipeline/inpaint.py note).
    """
    from test_model_parity_torch import torch_vae_encode

    tok = fix["tok"]
    ucfg = fix["cfg"].unet
    vcfg = fix["cfg"].vae

    color_context, _extra_seeds, extra_sigmas = _extract_seeds_sigmas(
        dict(color_context)
    )
    prompt_ids = tok(prompt, max_length=77, truncation=True,
                     padding="max_length")["input_ids"]
    uncond_ids = tok("", max_length=77, truncation=True,
                     padding="max_length")["input_ids"]
    with torch.no_grad():
        cond = fix["clip_model"](torch.tensor([prompt_ids])).last_hidden_state
        uncond = fix["clip_model"](
            torch.tensor([uncond_ids])
        ).last_hidden_state
    weights, orig, _sep = _torch_weight_pyramid(
        tok, cm, color_context, prompt_ids, extra_sigmas
    )

    sched = TorchLMS(steps)
    h, w = cm.shape[:2]

    # prepare_mask_and_masked_image (reference inpaint.py:93-106): image to
    # [-1, 1], mask binarized at 0.5, masked = image * (mask < 0.5)
    image = torch.from_numpy(
        np.asarray(init_image, np.float32)[None].transpose(0, 3, 1, 2)
    ) / 127.5 - 1.0
    mask = np.asarray(mask_image, np.float32)[None, None].copy()
    mask[mask < 0.5] = 0
    mask[mask >= 0.5] = 1
    mask = torch.from_numpy(mask)
    masked_image = image * (mask < 0.5)

    # strength truncation (reference inpaint.py:181-186; LMS offset = 0)
    init_timestep = min(int(steps * strength), steps)
    t_start = max(steps - init_timestep, 0)

    # init latents: VAE-encode + noise at the truncated start
    # (reference inpaint.py:189-198); posterior mean (docstring above)
    with torch.no_grad():
        moments = torch_vae_encode(
            fix["state_vae"], image, vcfg.block_out_channels,
            vcfg.layers_per_block, vcfg.norm_num_groups,
        )
    init_latents = moments.chunk(2, dim=1)[0] * vcfg.scaling_factor
    noise = torch.randn(init_latents.shape,
                        generator=torch.manual_seed(seed))
    latents = sched.add_noise(init_latents, noise, t_start)

    # prepare_mask_latents (reference inpaint.py:112-138): nearest mask
    # downsample to //8, VAE(masked image) latents; then the no-op second
    # nearest interpolate to latents' spatial dims (inpaint.py:213-214)
    mask_lat = F.interpolate(mask, size=(h // 8, w // 8))
    with torch.no_grad():
        m_moments = torch_vae_encode(
            fix["state_vae"], masked_image, vcfg.block_out_channels,
            vcfg.layers_per_block, vcfg.norm_num_groups,
        )
    masked_lat = m_moments.chunk(2, dim=1)[0] * vcfg.scaling_factor
    mask_lat = F.interpolate(mask_lat, size=latents.shape[-2:],
                             mode="nearest")
    masked_lat = F.interpolate(masked_lat, size=latents.shape[-2:],
                               mode="nearest")
    assert (latents.shape[1] + mask_lat.shape[1] + masked_lat.shape[1]
            == ucfg.in_channels)

    def weight_fn(w_, sigma, qk):
        return 0.1 * w_ * math.log(sigma + 1) * qk.max()

    ukw = dict(
        channels=ucfg.block_out_channels, layers=ucfg.layers_per_block,
        groups=ucfg.norm_num_groups, has_attn=ucfg.down_block_has_attn,
        heads_of=lambda ch: ucfg.num_attention_heads,
    )
    with torch.no_grad():
        for i in range(t_start, steps):
            sigma = float(sched.sigmas[i])
            t = torch.tensor([sched.timesteps[i]], dtype=torch.float32)
            lat_in = sched.scale_model_input(latents, i)
            lat_in = torch.cat([lat_in, mask_lat, masked_lat], dim=1)
            eps_text = torch_unet_forward(
                fix["state_unet"], lat_in, t, cond,
                pww={"weights": weights, "orig": orig, "sigma": sigma,
                     "fn": weight_fn},
                **ukw,
            )
            eps_uncond = torch_unet_forward(
                fix["state_unet"], lat_in, t, uncond, pww=None, **ukw,
            )
            eps = eps_uncond + guidance * (eps_text - eps_uncond)
            latents = sched.step(eps, i, latents)

        img = torch_vae_decode(
            fix["state_vae"], latents / vcfg.scaling_factor,
            vcfg.block_out_channels, vcfg.layers_per_block,
            vcfg.norm_num_groups,
        )
    img = ((img / 2 + 0.5).clamp(0, 1).permute(0, 2, 3, 1).numpy())
    return latents.numpy(), (img * 255).round().astype(np.uint8)[0]


# ---------------------------------------------------------------------------
# shared tiny state: one synthetic checkpoint feeds both implementations
# ---------------------------------------------------------------------------


def _make_fixture(cfg):
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    tok = toy_tokenizer(cfg.clip.vocab_size)
    gen = np.random.default_rng(7)

    torch.manual_seed(0)
    clip_model = CLIPTextModel(
        HFConfig(
            vocab_size=cfg.clip.vocab_size, hidden_size=cfg.clip.hidden_size,
            intermediate_size=cfg.clip.intermediate_size,
            num_hidden_layers=cfg.clip.num_layers,
            num_attention_heads=cfg.clip.num_heads,
            max_position_embeddings=cfg.clip.max_position_embeddings,
            hidden_act="quick_gelu",
        )
    ).eval()
    state_clip = {k: v.numpy() for k, v in clip_model.state_dict().items()}

    pipe0 = PwwPipeline.__new__(PwwPipeline)
    pipe0.config = cfg
    from pww_tpu.models.clip import CLIPTextEncoder
    from pww_tpu.models.unet import UNet2DCondition
    from pww_tpu.models.vae import AutoencoderKL

    pipe0.clip = CLIPTextEncoder(cfg.clip, dtype=jnp.float32)
    pipe0.clip2 = None
    pipe0.unet = UNet2DCondition(cfg.unet, dtype=jnp.float32)
    pipe0.vae = AutoencoderKL(cfg.vae, dtype=jnp.float32)
    shapes = jax.eval_shape(lambda: pipe0.init_params(0))

    state_unet = _synth_state(shapes["unet"], unet_key, gen)
    state_vae = _synth_state(shapes["vae"], vae_keys, gen, multi=True)
    params = {
        "clip": fill_params(shapes["clip"], state_clip, clip_key, name="clip"),
        "unet": fill_params(shapes["unet"], state_unet, unet_key, name="unet"),
        "vae": fill_params(shapes["vae"], state_vae, vae_keys, multi=True,
                           name="vae"),
    }
    pipe = PwwPipeline(
        config=cfg, params=params, tokenizer=tok, scheduler="lms",
        compute_dtype=jnp.float32, weights_dtype=None,
    )
    return {
        "cfg": cfg, "tok": tok, "clip_model": clip_model, "pipe": pipe,
        "state_unet": state_unet, "state_vae": state_vae,
    }


@pytest.fixture(scope="module")
def fix():
    return _make_fixture(SDModelConfig.tiny())


@pytest.fixture(scope="module")
def fix9():
    """9-channel inpainting UNet (runwayml/stable-diffusion-inpainting
    layout: 4 latent + 1 mask + 4 masked-image channels)."""
    return _make_fixture(SDModelConfig.tiny(in_channels=9))


def _color_map():
    cm = np.zeros((SIZE, SIZE, 3), np.uint8)
    cm[:, : SIZE // 2] = (255, 0, 0)
    cm[:, SIZE // 2 :] = (0, 0, 255)
    return cm


def _assert_composition(fix, kwargs_pipe, want_lat, want_img):
    got_lat = np.asarray(
        fix["pipe"].generate(return_latents=True, **kwargs_pipe)
    )
    # NHWC -> NCHW for comparison against the torch trajectory
    got_lat = np.transpose(got_lat, (0, 3, 1, 2))
    np.testing.assert_allclose(got_lat, want_lat, atol=2e-3, rtol=1e-3)
    got_img = np.asarray(fix["pipe"].generate(output_type="np", **kwargs_pipe))
    diff = np.abs(got_img[0].astype(int) - want_img.astype(int))
    assert diff.max() <= 2, f"uint8 image diff max {diff.max()}"
    assert diff.mean() < 0.05, f"uint8 image diff mean {diff.mean()}"


def test_full_loop_matches_reference_txt2img(fix):
    cm = _color_map()
    ctx = {(255, 0, 0): "cat,0.8", (0, 0, 255): "dog,0.5"}
    prompt = "a cat and a dog playing chess"
    want_lat, want_img = torch_reference_generate(fix, prompt, cm, ctx, seed=11)
    _assert_composition(
        fix,
        dict(prompt=prompt, color_map_image=cm, color_context=ctx,
             num_inference_steps=STEPS, guidance_scale=GUIDANCE, seed=11,
             noise_mode="torch"),
        want_lat, want_img,
    )


def test_full_loop_matches_reference_regional_seed(fix):
    cm = _color_map()
    # region 0 carries an extra seed (3rd field) -> regional composite
    ctx = {(255, 0, 0): "cat,0.8,42", (0, 0, 255): "dog,0.5"}
    prompt = "a cat and a dog playing chess"
    want_lat, want_img = torch_reference_generate(fix, prompt, cm, ctx, seed=11)
    _assert_composition(
        fix,
        dict(prompt=prompt, color_map_image=cm, color_context=ctx,
             num_inference_steps=STEPS, guidance_scale=GUIDANCE, seed=11,
             noise_mode="torch"),
        want_lat, want_img,
    )


def test_full_loop_matches_reference_img2img(fix):
    cm = _color_map()
    ctx = {(255, 0, 0): "cat,0.8", (0, 0, 255): "dog,0.5"}
    prompt = "a cat and a dog playing chess"
    # shared SCALED init latents on both sides (the VAE-encode equality is
    # proven piecewise; reference samples its posterior with unseeded global
    # RNG, reference `paint_with_words.py:460-463`, so latent injection is
    # the only deterministic meeting point)
    init = np.random.default_rng(3).standard_normal(
        (1, 4, SIZE // 8, SIZE // 8)
    ).astype(np.float32)
    want_lat, want_img = torch_reference_generate(
        fix, prompt, cm, ctx, seed=11, init_latents=init, strength=0.6,
    )
    _assert_composition(
        fix,
        dict(prompt=prompt, color_map_image=cm, color_context=ctx,
             num_inference_steps=STEPS, guidance_scale=GUIDANCE, seed=11,
             noise_mode="torch", strength=0.6,
             init_latents=np.transpose(init, (0, 2, 3, 1))),
        want_lat, want_img,
    )


def test_full_loop_matches_reference_inpaint(fix9):
    """The reference's 4th entry point: `paint_with_words_inpaint` — mask
    prep, both VAE encodes, strength truncation, and the per-step 9-channel
    concat — against `PwwPipeline.generate(mask_image=...)` on the shared
    9-channel tiny checkpoint."""
    cm = _color_map()
    ctx = {(255, 0, 0): "cat,0.8", (0, 0, 255): "dog,0.5"}
    prompt = "a cat and a dog playing chess"
    # deterministic init image + mask (right-half hole crossing both regions)
    rng = np.random.default_rng(5)
    init = rng.integers(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)
    mask = np.zeros((SIZE, SIZE), np.uint8)
    mask[SIZE // 4 : 3 * SIZE // 4, SIZE // 3 :] = 255

    want_lat, want_img = torch_reference_generate_inpaint(
        fix9, prompt, cm, ctx, seed=11, init_image=init, mask_image=mask,
        strength=0.8,
    )
    _assert_composition(
        fix9,
        dict(prompt=prompt, color_map_image=cm, color_context=ctx,
             init_image=init, mask_image=mask.astype(np.float32) / 255.0,
             num_inference_steps=STEPS, guidance_scale=GUIDANCE, seed=11,
             noise_mode="torch", vae_sample_mode="mean", strength=0.8),
        want_lat, want_img,
    )
