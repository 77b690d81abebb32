"""Textual-inversion TRAINING (Gal et al. 2022) — learn a new concept token.

The reference only *consumes* pre-trained embeddings (its TI notebook
downloads ``learned_embeds.bin`` from sd-concepts-library and injects it,
`contents/notebooks/paint_with_words_textual_inversion.ipynb`); training
happens upstream. Here the training loop itself is TPU-native: one jitted
step (VAE-latent noising → CLIP → UNet ε-prediction → MSE), gradients taken
ONLY w.r.t. the CLIP token-embedding table and masked to the new placeholder
rows, optax Adam on those rows. Everything else (UNet, VAE, rest of CLIP)
stays frozen, exactly like the upstream recipe.

Typical use::

    pipe = PwwPipeline.from_pretrained(...)
    result = train_textual_inversion(pipe, images, "<my-cat>",
                                     initializer_token="cat", num_steps=3000)
    result.save("learned_embeds.bin")        # diffusers format
    pipe.generate(prompt="a photo of <my-cat>", ...)
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# The standard CLIP-style prompt templates from the textual-inversion paper
# (trimmed set; enough prompt diversity for the embedding to generalize).
DEFAULT_TEMPLATES = (
    "a photo of a {}",
    "a rendering of a {}",
    "the photo of a {}",
    "a photo of my {}",
    "a photo of the {}",
    "a close-up photo of a {}",
    "a bright photo of the {}",
    "a cropped photo of a {}",
    "a good photo of the {}",
    "a photo of one {}",
)


@dataclasses.dataclass
class TIResult:
    """Trained embedding + bookkeeping."""

    placeholder: str
    embedding: np.ndarray  # (n_vectors, hidden)
    losses: List[float]

    def save(self, path: str) -> None:
        """Write in the diffusers ``{token: vec}`` format (torch-loadable by
        :func:`pww_tpu.weights.textual_inversion.read_learned_embedding`)."""
        import torch

        vec = self.embedding[0] if self.embedding.shape[0] == 1 else self.embedding
        torch.save({self.placeholder: torch.from_numpy(np.asarray(vec))}, path)


def _encode_images(pipeline, images) -> jnp.ndarray:
    """Images → scaled VAE latents (posterior mean; deterministic)."""
    from ..models.vae import AutoencoderKL
    from ..pipeline.pipeline import _preprocess_image

    scale = pipeline.config.vae.scaling_factor
    lats = []
    for im in images:
        x = _preprocess_image(im)
        moments = pipeline.vae.apply(
            pipeline.params["vae"], x, method=AutoencoderKL.encode_moments
        )
        mean = jnp.split(moments, 2, axis=-1)[0]
        lats.append(mean * scale)
    return jnp.concatenate(lats, axis=0).astype(jnp.float32)


def train_textual_inversion(
    pipeline,
    images: Sequence,
    placeholder: str,
    initializer_token: str = "thing",
    num_vectors: int = 1,
    num_steps: int = 500,
    batch_size: int = 1,
    learning_rate: float = 5e-3,
    seed: int = 0,
    templates: Sequence[str] = DEFAULT_TEMPLATES,
    log_every: Optional[int] = None,
) -> TIResult:
    """Learn ``placeholder`` from ``images`` on a frozen SD pipeline.

    Mutates ``pipeline`` in place (tokenizer + grown CLIP table, like
    :func:`~pww_tpu.weights.textual_inversion.apply_textual_inversion`), so
    the concept is immediately usable in prompts AND color-context labels.
    Returns a :class:`TIResult` whose ``.save()`` writes the diffusers file.
    """
    import optax

    from ..models.clip import CLIPTextEncoder

    if pipeline.config.is_xl:
        # Validate BEFORE mutating: the tokenizer add below is shared state,
        # and the train step would feed tower-1 hidden states into a UNet
        # expecting the concatenated dual-encoder context.
        raise NotImplementedError(
            "train_textual_inversion currently targets single-encoder SD "
            "models (the XL dual-encoder/micro-conditioning path is "
            "inference-only here); train on SD-1.x/2.x or inject an "
            "upstream XL embedding via apply_textual_inversion"
        )

    tokenizer = pipeline.tokenizer
    clip_params = pipeline.params["clip"]
    table = jnp.asarray(clip_params["params"]["token_embedding"]["embedding"])
    hidden = table.shape[-1]

    # -- init the new rows from the initializer token's embedding -----------
    init_ids = tokenizer(initializer_token)["input_ids"]
    init_ids = [i for i in init_ids if i not in
                (tokenizer.bos_token_id, tokenizer.eos_token_id)]
    init_row = (
        table[init_ids[0]] if init_ids else table.mean(axis=0)
    ).astype(jnp.float32)

    names = [placeholder] + [f"{placeholder}_{i}" for i in range(1, num_vectors)]
    for name in names:
        tokenizer.add_tokens(name)
    new_rows = jnp.tile(init_row[None], (num_vectors, 1))
    table = jnp.concatenate([table.astype(jnp.float32), new_rows], axis=0)
    n_vocab = table.shape[0]
    row_mask = jnp.zeros((n_vocab, 1), jnp.float32).at[-num_vectors:].set(1.0)

    # rebuild the (static-shape) CLIP for the grown vocab
    clip_cfg = dataclasses.replace(pipeline.config.clip, vocab_size=n_vocab)
    clip = CLIPTextEncoder(clip_cfg, dtype=pipeline.compute_dtype)

    def with_table(tab):
        return {
            **clip_params,
            "params": {
                **clip_params["params"],
                "token_embedding": {"embedding": tab.astype(jnp.float32)},
            },
        }

    # -- data: latents + tokenized templates --------------------------------
    latents = _encode_images(pipeline, images)  # (M, h, w, 4)
    phrase = " ".join(names)
    max_len = tokenizer.model_max_length
    ids = np.asarray(
        [tokenizer(t.format(phrase), max_length=max_len, truncation=True,
                   padding="max_length")["input_ids"] for t in templates],
        np.int32,
    )  # (T, 77)
    ids = jnp.asarray(ids)

    cfg = pipeline.config
    betas = _betas(cfg.scheduler)
    alphas_cumprod = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)
    prediction_type = cfg.unet.prediction_type

    unet = pipeline.unet
    unet_params = pipeline.params["unet"]

    tx = optax.adam(learning_rate)
    opt_state = tx.init(table)

    @jax.jit
    def train_step(tab, opt_state, rng):
        k_img, k_tpl, k_t, k_eps = jax.random.split(rng, 4)
        img_idx = jax.random.randint(k_img, (batch_size,), 0, latents.shape[0])
        tpl_idx = jax.random.randint(k_tpl, (batch_size,), 0, ids.shape[0])
        t = jax.random.randint(
            k_t, (batch_size,), 0, cfg.scheduler.num_train_timesteps
        )
        x0 = latents[img_idx]
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        a_t = alphas_cumprod[t][:, None, None, None]
        noised = jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * eps
        if prediction_type == "v_prediction":
            target = jnp.sqrt(a_t) * eps - jnp.sqrt(1.0 - a_t) * x0
        else:
            target = eps

        def loss_fn(tab):
            text = clip.apply(with_table(tab), ids[tpl_idx])
            pred = unet.apply(
                unet_params,
                noised.astype(unet.dtype),
                t.astype(jnp.float32),
                text.astype(unet.dtype),
            )
            return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(tab)
        grads = grads * row_mask  # only the placeholder rows learn
        updates, opt_state = tx.update(grads, opt_state, tab)
        return loss, optax.apply_updates(tab, updates), opt_state

    rng = jax.random.PRNGKey(seed)
    losses: List[float] = []
    for step in range(num_steps):
        rng, k = jax.random.split(rng)
        loss, table, opt_state = train_step(table, opt_state, k)
        losses.append(float(loss))
        if log_every and (step + 1) % log_every == 0:
            print(f"TI step {step + 1}/{num_steps}: loss {losses[-1]:.5f}")

    # -- install the trained table into the pipeline ------------------------
    pipeline.config = dataclasses.replace(pipeline.config, clip=clip_cfg)
    pipeline.clip = CLIPTextEncoder(clip_cfg, dtype=pipeline.compute_dtype)
    pipeline.params = {**pipeline.params, "clip": with_table(table)}
    # Both conditioning caches key on the prompt STRING: a pre-training
    # generate() of the placeholder prompt is cached with the old table, so
    # a plain _text_cache clear would leave _encode_cache serving stale
    # conditioning (the learned concept silently absent). The pipeline's
    # invalidation helper clears both under the encode lock.
    pipeline.invalidate_encode_caches()

    return TIResult(
        placeholder=phrase,
        embedding=np.asarray(table[-num_vectors:]),
        losses=losses,
    )


def _betas(sch_cfg) -> np.ndarray:
    from ..schedulers.schedules import make_betas

    return make_betas(sch_cfg)
