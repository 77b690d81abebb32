"""LoRA TRAINING (Hu et al. 2021) — learn low-rank adapters on a frozen SD.

The reference ecosystem trains LoRA upstream with GPU scripts (kohya-ss);
here the loop is TPU-native: one jitted step where the low-rank factors are
the ONLY trainables — the loss merges ``W + (alpha/r)·A@B`` into the frozen
UNet parameters functionally inside the step (pure tree surgery; gradients
flow through the merge into the factors), then ε-prediction MSE, optax Adam.
No module rewiring, no adapter forward path: the same merge that
:meth:`~pww_tpu.pipeline.pipeline.PwwPipeline.load_lora` applies at
inference is what is differentiated at training time, so train → save →
load round-trips exactly.

Typical use::

    pipe = PwwPipeline.from_pretrained(...)
    result = train_lora(pipe, images, captions, rank=8, num_steps=1000)
    result.save("my_style_lora.safetensors")   # kohya format
    pipe.load_lora(result.state_dict())        # or the saved file
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# attention linears — kohya's default UNet target set
DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out")


@dataclasses.dataclass
class LoraTrainResult:
    """Trained factors + bookkeeping.

    Factors are stored in flax layout: ``a`` (in, r) @ ``b`` (r, out);
    the kohya export transposes to ``lora_down`` (r, in) / ``lora_up``
    (out, r) torch layout.
    """

    factors: Dict[Tuple[str, ...], Dict[str, np.ndarray]]
    alpha: float
    rank: int
    losses: List[float]

    def state_dict(self) -> Dict[str, np.ndarray]:
        """kohya-format flat state dict (loadable by ``load_lora``)."""
        from ..weights.loader import unet_key

        sd = {}
        for path, f in self.factors.items():
            dkey = unet_key(path, 2)[0][: -len(".weight")]
            name = "lora_unet_" + dkey.replace(".", "_")
            sd[name + ".lora_down.weight"] = np.ascontiguousarray(
                np.asarray(f["a"], np.float32).T
            )
            sd[name + ".lora_up.weight"] = np.ascontiguousarray(
                np.asarray(f["b"], np.float32).T
            )
            sd[name + ".alpha"] = np.full((), self.alpha, np.float32)
        return sd

    def save(self, path: str) -> None:
        from safetensors.numpy import save_file

        save_file(self.state_dict(), path)


def _target_paths(
    unet_params, targets: Sequence[str]
) -> List[Tuple[int, Tuple[str, ...]]]:
    """(flat position, path) of every 2-D kernel whose module matches."""
    flat = jax.tree_util.tree_flatten_with_path(unet_params)[0]
    out = []
    for pos, (keypath, leaf) in enumerate(flat):
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        path = tuple(p for p in path if p != "params")
        if (
            path[-1] == "kernel"
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and path[-2] in targets
            and any("attn" in p for p in path)
        ):
            out.append((pos, path))
    return out


def train_lora(
    pipeline,
    images: Sequence,
    captions,  # str or Sequence[str] (one per image)
    rank: int = 8,
    alpha: Optional[float] = None,
    targets: Sequence[str] = DEFAULT_TARGETS,
    num_steps: int = 500,
    batch_size: int = 1,
    learning_rate: float = 1e-4,
    seed: int = 0,
    log_every: Optional[int] = None,
) -> LoraTrainResult:
    """Train UNet attention LoRA factors on a frozen pipeline.

    ``pipeline`` is NOT mutated — apply the result with
    ``pipeline.load_lora(result.state_dict())`` (or save + load the file).
    """
    import optax

    from .textual_inversion import _encode_images

    if isinstance(captions, str):
        captions = [captions] * len(images)
    if len(captions) != len(images):
        raise ValueError("need one caption per image (or a single str)")
    alpha = float(rank if alpha is None else alpha)
    scale = alpha / rank

    cfg = pipeline.config
    if cfg.is_xl:
        raise NotImplementedError(
            "train_lora currently targets single-encoder SD models (the XL "
            "micro-conditioning path is inference-only here); train on "
            "SD-1.x/2.x or use an upstream XL LoRA via load_lora"
        )
    unet = pipeline.unet
    unet_params = pipeline.params["unet"]
    flat, treedef = jax.tree_util.tree_flatten(unet_params)
    sites = _target_paths(unet_params, targets)
    if not sites:
        raise ValueError(f"no UNet attention kernels match targets={targets}")

    # -- factor init: A ~ N(0, 1/r), B = 0 (delta starts at zero) ------------
    k0 = jax.random.PRNGKey(seed)
    factors = {}
    for i, (pos, path) in enumerate(sites):
        in_dim, out_dim = flat[pos].shape
        ka = jax.random.fold_in(k0, i)
        factors[path] = {
            "a": jax.random.normal(ka, (in_dim, rank), jnp.float32) / rank,
            "b": jnp.zeros((rank, out_dim), jnp.float32),
        }
    pos_by_path = {path: pos for pos, path in sites}

    def merged_unet_params(fs):
        leaves = list(flat)
        for path, f in fs.items():
            pos = pos_by_path[path]
            base = flat[pos]
            delta = scale * (f["a"] @ f["b"])
            leaves[pos] = (base.astype(jnp.float32) + delta).astype(base.dtype)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # -- frozen text conditioning (one encode per caption) -------------------
    max_len = pipeline.tokenizer.model_max_length
    ids = np.asarray(
        [pipeline.tokenizer(c, max_length=max_len, truncation=True,
                            padding="max_length")["input_ids"] for c in captions],
        np.int32,
    )
    enc = pipeline.encode_text(jnp.asarray(ids))
    text_states = (enc[0] if isinstance(enc, tuple) else enc).astype(jnp.float32)

    latents = _encode_images(pipeline, images)  # (M, h, w, 4)
    from ..schedulers.schedules import make_betas

    alphas_cumprod = jnp.asarray(
        np.cumprod(1.0 - make_betas(cfg.scheduler)), jnp.float32
    )
    prediction_type = cfg.unet.prediction_type

    tx = optax.adam(learning_rate)
    opt_state = tx.init(factors)

    @jax.jit
    def train_step(fs, opt_state, rng):
        k_img, k_t, k_eps = jax.random.split(rng, 3)
        idx = jax.random.randint(k_img, (batch_size,), 0, latents.shape[0])
        t = jax.random.randint(
            k_t, (batch_size,), 0, cfg.scheduler.num_train_timesteps
        )
        x0 = latents[idx]
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        a_t = alphas_cumprod[t][:, None, None, None]
        noised = jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * eps
        if prediction_type == "v_prediction":
            target = jnp.sqrt(a_t) * eps - jnp.sqrt(1.0 - a_t) * x0
        else:
            target = eps

        def loss_fn(fs):
            pred = unet.apply(
                merged_unet_params(fs),
                noised.astype(unet.dtype),
                t.astype(jnp.float32),
                text_states[idx].astype(unet.dtype),
            )
            return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(fs)
        updates, opt_state = tx.update(grads, opt_state, fs)
        return loss, optax.apply_updates(fs, updates), opt_state

    rng = jax.random.PRNGKey(seed + 1)
    losses: List[float] = []
    for step in range(num_steps):
        rng, k = jax.random.split(rng)
        loss, factors, opt_state = train_step(factors, opt_state, k)
        losses.append(float(loss))
        if log_every and (step + 1) % log_every == 0:
            print(f"LoRA step {step + 1}/{num_steps}: loss {losses[-1]:.5f}")

    return LoraTrainResult(
        factors={
            p: {k: np.asarray(v) for k, v in f.items()}
            for p, f in factors.items()
        },
        alpha=alpha,
        rank=rank,
        losses=losses,
    )
