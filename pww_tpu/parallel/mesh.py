"""Device-mesh construction and sharding rules (DP + TP over ICI).

The reference is strictly single-device (a ``device`` string,
reference `paint_with_words/paint_with_words.py:129, 401`; multi-sample is a
serial host loop, `gradio_pww.py:31-45`). The TPU build scales two ways:

  * **data parallel** (``dp`` axis): the sample batch — and the CFG pair's N
    copies — shard across chips; zero communication except the final gather.
  * **tensor parallel** (``tp`` axis): attention-head and MLP inner dims of
    the UNet shard across chips; XLA inserts the psum after ``to_out`` /
    ``ff.proj_out`` automatically from the param shardings (scaling-book
    recipe: annotate, let SPMD propagate, collectives ride ICI).

No PP/EP/ring-attention: sequence lengths are ≤4096 image tokens + 77 text
tokens (SURVEY.md §5 long-context row), so DP×TP saturates a v5e pod slice.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host execution (DCN across slices, ICI within).

    Thin wrapper over ``jax.distributed.initialize`` — on Cloud TPU pods the
    arguments auto-detect from the metadata server; pass them explicitly for
    manual clusters. Call once per process before any jax op; then
    :func:`make_mesh` over ``jax.devices()`` spans every host's chips and the
    pjit-inserted collectives ride ICI within a slice / DCN across slices.
    Returns this process's index.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, devices=None
) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: all devices on the dp axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


# ---------------------------------------------------------------------------
# parameter partitioning rules (tensor parallel)
# ---------------------------------------------------------------------------

# (regex over the '/'-joined flax param path) -> PartitionSpec
_TP_RULES = [
    # attention projections: shard heads (output dim) for q/k/v, input for out
    (r".*attn\d/to_(q|k|v)/kernel$", P(None, TP_AXIS)),
    (r".*attn\d/to_out/kernel$", P(TP_AXIS, None)),
    (r".*attn\d/to_out/bias$", P(None)),
    # GEGLU feed-forward: inner dim sharded
    (r".*/ff/proj_in/kernel$", P(None, TP_AXIS)),
    (r".*/ff/proj_in/bias$", P(TP_AXIS)),
    (r".*/ff/proj_out/kernel$", P(TP_AXIS, None)),
]


def param_pspec(path: str) -> P:
    for pat, spec in _TP_RULES:
        if re.fullmatch(pat, path):
            return spec
    return P()  # replicated


def shard_params(params, mesh: Mesh):
    """Apply TP rules to a param pytree; replicate everything else."""

    def place(keypath, x):
        path = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in keypath
        )
        spec = param_pspec(path)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(tree, mesh: Mesh):
    """Shard the leading (batch) axis of every array in a pytree over dp."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % mesh.shape[DP_AXIS] == 0:
            spec = P(DP_AXIS, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def shard_spatial(latents, mesh: Mesh):
    """Shard the latent HEIGHT axis over the dp axis — single-image model
    parallelism for high resolutions (the honest CP analogue for images,
    SURVEY.md §5 long-context row). GSPMD inserts the conv halo exchanges and
    attention all-gathers automatically; verified equal to single-device to
    ~1e-6 relative (tests/test_sharding.py)."""
    if latents.shape[1] % mesh.shape[DP_AXIS] != 0:
        return jax.device_put(latents, NamedSharding(mesh, P()))
    return jax.device_put(
        latents, NamedSharding(mesh, P(None, DP_AXIS, None, None))
    )


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
