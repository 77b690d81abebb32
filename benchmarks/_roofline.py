"""Shared per-chip datasheet constants + timing helpers for the
benchmarks/ profile harnesses.

The bf16 peak-FLOPs table's single source is ``bench.py`` (the driver-run
artifact stays self-contained); this module re-exports it and owns the
HBM-bandwidth table, so adding/correcting a chip happens in exactly one
place per constant instead of three.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _PEAK_BF16_FLOPS as PEAK_FLOPS  # noqa: E402

# per-chip HBM bandwidth (bytes/s): v5e HBM2; v5p / v6e (Trillium) / v4
# per their public datasheets
HBM_BW = {"v5": 819e9, "v5p": 2765e9, "v6": 1640e9, "v4": 1228e9}


def chip(table):
    """Look up the current device's entry by device_kind substring
    (longest key first, so 'v5p' wins over 'v5'); None when unknown
    (e.g. CPU), which callers report as roofline n/a."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for sub, v in sorted(table.items(), key=lambda kv: -len(kv[0])):
        if sub in kind:
            return v
    return None


def med(fn, reps, warm=1):
    """Median wall time of ``fn()`` over ``reps`` runs after ``warm``
    untimed warmups. Callers make fn() end in an np.asarray fetch — the
    tunnel makes block_until_ready unreliable (CLAUDE.md)."""
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))
