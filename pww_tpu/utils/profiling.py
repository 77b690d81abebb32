"""Tracing / metrics / debug observability.

The reference's only observability is tqdm bars and prints (SURVEY.md §5:
tracing absent, metrics print-based). Here:

  * :class:`PhaseTimer` — wall-clock per pipeline phase (encode / denoise /
    decode) with ``jax.block_until_ready`` boundaries for honest device
    timings, accumulated into queryable counters (images/sec, p50).
  * :func:`trace` — context manager around ``jax.profiler`` for TensorBoard
    traces of the compiled programs.
  * :func:`enable_nan_checks` — flips ``jax_debug_nans`` (deterministic jit
    makes a race detector unnecessary; NaN origin is the useful debug signal).
"""
from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax


class PhaseTimer:
    """Accumulates per-phase timings; every ``phase()`` block syncs the device."""

    def __init__(self):
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.times[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self.times[name].append(seconds)

    def p50(self, name: str) -> Optional[float]:
        xs = self.times.get(name)
        return statistics.median(xs) if xs else None

    def total(self, name: str) -> float:
        return sum(self.times.get(name, []))

    def images_per_sec(self, name: str, images_per_call: int = 1) -> Optional[float]:
        p = self.p50(name)
        return images_per_call / p if p else None

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "count": len(v),
                "p50_s": statistics.median(v),
                "total_s": sum(v),
            }
            for k, v in self.times.items()
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pww_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)
