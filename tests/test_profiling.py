"""Observability helpers (`pww_tpu/utils/profiling.py`).

The reference has no tracing/metrics subsystem (SURVEY.md §5); these are the
counters bench.py and the serving /metrics endpoint build on, so their
aggregation semantics are pinned here.
"""
import os

import jax
import jax.numpy as jnp
import pytest

from pww_tpu.utils.profiling import PhaseTimer, enable_nan_checks, trace


def test_phase_timer_aggregation():
    t = PhaseTimer()
    for s in (0.1, 0.3, 0.2):
        t.record("denoise", s)
    assert t.p50("denoise") == pytest.approx(0.2)
    assert t.total("denoise") == pytest.approx(0.6)
    # throughput derives from the p50, not the mean (robust to a straggler)
    assert t.images_per_sec("denoise", images_per_call=4) == pytest.approx(20.0)
    s = t.summary()["denoise"]
    assert s["count"] == 3 and s["p50_s"] == pytest.approx(0.2)
    # unknown phases: None / 0.0, never KeyError
    assert t.p50("nope") is None
    assert t.total("nope") == 0.0
    assert t.images_per_sec("nope") is None


def test_phase_context_syncs_device_value():
    t = PhaseTimer()
    with t.phase("encode", sync=jnp.ones((4,)) * 2):
        pass
    assert len(t.times["encode"]) == 1
    assert t.times["encode"][0] >= 0.0


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d) as log_dir:
        jax.block_until_ready(jnp.arange(8) * 3)
    assert log_dir == d
    found = [
        os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs
    ]
    assert found, "profiler produced no trace files"


def test_enable_nan_checks_flips_config():
    before = jax.config.jax_debug_nans
    try:
        enable_nan_checks(True)
        assert jax.config.jax_debug_nans
        enable_nan_checks(False)
        assert not jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", before)
