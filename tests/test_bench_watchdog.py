"""bench.py's tunnel-hang mitigations: the SIGALRM watchdog helper.

The tunnel backend can lose an RPC silently (client blocks forever on a
reply whose connection no longer exists — see docs/BENCHMARKING.md
§Tunnel failure modes). `_with_watchdog` bounds such hangs and retries
once; these tests pin its three behaviors on the host (no device work).
"""
import signal
import time

import pytest

import bench


def test_fast_path_returns_value():
    assert bench._with_watchdog(lambda: 42, 60, "fast") == 42


def test_fast_path_restores_handler():
    prev = signal.getsignal(signal.SIGALRM)
    bench._with_watchdog(lambda: None, 60, "restore")
    assert signal.getsignal(signal.SIGALRM) is prev
    # and no alarm left pending
    assert signal.alarm(0) == 0


def test_hang_retries_then_succeeds():
    calls = []

    def flaky():
        calls.append(time.time())
        if len(calls) == 1:
            time.sleep(30)  # interruptible hang; watchdog fires at 1 s
        return "ok"

    t0 = time.time()
    assert bench._with_watchdog(flaky, 1, "flaky") == "ok"
    assert len(calls) == 2
    assert time.time() - t0 < 5


def test_hang_exhausts_retries_and_raises():
    def hang():
        time.sleep(30)

    t0 = time.time()
    with pytest.raises(TimeoutError, match="stuck: no result within 1s"):
        bench._with_watchdog(hang, 1, "stuck")
    assert time.time() - t0 < 5
    assert signal.alarm(0) == 0


def test_real_exceptions_propagate_without_retry():
    calls = []

    def boom():
        calls.append(1)
        raise ValueError("boom")

    with pytest.raises(ValueError):
        bench._with_watchdog(boom, 60, "boom")
    assert len(calls) == 1
