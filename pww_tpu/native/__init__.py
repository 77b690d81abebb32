"""ctypes bindings for the native host-ops library (with numpy fallbacks).

The compute path is JAX/XLA/Pallas; this is the *runtime around it* — the
host-side image/token preprocessing that sits on the serving critical path.
``g++ -O3`` builds ``libpww_host.so`` on first use; if no compiler is
available every function silently falls back to its numpy twin, so the
library is an accelerator, never a dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libpww_host.so")
_SRC = os.path.join(_HERE, "host_ops.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # rebuild when the source is newer than the (gitignored) .so —
        # otherwise an edit to host_ops.cpp silently keeps executing the
        # stale binary
        stale = (
            os.path.exists(_SO)
            and os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        )
        path = _SO if os.path.exists(_SO) and not stale else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64, f32, u8 = ctypes.c_int64, ctypes.c_float, ctypes.c_uint8
        P = ctypes.POINTER
        lib.color_masks.argtypes = [P(u8), i64, i64, P(u8), P(f32), i64, P(f32), P(i64)]
        lib.color_mask_sqdist.argtypes = [P(u8), i64, i64, P(u8), i64, P(u8)]
        lib.unique_colors.restype = i64
        lib.unique_colors.argtypes = [P(u8), i64, i64, i64, P(u8), P(i64), i64]
        lib.token_match_row.restype = i64
        lib.token_match_row.argtypes = [P(i64), i64, P(i64), i64, P(f32)]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def color_masks(
    img: np.ndarray, colors: np.ndarray, strengths: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(N,H,W) strength-scaled exact-match masks + per-color pixel counts."""
    img = np.ascontiguousarray(img[..., :3], np.uint8)
    colors = np.ascontiguousarray(colors, np.uint8)
    strengths = np.ascontiguousarray(strengths, np.float32)
    h, w = img.shape[:2]
    n = len(colors)
    lib = load()
    if lib is not None:
        out = np.empty((n, h, w), np.float32)
        counts = np.empty((n,), np.int64)
        lib.color_masks(
            _ptr(img, ctypes.c_uint8), h, w, _ptr(colors, ctypes.c_uint8),
            _ptr(strengths, ctypes.c_float), n, _ptr(out, ctypes.c_float),
            _ptr(counts, ctypes.c_int64),
        )
        return out, counts
    eq = (img[None] == colors[:, None, None]).all(-1)
    return (
        eq.astype(np.float32) * strengths[:, None, None],
        eq.reshape(n, -1).sum(-1).astype(np.int64),
    )


def color_mask_sqdist(
    img: np.ndarray, color, threshold: int = 30
) -> np.ndarray:
    img = np.ascontiguousarray(img[..., :3], np.uint8)
    h, w = img.shape[:2]
    lib = load()
    if lib is not None:
        c = np.asarray(color, np.uint8)
        out = np.empty((h, w), np.uint8)
        lib.color_mask_sqdist(
            _ptr(img, ctypes.c_uint8), h, w, _ptr(c, ctypes.c_uint8),
            int(threshold), _ptr(out, ctypes.c_uint8),
        )
        return out.astype(bool)
    diff = img.astype(np.int64) - np.asarray(color, np.int64)
    return (diff * diff).sum(-1) < threshold


def unique_colors(
    img: np.ndarray, min_fraction: float = 0.01, max_out: int = 8
) -> List[Tuple[Tuple[int, int, int], int]]:
    img = np.ascontiguousarray(img[..., :3], np.uint8)
    h, w = img.shape[:2]
    min_count = max(1, int(min_fraction * h * w) + 1)
    lib = load()
    if lib is not None:
        out_c = np.empty((max_out, 3), np.uint8)
        out_n = np.empty((max_out,), np.int64)
        got = lib.unique_colors(
            _ptr(img, ctypes.c_uint8), h, w, min_count,
            _ptr(out_c, ctypes.c_uint8), _ptr(out_n, ctypes.c_int64), max_out,
        )
        return [
            (tuple(int(x) for x in out_c[i]), int(out_n[i])) for i in range(got)
        ]
    flat = img.reshape(-1, 3)
    colors, counts = np.unique(flat, axis=0, return_counts=True)
    order = np.argsort(-counts)
    res = []
    for i in order[:max_out]:
        if counts[i] < min_count:
            break
        res.append((tuple(int(x) for x in colors[i]), int(counts[i])))
    return res


def token_match_row(ids, sub) -> Tuple[np.ndarray, int]:
    """Occurrence-count row over prompt positions (overlap-additive)."""
    ids = np.ascontiguousarray(ids, np.int64)
    sub = np.ascontiguousarray(sub, np.int64)
    lib = load()
    if lib is not None and len(sub) > 0:
        row = np.empty((len(ids),), np.float32)
        hits = lib.token_match_row(
            _ptr(ids, ctypes.c_int64), len(ids), _ptr(sub, ctypes.c_int64),
            len(sub), _ptr(row, ctypes.c_float),
        )
        return row, int(hits)
    row = np.zeros((len(ids),), np.float32)
    hits = 0
    for i in range(len(ids) - len(sub) + 1):
        if list(ids[i : i + len(sub)]) == list(sub):
            hits += 1
            row[i : i + len(sub)] += 1.0
    return row, hits
