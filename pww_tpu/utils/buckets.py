"""Resolution bucketing — bounding recompiles under arbitrary user sizes.

The reference accepts any w/h from its 256–1024 sliders (reference
`gradio_pww.py:96-99`); every jit program here is shape-specialized, so
serving snaps requests to a bucket lattice (multiples of 64 by default —
matching both the VAE's 8× factor and the UNet's 8× internal downsampling)
and resizes the color map/init image to the bucket. One compilation per
bucket, reused forever (SURVEY.md §7 hard part #3).
"""
from __future__ import annotations

from typing import Tuple


def snap_resolution(
    width: int,
    height: int,
    multiple: int = 64,
    min_side: int = 256,
    max_side: int = 1024,
) -> Tuple[int, int]:
    """Nearest bucket (round-to-nearest multiple, clamped)."""

    def snap(x: int) -> int:
        x = max(min_side, min(max_side, x))
        return int(round(x / multiple) * multiple) or multiple

    return snap(width), snap(height)


def bucket_count(
    multiple: int = 64, min_side: int = 256, max_side: int = 1024
) -> int:
    per_axis = (max_side - min_side) // multiple + 1
    return per_axis * per_axis
