"""Color-content extraction helpers for the web UIs.

Re-implementation of the reference Gradio app's tooling
(reference `gradio_pww.py:24-99`): dominant-color extraction from a sketched
segmentation map (>1% pixel threshold), squared-distance color masks
(threshold 30), the color↔textbox round-trip, and the seed-chain for
multi-sample generation. Importable without gradio so they are unit-testable.
"""
from __future__ import annotations

import ast
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MAX_NUM_COLORS = 8
COLOR_DIST_THRESHOLD = 30  # squared-distance threshold (reference :69-76)
PIXEL_FRACTION_THRESHOLD = 0.01  # >1% of pixels (reference :78-85)


def unique_colors(img: np.ndarray, threshold: float = PIXEL_FRACTION_THRESHOLD) -> List[Tuple[int, int, int]]:
    """Colors covering more than ``threshold`` of the image, most-common first.

    Uses the native single-pass histogram (pww_tpu.native) when available.
    """
    from pww_tpu.native import unique_colors as _native_unique

    return [c for c, _ in _native_unique(img, threshold, MAX_NUM_COLORS)]


def get_color_mask(
    color: Sequence[int], img: np.ndarray, threshold: float = COLOR_DIST_THRESHOLD
) -> np.ndarray:
    """Boolean mask of pixels within squared distance ``threshold`` of color."""
    from pww_tpu.native import color_mask_sqdist

    return color_mask_sqdist(img, color, threshold)


def extract_color_textboxes(img: np.ndarray) -> Dict[Tuple[int, int, int], str]:
    """Initial color-context skeleton from a sketch: color → 'label,strength'."""
    return {c: ",1.0" for c in unique_colors(img)}


def collect_color_content(entries: Dict[Tuple[int, int, int], str]) -> str:
    """Round-trip the per-color textboxes into the context-dict string."""
    return (
        "{"
        + ", ".join(f"{color}: {content!r}" for color, content in entries.items())
        + "}"
    )


def parse_color_content(text: str) -> Dict:
    """Parse the UI's context string (reference uses ast.literal_eval, :20)."""
    return ast.literal_eval(text)


def derive_sample_seeds(base_seed: int, num_samples: int) -> List[int]:
    """Deterministic per-sample seed chain (reference derives via
    torch.randint chains, :24-28; here a splitmix-style hash — deterministic
    and collision-free without torch)."""
    mask = (1 << 64) - 1
    seeds = []
    s = int(base_seed) & mask
    for _ in range(num_samples):
        s = (s + 0x9E3779B97F4A7C15) & mask
        z = s
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        seeds.append((z ^ (z >> 31)) & 0x7FFFFFFF)
    return seeds
