"""Web-UI helper + figure utility tests (host-side, no gradio needed)."""
import sys
import os

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))

from gradio_helpers import (
    collect_color_content,
    derive_sample_seeds,
    extract_color_textboxes,
    get_color_mask,
    parse_color_content,
    unique_colors,
)

from pww_tpu.utils.fig import annotate_color_map, fig_from_settings


def _sketch():
    img = np.zeros((100, 100, 3), np.uint8)
    img[:50] = (255, 0, 0)
    img[50:] = (0, 0, 255)
    img[0, 0] = (1, 2, 3)  # sub-threshold noise pixel
    return img


def test_unique_colors_threshold():
    colors = unique_colors(_sketch())
    assert (255, 0, 0) in colors and (0, 0, 255) in colors
    assert (1, 2, 3) not in colors  # under the 1% threshold


def test_get_color_mask_tolerance():
    img = _sketch()
    img[10, 10] = (252, 2, 1)  # within sq-dist 30 of red
    mask = get_color_mask((255, 0, 0), img)
    assert mask[10, 10] and mask[0, 5] and not mask[60, 60]


def test_color_content_roundtrip():
    entries = extract_color_textboxes(_sketch())
    text = collect_color_content(
        {c: "cat,1.0" for c in entries}
    )
    parsed = parse_color_content(text)
    assert all(parsed[c] == "cat,1.0" for c in parsed)


def test_derive_sample_seeds_deterministic():
    a = derive_sample_seeds(42, 5)
    b = derive_sample_seeds(42, 5)
    assert a == b and len(set(a)) == 5
    assert derive_sample_seeds(43, 5) != a


def test_annotate_and_fig():
    cm = Image.fromarray(_sketch())
    ctx = {(255, 0, 0): "cat,1.0", (0, 0, 255): "dog,0.5"}
    annotated = annotate_color_map(cm, ctx)
    assert annotated.size == cm.size
    out = Image.fromarray(np.zeros((100, 100, 3), np.uint8))
    fig = fig_from_settings(
        {"color_map_image": cm, "color_context": ctx, "input_prompt": "a cat"},
        [out, out],
    )
    assert fig.width >= 3 * 100 and fig.height > 100


def test_snap_resolution_buckets():
    from pww_tpu.utils.buckets import bucket_count, snap_resolution

    assert snap_resolution(512, 512) == (512, 512)
    assert snap_resolution(500, 700) == (512, 704)
    assert snap_resolution(100, 2000) == (256, 1024)  # clamped
    assert bucket_count() == 13 * 13
