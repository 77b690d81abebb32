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


def test_extract_color_textboxes_emits_valid_entries():
    """The extraction skeleton must be a VALID context ('obj,0.5,-1' defaults,
    reference gradio_pww.py:61-64), not a label-less ',1.0'."""
    entries = extract_color_textboxes(_sketch())
    assert entries and all(v == "obj,0.5,-1" for v in entries.values())
    # and it parses + runs through the real parser
    from pww_tpu.conditioning.color_context import extract_seed_and_sigma

    body, seed, sigma = extract_seed_and_sigma("obj,0.5,-1", ignore_seed=-1)
    assert body == "obj,0.5" and seed is None


def test_color_panels_round_trip_to_generate():
    """extract panels -> collect -> parse -> generate (tiny config): the full
    per-color accordion data path, UI-less (VERDICT missing #1)."""
    from gradio_helpers import collect_color_panels, extract_color_panels

    from pww_tpu import PwwPipeline
    from pww_tpu.config import SDModelConfig

    img = _sketch()
    masks, prompts, strengths, seeds, colors = extract_color_panels(img)
    assert len(masks) == len(prompts) == len(colors) == 8
    # two real panels, six fillers
    assert sum(c is not None for c in colors) == 2
    assert prompts[:2] == ["obj", "obj"] and prompts[2] == ""
    assert masks[0].shape == img.shape
    assert (masks[2] == 32).all()  # filler panels are the dark canvas

    # user edits the textboxes, then round-trips into the context string
    # (extraction order is frequency-based, so key the edits by color)
    edits = {(255, 0, 0): ("cat", "1.5", "-1"), (0, 0, 255): ("dog", "0.5", "7")}
    for i, c in enumerate(colors[:2]):
        prompts[i], strengths[i], seeds[i] = edits[c]
    text = collect_color_panels(colors, prompts, strengths, seeds)
    ctx = parse_color_content(text)
    assert ctx[(255, 0, 0)] == "cat,1.5,-1" and ctx[(0, 0, 255)] == "dog,0.5,7"

    pipe = PwwPipeline(config=SDModelConfig.tiny())
    out = pipe.generate(
        prompt="a cat and a dog", color_map_image=img[:64, :64],
        color_context=ctx, num_inference_steps=2, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_collect_color_panels_handles_string_colors_and_empties():
    from gradio_helpers import collect_color_panels

    text = collect_color_panels(
        ["(255, 0, 0)", "", None, "(0, 0, 255)"],
        ["cat", "x", "y", "dog"], ["1.0", "", "", "2.0"], ["-1", "", "", "5"],
    )
    ctx = parse_color_content(text)
    assert ctx == {(255, 0, 0): "cat,1.0,-1", (0, 0, 255): "dog,2.0,5"}
    # nothing filled in -> the empty-dict LITERAL, so the generate path's
    # ast.literal_eval round-trip still parses (regression: "" raised
    # SyntaxError in the UI)
    empty = collect_color_panels([None], [""], [""], [""])
    assert empty == "{}" and parse_color_content(empty) == {}


def test_build_color_panels_wiring_with_stub_gradio():
    """Exercise build_color_panels' actual extract/generate callbacks through
    a minimal gradio stub (gradio itself is not installed here)."""
    import contextlib

    from gradio_helpers import MAX_NUM_COLORS, build_color_panels

    clicks = []

    class _Comp:
        def __init__(self, *a, **k):
            pass

        def click(self, fn, inputs=None, outputs=None):
            clicks.append((fn, inputs, outputs))

    class _Ctx(_Comp):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _GR:
        Accordion = _Ctx
        Row = _Ctx
        Column = _Ctx
        Button = _Comp
        Textbox = _Comp
        Image = _Comp

        @staticmethod
        def update(**k):
            return ("update", k)

    sketch, content = _Comp(), _Comp()
    build_color_panels(_GR, sketch, content, MAX_NUM_COLORS)
    assert len(clicks) == 2
    extract_fn = clicks[0][0]
    generate_fn = clicks[1][0]

    outs = extract_fn(_sketch())
    assert len(outs) == 5 * MAX_NUM_COLORS
    k = MAX_NUM_COLORS
    masks, prompts, strengths, seeds, colors = (
        outs[:k], outs[k:2 * k], outs[2 * k:3 * k], outs[3 * k:4 * k],
        outs[4 * k:],
    )
    text = generate_fn(*colors, *prompts, *strengths, *seeds)
    ctx = parse_color_content(text)
    assert ctx[(255, 0, 0)] == "obj,0.5,-1" and ctx[(0, 0, 255)] == "obj,0.5,-1"
    # None sketch leaves the panels untouched
    assert all(u == ("update", {}) for u in extract_fn(None))


def test_fig_optional_captions():
    """Per-image captions (reference utils.py:13-14, 66-73) add a strip
    above the image panels; @-form contexts annotate with the bare label."""
    cm = Image.fromarray(_sketch())
    ctx = {(255, 0, 0): "cat@1.0@-1", (0, 0, 255): "dog,0.5"}
    out = Image.fromarray(np.zeros((100, 100, 3), np.uint8))
    settings = {"color_map_image": cm, "color_context": ctx,
                "input_prompt": "a cat"}
    plain = fig_from_settings(settings, [out, out])
    capped = fig_from_settings(
        settings, [out, out], optional_captions=["seed 0", "seed 1"]
    )
    assert capped.height == plain.height + 20
    assert capped.width == plain.width
