"""Figure/montage utility (host-side PIL).

Re-implementation of the reference's ``fig_from_settings``
(reference `paint_with_words/utils.py:10-85`): caption each region at its
top-left pixel on the color map, paste color map + outputs side by side, and
wrap the prompt underneath. Pure PIL, deliberately host-side (SURVEY.md §2
C13: keep as-is).
"""
from __future__ import annotations

import textwrap
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from ..conditioning.color_context import parse_color


def _load_font(size: int = 14):
    for name in ("Arial.ttf", "DejaVuSans.ttf", "LiberationSans-Regular.ttf"):
        try:
            return ImageFont.truetype(name, size)
        except OSError:
            continue
    return ImageFont.load_default()


def annotate_color_map(
    color_map: Image.Image, color_context: Dict
) -> Image.Image:
    """Draw each region's label at the region's top-left matching pixel."""
    img = color_map.convert("RGB").copy()
    arr = np.asarray(img)
    draw = ImageDraw.Draw(img)
    font = _load_font()
    for color_key, ctx in color_context.items():
        color = parse_color(color_key)
        try:
            from ..conditioning.color_context import parse_context_entry

            label = parse_context_entry(ctx)[0]
        except (ValueError, IndexError):
            label = ctx.split(",")[0]
        mask = (arr == np.array(color, np.uint8)).all(axis=-1)
        ys, xs = np.nonzero(mask)
        if len(ys) == 0:
            continue
        y, x = int(ys.min()), int(xs[ys.argmin()])
        lum = 0.299 * color[0] + 0.587 * color[1] + 0.114 * color[2]
        fill = (0, 0, 0) if lum > 128 else (255, 255, 255)
        draw.text((x + 2, y + 2), label, fill=fill, font=font)
    return img


def fig_from_settings(
    settings: Dict,
    images: Union[Image.Image, Sequence[Image.Image]],
    caption_height: int = 48,
    optional_captions: Optional[Sequence[str]] = None,
) -> Image.Image:
    """Montage: annotated color map + generated image(s) + wrapped prompt.

    ``settings`` follows the reference runner convention
    (reference `runner.py:9-72`): keys ``color_context``,
    ``color_map_img_path`` or ``color_map_image``, ``input_prompt``.
    ``optional_captions`` writes one caption above each generated image
    (reference `paint_with_words/utils.py:13-14, 66-73`).
    """
    if isinstance(images, Image.Image):
        images = [images]
    cmap = settings.get("color_map_image")
    if cmap is None and settings.get("color_map_img_path"):
        cmap = Image.open(settings["color_map_img_path"])
    if isinstance(cmap, np.ndarray):
        cmap = Image.fromarray(cmap)

    panels: List[Image.Image] = []
    h = max(im.height for im in images)
    if cmap is not None:
        cmap = annotate_color_map(cmap, settings.get("color_context", {}))
        cmap = cmap.resize((int(cmap.width * h / cmap.height), h))
        panels.append(cmap)
    panels.extend(im if im.height == h else im.resize((im.width, h)) for im in images)

    total_w = sum(p.width for p in panels)
    band = 20 if optional_captions else 0  # caption strip above the images
    fig = Image.new("RGB", (total_w, band + h + caption_height), (255, 255, 255))
    x = 0
    n_map_panels = len(panels) - len(images)
    cap_font = _load_font(12)
    for i, p in enumerate(panels):
        fig.paste(p, (x, band))
        if optional_captions and i >= n_map_panels:
            cap_i = i - n_map_panels
            if cap_i < len(optional_captions):
                ImageDraw.Draw(fig).text(
                    (x + 2, 2), optional_captions[cap_i], fill=(0, 0, 0),
                    font=cap_font,
                )
        x += p.width

    prompt = settings.get("input_prompt", "")
    if prompt:
        draw = ImageDraw.Draw(fig)
        font = _load_font()
        wrapped = textwrap.fill(prompt, width=max(20, total_w // 8))
        draw.text((4, band + h + 4), wrapped, fill=(0, 0, 0), font=font)
    return fig
