"""Gradio inpainting UI (reference `gradio_pww_inpaint.py:17-115`).

Adds the sketch-tool mask input (converted to 'L') on top of the txt2img UI;
reuses the color-extraction helpers. Steps slider ranges to 300 w/ default 150
as in the reference.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from gradio_helpers import (
    MAX_NUM_COLORS,
    build_color_panels,
    collect_color_content,
    derive_sample_seeds,
    extract_color_textboxes,
    parse_color_content,
)
from pww_tpu import PwwPipeline, paint_with_words_inpaint
from pww_tpu.config import SDModelConfig

try:
    import gradio as gr
except ImportError:  # pragma: no cover
    gr = None

_PIPE = None


def get_pipeline(model_path=None):
    global _PIPE
    if _PIPE is None:
        _PIPE = (
            PwwPipeline.from_pretrained(model_path)
            if model_path
            else PwwPipeline(config=SDModelConfig.tiny(in_channels=9))
        )
    return _PIPE


def run_pww_inpaint(
    color_map_image,
    color_content: str,
    prompt: str,
    negative_prompt: str,
    init_with_mask,
    width: int,
    height: int,
    num_samples: int,
    steps: int,
    guidance_scale: float,
    seed: int,
    strength: float,
    mask_blur: float = 0.0,
    masked_content: str = "original",
    inpaint_full_res: bool = False,
    model_path=None,
):
    pipe = get_pipeline(model_path)
    if init_with_mask is None or (
        isinstance(init_with_mask, dict) and init_with_mask.get("image") is None
    ):
        err = getattr(gr, "Error", ValueError)
        raise err("Upload an init image (and sketch a mask) first.")
    if color_map_image is None or (
        isinstance(color_map_image, dict) and color_map_image.get("image") is None
    ):
        err = getattr(gr, "Error", ValueError)
        raise err("Draw or upload a segmentation color map first.")
    if isinstance(init_with_mask, dict):
        init_image = Image.fromarray(np.asarray(init_with_mask["image"])[..., :3])
        mask = Image.fromarray(np.asarray(init_with_mask["mask"])[..., :3]).convert("L")
    else:
        init_image = Image.fromarray(np.asarray(init_with_mask)[..., :3])
        mask = Image.new("L", init_image.size, 255)
    init_image = init_image.resize((width, height), Image.BILINEAR)
    mask = mask.resize((width, height), Image.NEAREST)
    if isinstance(color_map_image, dict):
        color_map_image = color_map_image["image"]
    cm = Image.fromarray(np.asarray(color_map_image)[..., :3]).resize(
        (width, height), Image.NEAREST
    )
    context = parse_color_content(color_content)
    images = []
    for s in derive_sample_seeds(seed, num_samples):
        images.append(
            paint_with_words_inpaint(
                color_context=dict(context),
                color_map_image=cm,
                init_image=init_image,
                mask_image=mask,
                input_prompt=prompt,
                unconditional_input_prompt=negative_prompt,
                num_inference_steps=steps,
                guidance_scale=guidance_scale,
                seed=s,
                strength=strength,
                mask_blur=mask_blur,
                masked_content=masked_content,
                inpaint_full_res=inpaint_full_res,
                preloaded_utils=pipe,
            )
        )
    return images


def build_ui(model_path=None):
    if gr is None:
        raise ImportError("gradio is not installed (pip install pww-tpu[apps])")

    with gr.Blocks(title="Paint with Words Inpainting — TPU") as demo:
        gr.Markdown("## Paint with Words — Inpainting (TPU-native)")
        with gr.Row():
            with gr.Column():
                sketch = gr.Image(label="color map", type="numpy")
                init = gr.Image(label="image + mask (draw the fill region)",
                                type="numpy", tool="sketch")
                content = gr.Textbox(
                    label="color context",
                    value="{(255, 0, 0): 'moon,1.5'}",
                )
                extract = gr.Button("extract colors from sketch")
                prompt = gr.Textbox(label="prompt")
                negative = gr.Textbox(label="negative prompt", value="")
                with gr.Row():
                    width = gr.Slider(256, 1024, value=512, step=64, label="width")
                    height = gr.Slider(256, 1024, value=512, step=64, label="height")
                with gr.Row():
                    samples = gr.Slider(1, 12, value=1, step=1, label="samples")
                    steps = gr.Slider(1, 300, value=150, step=1, label="steps")
                with gr.Row():
                    scale = gr.Slider(1.0, 20.0, value=7.5, label="guidance")
                    seed = gr.Number(value=0, label="seed", precision=0)
                    strength = gr.Slider(0.0, 1.0, value=1.0, label="strength")
                with gr.Row():
                    mask_blur = gr.Slider(0.0, 64.0, value=0.0, step=0.5,
                                          label="mask blur")
                    masked_content = gr.Dropdown(
                        ["original", "fill", "latent_noise", "latent_nothing"],
                        value="original", label="masked content",
                    )
                    full_res = gr.Checkbox(value=False,
                                           label="inpaint only masked")
                go = gr.Button("generate", variant="primary")
            with gr.Column():
                build_color_panels(gr, sketch, content, MAX_NUM_COLORS)
                gallery = gr.Gallery(label="outputs")

        def _extract(img):
            if img is None:
                return gr.update()
            return collect_color_content(extract_color_textboxes(np.asarray(img)))

        extract.click(_extract, inputs=[sketch], outputs=[content])
        go.click(
            lambda *a: run_pww_inpaint(*a, model_path=model_path),
            inputs=[sketch, content, prompt, negative, init, width, height,
                    samples, steps, scale, seed, strength, mask_blur,
                    masked_content, full_res],
            outputs=[gallery],
        )
    return demo


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7861)
    args = ap.parse_args()
    get_pipeline(args.model)
    build_ui(args.model).launch(server_name=args.host, server_port=args.port)
