"""Gradio txt2img/img2img web UI (reference `gradio_pww.py:15-157`).

Same control surface as the reference: color-sketch segmentation canvas,
color-context textbox (``ast.literal_eval`` format), per-color accordions with
extraction tools, w/h/samples/steps/scale/seed/strength sliders. Key serving
difference: the pipeline is loaded ONCE and its compiled programs are cached
per resolution — the reference reloads every model on every request
(reference `gradio_pww.py:31-45`, SURVEY.md §3.5).
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
    unique_colors,
)
from pww_tpu import PwwPipeline, paint_with_words
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
            else PwwPipeline(config=SDModelConfig.tiny())
        )
    return _PIPE


def run_pww(
    color_map_image,
    color_content: str,
    prompt: str,
    negative_prompt: str,
    init_image,
    width: int,
    height: int,
    num_samples: int,
    steps: int,
    guidance_scale: float,
    seed: int,
    strength: float,
    clip_skip: int = 0,
    freeu: bool = False,
    model_path=None,
):
    """One request → list of PIL images (serving path)."""
    pipe = get_pipeline(model_path)
    if isinstance(color_map_image, dict):  # gradio sketch tool payload
        color_map_image = color_map_image["image"]
    if color_map_image is None:
        # a clear message instead of np.asarray(None)'s 0-d IndexError
        err = getattr(gr, "Error", ValueError)
        raise err("Draw or upload a segmentation color map first.")
    cm = Image.fromarray(np.asarray(color_map_image)[..., :3]).resize(
        (width, height), Image.NEAREST
    )
    if init_image is not None:
        init_image = Image.fromarray(np.asarray(init_image)[..., :3]).resize(
            (width, height), Image.BILINEAR
        )
    context = parse_color_content(color_content)
    images = []
    for s in derive_sample_seeds(seed, num_samples):
        images.append(
            paint_with_words(
                color_context=dict(context),
                color_map_image=np.asarray(cm),
                input_prompt=prompt,
                unconditional_input_prompt=negative_prompt,
                num_inference_steps=steps,
                guidance_scale=guidance_scale,
                seed=s,
                init_image=init_image,
                strength=strength,
                preloaded_utils=pipe,
                clip_skip=int(clip_skip),
                freeu=True if freeu else None,
            )
        )
    return images


def build_ui(model_path=None):
    if gr is None:
        raise ImportError("gradio is not installed (pip install pww-tpu[apps])")

    with gr.Blocks(title="Paint with Words — TPU") as demo:
        gr.Markdown("## Paint with Words (TPU-native)")
        with gr.Row():
            with gr.Column():
                sketch = gr.Image(label="color map (sketch your regions)",
                                  type="numpy")
                init = gr.Image(label="init image (optional, img2img)",
                                type="numpy")
                content = gr.Textbox(
                    label="color context",
                    value="{(255, 0, 0): 'cat,1.0', (0, 0, 255): 'dog,1.0'}",
                )
                extract = gr.Button("extract colors from sketch")
                prompt = gr.Textbox(label="prompt")
                negative = gr.Textbox(label="negative prompt", value="")
                with gr.Row():
                    width = gr.Slider(256, 1024, value=512, step=64, label="width")
                    height = gr.Slider(256, 1024, value=512, step=64, label="height")
                with gr.Row():
                    samples = gr.Slider(1, 12, value=1, step=1, label="samples")
                    steps = gr.Slider(1, 100, value=30, step=1, label="steps")
                with gr.Row():
                    scale = gr.Slider(1.0, 20.0, value=7.5, label="guidance")
                    seed = gr.Number(value=0, label="seed", precision=0)
                    strength = gr.Slider(0.0, 1.0, value=0.5,
                                         label="img2img strength")
                with gr.Accordion("advanced", open=False):
                    clip_skip = gr.Slider(0, 4, value=0, step=1,
                                          label="CLIP skip (diffusers k)")
                    freeu = gr.Checkbox(value=False, label="FreeU")
                go = gr.Button("generate", variant="primary")
            with gr.Column():
                # per-color accordion panels with mask previews and editable
                # prompt/strength/seed (reference gradio_pww.py:116-157)
                build_color_panels(gr, sketch, content, MAX_NUM_COLORS)
                gallery = gr.Gallery(label="outputs")

        def _extract(img):
            if img is None:
                return gr.update()
            return collect_color_content(extract_color_textboxes(np.asarray(img)))

        extract.click(_extract, inputs=[sketch], outputs=[content])
        go.click(
            lambda *a: run_pww(*a, model_path=model_path),
            inputs=[sketch, content, prompt, negative, init, width, height,
                    samples, steps, scale, seed, strength, clip_skip, freeu],
            outputs=[gallery],
        )
    return demo


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    get_pipeline(args.model)  # load once, before serving
    build_ui(args.model).launch(server_name=args.host, server_port=args.port)
