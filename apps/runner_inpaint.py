"""Inpainting example runner (reference `runner_inpaint.py:10-92`).

Requires a 9-channel inpainting checkpoint (``--model``); defaults to a tiny
random-weight 9-channel config for a structural smoke run.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from pww_tpu import PwwPipeline, WeightFunction, paint_with_words_inpaint
from pww_tpu.config import SDModelConfig

EXAMPLES = [
    {
        # reference runner_inpaint.py:10-24 (dog → moon-masked aurora scene);
        # the reference runner passes 0.15·w·log(1+σ)·max(QKᵀ) explicitly
        # (runner_inpaint.py:72,87) — the facade default is the signature's 0.1
        "color_context": {(255, 0, 0): "aurora,0.7", (0, 0, 255): "moon,1.5"},
        "input_prompt": "aurora over the lake with a full moon",
        "seed": 81,
        "strength": 1.0,
        "weight_function": WeightFunction(scale=0.15, sigma_mode="log1p_sigma",
                                          reduce_mode="max"),
        "name": "inpaint_moon",
    },
    {
        "color_context": {(255, 0, 0): "a red fox,1.2", (0, 0, 255): "snow,0.4"},
        "input_prompt": "a red fox standing in snow",
        "seed": 0,
        "strength": 0.9,
        "weight_function": WeightFunction(scale=0.3, sigma_mode="log1p_sigma2",
                                          reduce_mode="std"),
        "name": "inpaint_fox",
    },
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="9-channel inpainting checkpoint dir")
    ap.add_argument("--image", default=None, help="init image path")
    ap.add_argument("--mask", default=None, help="mask image path (white=fill)")
    ap.add_argument("--out", default="contents_out")
    ap.add_argument("--steps", type=int, default=150)
    args = ap.parse_args()

    if args.model:
        pipe = PwwPipeline.from_pretrained(args.model)
        size = 512
        steps = args.steps
    else:
        print("no --model given: tiny random-weight 9-channel smoke config")
        pipe = PwwPipeline(config=SDModelConfig.tiny(in_channels=9))
        size = 128
        steps = 4

    if args.image:
        init = Image.open(args.image).convert("RGB").resize((size, size))
    else:
        init = Image.fromarray(
            np.full((size, size, 3), 110, np.uint8)
        )
    if args.mask:
        mask = Image.open(args.mask).convert("L").resize((size, size))
    else:
        m = np.zeros((size, size), np.uint8)
        m[size // 4 : 3 * size // 4, size // 4 : 3 * size // 4] = 255
        mask = Image.fromarray(m)

    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    cm[:, size // 2 :] = (0, 0, 255)

    os.makedirs(args.out, exist_ok=True)
    for ex in EXAMPLES:
        img = paint_with_words_inpaint(
            color_context=dict(ex["color_context"]),
            color_map_image=Image.fromarray(cm),
            init_image=init,
            mask_image=mask,
            input_prompt=ex["input_prompt"],
            num_inference_steps=steps,
            seed=ex["seed"],
            strength=ex["strength"],
            weight_function=ex.get("weight_function"),
            preloaded_utils=pipe,
        )
        out_path = os.path.join(args.out, f"output_{ex['name']}.png")
        img.save(out_path)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
