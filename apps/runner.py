"""Example runner: the reference's five txt2img example settings against the
TPU pipeline (reference `runner.py:9-107`), doubling as golden-output
fixtures. Requires a local SD checkpoint dir (``--model``); defaults to the
random-weight tiny config for a structural smoke run when none is given.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np
from PIL import Image

from pww_tpu import PwwPipeline, WeightFunction, paint_with_words
from pww_tpu.config import SDModelConfig
from pww_tpu.utils.fig import fig_from_settings

EXAMPLES = [
    {
        # reference runner.py:9-19 (cat/dog)
        "color_context": {
            (7, 9, 182): "aurora,0.5",
            (136, 178, 92): "full moon,1.5",
            (51, 193, 217): "mountains,0.4",
            (61, 163, 35): "a half-frozen lake,0.3",
            (89, 102, 255): "boat,2.0",
        },
        "input_prompt": "aurora, full moon, mountains, a half-frozen lake, boat",
        "seed": 0,
        "name": "aurora_1",
    },
    {
        "color_context": {(255, 0, 0): "cat,1.0", (0, 0, 255): "dog,1.0"},
        "input_prompt": "a cat and a dog sitting together, realistic photo",
        "seed": 81,
        "name": "cat_dog",
    },
    {
        # custom weight function example (reference runner.py:45-58)
        "color_context": {(255, 0, 0): "cat,1.0", (0, 0, 255): "dog,1.0"},
        "input_prompt": "a cat and a dog sitting together, realistic photo",
        "seed": 0,
        "weight_function": WeightFunction(scale=0.4, sigma_mode="log1p_sigma",
                                          reduce_mode="max"),
        "name": "cat_dog_w04",
    },
    {
        # regional-seed example (reference runner.py:61-72, README.md:192-228)
        "color_context": {
            (255, 0, 0): "a mecha robot,1.2,2077",
            (0, 0, 255): "a dog,1.0,42",
        },
        "input_prompt": "a mecha robot and a dog in a city",
        "seed": 2077,
        "name": "regional_seed",
    },
    {
        # std-reduce weight function (README.md:119-164 sweep)
        "color_context": {(255, 0, 0): "cat,1.0", (0, 0, 255): "dog,1.0"},
        "input_prompt": "a cat and a dog sitting together, realistic photo",
        "seed": 0,
        "weight_function": WeightFunction(scale=0.3, sigma_mode="log1p_sigma2",
                                          reduce_mode="std"),
        "name": "cat_dog_std",
    },
]


def default_color_map(size: int = 512) -> np.ndarray:
    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    cm[:, size // 2 :] = (0, 0, 255)
    return cm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="local checkpoint dir or .ckpt")
    ap.add_argument("--out", default="contents_out")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--only", default=None, help="run a single example by name")
    args = ap.parse_args()

    if args.model:
        pipe = PwwPipeline.from_pretrained(args.model)
    else:
        print("no --model given: running tiny random-weight smoke config")
        pipe = PwwPipeline(config=SDModelConfig.tiny())

    os.makedirs(args.out, exist_ok=True)
    for ex in EXAMPLES:
        if args.only and ex["name"] != args.only:
            continue
        size = 512 if args.model else 128
        cm = ex.get("color_map_image")
        if cm is None:
            cm = default_color_map(size)
            if len(ex["color_context"]) > 2:  # aurora needs 5 bands
                cm = np.zeros((size, size, 3), np.uint8)
                colors = list(ex["color_context"].keys())
                band = size // len(colors)
                for i, c in enumerate(colors):
                    cm[i * band : (i + 1) * band if i + 1 < len(colors) else size] = c
        img = paint_with_words(
            color_context=dict(ex["color_context"]),
            color_map_image=cm,
            input_prompt=ex["input_prompt"],
            num_inference_steps=args.steps,
            seed=ex["seed"],
            weight_function=ex.get("weight_function"),
            preloaded_utils=pipe,
        )
        out_path = os.path.join(args.out, f"output_{ex['name']}.png")
        img.save(out_path)
        fig = fig_from_settings(
            {"color_map_image": cm, "color_context": ex["color_context"],
             "input_prompt": ex["input_prompt"]},
            img,
        )
        fig.save(os.path.join(args.out, f"fig_{ex['name']}.png"))
        print("wrote", out_path)


if __name__ == "__main__":
    main()
