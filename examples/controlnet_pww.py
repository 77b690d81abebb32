"""ControlNet + paint-with-words (reference C19 / BASELINE config #4).

The reference only documents this combination through an external webui
submodule (`README.md:365-450`); here both conditionings compose inside one
compiled step: the ControlNet residuals steer structure, the PwW bias steers
region-token attention.

  python examples/controlnet_pww.py --model /path/sd15 --controlnet /path/cn
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pww_tpu import PwwPipeline
from pww_tpu.config import SDModelConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--controlnet", default=None,
                    help="diffusers ControlNetModel checkpoint dir")
    ap.add_argument("--hint", default=None, help="conditioning image path")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--out", default="cn_pww_output.png")
    args = ap.parse_args()

    if args.model:
        pipe = PwwPipeline.from_pretrained(args.model)
        size, steps = 512, 30
    else:
        print("no --model: tiny random-weight demo (structural only)")
        pipe = PwwPipeline(config=SDModelConfig.tiny())
        size, steps = 128, 3
    pipe.load_controlnet(args.controlnet)

    if args.hint:
        from PIL import Image

        hint = np.asarray(
            Image.open(args.hint).convert("RGB").resize((size, size))
        )
    else:
        hint = np.zeros((size, size, 3), np.uint8)
        hint[size // 4 : 3 * size // 4, size // 4 : 3 * size // 4] = 255

    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    cm[:, size // 2 :] = (0, 0, 255)

    img = pipe.generate(
        prompt="a castle and a forest, canny structure",
        color_map_image=cm,
        color_context={(255, 0, 0): "castle,1.0", (0, 0, 255): "forest,0.8"},
        control_image=hint,
        controlnet_conditioning_scale=args.scale,
        num_inference_steps=steps,
        seed=0,
    )
    img.save(args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
