"""Train a textual-inversion concept, then paint with it.

The reference's TI notebook only *injects* pre-trained embeddings
(`contents/notebooks/paint_with_words_textual_inversion.ipynb`); this example
also covers the training side — TPU-native (one jitted step, gradients masked
to the placeholder rows, frozen UNet/VAE/CLIP).

Usage:
  python examples/train_textual_inversion_pww.py \
      [--model /path/sd15-dir] [--images img1.png img2.png ...] \
      [--token "<my-cat>"] [--init-token cat] [--steps 3000] [--out out.bin]

Without --model it runs a tiny random-weight smoke (synthetic images).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from pww_tpu import PwwPipeline
from pww_tpu.config import SDModelConfig
from pww_tpu.training import train_textual_inversion


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="checkpoint dir (diffusers/converted)")
    ap.add_argument("--images", nargs="*", default=None, help="3-5 concept images")
    ap.add_argument("--token", default="<my-concept>")
    ap.add_argument("--init-token", default="thing",
                    help="existing word whose embedding seeds the new token")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--vectors", type=int, default=1)
    ap.add_argument("--out", default="learned_embeds.bin")
    args = ap.parse_args()

    if args.model:
        pipe = PwwPipeline.from_pretrained(args.model)
        steps = args.steps
    else:
        print("no --model: tiny random-weight smoke run")
        pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
        steps = min(args.steps, 100)

    if args.images:
        images = [Image.open(p).convert("RGB") for p in args.images]
    else:
        rng = np.random.default_rng(0)
        images = [
            Image.fromarray((rng.random((64, 64, 3)) * 80 + 100).astype(np.uint8))
            for _ in range(3)
        ]

    result = train_textual_inversion(
        pipe, images, args.token, initializer_token=args.init_token,
        num_vectors=args.vectors, num_steps=steps, batch_size=args.batch,
        learning_rate=args.lr, log_every=max(steps // 10, 1),
    )
    result.save(args.out)
    print(f"trained {result.placeholder!r}; final loss "
          f"{np.mean(result.losses[-10:]):.5f}; wrote {args.out}")

    # paint with the freshly learned concept
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    img = pipe.generate(
        prompt=f"a photo of {result.placeholder}",
        color_map_image=cm,
        color_context={(255, 0, 0): f"{result.placeholder},1.0"},
        num_inference_steps=4 if not args.model else 30,
        seed=0,
    )
    img.save("ti_sample.png")
    print("wrote ti_sample.png")


if __name__ == "__main__":
    main()
