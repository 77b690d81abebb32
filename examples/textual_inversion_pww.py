"""Textual inversion + paint-with-words (reference TI notebook recipe,
`contents/notebooks/paint_with_words_textual_inversion.ipynb` / README.md:301-307).

The reference's notebook: load a learned embedding ``.bin``, add the
placeholder token, resize the CLIP embedding matrix, write the row, then run
PwW with the placeholder in both the prompt and a region label. Same flow here
via :func:`apply_textual_inversion` — the injection happens before jit so the
compiled pipeline sees a static vocabulary.

  python examples/textual_inversion_pww.py --model /path/sd15 \
      --embedding /path/my-concept.bin
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pww_tpu import PwwPipeline, paint_with_words
from pww_tpu.config import SDModelConfig
from pww_tpu.weights.textual_inversion import apply_textual_inversion


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--embedding", default=None, help="learned_embeds.bin")
    ap.add_argument("--out", default="ti_output.png")
    args = ap.parse_args()

    if args.model:
        pipe = PwwPipeline.from_pretrained(args.model)
    else:
        print("no --model: tiny random-weight demo (structural only)")
        pipe = PwwPipeline(config=SDModelConfig.tiny())

    if args.embedding:
        placeholder = apply_textual_inversion(pipe, args.embedding)
    else:
        # demo: inject a synthetic embedding so the flow still runs
        import tempfile

        import torch

        hidden = pipe.config.clip.hidden_size
        vec = torch.randn(hidden) * 0.01
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "emb.bin")
            torch.save({"<my-concept>": vec}, p)
            placeholder = apply_textual_inversion(pipe, p)
    print("placeholder token:", placeholder)

    size = 512 if args.model else 128
    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    cm[:, size // 2 :] = (0, 0, 255)

    img = paint_with_words(
        color_context={
            (255, 0, 0): f"{placeholder},1.2",
            (0, 0, 255): "a mountain lake,0.6",
        },
        color_map_image=cm,
        input_prompt=f"a photo of {placeholder} beside a mountain lake",
        num_inference_steps=30 if args.model else 3,
        seed=0,
        preloaded_utils=pipe,
    )
    img.save(args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
