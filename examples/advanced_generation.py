"""Round-2 generation surfaces in one walkthrough: CLIP-skip, FreeU,
DPM++ 2M SDE (Karras), hires fix, T2I-Adapter, and multi-ControlNet.
(For the SDXL base→refiner ensemble see tests/test_ensemble.py — it needs
two pipelines.)

With no ``--model`` everything runs on the tiny random-weight config (the
CI path — proves the wiring end-to-end); point ``--model`` at a converted
SD-1.5 directory for real outputs.

  python examples/advanced_generation.py [--model /path/sd15] [--out-dir out]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pww_tpu import PwwPipeline
from pww_tpu.config import SDModelConfig


def demo_color_map(side):
    cm = np.zeros((side, side, 3), np.uint8)
    cm[:, : side // 2] = (255, 0, 0)
    cm[: side // 3, side // 2 :] = (0, 0, 255)
    return cm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--tiny-side", type=int, default=64)
    args = ap.parse_args()

    if args.model:
        pipe = PwwPipeline.from_pretrained(args.model)
        side, steps = 512, 30
    else:
        pipe = PwwPipeline(config=SDModelConfig.tiny())
        side, steps = args.tiny_side, 2

    cm = demo_color_map(side)
    ctx = {(255, 0, 0): "cat,1.0", (0, 0, 255): "moon,0.8"}
    kw = dict(
        prompt="a cat under the moon",
        color_map_image=cm,
        color_context=ctx,
        num_inference_steps=steps,
        seed=0,
    )

    def save(img, name):
        path = os.path.join(args.out_dir, name)
        (img[0] if isinstance(img, list) else img).save(path)
        print("wrote", path)

    # 1. CLIP-skip + FreeU on the plain txt2img path
    save(pipe.generate(clip_skip=1, freeu=True, **kw), "adv_clipskip_freeu.png")

    # 2. A stochastic second-order sampler with Karras spacing
    from pww_tpu.config import SchedulerConfig
    from pww_tpu.schedulers.schedules import make_scheduler

    pipe.scheduler = make_scheduler(
        "dpmpp_2m_sde", SchedulerConfig(use_karras_sigmas=True)
    )
    save(pipe.generate(**kw), "adv_sde_karras.png")
    pipe.scheduler = make_scheduler("lms")

    # 3. Hires fix: native pass, latent 2x upscale, refine
    save(
        pipe.generate_hires(hires_scale=2.0, hires_strength=0.6,
                            hires_steps=steps, **kw),
        "adv_hires.png",
    )

    # 4. T2I-Adapter structural hint (random-init without a checkpoint)
    pipe.load_t2i_adapter()
    hint = np.zeros((side, side, 3), np.uint8)
    hint[side // 4 : 3 * side // 4, side // 3 : 2 * side // 3] = 255
    save(
        pipe.generate(adapter_image=hint, adapter_conditioning_scale=0.8, **kw),
        "adv_t2i_adapter.png",
    )

    # 5. Multi-ControlNet: two stacked nets, per-net scales
    pipe.load_controlnet().add_controlnet()
    save(
        pipe.generate(
            control_image=[hint, 255 - hint],
            controlnet_conditioning_scale=[1.0, 0.5],
            **kw,
        ),
        "adv_multi_controlnet.png",
    )


if __name__ == "__main__":
    main()
