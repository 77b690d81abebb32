"""Performance sweep: resolution × batch × scheduler on the active backend.

Prints a table of p50 latency / images-per-sec; the 768² batched row is
BASELINE config #5's throughput stress of the bias-pyramid pipeline.

  python benchmarks/sweep.py                  # SD-1.5 on TPU
  python benchmarks/sweep.py --tiny           # CPU smoke
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax

    if args.tiny:
        # CPU smoke: keep the tiny config off the tunneled TPU (the
        # environment's sitecustomize force-selects it; see bench.py)
        jax.config.update("jax_platforms", "cpu")

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    from pww_tpu import PwwPipeline
    from pww_tpu.config import SDModelConfig

    if args.tiny:
        pipe = PwwPipeline(config=SDModelConfig.tiny())
        cases = [(64, 1), (64, 2)]
        steps = 2
    else:
        # reuse bench's pipeline builder: it synthesizes random-init params
        # on the host with numpy (no remote-compiled init programs) and
        # installs the synthetic full-vocab tokenizer so the measured
        # prologue is the real BPE path, not the toy fallback (same reasons
        # serve_load.py goes through it)
        import types

        import bench as B

        pipe = B._make_pipeline(
            SDModelConfig.sd15(),
            types.SimpleNamespace(tiny=False, scheduler="lms"),
        )
        cases = [(512, 1), (512, 4), (768, 1), (768, 4), (1024, 1)]
        steps = args.steps

    print(f"{'res':>6} {'batch':>5} {'steps':>5} {'p50 s/call':>11} "
          f"{'s/image':>8} {'img/s':>7}")
    for size, batch in cases:
        cm = np.zeros((size, size, 3), np.uint8)
        cm[:, : size // 2] = (255, 0, 0)
        cm[:, size // 2 :] = (0, 0, 255)
        kw = dict(
            prompt="a cat and a dog", color_map_image=cm,
            color_context={(255, 0, 0): "cat,0.5", (0, 0, 255): "dog,0.5"},
            num_inference_steps=steps, num_samples=batch, output_type="np",
        )
        pipe.generate(seed=0, **kw)  # compile+warm
        times = []
        for i in range(args.repeats):
            t0 = time.time()
            pipe.generate(seed=i + 1, **kw)
            times.append(time.time() - t0)
        p50 = float(np.median(times))
        print(f"{size:>6} {batch:>5} {steps:>5} {p50:>11.3f} "
              f"{p50 / batch:>8.3f} {batch / p50:>7.3f}")


if __name__ == "__main__":
    main()
