"""Same-seed quality drift of ToMe ratios vs the exact program (round 5).

`AB_KERNELS_1024_tome.json` answers the SPEED half of the VERDICT-r4 ToMe
verdict (ratio ≥ 0.5 wins at 1024²); this records the QUALITY half: one
fixed-seed 1024² generation per ratio against the exact output of the same
seed, scored with the fidelity harness's PSNR/SSIM (`fidelity.py` — the
same metrics the image-space goldens use). No LPIPS here: its calibration
weights don't exist in this environment (docs/BENCHMARKING.md, external
recipe). All programs are warm after the A/B ran, so this costs seconds.

  python benchmarks/tome_drift.py --size 1024          # real chip
  python benchmarks/tome_drift.py --tiny               # CPU plumbing smoke
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--ratios", default="0.3,0.5,0.75")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as B
    from benchmarks.fidelity import psnr, ssim
    from pww_tpu.config import SDModelConfig

    class _A:
        tiny = args.tiny
        scheduler = "lms"

    if args.tiny:
        import dataclasses

        # lower the merge threshold so the 256-token tiny site actually
        # merges — otherwise every ratio is a no-op and PSNR is inf
        cfg, size, steps = SDModelConfig.tiny(), 128, 2
        cfg = dataclasses.replace(
            cfg, unet=dataclasses.replace(cfg.unet, tome_min_tokens=256))
    else:
        cfg, size, steps = SDModelConfig.sd15(), args.size, args.steps
    pipe = B._make_pipeline(cfg, _A)
    _, kw = B._bench_kwargs(size, steps, 1)

    exact = np.asarray(pipe.generate(seed=7, **kw))
    exact = exact[0] if exact.ndim == 4 else exact
    record = {"size": size, "steps": steps, "seed": 7, "per_ratio": {}}
    for ratio in [float(r) for r in args.ratios.split(",")]:
        img = np.asarray(pipe.generate(seed=7, tome_ratio=ratio, **kw))
        img = img[0] if img.ndim == 4 else img
        record["per_ratio"][str(ratio)] = {
            "psnr_db": round(psnr(exact, img), 2),
            "ssim": round(ssim(exact, img), 4),
        }
        print(f"ratio {ratio}: PSNR {record['per_ratio'][str(ratio)]}",
              file=sys.stderr, flush=True)
    print(json.dumps(record))
    if not args.tiny:
        out = os.path.join(os.path.dirname(__file__), "TOME_DRIFT.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
