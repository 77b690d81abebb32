"""Interleaved same-session kernel-knob A/B at high resolution (round 4).

Round-3 verdict asked for a block-size sweep at 4096-16384 q-lengths.
Cross-session numbers on the tunneled chip drift ±8-10%, so variants are
compared ONLY by interleaving timed calls within one session
(docs/BENCHMARKING.md methodology): one pipeline per knob setting (same
params — a config change recompiles but shares weights), alternating
A/B/C/A/B/C... timed generate() calls.

  python benchmarks/ab_kernels.py --size 1024 --rounds 6
  python benchmarks/ab_kernels.py --tiny            # CPU plumbing smoke
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to keep (others in "
                    "the set are skipped — useful to re-run a decision pair "
                    "without paying cold compiles for variants already "
                    "answered at another operating point)")
    ap.add_argument("--set", default="hires",
                    choices=["hires", "b8", "gn", "b8x", "tome"],
                    help="knob set: 'hires' (round-3 ask: blocks at 4096-"
                    "16384 q), 'b8' (round-4 batch-scaling: bigger blocks "
                    "+ dense-at-1024 with 16 CFG rows in flight), 'gn' "
                    "(fused Pallas GroupNorm vs XLA's reduce fusions), "
                    "'b8x' (round-5 MXU-gap experiments: unpadded flash "
                    "head dims, im2col conv GEMM, NCHW conv dimension "
                    "numbers — VERDICT r4 item 3), or 'tome' (token-merge "
                    "ratios 0.3/0.5/0.75 at the operating point ToMe was "
                    "built for — run with --size 1024)")
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
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import PwwPipeline

    class _A:
        tiny = args.tiny
        scheduler = "lms"

    if args.tiny:
        cfg0, size, steps = SDModelConfig.tiny(), 128, 2
    else:
        cfg0, size, steps = SDModelConfig.sd15(), args.size, args.steps
    base = B._make_pipeline(cfg0, _A)

    # knob variants: baseline, halved flash block, doubled cross-attn q block
    def with_unet(**kw):
        return dataclasses.replace(
            cfg0, unet=dataclasses.replace(cfg0.unet, **kw)
        )

    def variant(**kwcfg):
        return PwwPipeline(
            config=with_unet(**kwcfg), params=base.params,
            weights_dtype=None, tokenizer=base.tokenizer,
        )

    if args.set == "hires":
        variants = {
            "base_fb1024_xq1024": base,
            "flash_block512": variant(flash_block=512),
            "xattn_q2048": variant(xattn_block_q=2048),
        }
    elif args.set == "gn":
        def norm_variant(gn, ln):
            cfg = dataclasses.replace(
                with_unet(fused_group_norm=gn, fused_layer_norm=ln),
                vae=dataclasses.replace(cfg0.vae, fused_group_norm=gn),
            )
            return PwwPipeline(config=cfg, params=base.params,
                               weights_dtype=None, tokenizer=base.tokenizer)

        # Every variant is constructed explicitly (NOT from `base`) so the
        # set measures the same four points regardless of what the config
        # defaults currently are (round 5 flipped them to XLA norms).
        variants = {
            "norm_xla": norm_variant(False, False),   # round-5 default
            "gn_only": norm_variant(True, False),
            "ln_only": norm_variant(False, True),
            "norm_fused_all": norm_variant(True, True),
        }
    elif args.set == "b8x":
        # round-5 falsifiable experiments at the named b8 structural costs
        # (docs/BENCHMARKING.md roofline): (a) the flash wrapper's
        # materialized 40→128 head-dim pads (HBM passes), (b) XLA's native
        # conv schedule vs an explicit im2col GEMM at the 320-ch stages,
        # (c) NCHW conv dimension numbers. Numerics pinned equal in
        # tests/test_conv_lowering.py.
        variants = {
            "base": base,
            "flash_nopad": variant(flash_pad_heads=False),
            "conv_im2col": variant(conv_lowering="im2col"),
            "conv_nchw": variant(conv_lowering="nchw"),
        }
    elif args.set == "tome":
        # ToMe has never beaten the 512² headline (PERF_DEFAULTS.md); this
        # set answers whether it wins where self-attention dominates
        # (1024²: 535.7 TF/img). Ratios are generate() kwargs — same
        # pipeline/program family, the merge changes the traced graph.
        variants = {"exact": base}
        extra_kwargs = {
            "tome_03": (base, {"tome_ratio": 0.3}),
            "tome_05": (base, {"tome_ratio": 0.5}),
            "tome_075": (base, {"tome_ratio": 0.75}),
        }
    else:  # b8: larger blocks amortize better over 16 CFG rows; also test
        # whether XLA-dense beats flash at seq 1024 when batch covers latency
        variants = {
            "base_fb1024_xq1024": base,
            "flash_block2048": variant(flash_block=2048),
            "dense_at_1024": variant(flash_min_seq=4096),
            "xq2048": variant(xattn_block_q=2048),
        }

    if args.set == "tome":
        for name, (pipe, kw_extra) in extra_kwargs.items():
            variants[name] = (pipe, kw_extra)
    # normalize: every variant is (pipe, per-variant generate kwargs)
    variants = {
        n: (v if isinstance(v, tuple) else (v, {}))
        for n, v in variants.items()
    }
    if args.only:
        keep = {s.strip() for s in args.only.split(",") if s.strip()}
        unknown = keep - set(variants)
        if unknown:
            ap.error(f"--only names not in set '{args.set}': {sorted(unknown)}")
        variants = {n: v for n, v in variants.items() if n in keep}

    cm, kw = B._bench_kwargs(size, steps, args.batch)
    infeasible = {}
    for name, (pipe, kwx) in list(variants.items()):  # warm (compile) each
        t0 = time.time()
        try:
            pipe.generate(seed=0, **kw, **kwx)
        except Exception as e:
            # e.g. flash_block=2048 at b8 overflows the 16 MB scoped VMEM —
            # an infeasible point is a RESULT of the sweep, not a crash
            msg = (str(e).splitlines() or [repr(e)])[-1][:200]
            print(f"{name}: infeasible ({msg})", file=sys.stderr, flush=True)
            infeasible[name] = msg
            del variants[name]
            continue
        print(f"{name}: warm {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)
    times = {k: [] for k in variants}
    for r in range(args.rounds):  # interleave
        for name, (pipe, kwx) in variants.items():
            t0 = time.time()
            pipe.generate(seed=r + 1, **kw, **kwx)
            times[name].append(time.time() - t0)
        print(f"round {r}: " + "  ".join(
            f"{n}={times[n][-1]:.3f}s" for n in variants), file=sys.stderr,
            flush=True)

    record = {
        "size": size, "steps": steps, "rounds": args.rounds,
        "batch": args.batch, "set": args.set, "infeasible": infeasible,
        "median_s": {n: round(float(np.median(t)), 4) for n, t in times.items()},
        "p25_s": {n: round(float(np.percentile(t, 25)), 4) for n, t in times.items()},
        "p75_s": {n: round(float(np.percentile(t, 75)), 4) for n, t in times.items()},
    }
    print(json.dumps(record))
    if not args.tiny:
        out = os.path.join(
            os.path.dirname(__file__),
            f"AB_KERNELS_{size}" + (f"_b{args.batch}" if args.batch != 1
                                    else "")
            + (f"_{args.set}" if args.set not in ("hires", "b8") else "")
            + ".json",
        )
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
