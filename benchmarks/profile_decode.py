"""True device compute time of the VAE decode (round 4).

PROFILE_PHASES times decode as ONE dispatch + a full uint8 image fetch, so
on the tunneled backend the number conflates three things: decode compute,
the per-dispatch round-trip (~5-30 ms), and the image D2H transfer. This
harness separates them: a single compiled program runs the decode N times
inside a ``lax.scan`` (input perturbed per iteration so XLA cannot CSE the
iterations away) and returns one scalar — so dispatch and fetch cost are
paid once and ``(t(N) - t(1)) / (N - 1)`` is the pure per-decode device
time. The residual ``decode_incl_d2h - compute`` is the tunnel's
dispatch+D2H share, which the pipelined/serving paths overlap.

    python benchmarks/profile_decode.py            # real TPU, writes JSON
    python benchmarks/profile_decode.py --tiny     # CPU plumbing smoke
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# per-chip datasheet constants + timing helper, shared with
# profile_phases.py (peak-FLOPs table's single source is bench.py)
from _roofline import HBM_BW, PEAK_FLOPS  # noqa: E402
from _roofline import chip as _chip  # noqa: E402
from _roofline import med as _med  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--n", type=int, default=9, help="chained decodes")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import bench as B
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import _decode_uint8, run_decode

    class _A:
        tiny = args.tiny
        scheduler = "lms"

    if args.tiny:
        cfg, size = SDModelConfig.tiny(), 128
    else:
        cfg, size = SDModelConfig.sd15(), args.size
    pipe = B._make_pipeline(cfg, _A)

    peak = _chip(PEAK_FLOPS)
    bw = _chip(HBM_BW)
    sf = pipe.config.vae.scale_factor

    @functools.partial(jax.jit, static_argnames=("vae", "n"))
    def chained(vae, params, z, n):
        # per-iteration input perturbation defeats CSE; the scalar checksum
        # keeps the fetch negligible while forcing every iteration to run
        def body(c, i):
            img = _decode_uint8(vae, params, z + i.astype(z.dtype) * 1e-6)
            return c + img[0, 0, 0, 0].astype(jnp.int32), None
        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n))
        return tot

    record = {
        "size": size, "n": args.n,
        "device": str(jax.devices()[0].device_kind),
        "batches": {},
    }
    for batch in args.batches:
        z = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (batch, size // sf, size // sf,
                 pipe.config.vae.latent_channels)
            ),
            jnp.float32,
        )
        r = {}
        t1 = _med(lambda: np.asarray(
            chained(pipe.vae, pipe.params["vae"], z, 1)), args.reps)
        tn = _med(lambda: np.asarray(
            chained(pipe.vae, pipe.params["vae"], z, args.n)), args.reps)
        r["chain_1_s"] = t1
        r[f"chain_{args.n}_s"] = tn
        r["decode_compute_s"] = (tn - t1) / (args.n - 1)
        # the PROFILE_PHASES-style point for the same input: one dispatch +
        # full uint8 image fetch — difference vs compute = dispatch + D2H
        r["decode_incl_d2h_s"] = _med(
            lambda: np.asarray(run_decode(pipe.vae, pipe.params["vae"], z)),
            args.reps,
        )
        r["dispatch_plus_d2h_s"] = r["decode_incl_d2h_s"] - r["decode_compute_s"]
        ca = run_decode.lower(
            pipe.vae, pipe.params["vae"], z
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        r["decode_flops"] = float(ca.get("flops", 0.0))
        r["decode_hbm_bytes"] = float(ca.get("bytes accessed", 0.0))
        if peak and bw and r["decode_flops"]:
            r["roofline_s"] = max(
                r["decode_flops"] / peak, r["decode_hbm_bytes"] / bw
            )
            r["roofline_fraction"] = r["roofline_s"] / r["decode_compute_s"]
        record["batches"][str(batch)] = {
            k: (round(v, 5) if isinstance(v, float) else v)
            for k, v in r.items()
        }
        print(f"b{batch}: " + json.dumps(record["batches"][str(batch)]),
              file=sys.stderr, flush=True)

    print(json.dumps(record))
    if not args.tiny:
        out = os.path.join(os.path.dirname(__file__), "PROFILE_DECODE.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
