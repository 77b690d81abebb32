"""Phase attribution + roofline for the batch-scaling question (round 4).

Round-3 finding: 8× batch bought only 1.2× throughput and nothing recorded
WHERE the time goes. This harness times each pipeline phase in isolation on
the real chip — text encode (host+CLIP), the 30-step denoise scan alone,
the VAE decode alone, the fused denoise+decode program, and the full
``generate`` with and without the image D2H — at batch 1 and 8, and puts
the measured per-step denoise time against XLA's own cost model of the
exact compiled step (FLOPs and HBM bytes): ``roofline = max(flops/peak,
bytes/bw)``. If measured ≈ roofline, the wall is physics (documented in
docs/BENCHMARKING.md); if not, the gap names the phase to fix.

    python benchmarks/profile_phases.py            # real TPU, writes JSON
    python benchmarks/profile_phases.py --tiny     # CPU plumbing smoke

Timing discipline (CLAUDE.md): the tunnel makes ``block_until_ready``
unreliable — every timed call ends in an ``np.asarray`` fetch of its
(small) output; image fetches are what the D2H column measures.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# per-chip datasheet constants + timing helper, shared with
# profile_decode.py (peak-FLOPs table's single source is bench.py)
from _roofline import HBM_BW, PEAK_FLOPS  # noqa: E402
from _roofline import chip as _chip  # noqa: E402
from _roofline import med as _med  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=6)
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
    from pww_tpu.conditioning.seeding import make_noise
    from pww_tpu.pipeline.pipeline import run_decode, run_denoise

    class _A:
        tiny = args.tiny
        scheduler = "lms"

    if args.tiny:
        cfg, size, steps = SDModelConfig.tiny(), 128, 3
    else:
        cfg, size, steps = SDModelConfig.sd15(), args.size, args.steps
    pipe = B._make_pipeline(cfg, _A)

    peak = _chip(PEAK_FLOPS)
    bw = _chip(HBM_BW)
    sf = pipe.config.vae.scale_factor
    cm, kwargs = B._bench_kwargs(size, steps, 1)
    record = {
        "size": size, "steps": steps,
        "device": str(jax.devices()[0].device_kind),
        "peak_bf16_flops": peak, "hbm_bytes_per_s": bw,
        "batches": {},
    }

    for batch in args.batches:
        r = {}
        _, kw = B._bench_kwargs(size, steps, batch)

        # -- phase: host prologue (parse/rasterize/CLIP encode, cached off)
        def encode():
            pipe._text_cache.clear()
            pipe._encode_cache.clear()
            return pipe.encode_inputs(
                kw["prompt"], cm, kw["color_context"], "", None
            )

        r["encode_s"] = _med(lambda: np.asarray(encode().text_states), args.reps)

        enc = pipe.encode_inputs(kw["prompt"], cm, kw["color_context"], "", None)
        schedule = pipe.scheduler.set_timesteps(steps)
        text_states, pww, _pooled = pipe._tile_cfg(enc, batch)
        lat_shape = (batch, size // sf, size // sf,
                     pipe.config.vae.latent_channels)
        lat0 = make_noise(0, lat_shape, "jax") * schedule.init_noise_sigma
        g = jnp.float32(7.5)

        # -- phase: denoise scan alone (latents fetch = 128 KB, negligible)
        def denoise():
            out, _ = run_denoise(
                pipe.unet, pipe.params["unet"], lat0, text_states, pww,
                schedule, g, t_start=0, cfg_batched=True,
            )
            return np.asarray(out)

        r["denoise_s"] = _med(denoise, args.reps)

        final_lat = jnp.asarray(denoise())

        # -- phase: VAE decode alone (uint8 fetch included — serving pays it)
        def decode():
            return np.asarray(
                run_decode(pipe.vae, pipe.params["vae"], final_lat)
            )

        r["decode_incl_d2h_s"] = _med(decode, args.reps)

        # -- full pipeline: with and without the image D2H
        r["generate_np_s"] = _med(
            lambda: pipe.generate(seed=1, **kw), args.reps
        )
        kwdev = dict(kw, output_type="device")

        def gen_dev():
            # device output, synced by fetching a 1-pixel slice: measures
            # the full pipeline minus the image D2H transfer (generate_np_s
            # minus this ≈ what the tunnel's image fetch costs)
            out = pipe.generate(seed=1, **kwdev)
            return np.asarray(out[:, :1, :1])

        r["generate_dev_sync_row_s"] = _med(gen_dev, args.reps)

        # -- XLA cost model of the exact compiled denoise step
        lowered = run_denoise.lower(
            pipe.unet, pipe.params["unet"], lat0, text_states, pww,
            schedule, g, t_start=steps - 1, cfg_batched=True,
        )
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0))
        step_bytes = float(ca.get("bytes accessed", 0.0))
        r["step_flops"] = step_flops
        r["step_hbm_bytes"] = step_bytes
        r["step_measured_s"] = r["denoise_s"] / steps
        if peak and bw and step_flops:
            t_flops = step_flops / peak
            t_bytes = step_bytes / bw
            r["step_roofline_s"] = max(t_flops, t_bytes)
            r["step_flops_bound_s"] = t_flops
            r["step_bytes_bound_s"] = t_bytes
            r["step_roofline_fraction"] = (
                r["step_roofline_s"] / r["step_measured_s"]
            )
            r["bound"] = "hbm" if t_bytes > t_flops else "mxu"

        dca = run_decode.lower(
            pipe.vae, pipe.params["vae"], final_lat
        ).compile().cost_analysis()
        if isinstance(dca, (list, tuple)):
            dca = dca[0]
        r["decode_flops"] = float(dca.get("flops", 0.0))
        r["decode_hbm_bytes"] = float(dca.get("bytes accessed", 0.0))
        if peak and bw and r["decode_flops"]:
            r["decode_roofline_s"] = max(
                r["decode_flops"] / peak, r["decode_hbm_bytes"] / bw
            )

        record["batches"][str(batch)] = {
            k: (round(v, 5) if isinstance(v, float) else v)
            for k, v in r.items()
        }
        print(f"b{batch}: " + json.dumps(record["batches"][str(batch)]),
              file=sys.stderr, flush=True)

    print(json.dumps(record))
    if not args.tiny:
        out = os.path.join(os.path.dirname(__file__), "PROFILE_PHASES.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
