"""Benchmark: SD-1.5 512² 30-step paint-with-words on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no quantitative numbers (BASELINE.md); the north-star
target is < 2 s/image (0.5 img/s) for SD-1.5 512², 30 steps, PwW active, on
TPU v5e. vs_baseline is measured images/sec divided by that 0.5 img/s target.

Weights are randomly initialized (no checkpoints ship in this environment);
FLOPs, memory traffic, and program structure are identical to real weights.
"""
import argparse
import os
import json
import sys
import time

import numpy as np


def _make_pipeline(cfg, args):
    """Build the pipeline; persist random-init params to disk so repeat bench
    runs skip the (remote-compiled, ~minutes) init programs entirely."""
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from pww_tpu.pipeline.pipeline import PwwPipeline

    if args.tiny:
        return PwwPipeline(config=cfg, scheduler=args.scheduler)

    # Full-size runs use the synthetic full-vocab tokenizer so the measured
    # path exercises the real BPE encode + cache (VERDICT r2 weak #5), not
    # the hash-based toy fallback. No checkpoint assets exist on disk.
    from pww_tpu.tokenizer.clip_bpe import synthetic_tokenizer

    tok = synthetic_tokenizer(cfg.clip.vocab_size)

    cache_path = os.path.join(os.path.dirname(__file__), ".bench_params.msgpack")
    if os.path.exists(cache_path):
        try:
            t0 = time.time()
            shapes = _param_shapes(cfg)
            with open(cache_path, "rb") as f:
                params = flax.serialization.from_bytes(shapes, f.read())
            params = jax.device_put(params)
            print(f"params loaded from disk: {time.time() - t0:.1f}s",
                  file=sys.stderr)
            return PwwPipeline(
                config=cfg, params=params, scheduler=args.scheduler,
                weights_dtype=None, tokenizer=tok,
            )
        except Exception as e:  # stale cache → re-init
            print(f"param cache load failed ({e!r}); re-initializing",
                  file=sys.stderr)
    pipe = PwwPipeline(config=cfg, scheduler=args.scheduler, tokenizer=tok)
    try:
        with open(cache_path, "wb") as f:
            f.write(flax.serialization.to_bytes(
                jax.tree.map(lambda x: jax.device_get(x), pipe.params)
            ))
    except Exception as e:
        print(f"param cache save failed ({e!r})", file=sys.stderr)
    return pipe


def _param_shapes(cfg):
    """Zero param pytrees with the right structure for from_bytes."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pww_tpu.pipeline.pipeline import PwwPipeline

    pipe = PwwPipeline.__new__(PwwPipeline)
    pipe.config = cfg
    from pww_tpu.models.clip import CLIPTextEncoder
    from pww_tpu.models.unet import UNet2DCondition
    from pww_tpu.models.vae import AutoencoderKL

    pipe.clip = CLIPTextEncoder(cfg.clip, dtype=jnp.bfloat16)
    pipe.unet = UNet2DCondition(cfg.unet, dtype=jnp.bfloat16)
    pipe.vae = AutoencoderKL(cfg.vae, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    h = w = 2 ** (len(cfg.unet.block_out_channels) - 1)
    shapes = {
        "clip": jax.eval_shape(
            pipe.clip.init, rng,
            jnp.zeros((1, cfg.clip.max_position_embeddings), jnp.int32),
        ),
        "unet": jax.eval_shape(
            pipe.unet.init, rng, jnp.zeros((1, h, w, cfg.unet.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, cfg.clip.max_position_embeddings,
                       cfg.unet.cross_attention_dim)),
        ),
        "vae": jax.eval_shape(
            pipe.vae.init, rng,
            jnp.zeros((1, cfg.vae.scale_factor * 2, cfg.vae.scale_factor * 2,
                       cfg.vae.in_channels)),
        ),
    }
    # bf16 leaves (weights_dtype cast happens before save)
    return jax.tree.map(
        lambda s: np.zeros(s.shape, jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype),
        shapes,
    )


_PEAK_BF16_FLOPS = {
    # device_kind substring -> chip peak dense bf16 FLOP/s
    "v6": 918e12,      # Trillium (v6e)
    "v5p": 459e12,
    "v5": 197e12,      # v5e / "TPU v5 lite"
    "v4": 275e12,
}


def _chip_peak_flops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_BF16_FLOPS.items():
        if sub in kind:
            return peak
    return 0.0  # unknown (e.g. CPU): MFU reported as null


def _denoise_flops(pipe, cm, kwargs, batch: int, size: int, steps: int):
    """Total denoise-loop FLOPs for one generate() call, from XLA's own cost
    model of the exact compiled program (no analytic approximation).

    XLA counts a while/scan body ONCE regardless of trip count, so lower a
    length-1 scan (t_start = steps-1) to get per-CFG-step FLOPs and multiply
    by the step count.
    """
    import jax.numpy as jnp

    from pww_tpu.conditioning.seeding import make_noise
    from pww_tpu.pipeline.pipeline import run_denoise

    enc = pipe.encode_inputs(
        kwargs["prompt"], cm, kwargs["color_context"], "", None
    )
    schedule = pipe.scheduler.set_timesteps(steps)
    text_states, pww, _pooled = pipe._tile_cfg(enc, batch)
    sf = pipe.config.vae.scale_factor
    latents = make_noise(
        0, (batch, size // sf, size // sf, pipe.config.vae.latent_channels),
        "jax",
    ) * schedule.init_noise_sigma
    lowered = run_denoise.lower(
        pipe.unet, pipe.params["unet"], latents, text_states, pww,
        schedule, jnp.float32(7.5), t_start=steps - 1, cfg_batched=True,
    )
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"]) * steps


def _timed_run(pipe, kwargs, repeats: int, label: str, return_times=False):
    """warmup + median wall time of generate() (full pipeline, D2H incl.)."""
    t0 = time.time()
    pipe.generate(seed=0, **kwargs)
    print(f"{label} warmup (incl. compile): {time.time() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for i in range(repeats):
        t0 = time.time()
        pipe.generate(seed=i + 1, **kwargs)
        times.append(time.time() - t0)
    per_call = float(np.median(times))
    print(f"{label}: p50/call {per_call:.3f}s  "
          f"(times: {['%.2f' % t for t in times]})", file=sys.stderr)
    return (per_call, times) if return_times else per_call


def _bench_kwargs(size: int, steps: int, batch: int):
    # the reference's canonical cat/dog example geometry (runner.py:9-25)
    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    cm[:, size // 2 :] = (0, 0, 255)
    return cm, dict(
        prompt="a cat sitting next to a dog, realistic photo",
        color_map_image=cm,
        color_context={(255, 0, 0): "cat,0.5", (0, 0, 255): "dog,0.5"},
        num_inference_steps=steps,
        guidance_scale=7.5,
        num_samples=batch,
        output_type="np",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke config")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=1, help="images per call")
    ap.add_argument("--repeats", type=int, default=None,
                    help="headline reps (default: 15 on TPU, 2 with --tiny) "
                    "— the spread over these is the variance evidence")
    ap.add_argument("--scheduler", default="lms")
    ap.add_argument("--no-extras", action="store_true",
                    help="skip the batch-8 and 768px secondary points")
    args = ap.parse_args()

    import jax

    if args.tiny:
        # --tiny is the CPU smoke path: without this the environment's
        # sitecustomize routes even the tiny config to the tunneled TPU,
        # where each fresh program costs minutes of remote compile.
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: remote-compile backends (tunneled TPU)
    # pay tens of seconds per program; cache across runs.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PWW_JAX_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import PwwPipeline

    if args.tiny:
        cfg = SDModelConfig.tiny()
        size = 128
        steps = 3
    else:
        cfg = SDModelConfig.sd15()
        size = args.size
        steps = args.steps

    if args.repeats is None:
        args.repeats = 2 if args.tiny else 15

    print(f"devices: {jax.devices()}", file=sys.stderr)
    t0 = time.time()
    pipe = _make_pipeline(cfg, args)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    cm, kwargs = _bench_kwargs(size, steps, args.batch)
    per_call, headline_times = _timed_run(
        pipe, kwargs, args.repeats, f"{size}px b{args.batch}",
        return_times=True,
    )
    per_image = per_call / args.batch
    ips = args.batch / per_call
    ht = np.asarray(headline_times)
    spread = {
        "p25": float(np.percentile(ht, 25)), "p75": float(np.percentile(ht, 75)),
        "min": float(ht.min()), "max": float(ht.max()),
    }
    print(f"p50 latency/image: {per_image:.3f}s  images/s/chip: {ips:.3f}  "
          f"spread p25/p75 {spread['p25']:.3f}/{spread['p75']:.3f}s",
          file=sys.stderr)

    # MFU: XLA-counted denoise FLOPs / wall time / chip peak. Wall time is the
    # FULL pipeline (text encode + denoise + VAE + D2H), so this is the
    # end-to-end (conservative) utilization, not a kernel-window number.
    mfu = flops_per_image = None
    try:
        flops = _denoise_flops(pipe, cm, kwargs, args.batch, size, steps)
        flops_per_image = flops / args.batch
        peak = _chip_peak_flops()
        if peak:
            mfu = flops / per_call / peak
            print(f"denoise FLOPs/img: {flops_per_image/1e12:.2f} TF  "
                  f"end-to-end MFU: {mfu:.3f}", file=sys.stderr)
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"cost analysis unavailable: {e!r}", file=sys.stderr)

    extras = {}

    def _extra(name, fn):
        """Secondary points must never sink the headline JSON line."""
        try:
            extras[name] = fn()
            print(f"{name}: {extras[name]:.3f}", file=sys.stderr)
        except Exception as e:  # pragma: no cover - backend-dependent
            print(f"extra {name} failed: {e!r}", file=sys.stderr)
            extras[name] = None

    if not args.tiny and not args.no_extras:
        reps = max(2, args.repeats - 3)

        def _b8():
            _, kw8 = _bench_kwargs(size, steps, 8)
            return 8 / _timed_run(pipe, kw8, reps, f"{size}px b8")

        def _768():
            _, kw768 = _bench_kwargs(768, steps, 1)
            return _timed_run(pipe, kw768, reps, "768px b1")

        def _dc():  # opt-in DeepCache point (headline stays exact)
            kwdc = dict(kwargs, cache_interval=5)
            return args.batch / _timed_run(
                pipe, kwdc, reps, f"{size}px b1 deepcache5"
            )

        def _tome():  # opt-in ToMe (token merging, ratio 0.5 — tomesd default)
            kwtome = dict(kwargs, tome_ratio=0.5)
            return args.batch / _timed_run(
                pipe, kwtome, reps, f"{size}px b1 tome0.5"
            )

        def _lcm():
            # LCM-LoRA/distilled fast-sampling path; random-init weights
            # time identically to a distilled checkpoint
            pipe_lcm = PwwPipeline(
                config=cfg, params=pipe.params, scheduler="lcm",
                weights_dtype=None, tokenizer=pipe.tokenizer,
            )
            kwlcm = dict(kwargs, num_inference_steps=4, guidance_scale=1.0)
            return args.batch / _timed_run(
                pipe_lcm, kwlcm, reps, f"{size}px b1 lcm4"
            )

        def _1024():
            _, kw1024 = _bench_kwargs(1024, steps, 1)
            return _timed_run(pipe, kw1024, reps, "1024px b1")

        def _serve():
            # generate_batch over heterogeneous requests — the serving hot
            # path the Batcher drives (different prompts/contexts/seeds,
            # shared program). Returns requests/s.
            animals = ["cat", "dog", "fox", "owl", "bear", "wolf", "deer",
                       "hare"]
            reqs = []
            for i, a in enumerate(animals):
                reqs.append(dict(
                    prompt=f"a {a} in a field, realistic photo",
                    color_map_image=cm,
                    color_context={(255, 0, 0): f"{a},0.5"},
                    seed=i,
                ))
            t0 = time.time()
            pipe.generate_batch(reqs, num_inference_steps=steps,
                                output_type="np")
            print(f"serve_batch warmup (incl. compile): {time.time()-t0:.1f}s",
                  file=sys.stderr)
            times = []
            for r in range(reps):
                t0 = time.time()
                pipe.generate_batch(reqs, num_inference_steps=steps,
                                    output_type="np")
                times.append(time.time() - t0)
            per = float(np.median(times))
            print(f"serve_batch8: p50/call {per:.3f}s", file=sys.stderr)
            return len(reqs) / per

        def _pipelined():
            # Sustained throughput of the IDENTICAL headline program with
            # D2H overlapped: dispatch call i+1 (async) before fetching
            # call i's uint8 device image — exactly how the serving
            # Batcher's fetcher thread runs. The headline stays the
            # synchronous p50 latency; this point quantifies how much of
            # the latency gap is the tunnel's D2H transfer (~80 ms/img at
            # b1, docs/BENCHMARKING.md) rather than compute.
            m = max(6, args.repeats - 5)
            kwdev = dict(kwargs, output_type="device")
            pipe.generate(seed=0, **kwdev)  # already warm (headline)
            t0 = time.time()
            pending = pipe.generate(seed=1, **kwdev)
            for i in range(1, m):
                nxt = pipe.generate(seed=i + 1, **kwdev)
                np.asarray(pending)  # fetch i while i+1 computes
                pending = nxt
            np.asarray(pending)
            total = time.time() - t0
            print(f"pipelined x{m}: {total:.3f}s total", file=sys.stderr)
            return m * args.batch / total

        _extra("batch8_img_per_s", _b8)
        _extra("headline_pipelined_img_per_s", _pipelined)
        _extra("s_per_image_768px", _768)
        _extra("s_per_image_1024px", _1024)
        _extra("serve_batch8_req_per_s", _serve)
        _extra("deepcache_interval5_img_per_s", _dc)
        _extra("tome_ratio05_img_per_s", _tome)
        _extra("lcm_4step_img_per_s", _lcm)

        # end-of-session headline recheck: quantifies within-session drift
        # (tunnel variance) so round-over-round comparisons have error bars
        def _recheck():
            return _timed_run(pipe, kwargs, 5, f"{size}px b1 recheck")

        _extra("headline_recheck_s_per_image", _recheck)
    batch8_ips = extras.get("batch8_img_per_s")
    s_per_img_768 = extras.get("s_per_image_768px")
    deepcache5_ips = extras.get("deepcache_interval5_img_per_s")
    tome_ips = extras.get("tome_ratio05_img_per_s")
    lcm4_ips = extras.get("lcm_4step_img_per_s")

    baseline_ips = 0.5  # north star: < 2 s/image at the 512px/30-step config
    headline_cfg = not args.tiny and size == 512 and steps == 30
    record = {
        # name + baseline describe the MEASURED configuration: a --size /
        # --steps / --tiny override must not masquerade as the headline
        "metric": (
            "images_per_sec_per_chip_sd15_512px_30step_pww" if headline_cfg
            else f"images_per_sec_per_chip_"
                 f"{'tiny' if args.tiny else 'sd15'}_{size}px_{steps}step_pww"
        ),
        "value": round(ips, 4),
        "unit": "img/s/chip",
        "size": size,
        "steps": steps,
        "vs_baseline": round(ips / baseline_ips, 3) if headline_cfg else None,
        "p50_s_per_image": round(per_image, 4),
        "mfu_end_to_end": None if mfu is None else round(mfu, 4),
        "denoise_tflops_per_image": (
            None if flops_per_image is None else round(flops_per_image / 1e12, 3)
        ),
        "batch8_img_per_s": (
            None if batch8_ips is None else round(batch8_ips, 4)
        ),
        "s_per_image_768px": (
            None if s_per_img_768 is None else round(s_per_img_768, 4)
        ),
        "s_per_image_1024px": (
            None if extras.get("s_per_image_1024px") is None
            else round(extras["s_per_image_1024px"], 4)
        ),
        "serve_batch8_req_per_s": (
            None if extras.get("serve_batch8_req_per_s") is None
            else round(extras["serve_batch8_req_per_s"], 4)
        ),
        "headline_recheck_s_per_image": (
            None if extras.get("headline_recheck_s_per_image") is None
            else round(extras["headline_recheck_s_per_image"], 4)
        ),
        "headline_spread_s": {k: round(v, 4) for k, v in spread.items()},
        "headline_pipelined_img_per_s": (
            None if extras.get("headline_pipelined_img_per_s") is None
            else round(extras["headline_pipelined_img_per_s"], 4)
        ),
        "deepcache_interval5_img_per_s": (
            None if deepcache5_ips is None else round(deepcache5_ips, 4)
        ),
        "tome_ratio05_img_per_s": (
            None if tome_ips is None else round(tome_ips, 4)
        ),
        "lcm_4step_img_per_s": (
            None if lcm4_ips is None else round(lcm4_ips, 4)
        ),
        "repeats": args.repeats,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
