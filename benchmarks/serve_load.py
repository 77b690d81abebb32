"""Serving load test: micro-batched vs serial request handling.

Quantifies the batcher's win over the reference's serving model (serial loop,
reference `gradio_pww.py:31-45`). Fires N concurrent requests at a
:class:`Batcher` and compares wall time against running them one by one.

  python benchmarks/serve_load.py --tiny           # CPU
  python benchmarks/serve_load.py --n 8            # TPU, SD-1.5
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _run_mixed(pipe, req, size, steps, tiny, waves=3,
               max_wait_ms=200.0):
    """Heterogeneous closed-loop load (VERDICT r4 item 6).

    10 closed-loop clients against ONE Batcher: 4 txt2img @ base size, 4
    txt2img @ the next resolution bucket (768² real / 96² tiny), 1 inpaint
    (batchable mode, but alone in its compat group), 1 prompt-editing
    (singleton by construction — per-step conditioning switch). Each client
    submits its next request only after the previous resolves. Per-class
    latency percentiles isolate what the batcher can control: requests of a
    class should see a consistent full-cycle latency, not a lottery of
    queue positions. pad_to_bucket bounds the program set when class waves
    drift and groups split (a 3-request group pads to the compiled 4-row
    program instead of compiling a 3-row one mid-run).
    """
    import json
    import threading
    import time as _time

    from pww_tpu.serving.batcher import Batcher

    hi = 96 if tiny else 768
    rng = np.random.default_rng(0)
    init = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    mask = np.zeros((size, size), np.float32)
    q = size // 4
    mask[q: 3 * q, q: 3 * q] = 1.0

    def txt_req(i, rsize):
        return req(i, rsize)

    def inpaint_req(i):
        r = req(i)
        r.update(init_image=init, mask_image=mask, strength=0.8,
                 mask_blur=4.0)
        return r

    def edit_req(i):
        r = req(i)
        r["prompt"] = f"a [cat:dog:{max(1, steps // 2)}] number {i}"
        r["prompt_editing"] = True
        return r

    classes = {
        "txt512": (4, lambda i: txt_req(i, size)),
        "txt768": (4, lambda i: txt_req(i, hi)),
        "inpaint": (1, inpaint_req),
        "edit": (1, edit_req),
    }

    # The memory budget: the first real run OOM'd 14 times because 768²-b4
    # launches overlapping other programs exceeded HBM, even though every
    # shape warms fine alone. 2·768² pixels caps 768² groups at 2 rows and
    # leaves 512² at the full max_batch of 4.
    max_px = None if tiny else 2 * hi * hi

    # Warm every program the run can touch — every bucket size the pixel
    # budget allows per txt class (groups that split under drift pad to
    # these), the inpaint b1 program, and the prompt-editing segment pair.
    # Compiles here keep the timed phase compile-free.
    for b in (1, 2, 4):
        for rs in (size, hi):
            if max_px is not None and b > max(1, max_px // (rs * rs)):
                continue
            t0 = _time.time()
            pipe.generate_batch([txt_req(j, rs) for j in range(b)],
                                num_inference_steps=steps)
            print(f"warm txt{rs} b{b}: {_time.time() - t0:.1f}s",
                  file=sys.stderr, flush=True)
    t0 = _time.time()
    pipe.generate_batch([inpaint_req(0)], num_inference_steps=steps,
                        strength=0.8)
    print(f"warm inpaint b1: {_time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    t0 = _time.time()
    pipe.generate(**edit_req(0))
    print(f"warm edit: {_time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)

    batcher = Batcher(pipe, max_batch=4, max_wait_ms=max_wait_ms,
                      pad_to_bucket=True, max_batch_pixels=max_px)
    lat = {c: [] for c in classes}
    fails = {c: 0 for c in classes}
    lock = threading.Lock()

    def client(cls, maker, cid):
        for w in range(waves):
            r = maker(1000 * cid + w)
            ts = _time.time()
            try:
                batcher.submit(r).result(timeout=3600)
            except Exception as e:
                # a failed wave must be VISIBLE in the artifact, and must
                # not silently end this client's remaining waves
                with lock:
                    fails[cls] += 1
                print(f"{cls} wave {w} FAILED: "
                      f"{(str(e).splitlines() or [repr(e)])[-1][:120]}",
                      file=sys.stderr, flush=True)
                continue
            with lock:
                lat[cls].append(_time.time() - ts)

    threads = []
    cid = 0
    for cls, (n, maker) in classes.items():
        for _ in range(n):
            threads.append(threading.Thread(
                target=client, args=(cls, maker, cid)))
            cid += 1
    try:
        t0 = _time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        total = _time.time() - t0
    finally:
        batcher.close()

    n_req = sum(len(xs) for xs in lat.values())  # COMPLETED requests only
    per_class = {}
    for cls, xs in lat.items():
        xs.sort()
        if not xs:
            per_class[cls] = {"n": 0, "failed": fails[cls]}
            continue
        p50 = xs[len(xs) // 2]
        p95 = xs[min(len(xs) - 1, int(0.95 * len(xs)))]
        per_class[cls] = {
            "n": len(xs),
            "failed": fails[cls],
            "p50_s": round(p50, 3),
            "p95_s": round(p95, 3),
            "p95_over_p50": round(p95 / p50, 3),
        }
    mixed = {
        "clients": {c: n for c, (n, _) in classes.items()},
        "waves": waves,
        "steps": steps,
        "sizes": {"txt512": size, "txt768": hi},
        "max_batch_pixels": max_px,
        "max_wait_ms": max_wait_ms,
        "sustained_req_per_s": round(n_req / total, 4),
        "per_class": per_class,
        "batches_formed": batcher.stats["batches"],
        "batch_efficiency": round(
            batcher.stats["batched_requests"] / batcher.stats["batches"], 3),
        "retries": batcher.stats["retries"],
        "pad_to_bucket": True,
        "closed_loop": True,
        "tiny": bool(tiny),
    }
    print(json.dumps({"mixed": mixed}))
    if not tiny:
        out = os.path.join(os.path.dirname(__file__), "SERVE_LOAD.json")
        rec = {}
        if os.path.exists(out):
            with open(out) as f:
                rec = json.load(f)
        rec["mixed"] = mixed
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--n", type=int, default=6, help="concurrent requests")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--img2img", action="store_true",
                    help="also measure an img2img wave (these requests "
                    "batched serially through plain generate before the "
                    "per-sample-row scan landed)")
    ap.add_argument("--max-wait-ms", type=float, default=200.0,
                    help="batcher linger in --mixed; should scale with the "
                    "cycle time (~13 s under the default mix) so a client "
                    "re-submitting right after its class's batch resolves "
                    "can still catch the forming group")
    ap.add_argument("--waves", type=int, default=3,
                    help="closed-loop submissions per client in --mixed "
                    "(more waves = steadier per-class tail statistics)")
    ap.add_argument("--mixed", action="store_true",
                    help="heterogeneous closed-loop scenario (VERDICT r4 "
                    "item 6): 4 clients at 512² + 4 at 768² + 1 inpaint + "
                    "1 prompt-editing singleton; records per-class p50/p95 "
                    "into SERVE_LOAD.json's 'mixed' key and skips the "
                    "homogeneous phases")
    args = ap.parse_args()

    import jax

    if args.tiny:
        # CPU smoke must stay off the tunneled TPU (fresh programs cost
        # minutes there; the sitecustomize force-selects it otherwise)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    from pww_tpu import PwwPipeline
    from pww_tpu.config import SDModelConfig
    from pww_tpu.serving.batcher import Batcher

    if args.tiny:
        pipe = PwwPipeline(config=SDModelConfig.tiny())
        size, steps = 64, 2
    else:
        # reuse bench's pipeline builder: host-synthesized random-init
        # params (numpy, no XLA init programs) + synthetic BPE tokenizer
        import bench as B

        class _Args:
            tiny = False
            scheduler = "lms"

        pipe = B._make_pipeline(SDModelConfig.sd15(), _Args)
        size, steps = 512, args.steps

    def req(i, rsize=None):
        rsize = size if rsize is None else rsize
        cm = np.zeros((rsize, rsize, 3), np.uint8)
        cm[:, : rsize // 2] = (255, 0, 0)
        return {
            "prompt": f"a cat number {i}",
            "color_map_image": cm,
            "color_context": {(255, 0, 0): "cat,1.0"},
            "seed": i,
            "num_inference_steps": steps,
        }

    if args.mixed:
        _run_mixed(pipe, req, size, steps, tiny=args.tiny,
                   waves=args.waves, max_wait_ms=args.max_wait_ms)
        return

    # warm the compiled programs at batch sizes 1 and n
    pipe.generate_batch([req(0)], num_inference_steps=steps)
    pipe.generate_batch([req(i) for i in range(args.n)], num_inference_steps=steps)

    t0 = time.time()
    for i in range(args.n):
        pipe.generate_batch([req(i)], num_inference_steps=steps)
    serial = time.time() - t0

    batcher = Batcher(pipe, max_batch=args.n, max_wait_ms=200.0)
    try:
        t0 = time.time()
        futs = [batcher.submit(req(i)) for i in range(args.n)]
        for f in futs:
            f.result(timeout=600)
        batched = time.time() - t0
    finally:
        batcher.close()

    print(f"requests: {args.n}  serial: {serial:.2f}s  "
          f"batched: {batched:.2f}s  speedup: {serial / batched:.2f}x  "
          f"(batches formed: {batcher.stats['batches']})")

    # sustained phase: n CLOSED-LOOP clients, 3 sequential requests each —
    # the standard serving-latency methodology. (The round-3 harness burst
    # all 3n requests at once, so its p95/p50 = 1.5 measured backlog-drain
    # makespan — wave k of a saturated queue finishing at k cycles — not
    # serving quality. A closed-loop client submits its next request only
    # after its previous one resolves, so per-request latency isolates
    # queueing the batcher can actually control; with backpressured group
    # formation all n clients coalesce into one full batch per cycle.)
    import threading

    waves = 3
    batcher = Batcher(pipe, max_batch=args.n, max_wait_ms=200.0)
    lat = []
    lat_lock = threading.Lock()

    def client(cid):
        for w in range(waves):
            ts = time.time()
            batcher.submit(req(cid + w * args.n)).result(timeout=1200)
            with lat_lock:
                lat.append(time.time() - ts)

    try:
        t0 = time.time()
        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(args.n)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        sustained = time.time() - t0
    finally:
        batcher.close()
    lat.sort()
    record = {
        "n_concurrent": args.n,
        "steps": steps,
        "serial_s": round(serial, 3),
        "batched_s": round(batched, 3),
        "batched_speedup": round(serial / batched, 3),
        "sustained_requests": waves * args.n,
        "sustained_req_per_s": round(waves * args.n / sustained, 4),
        "latency_p50_s": round(lat[len(lat) // 2], 3),
        "latency_p95_s": round(lat[min(len(lat) - 1, int(0.95 * len(lat)))], 3),
        "closed_loop": True,
        "batches_formed": batcher.stats["batches"],
        "tiny": bool(args.tiny),
    }
    if args.img2img:
        # img2img wave: per-request init latents/noise ride per-sample rows
        # of the same compiled scan (previously: singleton generate calls)
        rng = np.random.default_rng(0)
        init = (rng.random((size, size, 3)) * 255).astype(np.uint8)

        def i2i_req(i):
            r = req(i)
            r.update(init_image=init, strength=0.6)
            return r

        pipe.generate_batch([i2i_req(0)], num_inference_steps=steps,
                            strength=0.6)
        pipe.generate_batch([i2i_req(i) for i in range(args.n)],
                            num_inference_steps=steps, strength=0.6)
        t0 = time.time()
        for i in range(args.n):
            pipe.generate_batch([i2i_req(i)], num_inference_steps=steps,
                                strength=0.6)
        i2i_serial = time.time() - t0
        batcher = Batcher(pipe, max_batch=args.n, max_wait_ms=200.0)
        try:
            t0 = time.time()
            futs = [batcher.submit(i2i_req(i)) for i in range(args.n)]
            for f in futs:
                f.result(timeout=1200)
            i2i_batched = time.time() - t0
            i2i_batches = batcher.stats["batches"]
        finally:
            batcher.close()
        record.update({
            "img2img_serial_s": round(i2i_serial, 3),
            "img2img_batched_s": round(i2i_batched, 3),
            "img2img_speedup": round(i2i_serial / i2i_batched, 3),
            "img2img_batches": i2i_batches,
        })

    import json

    print(json.dumps(record))
    if not args.tiny:
        out = os.path.join(os.path.dirname(__file__), "SERVE_LOAD.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
