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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--n", type=int, default=6, help="concurrent requests")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--img2img", action="store_true",
                    help="also measure an img2img wave (these requests "
                    "batched serially through plain generate before the "
                    "per-sample-row scan landed)")
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

    def req(i):
        cm = np.zeros((size, size, 3), np.uint8)
        cm[:, : size // 2] = (255, 0, 0)
        return {
            "prompt": f"a cat number {i}",
            "color_map_image": cm,
            "color_context": {(255, 0, 0): "cat,1.0"},
            "seed": i,
            "num_inference_steps": steps,
        }

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
