"""Stdlib HTTP inference server with request micro-batching.

POST /generate  {"prompt": ..., "color_context": {"#ff0000": "cat,1.0"},
                 "color_map_png_b64": ..., "seed": 0, "steps": 30,
                 "guidance_scale": 7.5,
                 "weight_function": {"scale": 0.4, "sigma_mode":
                     "log1p_sigma", "reduce_mode": "max"},   # optional
                 "cache_interval": 1,   # >1 = DeepCache approximation
                 "tome_ratio": 0.0,     # >0 = ToMe approximation
                 "init_image_png_b64": ...,    # optional: img2img
                 "strength": 0.5,
                 "mask_image_png_b64": ...,    # optional: inpaint (with init)
                 "mask_blur": 0.0, "masked_content": "original"}
  → {"image_png_b64": ..., "latency_s": ...}
GET  /healthz   → {"ok": true, "stats": {...}}
GET  /metrics   → counters + p50/p95 request latency + batch efficiency

Run: ``python -m pww_tpu.serving.server --model /path/to/sd15 --port 8000``.
Compiled programs are shared across requests (the reference's Gradio path
reloads all models per request, `gradio_pww.py:31-45`); concurrent requests
with compatible shapes are fused by :mod:`pww_tpu.serving.batcher`.
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .batcher import Batcher


def _decode_image(b64: str) -> np.ndarray:
    from PIL import Image

    raw = base64.b64decode(b64)
    return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))


def _encode_image(img) -> str:
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _parse_context(ctx: dict) -> dict:
    out = {}
    for k, v in ctx.items():
        if isinstance(k, str) and not k.startswith("#"):
            k = tuple(int(x) for x in k.strip("()").split(","))
        out[k] = v
    return out


def make_handler(batcher: Batcher):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, "stats": batcher.stats})
            elif self.path == "/metrics":
                self._send(200, batcher.metrics())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                color_map = None
                if req.get("color_map_png_b64"):
                    color_map = _decode_image(req["color_map_png_b64"])
                    from PIL import Image

                    from ..utils.buckets import snap_resolution

                    h, w = color_map.shape[:2]
                    bw, bh = snap_resolution(w, h)
                    if (bh, bw) != (h, w):  # bucket to bound recompiles
                        color_map = np.asarray(
                            Image.fromarray(color_map).resize(
                                (bw, bh), Image.NEAREST
                            )
                        )
                init_image = mask_image = None
                if req.get("init_image_png_b64"):
                    from PIL import Image

                    from ..utils.buckets import snap_resolution

                    init_image = _decode_image(req["init_image_png_b64"])
                    # Snap the init to the bucket lattice like the color
                    # map: the %32-floored init dims set the compiled
                    # program's shape, so arbitrary upload sizes would
                    # compile a fresh denoise program each (1-6 min on the
                    # tunneled chip — a trivial serving stall/DoS).
                    ih, iw = init_image.shape[:2]
                    if ih % 64 or iw % 64:  # already lattice-aligned sizes
                        bw, bh = snap_resolution(iw, ih)  # pass unresized
                        init_image = np.asarray(
                            Image.fromarray(init_image).resize(
                                (bw, bh), Image.BILINEAR
                            )
                        )
                if req.get("mask_image_png_b64"):
                    from PIL import Image

                    raw = base64.b64decode(req["mask_image_png_b64"])
                    mask_image = (
                        np.asarray(
                            Image.open(io.BytesIO(raw)).convert("L"),
                            np.float32,
                        ) / 255.0
                    )
                    if init_image is not None and mask_image.shape[:2] != \
                            init_image.shape[:2]:
                        # keep the mask aligned with the snapped init
                        ih, iw = init_image.shape[:2]
                        mask_image = np.asarray(
                            Image.fromarray(
                                (mask_image * 255).astype(np.uint8)
                            ).resize((iw, ih), Image.NEAREST),
                            np.float32,
                        ) / 255.0
                wf = None
                if req.get("weight_function"):
                    from ..ops.weight_functions import WeightFunction

                    wf = WeightFunction(**req["weight_function"])
                t0 = time.time()
                fut = batcher.submit(
                    {
                        "prompt": req.get("prompt", ""),
                        "negative_prompt": req.get("negative_prompt", ""),
                        "color_context": _parse_context(req.get("color_context", {})),
                        "color_map_image": color_map,
                        "seed": int(req.get("seed", 0)),
                        "num_inference_steps": int(req.get("steps", 30)),
                        "guidance_scale": float(req.get("guidance_scale", 7.5)),
                        "weight_function": wf,
                        "cache_interval": int(req.get("cache_interval", 1)),
                        "tome_ratio": float(req.get("tome_ratio", 0.0)),
                        "prompt_weighting": bool(
                            req.get("prompt_weighting", False)
                        ),
                        "clip_skip": int(req.get("clip_skip", 0)),
                        "long_prompts": bool(req.get("long_prompts", False)),
                        "prompt_editing": bool(
                            req.get("prompt_editing", False)
                        ),
                        "sag_scale": float(req.get("sag_scale", 0.0)),
                        "freeu": (
                            True if req.get("freeu") is True
                            else tuple(req["freeu"]) if req.get("freeu")
                            else None
                        ),
                        "init_image": init_image,
                        "mask_image": mask_image,
                        "strength": float(req.get("strength", 0.5)),
                        "mask_blur": float(req.get("mask_blur", 0.0)),
                        "masked_content": str(
                            req.get("masked_content", "original")
                        ),
                    }
                )
                img = fut.result(timeout=600)
                latency = time.time() - t0
                batcher.observe_latency(latency)
                self._send(
                    200,
                    {
                        "image_png_b64": _encode_image(img),
                        "latency_s": round(latency, 3),
                    },
                )
            except Exception as e:  # noqa: BLE001 - surface to client
                self._send(500, {"error": repr(e)})

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=25.0)
    ap.add_argument("--tiny", action="store_true", help="random tiny config")
    args = ap.parse_args()

    from ..config import SDModelConfig
    from ..pipeline.pipeline import PwwPipeline

    if args.model:
        pipe = PwwPipeline.from_pretrained(args.model)
    elif args.tiny:
        pipe = PwwPipeline(config=SDModelConfig.tiny())
    else:
        pipe = PwwPipeline()

    batcher = Batcher(pipe, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(batcher))
    print(f"serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
