"""Request micro-batching for production serving.

The reference's serving path is a serial host loop that reloads every model
per request (reference `gradio_pww.py:31-45`). Here requests are coalesced:
a worker thread drains the queue, groups requests by compatibility key
(resolution, steps, guidance, scheduler, weight-function), and issues ONE
batched ``generate_batch`` per group — so concurrent users share a single
compiled denoise program and the chip runs at batch efficiency.
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np


@dataclass
class _Pending:
    request: Dict
    key: Tuple
    future: Future = field(default_factory=Future)
    # fetch-failure requeues consumed (each request gets ONE: transient
    # device-memory exhaustion under overlapped launches is retryable,
    # a second failure on an idle device is real)
    retries: int = 0


def _is_singleton(req: Dict) -> bool:
    """Requests that can't ride ``generate_batch``: per-step conditioning
    switches (switch points differ per request), inpaint-only-masked
    (per-request crop region → per-request paste-back resolution), and
    ControlNet / IP-Adapter conditioning (generate_batch has no hint /
    per-request reference-image support — silently dropping them would
    return a different image than the same request served alone). Plain
    img2img/inpaint requests DO batch — init latents, noise, and blend state
    are per-sample rows of the batched scan."""
    return bool(
        req.get("prompt_editing")
        or req.get("inpaint_full_res")
        or req.get("control_image") is not None
        or req.get("ip_adapter_image") is not None
        or req.get("adapter_image") is not None  # T2I-Adapter hint
        or int(req.get("num_samples", 1)) != 1
        or req.get("denoising_end") is not None
        or req.get("denoising_start") is not None
        # SDXL micro-conditioning overrides are generate-only kwargs
        or req.get("original_size") is not None
        or req.get("target_size") is not None
    )


def _image_shape_hw(img) -> Tuple[int, int]:
    arr = np.asarray(img)
    return int(arr.shape[0]), int(arr.shape[1])


def compat_key(req: Dict, tokenizer=None) -> Tuple:
    if _is_singleton(req):
        # Force a singleton group (the fresh object() never compares equal),
        # served by a plain `generate` call in the worker.
        return ("singleton", object())
    cm = req.get("color_map_image")
    init = req.get("init_image")
    # The color-map grid sets the PwW weight-pyramid spatial keys; requests
    # with different grids (or map vs no map) cannot share one
    # generate_batch call even when the processing resolution agrees
    # (pipeline enforces equal pyramid keys), so the grid is part of the key.
    map_grid = None if cm is None else _image_shape_hw(cm)
    if init is not None:
        # img2img: the %32-floored init image sets the PROCESSING
        # resolution (generate_batch's dims rule, matching generate's
        # _preprocess_image) even when a color map is present — the map
        # only drives the bias via the ORIG resize fallback.
        ih, iw = _image_shape_hw(init)
        shape = (ih - ih % 32, iw - iw % 32)
    elif cm is not None:
        shape = map_grid
    else:
        shape = (512, 512)
    # img2img/inpaint mode and strength are compile-relevant: t_start is a
    # static argument of the denoise program and extra channels / blend state
    # change its signature — only same-mode requests can share a batch.
    i2i = init is not None
    mode = (
        i2i,
        req.get("mask_image") is not None,
        float(req.get("strength", 0.5)) if i2i else None,
        # noise_mode is a batch-level generate_batch kwarg (host-side RNG
        # choice): the worker forwards group[0]'s, so it must group
        str(req.get("noise_mode", "jax")),
    )
    long_p = bool(req.get("long_prompts", False))
    # Windowed long-prompt encoding makes the text length a function of each
    # prompt's token count (encode.py:_window_ids); two long-prompt requests
    # with different window counts cannot share a generate_batch call
    # (pipeline enforces equal text length), so the window count is part of
    # the key whenever a tokenizer is available to compute it.
    n_win = 0
    if long_p and tokenizer is not None:
        from ..conditioning.encode import _window_ids

        max_len = tokenizer.model_max_length
        n_win = max(
            len(_window_ids(tokenizer, req.get("prompt", ""), max_len)),
            len(_window_ids(tokenizer, req.get("negative_prompt", ""), max_len)),
        )
    return (
        shape,
        map_grid,
        int(req.get("num_inference_steps", 30)),
        float(req.get("guidance_scale", 7.5)),
        repr(req.get("weight_function")),
        int(req.get("cache_interval", 1)),
        float(req.get("tome_ratio", 0.0)),
        repr(req.get("freeu")),
        (long_p, n_win),
        float(req.get("sag_scale", 0.0)),
        mode,
    )


class Batcher:
    """Coalesces requests into ``pipeline.generate_batch`` calls.

    Args:
      pipeline: a :class:`~pww_tpu.pipeline.pipeline.PwwPipeline`.
      max_batch: max requests fused into one device call.
      max_wait_ms: linger time — how long the first request in a group waits
        for company before the batch launches.
    """

    def __init__(self, pipeline, max_batch: int = 8, max_wait_ms: float = 25.0,
                 pad_to_bucket: bool = False,
                 max_batch_pixels: "int | None" = None):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        # Memory-aware row cap: bound a group's OUTPUT pixels (rows · h · w)
        # so high-resolution buckets form smaller batches. Device-memory
        # peak scales with rows × resolution; one max_batch knob can't fit
        # both 512² and 768² buckets — the first real mixed-load run OOM'd
        # 14 times from 768²-b4 launches overlapping other programs. None =
        # off (homogeneous loads size max_batch for their single shape).
        self.max_batch_pixels = (
            None if max_batch_pixels is None else int(max_batch_pixels)
        )
        # Bucketed batch sizes: pad each batched group to the next power of
        # two (capped at max_batch) with clones of its first request, then
        # drop the padded rows. Each distinct batch size is a separate XLA
        # program; under heterogeneous load, groups split unpredictably
        # (3+1, 2+2, ...) and every novel size pays a full compile — minutes
        # on a tunneled chip. Padding bounds the program set to
        # {1, 2, 4, ..., max_batch} at the cost of ≤2x compute on the padded
        # rows (worst case: group of 2^k + 1). Off by default: steady
        # homogeneous load always forms full batches and padding would only
        # waste FLOPs.
        self.pad_to_bucket = bool(pad_to_bucket)
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        # XLA compiles run ON this thread (first request of each program
        # shape); LLVM's recursive passes can overflow the default 8 MB
        # thread stack on deep UNet programs — give the worker real headroom.
        prev = threading.stack_size(64 * 1024 * 1024)
        try:
            self._worker = threading.Thread(target=self._run, daemon=True)
        finally:
            threading.stack_size(prev)
        self._worker.start()
        # single fetch thread: converts launched device batches to PIL and
        # resolves futures in batch order, off the launch thread
        self._fetcher = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="pww-fetch"
        )
        # launched batches whose COMPUTE is not yet confirmed finished:
        # while > 0 the device is busy and group formation keeps draining
        # (see _drain_group). Decremented by the fetcher thread right after
        # its 1-pixel compute barrier — NOT after the full image transfer —
        # so a pending D2H fetch never blocks the next dispatch (fetching a
        # finished result alongside a running program is free on the
        # tunnel, docs/BENCHMARKING.md §6).
        self._computing = 0
        self._computing_lock = threading.Lock()
        # most recently launched device batch (worker thread only): the
        # worker syncs on its COMPUTE before dispatching the next batch —
        # remote/tunneled backends penalize a dispatch queued behind a
        # running program far more than the wait costs (measured +0.35 s to
        # ~19 s/call, docs/BENCHMARKING.md §6); on local TPU this is a ~ms
        # no-op. The full image transfer still overlaps on the fetcher.
        self._last_launch = None
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                      "retries": 0}
        self._latencies = deque(maxlen=1024)  # seconds, per finished request

    def observe_latency(self, seconds: float) -> None:
        """Record one finished request's wall latency (handler-side)."""
        self._latencies.append(float(seconds))

    def metrics(self) -> Dict:
        """Counters + latency percentiles over the last 1024 requests."""
        # snapshot first: handler threads append concurrently, and sorting
        # the live deque raises "deque mutated during iteration" under load
        lat = sorted(self._latencies.copy())
        out = dict(self.stats)
        out["batch_efficiency"] = (
            self.stats["batched_requests"] / self.stats["batches"]
            if self.stats["batches"] else None
        )
        for name, q in (("latency_p50_s", 0.50), ("latency_p95_s", 0.95)):
            out[name] = (
                round(lat[min(len(lat) - 1, int(q * len(lat)))], 4)
                if lat else None
            )
        out["latency_samples"] = len(lat)
        return out

    def submit(self, request: Dict) -> Future:
        """Enqueue a request dict (generate_batch schema); returns a Future
        resolving to a PIL image."""
        p = _Pending(
            request=request,
            key=compat_key(request, getattr(self.pipeline, "tokenizer", None)),
        )
        self.stats["requests"] += 1
        self._q.put(p)
        return p.future

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)
        self._fetcher.shutdown(wait=True)

    # -- worker --------------------------------------------------------------
    def _cap_for(self, key) -> int:
        """Row cap for one batched group: max_batch, tightened by the
        max_batch_pixels budget at the group's resolution (key[0] is the
        processing (h, w) for every non-singleton key)."""
        if self.max_batch_pixels is None or not key or key[0] == "singleton":
            return self.max_batch
        h, w = key[0]
        return max(1, min(self.max_batch, self.max_batch_pixels // (h * w)))

    def _drain_group(self, first: _Pending) -> List[_Pending]:
        if first.key and first.key[0] == "singleton":
            # Singleton by construction (compat_key embeds a fresh object()):
            # waiting out max_wait could never find a batchmate, and pulling
            # the queue here would only re-order other requests behind it.
            return [first]
        group = [first]
        cap = self._cap_for(first.key)
        deadline = time.monotonic() + self.max_wait
        leftovers: List[_Pending] = []
        while len(group) < cap and not self._stop.is_set():
            # Backpressure (round-4 tail fix): while a launched batch is
            # still COMPUTING, committing the next group early cannot
            # start it any sooner — the device executes in submission order
            # — but it DOES lock out every request arriving during the
            # in-flight batch, costing them a whole extra cycle. So keep
            # draining while the device is busy (bounded by the in-flight
            # batch's compute duration) and only let the linger deadline
            # close the group once the device is idle. The busy window ends
            # at compute completion, not fetch completion: the next dispatch
            # may (and should) overlap the previous batch's D2H transfer.
            # A full group still launches immediately: at saturation the
            # host prologue then overlaps device compute.
            busy = self._computing > 0
            now = time.monotonic()
            if not busy and now >= deadline:
                break
            timeout = 0.005 if busy else (deadline - now)
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                continue  # re-check inflight / deadline
            if nxt.key == first.key:
                group.append(nxt)
            else:
                leftovers.append(nxt)
        for lo in leftovers:  # push back foreign-key requests
            self._q.put(lo)
        return group

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            group = self._drain_group(first)
            self.stats["batches"] += 1
            self.stats["batched_requests"] += len(group)
            try:
                if group[0].key and group[0].key[0] == "singleton":
                    # singleton group (see compat_key): runs through plain
                    # generate. Fused-path singletons (ControlNet /
                    # IP-Adapter / T2I-Adapter / num_samples / SDXL
                    # overrides) still use output_type="device" so their
                    # D2H overlaps the next group's compute like batched
                    # groups; generate itself rejects device output on
                    # paths needing host post-processing (prompt editing,
                    # inpaint-only-masked) and those fall back to a
                    # synchronous fetch here.
                    p = group[0]
                    try:
                        self._sync_prev_compute()
                        images_dev = self.pipeline.generate(
                            **p.request, output_type="device"
                        )
                    except ValueError as e:
                        if 'output_type="device"' not in str(e):
                            raise
                        img = self.pipeline.generate(
                            **p.request, output_type="np"
                        )
                        from PIL import Image

                        p.future.set_result(
                            Image.fromarray(np.asarray(img)[0])
                        )
                        continue
                    except Exception:
                        # Transient device-memory exhaustion comes from
                        # overlapped launches (each program shape warms fine
                        # alone): drain ALL in-flight work, retry once on
                        # the idle device, synchronously.
                        self._full_sync()
                        self.stats["retries"] += 1
                        img = self.pipeline.generate(
                            **p.request, output_type="np"
                        )
                        from PIL import Image

                        p.future.set_result(
                            Image.fromarray(np.asarray(img)[0])
                        )
                        continue
                    self._hand_to_fetcher(group, images_dev)
                    continue
                # batch-level kwargs (uniform across the group — enforced
                # by compat_key)
                g0 = group[0].request
                common = dict(
                    num_inference_steps=g0.get("num_inference_steps", 30),
                    guidance_scale=g0.get("guidance_scale", 7.5),
                    weight_function=g0.get("weight_function"),
                    cache_interval=g0.get("cache_interval", 1),
                    tome_ratio=g0.get("tome_ratio", 0.0),
                    freeu=g0.get("freeu"),
                    sag_scale=g0.get("sag_scale", 0.0),
                    strength=g0.get("strength", 0.5),
                    noise_mode=g0.get("noise_mode", "jax"),
                )
                reqs = [p.request for p in group]
                cap = self._cap_for(group[0].key)
                if self.pad_to_bucket and len(reqs) < cap:
                    target = 1
                    while target < len(reqs):
                        target *= 2
                    # a non-power-of-two cap (max_batch or the pixel-budget
                    # cap at this resolution) is itself a bucket
                    target = min(target, cap)
                    # clones share group[0]'s compat key by construction, so
                    # they cannot change the program beyond the batch dim;
                    # _resolve zips futures with rows and drops the padding
                    reqs = reqs + [dict(reqs[0])] * (target - len(reqs))
                try:
                    # output_type="device": the un-fetched uint8 array lets
                    # this thread run the NEXT group's host prologue while
                    # the fetcher thread pays this group's D2H transfer.
                    # _sync_prev_compute first: the dispatch itself must not
                    # queue behind a still-running program (tunnel penalty,
                    # docs/BENCHMARKING.md §6).
                    self._sync_prev_compute()
                    images_dev = self.pipeline.generate_batch(
                        reqs, output_type="device", **common,
                    )
                except Exception:
                    from PIL import Image

                    # First assume transient device-memory exhaustion from
                    # overlapped launches (each program shape warms fine
                    # alone; the first real mixed-load run recorded 14
                    # RESOURCE_EXHAUSTED, all mid-overlap): drain ALL
                    # in-flight work, then retry the identical padded batch
                    # once, synchronously, on the idle device.
                    self._full_sync()
                    self.stats["retries"] += 1
                    try:
                        arr = np.asarray(self.pipeline.generate_batch(
                            reqs, output_type="np", **common,
                        ))
                        for p, im in zip(group, arr):
                            p.future.set_result(Image.fromarray(im))
                        continue
                    except Exception:
                        if len(group) == 1:
                            raise
                    # Still failing on an idle device: one request's
                    # validation error must not fail its co-batched
                    # neighbors with a 500 — retry each request alone so
                    # only the offender errors (the per-request programs
                    # are the already-compiled batch-1 shapes).
                    for p in group:
                        try:
                            img = self.pipeline.generate_batch(
                                [p.request], output_type="np", **common,
                            )
                            p.future.set_result(
                                Image.fromarray(np.asarray(img)[0])
                            )
                        except Exception as pe:
                            if not p.future.done():
                                p.future.set_exception(pe)
                    continue
                self._hand_to_fetcher(group, images_dev)
            except Exception as e:  # propagate to every waiter
                for p in group:
                    if not p.future.done():
                        p.future.set_exception(e)

    def _sync_prev_compute(self) -> None:
        """Wait for the previously launched batch's COMPUTE (not its
        transfer) via a 1-pixel slice fetch, so the next dispatch never
        queues behind a running program (worker thread only)."""
        dev = self._last_launch
        self._last_launch = None
        if dev is None:
            return
        try:
            np.asarray(dev[:1, :1, :1])
        except Exception:
            pass  # the fetcher's full fetch surfaces any real error

    def _full_sync(self, timeout_s: float = 600.0) -> None:
        """Drain ALL in-flight device work (worker thread only): sync the
        last launch's compute, then wait for the fetcher to confirm every
        outstanding batch. Used before an OOM retry so it runs against an
        otherwise-idle device — transient exhaustion comes from overlapped
        programs' peaks, not from any single program."""
        self._sync_prev_compute()
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self._computing_lock:
                if self._computing == 0:
                    return
            time.sleep(0.01)

    def _hand_to_fetcher(self, group: List[_Pending], images_dev) -> None:
        """Queue a launched device batch for fetching; tracks it as
        computing so group formation applies backpressure until its
        compute (not its transfer) is confirmed done."""
        self._last_launch = images_dev
        with self._computing_lock:
            self._computing += 1
        try:
            self._fetcher.submit(self._resolve_tracked, group, images_dev)
        except RuntimeError:
            # close() shut the executor down while this batch was still on
            # device (joins time out at 5 s; a compile can take minutes) —
            # resolve inline so in-flight requests complete instead of
            # erroring.
            self._resolve_tracked(group, images_dev)

    def _resolve_tracked(self, group: List[_Pending], images_dev) -> None:
        # Compute barrier first (1-pixel slice, ~ms once the program
        # finishes): releasing backpressure here instead of after the full
        # image transfer lets the worker close and dispatch the next group
        # while this batch's D2H is still in flight. The fetcher is a
        # single thread processing launches in order, so the counter pairs
        # exactly with each launch.
        try:
            try:
                np.asarray(images_dev[:1, :1, :1])
            except Exception:
                pass  # _resolve's full fetch surfaces any real error
        finally:
            with self._computing_lock:
                self._computing -= 1
        self._resolve(group, images_dev)

    def _resolve(self, group: List[_Pending], images_dev) -> None:
        """Fetch one launched batch and resolve its futures (runs on the
        single fetcher thread, preserving batch order)."""
        from PIL import Image

        try:
            arr = np.asarray(images_dev)
        except Exception as e:
            # The fetch is where a launched program's failure surfaces
            # (execution is async until materialization) — under mixed
            # load that's typically transient memory exhaustion from
            # overlapped launches. Requeue each request ONCE; it re-enters
            # group formation and relaunches through already-compiled
            # bucket programs. A request that already consumed its requeue
            # fails for real.
            requeued = False
            for p in group:
                if p.future.done():
                    continue
                if p.retries == 0:
                    p.retries = 1
                    self._q.put(p)
                    requeued = True
                else:
                    p.future.set_exception(e)
            if requeued:
                self.stats["retries"] += 1
            return
        try:
            for p, im in zip(group, arr):
                p.future.set_result(Image.fromarray(im))
        except Exception as e:
            for p in group:
                if not p.future.done():
                    p.future.set_exception(e)
