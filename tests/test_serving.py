"""Serving batcher + multi-prompt batch generation tests."""
import threading
import time

import numpy as np
import pytest

from pww_tpu import PwwPipeline
from pww_tpu.config import SDModelConfig
from pww_tpu.serving.batcher import Batcher, compat_key


@pytest.fixture(scope="module")
def pipe():
    return PwwPipeline(config=SDModelConfig.tiny())


def _req(prompt, seed, size=64):
    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    return {
        "prompt": prompt,
        "color_map_image": cm,
        "color_context": {(255, 0, 0): f"{prompt.split()[-1]},1.0"},
        "seed": seed,
        "num_inference_steps": 2,
    }


def test_generate_batch_multi_prompt(pipe):
    out = pipe.generate_batch(
        [_req("a cat", 0), _req("a dog", 1), _req("a boat", 2)],
        num_inference_steps=2, output_type="np",
    )
    assert out.shape == (3, 64, 64, 3)
    # different prompts/seeds → different images
    assert np.abs(out[0].astype(int) - out[1].astype(int)).mean() > 0


def test_generate_batch_matches_single(pipe):
    """Batching must not change a request's output vs running it alone."""
    single = pipe.generate_batch([_req("a cat", 7)], num_inference_steps=2,
                                 output_type="np")[0]
    batched = pipe.generate_batch(
        [_req("a dog", 3), _req("a cat", 7)], num_inference_steps=2,
        output_type="np",
    )[1]
    np.testing.assert_array_equal(single, batched)


def test_generate_batch_rejects_mixed_resolution(pipe):
    with pytest.raises(ValueError, match="resolution"):
        pipe.generate_batch([_req("a", 0, 64), _req("b", 1, 128)],
                            num_inference_steps=2)


def test_batcher_fuses_concurrent_requests(pipe):
    b = Batcher(pipe, max_batch=4, max_wait_ms=300.0)
    try:
        futs = [b.submit(_req(p, i)) for i, p in enumerate(["a cat", "a dog", "a fox"])]
        imgs = [f.result(timeout=300) for f in futs]
        assert all(im.size == (64, 64) for im in imgs)
        assert b.stats["requests"] == 3
        assert b.stats["batches"] < 3  # at least some fusion happened
    finally:
        b.close()


def test_batcher_separates_incompatible_keys(pipe):
    assert compat_key(_req("a", 0, 64)) != compat_key(_req("a", 0, 128))
    k1 = compat_key({"num_inference_steps": 2, "color_map_image": None})
    k2 = compat_key({"num_inference_steps": 3, "color_map_image": None})
    assert k1 != k2


def test_batcher_propagates_errors(pipe):
    b = Batcher(pipe, max_batch=2, max_wait_ms=10.0)
    try:
        bad = {"prompt": "x", "color_map_image": "not-an-image",
               "color_context": {}, "seed": 0, "num_inference_steps": 2}
        with pytest.raises(Exception):
            b.submit(bad).result(timeout=60)
    finally:
        b.close()


def test_batcher_honors_weight_function_and_cache_interval(pipe):
    """Structured weight-function specs and DeepCache intervals are part of
    the compatibility key and flow into generate_batch (serving knobs)."""
    from pww_tpu.ops.weight_functions import WeightFunction
    from pww_tpu.serving.batcher import Batcher, compat_key

    r1 = dict(_req("a cat", 0),
              weight_function=WeightFunction(0.4, "log1p_sigma", "max"),
              cache_interval=2)
    r2 = {**r1, "cache_interval": 1}
    assert compat_key(r1) != compat_key(r2)

    b = Batcher(pipe, max_batch=4, max_wait_ms=50)
    try:
        img = b.submit(dict(r1)).result(timeout=600)
        assert img.size == (64, 64)
    finally:
        b.close()


def test_batcher_honors_tome_ratio(pipe):
    """Per-request ToMe ratio keys the batch group and reaches generate_batch.
    (tiny latents sit below tome_min_tokens, so the program is the exact one —
    this validates the serving plumbing, not the merge itself)."""
    r1 = dict(_req("a cat", 0), tome_ratio=0.5)
    r2 = dict(_req("a cat", 0))
    assert compat_key(r1) != compat_key(r2)

    b = Batcher(pipe, max_batch=4, max_wait_ms=50)
    try:
        img = b.submit(dict(r1)).result(timeout=600)
        assert img.size == (64, 64)
    finally:
        b.close()


def test_batcher_honors_round2_knobs(pipe):
    """freeu / sag_scale / long_prompts key the batch group; clip_skip /
    prompt_weighting are per-request encode options that flow through the
    request dict into generate_batch."""
    base = _req("a cat", 0)
    assert compat_key(dict(base, freeu=True)) != compat_key(base)
    assert compat_key(dict(base, sag_scale=0.5)) != compat_key(base)
    assert compat_key(dict(base, long_prompts=True)) != compat_key(base)

    b = Batcher(pipe, max_batch=4, max_wait_ms=50)
    try:
        r = dict(base, freeu=(1.2, 1.3, 0.9, 0.3), sag_scale=0.4,
                 clip_skip=1, long_prompts=True)
        img = b.submit(r).result(timeout=600)
        assert img.size == (64, 64)
        plain = b.submit(dict(base)).result(timeout=600)
        assert not np.array_equal(np.asarray(img), np.asarray(plain))
    finally:
        b.close()


def test_batcher_metrics(pipe):
    """/metrics surface: latency percentiles + batch efficiency counters."""
    b = Batcher(pipe, max_batch=4, max_wait_ms=50)
    try:
        m0 = b.metrics()
        assert m0["latency_p50_s"] is None and m0["latency_samples"] == 0
        img = b.submit(dict(_req("a cat", 0))).result(timeout=600)
        assert img.size == (64, 64)
        b.observe_latency(1.5)
        b.observe_latency(0.5)
        b.observe_latency(0.7)
        m = b.metrics()
        assert m["latency_samples"] == 3
        assert m["latency_p50_s"] == 0.7
        assert m["latency_p95_s"] == 1.5
        assert m["batch_efficiency"] == 1.0
        assert m["requests"] == 1
    finally:
        b.close()


def test_compat_key_long_prompt_window_count(pipe):
    """Windowed long-prompt encoding makes the text length per-prompt:
    requests with different window counts must not share a batch key
    (generate_batch requires equal text length)."""
    tok = pipe.tokenizer
    short = dict(_req("a cat", 0), long_prompts=True)
    longr = dict(_req("word " * 120 + "cat", 1), long_prompts=True)
    assert compat_key(short, tok) != compat_key(longr, tok)
    # equal window counts still fuse
    other = dict(_req("a dog", 2), long_prompts=True)
    assert compat_key(short, tok) == compat_key(other, tok)
    # no tokenizer -> degrades gracefully (long flag still keyed)
    assert compat_key(short) == compat_key(longr)


def test_batcher_mixed_window_counts_both_succeed(pipe):
    """Regression: a 1-window and a 2-window long-prompt request submitted
    concurrently used to be fused into one group and fail as a pair with
    'must share the text length'. Both must now resolve."""
    b = Batcher(pipe, max_batch=4, max_wait_ms=300.0)
    try:
        futs = [
            b.submit(dict(_req("a cat", 0), long_prompts=True)),
            b.submit(dict(_req("word " * 120 + "dog", 1), long_prompts=True)),
        ]
        imgs = [f.result(timeout=600) for f in futs]
        assert all(im.size == (64, 64) for im in imgs)
        assert b.stats["batches"] >= 2  # split into separate device calls
    finally:
        b.close()


def test_batcher_overlapped_fetch_two_groups(pipe):
    """The worker launches group i+1 before group i's images are fetched
    (device-array handoff to the fetcher thread); results still arrive
    correct and per-request."""
    b = Batcher(pipe, max_batch=2, max_wait_ms=50.0)
    try:
        futs = [b.submit(_req(p, i)) for i, p in
                enumerate(["a cat", "a dog", "a fox", "a owl"])]
        imgs = [f.result(timeout=600) for f in futs]
        assert all(im.size == (64, 64) for im in imgs)
        assert b.stats["batches"] >= 2
        # different prompts/seeds -> different images resolved to the right
        # futures (a cross-wired zip would make some identical)
        arrs = [np.asarray(im) for im in imgs]
        assert not np.array_equal(arrs[0], arrs[1])
    finally:
        b.close()


def test_generate_batch_output_type_device(pipe):
    """output_type='device' returns an un-fetched uint8 array equal to the
    fetched 'np' output."""
    reqs = [_req("a cat", 0), _req("a dog", 1)]
    dev = pipe.generate_batch(reqs, num_inference_steps=2,
                              output_type="device")
    arr = np.asarray(dev)
    ref = pipe.generate_batch(reqs, num_inference_steps=2, output_type="np")
    assert arr.dtype == np.uint8
    np.testing.assert_array_equal(arr, np.asarray(ref))


def test_batcher_prompt_editing_singleton(pipe):
    """Editing requests get singleton groups and the segmented generate
    path; plain requests still batch around them."""
    r1 = _req("a [cat:dog:1] photo", 0)
    r1["prompt_editing"] = True
    r2 = _req("a cat", 1)
    assert compat_key(r1) != compat_key(r1)  # never groups, even with itself
    b = Batcher(pipe, max_batch=4, max_wait_ms=50.0)
    try:
        f1 = b.submit(dict(r1))
        f2 = b.submit(r2)
        im1 = f1.result(timeout=600)
        im2 = f2.result(timeout=600)
        assert im1.size == (64, 64) and im2.size == (64, 64)
    finally:
        b.close()


def test_batcher_fused_singleton_overlapped_fetch(pipe):
    """Singleton requests on the fused path (here: num_samples=2) ride the
    device-output + fetcher-thread overlap like batched groups, and resolve
    the same first image generate would return alone."""
    r = _req("a cat on a mat", 11)
    r["num_samples"] = 2
    assert compat_key(r)[0] == "singleton"
    direct = np.asarray(pipe.generate(**r, output_type="np")[0])
    b = Batcher(pipe, max_batch=4, max_wait_ms=25.0)
    try:
        im = b.submit(dict(r)).result(timeout=600)
        np.testing.assert_array_equal(np.asarray(im), direct)
    finally:
        b.close()


def test_drain_group_editing_short_circuits(pipe):
    """An editing singleton can never find a batchmate: _drain_group must
    return immediately without consuming max_wait or pulling (and thus
    re-ordering) other queued requests."""
    from pww_tpu.serving.batcher import _Pending

    b = Batcher.__new__(Batcher)  # no worker thread: unit-test _drain_group
    import queue as _queue

    b._q = _queue.Queue()
    b.max_batch = 4
    b.max_wait = 5.0
    r_edit = _req("a [cat:dog:1] x", 0)
    r_edit["prompt_editing"] = True
    p_edit = _Pending(request=r_edit, key=compat_key(r_edit))
    other = _Pending(request=_req("a cat", 1), key=("x",))
    b._q.put(other)
    t0 = time.monotonic()
    group = b._drain_group(p_edit)
    assert time.monotonic() - t0 < 1.0  # no max_wait sleep
    assert group == [p_edit]
    assert b._q.qsize() == 1  # untouched


def test_batcher_img2img_mode_groups(pipe):
    """img2img / inpaint requests batch through generate_batch (per-request
    init/mask state rides per-sample rows), but the compatibility key splits
    by (mode, strength) so an img2img and an inpaint request land in
    DIFFERENT groups; a batch-1 group compiles the same program shapes as
    plain generate, so its result is bit-identical to a direct call."""
    init = np.full((64, 64, 3), 120, np.uint8)
    r = _req("a cat", 3)
    r.update(init_image=init, strength=0.5)
    assert compat_key(r) == compat_key(dict(r, seed=9))  # same mode groups
    mask = np.zeros((64, 64), np.float32)
    mask[8:32, 8:32] = 1.0
    r_in = _req("a dog", 4)
    r_in.update(init_image=init, mask_image=mask, strength=0.8,
                mask_blur=2.0, masked_content="fill")
    assert compat_key(r) != compat_key(r_in)  # inpaint splits from img2img
    b = Batcher(pipe, max_batch=4, max_wait_ms=50.0)
    try:
        f1 = b.submit(dict(r))
        f2 = b.submit(dict(r_in))
        im1 = f1.result(timeout=600)
        im2 = f2.result(timeout=600)
        assert im1.size == (64, 64) and im2.size == (64, 64)
    finally:
        b.close()
    direct = pipe.generate(**r, output_type="np")
    np.testing.assert_array_equal(np.asarray(im1), np.asarray(direct)[0])


def test_server_handler_inpaint_roundtrip(pipe):
    """The HTTP handler decodes init/mask PNGs and returns an image (run
    through a real socket so header/body framing is exercised)."""
    import base64
    import http.client
    import io
    import json
    import threading as _t
    from http.server import ThreadingHTTPServer

    from PIL import Image

    from pww_tpu.serving.server import make_handler

    b = Batcher(pipe, max_batch=2, max_wait_ms=10.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(b))
    port = srv.server_address[1]
    th = _t.Thread(target=srv.serve_forever, daemon=True)
    th.start()

    def _png(arr, mode="RGB"):
        buf = io.BytesIO()
        Image.fromarray(arr).convert(mode).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    init = np.full((64, 64, 3), 120, np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        body = json.dumps({
            "prompt": "a cat",
            "steps": 2,
            "seed": 0,
            "init_image_png_b64": _png(init),
            "mask_image_png_b64": _png(mask, "L"),
            "strength": 0.8,
            "mask_blur": 1.5,
        })
        conn.request("POST", "/generate", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        assert resp.status == 200, payload
        img = Image.open(io.BytesIO(
            base64.b64decode(payload["image_png_b64"])
        ))
        assert img.size == (64, 64)
    finally:
        srv.shutdown()
        b.close()


def test_singleton_routing_for_generate_only_kwargs():
    """Requests carrying generate-only kwargs (T2I-Adapter hints, multi-
    sample, ensemble splits, SDXL micro-conditioning overrides) must NOT
    ride generate_batch, which would silently drop them."""
    base = {"prompt": "a", "color_map_image": None}
    for extra in (
        {"adapter_image": np.zeros((64, 64, 3), np.uint8)},
        {"num_samples": 2},
        {"denoising_end": 0.8},
        {"denoising_start": 0.8},
        {"original_size": (1024, 1024)},
        {"target_size": (1024, 1024)},
    ):
        r = dict(base, **extra)
        assert compat_key(r) != compat_key(r), extra  # singleton: never groups
    assert compat_key(dict(base)) == compat_key(dict(base))


def test_server_snaps_only_unaligned_init_sizes():
    """Uploaded init images snap to the bucket lattice to bound compiles —
    but a size that is already a multiple of 64 (including tiny test sizes
    below the bucket minimum) passes through unresized."""
    import importlib

    server_mod = importlib.import_module("pww_tpu.serving.server")
    src = open(server_mod.__file__).read()
    assert "ih % 64 or iw % 64" in src  # aligned sizes skip the snap
    from pww_tpu.utils.buckets import snap_resolution

    assert snap_resolution(500, 375) == (512, 384)
    assert snap_resolution(1023, 681) == (1024, 704)


def test_prewarm_text_cache_matches_per_request_encode(pipe):
    """The batched (2K,77) CLIP pre-encode must produce the same text
    states the per-request (2,77) path produces, and seed the cache under
    the exact keys encode_inputs reads (prewarm exists to cut K serial
    device round-trips off the serving cycle; it must not change
    conditioning)."""
    import jax.numpy as jnp

    prompts = ["a red cat", "a blue dog", "a green boat"]
    reqs = [{"prompt": p} for p in prompts]
    pipe._text_cache.clear()
    pipe._encode_cache.clear()
    pipe._prewarm_text_cache(reqs)
    # all pairs cached (deduped), under the standard-path key shape
    for p in prompts:
        assert (p, "", False, 0, False) in pipe._text_cache
    warmed = {p: pipe._text_cache[(p, "", False, 0, False)] for p in prompts}
    # reference: the per-request (2,77) program
    for p in prompts:
        ids = jnp.asarray(
            [pipe.tokenizer("", max_length=77, truncation=True,
                            padding="max_length")["input_ids"],
             pipe.tokenizer(p, max_length=77, truncation=True,
                            padding="max_length")["input_ids"]],
            jnp.int32,
        )
        out = pipe.encode_text(ids)
        states = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(
            np.asarray(warmed[p][0], np.float32),
            np.asarray(states, np.float32),
            rtol=0, atol=1e-5,
        )
    pipe._text_cache.clear()


def test_prewarm_skips_nonstandard_and_single(pipe):
    """Prompt-weighted / long-prompt / clip-skip requests and lone novel
    prompts fall through to the per-request encode (no cache seeding)."""
    pipe._text_cache.clear()
    pipe._prewarm_text_cache([
        {"prompt": "a cat", "prompt_weighting": True},
        {"prompt": "a dog", "long_prompts": True},
        {"prompt": "an owl", "clip_skip": 1},
    ])
    assert not pipe._text_cache
    pipe._prewarm_text_cache([{"prompt": "a lone wolf"}])
    assert not pipe._text_cache  # single pair: (2,77) program already covers


def test_generate_batch_cold_cache_matches_warm(pipe):
    """End-to-end: a cold-cache batch (which exercises the prewarmed
    (2K,77) text encode) must be BIT-IDENTICAL to the same batch run with
    the caches pre-populated by the per-request (2,77) encodes — the
    prewarm is a dispatch-count optimization, not a conditioning change.

    (Comparing against per-request batch-1 runs instead would conflate this
    with batch-size-dependent XLA:CPU partitioning under the suite's
    8-virtual-device backend — batch-3 programs differ from batch-1 in low
    bits there, prewarm or not.)"""
    reqs = [_req("a fox", 11), _req("an owl", 12), _req("a bear", 13)]
    # warm path: per-request (2,77) encodes fill the text cache first
    pipe._text_cache.clear()
    pipe._encode_cache.clear()
    for r in reqs:
        pipe.encode_inputs(r["prompt"], r["color_map_image"],
                           r["color_context"], "", None)
    warm = pipe.generate_batch(reqs, num_inference_steps=2,
                               output_type="np")
    # cold path: prewarm batches the text encode into one (6,77) call
    pipe._text_cache.clear()
    pipe._encode_cache.clear()
    cold = pipe.generate_batch(reqs, num_inference_steps=2,
                               output_type="np")
    np.testing.assert_array_equal(warm, cold)


def test_backpressure_releases_at_compute_not_fetch(pipe):
    """The busy window group formation waits on must end at COMPUTE
    completion (the fetcher's 1-pixel barrier), not at the end of the full
    image transfer — otherwise the next group's dispatch serializes behind
    every D2H fetch and the device idles for the whole transfer."""
    from pww_tpu.serving.batcher import _Pending

    fetch_gate = threading.Event()

    class _Slice:  # the 1-px compute barrier: returns immediately
        def __array__(self, dtype=None, copy=None):
            return np.zeros((1, 1, 1), np.uint8)

    class _FakeDeviceBatch:  # the full fetch: blocked until the gate opens
        def __getitem__(self, idx):
            return _Slice()

        def __array__(self, dtype=None, copy=None):
            assert fetch_gate.wait(timeout=10.0), "test gate never opened"
            return np.zeros((1, 8, 8, 3), np.uint8)

    b = Batcher(pipe, max_batch=2, max_wait_ms=10.0)
    try:
        p = _Pending(request={}, key=("k",))
        b._hand_to_fetcher([p], _FakeDeviceBatch())
        deadline = time.monotonic() + 5.0
        while b._computing > 0 and time.monotonic() < deadline:
            time.sleep(0.002)
        # backpressure released while the transfer is still in flight
        assert b._computing == 0
        assert not p.future.done()
        fetch_gate.set()
        img = p.future.result(timeout=10.0)
        assert img.size == (8, 8)
    finally:
        fetch_gate.set()
        b.close()


def test_batcher_pad_to_bucket(pipe):
    """With pad_to_bucket, a 3-request group runs as a padded batch of 4
    (bounding the compiled-program set to power-of-two sizes), futures map
    to the right rows, and the padding row is dropped. Row correspondence is
    asserted against a direct generate_batch of the same padded 4-row list:
    bit-equality only holds within one program shape (a 4-row and a 1-row
    program may tile reductions differently)."""
    reqs = [_req(p, i) for i, p in enumerate(["a cat", "a dog", "a fox"])]
    b = Batcher(pipe, max_batch=4, max_wait_ms=300.0, pad_to_bucket=True)
    try:
        futs = [b.submit(dict(r)) for r in reqs]
        imgs = [f.result(timeout=600) for f in futs]
    finally:
        b.close()
    assert b.stats["batches"] == 1
    assert b.stats["batched_requests"] == 3  # stats count REAL requests
    direct = pipe.generate_batch(reqs + [dict(reqs[0])],
                                 num_inference_steps=2, output_type="np")
    for img, row in zip(imgs, direct):
        np.testing.assert_array_equal(np.asarray(img), row)


def test_batcher_pad_to_bucket_caps_at_max_batch(pipe):
    """A group of max_batch-1 with a non-power-of-two cap pads to max_batch,
    never past it."""
    b = Batcher(pipe, max_batch=3, max_wait_ms=300.0, pad_to_bucket=True)
    try:
        futs = [b.submit(_req(p, i))
                for i, p in enumerate(["a cat", "a dog", "a fox"])]
        for f in futs:
            f.result(timeout=600)
    finally:
        b.close()
    assert b.stats["batches"] == 1


def test_batcher_max_batch_pixels_caps_group(pipe):
    """A pixel budget of 2·64² caps 64² groups at 2 rows: 4 concurrent
    requests form 2 batches of 2 instead of 1 batch of 4, and every future
    still resolves correctly."""
    b = Batcher(pipe, max_batch=4, max_wait_ms=300.0,
                max_batch_pixels=2 * 64 * 64)
    try:
        assert b._cap_for(((64, 64),)) == 2
        assert b._cap_for(((128, 128),)) == 1  # floor, never 0
        assert b._cap_for(("singleton", object())) == 4  # cap is per-bucket
        futs = [b.submit(_req(p, i)) for i, p in enumerate(
            ["a cat", "a dog", "a fox", "a boat"])]
        imgs = [f.result(timeout=600) for f in futs]
    finally:
        b.close()
    assert b.stats["batches"] == 2
    assert b.stats["batched_requests"] == 4
    assert all(im.size == (64, 64) for im in imgs)


def test_batcher_retries_failed_launch_after_full_sync(pipe):
    """A launch that fails transiently (the mixed-load OOM signature:
    overlapped launches exhaust device memory, the same program succeeds
    on an idle device) is retried whole after draining in-flight work; the
    clients see results, not exceptions."""
    real = pipe.generate_batch
    calls = {"n": 0}

    def flaky(reqs, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return real(reqs, **kw)

    pipe_proxy = type("P", (), {})()
    for name in dir(pipe):
        if not name.startswith("__"):
            setattr(pipe_proxy, name, getattr(pipe, name))
    pipe_proxy.generate_batch = flaky

    b = Batcher(pipe_proxy, max_batch=4, max_wait_ms=300.0)
    try:
        futs = [b.submit(_req(p, i))
                for i, p in enumerate(["a cat", "a dog"])]
        imgs = [f.result(timeout=600) for f in futs]
    finally:
        b.close()
    assert b.stats["retries"] == 1
    assert calls["n"] == 2  # whole-group retry, not per-request fallback
    direct = real([_req("a cat", 0), _req("a dog", 1)],
                  num_inference_steps=2, output_type="np")
    for img, row in zip(imgs, direct):
        np.testing.assert_array_equal(np.asarray(img), row)


def test_batcher_requeues_failed_fetch_once(pipe):
    """A launched batch whose FETCH fails (where async execution errors
    surface) is requeued once: the requests re-enter group formation and
    resolve through a fresh launch. A second fetch failure is real and
    propagates."""

    class FlakyDevice:
        """Mimics an un-fetched device array whose materialization fails
        the first time."""

        def __init__(self, arr):
            self._arr = np.asarray(arr)
            self.failed = False

        def __getitem__(self, idx):  # 1-pixel compute barrier slices
            return self._arr[idx]

        def __array__(self, dtype=None, copy=None):
            if not self.failed:
                self.failed = True
                raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
            return self._arr

    real = pipe.generate_batch
    calls = {"n": 0}

    def wrapped(reqs, **kw):
        calls["n"] += 1
        out = real(reqs, **{**kw, "output_type": "np"})
        if calls["n"] == 1:
            return FlakyDevice(out)
        return out

    pipe_proxy = type("P", (), {})()
    for name in dir(pipe):
        if not name.startswith("__"):
            setattr(pipe_proxy, name, getattr(pipe, name))
    pipe_proxy.generate_batch = wrapped

    b = Batcher(pipe_proxy, max_batch=4, max_wait_ms=300.0)
    try:
        futs = [b.submit(_req(p, i))
                for i, p in enumerate(["a cat", "a dog"])]
        imgs = [f.result(timeout=600) for f in futs]
    finally:
        b.close()
    assert b.stats["retries"] >= 1
    assert calls["n"] == 2
    direct = real([_req("a cat", 0), _req("a dog", 1)],
                  num_inference_steps=2, output_type="np")
    for img, row in zip(imgs, direct):
        np.testing.assert_array_equal(np.asarray(img), row)
