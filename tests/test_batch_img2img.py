"""Batched img2img / inpaint in ``generate_batch`` + batcher routing.

Beyond-reference surface: the reference serves every request serially
(`gradio_pww.py:31-45`). Here img2img and inpaint requests ride the same
batched denoise scan as txt2img — per-request init latents, noise and blend
state are per-sample rows — so a batched request must match the same request
served alone through ``generate`` (which pins the reference's
truncation/noising semantics, `paint_with_words.py:435-460`,
`paint_with_words_inpaint.py:180-198`).

Equality methodology (verified by exhaustive input capture): every tensor
entering the batched denoise program — init latents, noise, blend
mask/init/noise, conditioning, pww weights — is BIT-identical to the single
path's. The scan itself compiles to a different program per batch size, and
bf16 (and, under the suite's 8-virtual-device flag, even f32 at uint8
rounding boundaries) reassociates per program — so the cross-batch-size
tests run the f32 pipeline and allow exactly one uint8 quantum, while a
batch-1 ``generate_batch`` call (same program shapes as ``generate``) must
match bitwise. A semantic bug shows up as tens of quanta (observed 29 when
rows were deliberately mismatched), far outside this gate.
"""
import numpy as np
import pytest

from pww_tpu import PwwPipeline
from pww_tpu.config import SDModelConfig
from pww_tpu.serving.batcher import Batcher, compat_key


@pytest.fixture(scope="module")
def pipe():
    """f32: bitwise-comparable across compiled programs up to uint8
    rounding (same convention as test_pipeline.py's pipe_f32)."""
    import jax.numpy as jnp

    return PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None,
                       compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def pipe9():
    import jax.numpy as jnp

    return PwwPipeline(config=SDModelConfig.tiny(in_channels=9),
                       weights_dtype=None, compute_dtype=jnp.float32)


def _init(seed, size=64):
    rng = np.random.default_rng(seed)
    return (rng.random((size, size, 3)) * 255).astype(np.uint8)


def _mask(size=64):
    m = np.zeros((size, size), np.float32)
    m[16:48, 16:48] = 1.0
    return m


def _cm(size=64):
    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    return cm


def _req(prompt, seed, **extra):
    r = {
        "prompt": prompt,
        "color_map_image": _cm(),
        "color_context": {(255, 0, 0): f"{prompt.split()[-1]},1.0"},
        "seed": seed,
        "init_image": _init(seed),
    }
    r.update(extra)
    return r


def _single(pipe, req, strength, steps=3):
    return np.asarray(
        pipe.generate(
            **req, strength=strength, num_inference_steps=steps,
            output_type="np",
        )
    )[0]


def _assert_quantum_equal(batched_row, single_row):
    """f32 cross-program comparison: the batch-n scan is a different XLA
    program than batch-1, so sums reassociate by ~1 ulp, which can flip a
    uint8 rounding boundary — allow exactly one quantum, nothing more."""
    diff = np.abs(batched_row.astype(int) - single_row.astype(int))
    assert diff.max() <= 1, diff.max()
    assert diff.mean() < 0.05, diff.mean()


def test_batch1_img2img_bitmatches_single(pipe):
    """batch-1 generate_batch compiles the same program shapes as generate:
    the img2img path must be bit-identical end to end."""
    req = _req("a cat", 7)
    batch = np.asarray(
        pipe.generate_batch(
            [req], num_inference_steps=3, strength=0.6, output_type="np"
        )
    )
    single = _single(pipe, req, strength=0.6)
    np.testing.assert_array_equal(batch[0], single)


def test_batched_img2img_matches_single(pipe):
    reqs = [_req("a cat", 7), _req("a dog", 3)]
    batch = np.asarray(
        pipe.generate_batch(
            reqs, num_inference_steps=3, strength=0.6, output_type="np"
        )
    )
    for i, r in enumerate(reqs):
        _assert_quantum_equal(batch[i], _single(pipe, r, strength=0.6))


def test_batched_img2img_no_color_map(pipe):
    """img2img without a color map: the init image sets the resolution."""
    reqs = [
        {"prompt": "a cat", "seed": 1, "init_image": _init(1)},
        {"prompt": "a dog", "seed": 2, "init_image": _init(2)},
    ]
    batch = np.asarray(
        pipe.generate_batch(
            reqs, num_inference_steps=2, strength=0.8, output_type="np"
        )
    )
    assert batch.shape == (2, 64, 64, 3)
    _assert_quantum_equal(batch[1],
                          _single(pipe, reqs[1], strength=0.8, steps=2))


def test_batched_legacy_inpaint_matches_single(pipe):
    """4-ch checkpoints: per-request blend mask/init/noise rows of the scan,
    including per-request mask_blur and masked-content fills."""
    reqs = [
        _req("a cat", 5, mask_image=_mask(), mask_blur=4.0),
        _req("a dog", 9, mask_image=_mask(),
             masked_content="latent_noise"),
    ]
    batch = np.asarray(
        pipe.generate_batch(
            reqs, num_inference_steps=3, strength=0.8, output_type="np"
        )
    )
    for i, r in enumerate(reqs):
        _assert_quantum_equal(batch[i], _single(pipe, r, strength=0.8))


def test_batched_9ch_inpaint_matches_single(pipe9):
    reqs = [
        _req("a cat", 0, mask_image=_mask()),
        _req("a dog", 4, mask_image=_mask(), masked_content="fill"),
    ]
    batch = np.asarray(
        pipe9.generate_batch(
            reqs, num_inference_steps=2, strength=1.0, output_type="np"
        )
    )
    for i, r in enumerate(reqs):
        _assert_quantum_equal(batch[i],
                              _single(pipe9, r, strength=1.0, steps=2))


def test_batched_img2img_non_multiple_of_32(pipe):
    """The 500x500 case scaled down: a 68x68 map + 68x68 init must process
    at the FLOORED init resolution (64x64) exactly like generate — the raw
    map grid only drives the bias via the ORIG resize fallback — not be
    rejected as a resolution mismatch."""
    size = 68
    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    reqs = [
        {"prompt": "a cat", "color_map_image": cm,
         "color_context": {(255, 0, 0): "cat,1.0"}, "seed": 3,
         "init_image": _init(3, size)},
        {"prompt": "a dog", "color_map_image": cm,
         "color_context": {(255, 0, 0): "dog,1.0"}, "seed": 8,
         "init_image": _init(8, size)},
    ]
    batch = np.asarray(
        pipe.generate_batch(
            reqs, num_inference_steps=2, strength=0.6, output_type="np"
        )
    )
    assert batch.shape == (2, 64, 64, 3)
    _assert_quantum_equal(batch[0], _single(pipe, reqs[0], strength=0.6,
                                            steps=2))


def test_batch_rejects_masked_content_for_txt2img(pipe):
    """generate's unconditional caller-error checks apply per request in
    the batch path too — a txt2img request carrying masked_content or
    mask_blur must raise, not silently return a plain image."""
    with pytest.raises(ValueError, match="require mask_image"):
        pipe.generate_batch(
            [{"prompt": "a", "seed": 0, "color_map_image": _cm(),
              "masked_content": "fill"}],
            num_inference_steps=2,
        )
    with pytest.raises(ValueError, match="require mask_image"):
        pipe.generate_batch(
            [{"prompt": "a", "seed": 0, "color_map_image": _cm(),
              "mask_blur": 4.0}],
            num_inference_steps=2,
        )
    with pytest.raises(ValueError, match="masked_content must be"):
        pipe.generate_batch(
            [_req("a", 0, mask_image=_mask(), masked_content="bogus")],
            num_inference_steps=2,
        )


def test_batch_rejects_mixed_modes(pipe):
    with pytest.raises(ValueError, match="agree on img2img"):
        pipe.generate_batch(
            [_req("a", 0), {"prompt": "b", "seed": 1,
                            "color_map_image": _cm()}],
            num_inference_steps=2,
        )
    with pytest.raises(ValueError, match="agree on inpaint"):
        pipe.generate_batch(
            [_req("a", 0, mask_image=_mask()), _req("b", 1)],
            num_inference_steps=2,
        )


def test_batch_rejects_mismatched_init_resolution(pipe):
    reqs = [
        {"prompt": "a", "seed": 0, "init_image": _init(0, 64)},
        {"prompt": "b", "seed": 1, "init_image": _init(1, 128)},
    ]
    with pytest.raises(ValueError, match="resolution"):
        pipe.generate_batch(reqs, num_inference_steps=2)


def test_compat_key_groups_img2img():
    """Same-mode same-strength requests share a key; txt2img, different
    strength, and inpaint all split."""
    a = _req("a", 0)
    b = _req("b", 1)
    assert compat_key(a) == compat_key(b)
    txt = {"prompt": "c", "color_map_image": _cm(), "seed": 2}
    assert compat_key(a) != compat_key(txt)
    assert compat_key(a) != compat_key({**_req("d", 3), "strength": 0.9})
    assert compat_key(a) != compat_key(_req("e", 4, mask_image=_mask()))
    # inpaint-only-masked stays singleton (per-request crop resolution)
    k = compat_key(_req("f", 5, mask_image=_mask(), inpaint_full_res=True))
    assert k[0] == "singleton"
    # noise_mode is forwarded batch-level, so it must split groups
    assert compat_key(a) != compat_key(_req("g", 6, noise_mode="torch"))
    # ControlNet / IP-Adapter conditioning: generate_batch has no support,
    # so these must ride singleton generate (not silently drop the hint)
    for extra_field in ("control_image", "ip_adapter_image"):
        k = compat_key({"prompt": "h", "seed": 7, "color_map_image": _cm(),
                        extra_field: _init(7)})
        assert k[0] == "singleton"
    # img2img resolution key uses the floored init dims even with a map
    cm68 = np.zeros((68, 68, 3), np.uint8)
    k68 = compat_key({"prompt": "i", "seed": 8, "color_map_image": cm68,
                      "init_image": _init(8, 68)})
    assert k68[0] == (64, 64)


def test_batcher_isolates_bad_request(pipe):
    """One malformed request in a fused group must not 500 its co-batched
    neighbors: the worker retries the group per-request so only the
    offender errors."""
    b = Batcher(pipe, max_batch=4, max_wait_ms=300.0)
    try:
        good = dict(_req("a cat", 0), num_inference_steps=2, strength=0.8)
        bad = dict(_req("a dog", 1), num_inference_steps=2, strength=0.8,
                   masked_content="bogus")
        assert compat_key(good) == compat_key(bad)  # they DO fuse
        f_good = b.submit(good)
        f_bad = b.submit(bad)
        img = f_good.result(timeout=300)
        assert np.asarray(img).shape == (64, 64, 3)
        with pytest.raises(ValueError, match="masked_content must be"):
            f_bad.result(timeout=300)
    finally:
        b.close()


def test_batcher_fuses_concurrent_img2img(pipe):
    b = Batcher(pipe, max_batch=4, max_wait_ms=300.0)
    try:
        reqs = [
            dict(_req(p, i), num_inference_steps=2, strength=0.8)
            for i, p in enumerate(["a cat", "a dog"])
        ]
        futs = [b.submit(r) for r in reqs]
        imgs = [f.result(timeout=300) for f in futs]
        assert all(np.asarray(im).shape == (64, 64, 3) for im in imgs)
        assert b.stats["batches"] == 1  # fused into ONE device call
        # batched result == the same request served alone
        single = _single(pipe, _req("a dog", 1), strength=0.8, steps=2)
        _assert_quantum_equal(np.asarray(imgs[1]), single)
    finally:
        b.close()


def test_compat_key_separates_map_grids():
    """Same floored init dims, different color-map grids → different PwW
    pyramid keys → must not share a batch key (regression: equal keys fused
    groups that generate_batch then failed with a KeyError)."""
    r64 = _req("a cat", 0)
    r128 = dict(r64, color_map_image=_cm(128))
    r_none = {k: v for k, v in r64.items()
              if k not in ("color_map_image", "color_context")}
    assert compat_key(r64) != compat_key(r128)
    assert compat_key(r64) != compat_key(r_none)
    assert compat_key(r64) == compat_key(dict(r64, seed=5))


def test_generate_batch_rejects_mixed_map_grids(pipe):
    reqs = [
        _req("a cat", 0),
        dict(_req("a dog", 1), color_map_image=_cm(128)),
    ]
    with pytest.raises(ValueError, match="color-map grid"):
        pipe.generate_batch(reqs, num_inference_steps=2, strength=0.6)


@pytest.fixture(scope="module")
def pipe_xl():
    import jax.numpy as jnp

    return PwwPipeline(config=SDModelConfig.tiny_xl(), weights_dtype=None,
                       compute_dtype=jnp.float32)


def test_batch1_sdxl_img2img_time_ids_match_single(pipe_xl):
    """SDXL micro-conditioning: a non-%32 init (80x80) PROCESSES at 64x64
    but generate's time_ids carry the raw 80x80 dims — the batch path must
    build the same per-request time_ids or a batched request diverges from
    the same request served alone."""
    req = {"prompt": "a cat", "seed": 3, "init_image": _init(3, size=80)}
    batch = np.asarray(
        pipe_xl.generate_batch(
            [req], num_inference_steps=2, strength=0.6, output_type="np"
        )
    )
    single = np.asarray(
        pipe_xl.generate(
            **req, strength=0.6, num_inference_steps=2, output_type="np"
        )
    )[0]
    np.testing.assert_array_equal(batch[0], single)


@pytest.fixture(scope="module")
def pipe_anc():
    import jax.numpy as jnp

    return PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None,
                       compute_dtype=jnp.float32, scheduler="euler_ancestral")


def test_batch1_ancestral_step_noise_bitmatches_single(pipe_anc):
    """Ancestral schedulers draw fresh noise every step: generate_batch must
    derive each row's stream from ITS request seed (regression: a shared
    fixed key made serving output depend on batch composition and never
    match the same request served alone)."""
    req = {"prompt": "a cat", "seed": 11, "color_map_image": _cm(),
           "color_context": {(255, 0, 0): "cat,1.0"}}
    batch = np.asarray(pipe_anc.generate_batch(
        [req], num_inference_steps=3, output_type="np"))
    single = np.asarray(pipe_anc.generate(
        **req, num_inference_steps=3, output_type="np"))
    np.testing.assert_array_equal(batch[0], single[0])


def test_batched_ancestral_rows_match_singles(pipe_anc):
    reqs = [
        {"prompt": "a cat", "seed": 4, "color_map_image": _cm(),
         "color_context": {(255, 0, 0): "cat,1.0"}},
        {"prompt": "a dog", "seed": 9, "color_map_image": _cm(),
         "color_context": {(255, 0, 0): "dog,1.0"}},
    ]
    batch = np.asarray(pipe_anc.generate_batch(
        reqs, num_inference_steps=3, output_type="np"))
    for i, r in enumerate(reqs):
        single = np.asarray(pipe_anc.generate(
            **r, num_inference_steps=3, output_type="np"))[0]
        _assert_quantum_equal(batch[i], single)
