"""End-to-end pipeline tests on the tiny config (txt2img/img2img/inpaint,
determinism, bias effect, batching, schedulers). These are the fixed-seed
integration tests the reference never had (SURVEY.md §4)."""
import numpy as np
import pytest
from PIL import Image

from pww_tpu import PwwPipeline, paint_with_words, paint_with_words_inpaint
from pww_tpu.config import SDModelConfig


@pytest.fixture(scope="module")
def pipe():
    return PwwPipeline(config=SDModelConfig.tiny())


@pytest.fixture(scope="module")
def pipe9():
    return PwwPipeline(config=SDModelConfig.tiny(in_channels=9))


def _cm(size=64):
    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    cm[:, size // 2 :] = (0, 0, 255)
    return cm


CTX = {(255, 0, 0): "cat,1.0", (0, 0, 255): "dog,1.0"}


def test_output_type_device_matches_np(pipe):
    """generate(output_type="device") returns the SAME uint8 image as "np",
    un-fetched (the serving/bench overlap contract) — and paths needing host
    post-processing reject it up front."""
    import jax

    kw = dict(prompt="a cat and a dog", color_map_image=_cm(),
              color_context=dict(CTX), num_inference_steps=2, seed=7)
    dev = pipe.generate(output_type="device", **kw)
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(
        np.asarray(dev), pipe.generate(output_type="np", **kw)
    )
    with pytest.raises(ValueError, match="fused denoise\\+decode"):
        pipe.generate(output_type="device", return_latents=True, **kw)


def test_txt2img_deterministic(pipe):
    kw = dict(prompt="a cat and a dog", color_map_image=_cm(),
              color_context=dict(CTX), num_inference_steps=2, seed=7,
              output_type="np")
    a = pipe.generate(**kw)
    b = pipe.generate(**kw)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 64, 64, 3) and a.dtype == np.uint8


def test_seed_changes_output(pipe):
    kw = dict(prompt="a cat and a dog", color_map_image=_cm(),
              color_context=dict(CTX), num_inference_steps=2, output_type="np")
    a = pipe.generate(seed=1, **kw)
    b = pipe.generate(seed=2, **kw)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 0


def test_bias_strength_changes_output(pipe):
    kw = dict(prompt="a cat and a dog", color_map_image=_cm(),
              num_inference_steps=2, seed=3, output_type="np")
    a = pipe.generate(color_context={(255, 0, 0): "cat,3.0"}, **kw)
    b = pipe.generate(color_context={(255, 0, 0): "cat,0.0"}, **kw)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 0


def test_img2img_runs(pipe):
    init = Image.fromarray(np.full((64, 64, 3), 120, np.uint8))
    out = pipe.generate(
        prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
        num_inference_steps=4, seed=0, init_image=init, strength=0.5,
        output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_inpaint_runs(pipe9):
    init = Image.fromarray(np.full((64, 64, 3), 120, np.uint8))
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    out = pipe9.generate(
        prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
        num_inference_steps=3, seed=0, init_image=init, mask_image=mask,
        strength=1.0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_inpaint_channel_validation():
    """A checkpoint whose UNet channel count matches NEITHER plain latents
    (legacy masked-blend takes those) nor latents+mask+masked-image gets
    the reference's channel-count error (reference inpaint.py:216-227).
    (4-channel checkpoints no longer error: they inpaint via the legacy
    masked-blend path, `test_legacy_inpaint.py`.)"""
    pipe6 = PwwPipeline(config=SDModelConfig.tiny(in_channels=6))
    init = Image.fromarray(np.full((64, 64, 3), 120, np.uint8))
    with pytest.raises(ValueError, match="channel"):
        pipe6.generate(
            prompt="x", color_map_image=_cm(), num_inference_steps=2,
            init_image=init, mask_image=np.ones((64, 64), np.float32),
        )


def test_num_samples_batched(pipe):
    out = pipe.generate(
        prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
        num_inference_steps=2, seed=0, num_samples=3, output_type="np",
    )
    assert out.shape == (3, 64, 64, 3)


def test_regional_seeding_differs(pipe):
    kw = dict(prompt="a cat and a dog", color_map_image=_cm(),
              num_inference_steps=2, seed=5, output_type="np")
    a = pipe.generate(
        color_context={(255, 0, 0): "cat,1.0,123", (0, 0, 255): "dog,1.0"}, **kw
    )
    b = pipe.generate(
        color_context={(255, 0, 0): "cat,1.0,999", (0, 0, 255): "dog,1.0"}, **kw
    )
    c = pipe.generate(
        color_context={(255, 0, 0): "cat,1.0,123", (0, 0, 255): "dog,1.0"}, **kw
    )
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 0  # region seed matters
    np.testing.assert_array_equal(a, c)  # and is deterministic


def test_ddim_scheduler_end_to_end():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), scheduler="ddim")
    out = pipe.generate(
        prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert out.shape == (1, 64, 64, 3)


def test_facade_kwargs_parity(pipe):
    """The reference call signature works verbatim (modulo device strings)."""
    import math
    import jax.numpy as jnp

    img = paint_with_words(
        color_context={(255, 0, 0): "cat,1.0"},
        color_map_image=Image.fromarray(_cm()),
        input_prompt="a cat",
        num_inference_steps=2,
        guidance_scale=7.5,
        seed=0,
        weight_function=lambda w, sigma, qk: 0.1 * w * jnp.log1p(sigma) * jnp.max(qk),
        unconditional_input_prompt="",
        preloaded_utils=pipe,
    )
    assert isinstance(img, Image.Image)


def test_callback_observes_every_step(pipe):
    seen = []
    pipe.generate(
        prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
        num_inference_steps=4, seed=0, output_type="np",
        callback=lambda i, t, lat: seen.append((i, lat.shape)),
        callback_steps=1,
    )
    assert [s[0] for s in seen] == [0, 1, 2, 3]
    assert all(s[1] == (1, 8, 8, 4) for s in seen)


def test_callback_chunked_matches_plain(pipe):
    kw = dict(prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
              num_inference_steps=4, seed=11, output_type="np")
    plain = pipe.generate(**kw)
    chunked = pipe.generate(callback=lambda *a: None, callback_steps=2, **kw)
    np.testing.assert_array_equal(plain, chunked)


def test_caller_supplied_latents(pipe):
    """Reference pipeline-class `latents:` kwarg parity: same latents → same
    image; also powers deterministic resume (latents fully describe state)."""
    lat = np.random.default_rng(3).standard_normal((1, 8, 8, 4)).astype(np.float32)
    kw = dict(prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
              num_inference_steps=2, output_type="np")
    a = pipe.generate(latents=lat, **kw)
    b = pipe.generate(latents=lat, **kw)
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="latents shape"):
        pipe.generate(latents=lat[:, :4], **kw)


def test_custom_weight_fn_matches_equivalent_family(pipe):
    """Custom callables run the reference's exact split CFG (uncond bias-free,
    reduce over cond scores only). For a w-multiplicative callable this must
    agree with the mathematically-equivalent structured WeightFunction."""
    import jax.numpy as jnp

    from pww_tpu import WeightFunction

    kw = dict(prompt="a cat", color_map_image=_cm(),
              color_context={(255, 0, 0): "cat,1.5"},
              num_inference_steps=2, seed=9, output_type="np")
    a = pipe.generate(
        weight_function=lambda w, s, qk: 0.3 * w * jnp.log1p(s) * jnp.max(qk),
        **kw,
    )
    b = pipe.generate(
        weight_function=WeightFunction(0.3, "log1p_sigma", "max"), **kw
    )
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.mean() < 1.0, diff.mean()  # same math, different kernels


@pytest.fixture(scope="module")
def pipe_f32():
    """f32 pipeline: bitwise-comparable across different compiled programs
    (bf16 reassociates differently per program, ~1e-2 relative)."""
    import jax.numpy as jnp

    return PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None,
                       compute_dtype=jnp.float32)


def test_custom_weight_fn_callback_matches_plain(pipe_f32):
    """The per-step callback path must run the SAME split CFG as the plain
    scan for custom weight functions (uncond bias-free, qk reduce per-sample
    over cond rows only, reference `paint_with_words.py:483-499`)."""
    import jax.numpy as jnp

    kw = dict(prompt="a cat", color_map_image=_cm(),
              color_context={(255, 0, 0): "cat,1.5"},
              num_inference_steps=4, seed=9, output_type="np",
              weight_function=lambda w, s, qk: 0.3 * w * jnp.log1p(s) * jnp.max(qk))
    plain = pipe_f32.generate(**kw)
    with_cb = pipe_f32.generate(callback=lambda *a: None, callback_steps=1, **kw)
    np.testing.assert_array_equal(plain, with_cb)


def test_generate_batch_matches_single_with_orig_fallback(pipe):
    """A 68x68 map makes the rounded pyramid key (9·9=81) differ from the
    actual latent attention size (8·8=64), so the highest-res bias comes only
    from bias_for()'s ORIG resize fallback — generate_batch must carry
    weight_orig so serving matches the single-request path bitwise."""
    cm = np.zeros((68, 68, 3), np.uint8)
    cm[:, :34] = (255, 0, 0)
    req = dict(prompt="a cat", color_map_image=cm,
               color_context={(255, 0, 0): "cat,2.0"}, seed=5)
    single = pipe.generate(num_inference_steps=2, output_type="np", **req)
    batch = pipe.generate_batch([req], num_inference_steps=2, output_type="np")
    np.testing.assert_array_equal(single, batch)


def test_generate_batch_custom_weight_fn_matches_single(pipe_f32):
    """generate_batch must use the split CFG for custom weight functions AND
    evaluate the lambda per-sample: each request's ``qk.max()`` must not see
    the other requests' score rows (reference semantics are batch-1)."""
    import jax.numpy as jnp

    def wf(w, s, qk):
        return 0.2 * w * jnp.log1p(s) * jnp.max(qk)

    reqs = [
        dict(prompt="a cat", color_map_image=_cm(),
             color_context={(255, 0, 0): "cat,1.5"}, seed=5),
        dict(prompt="a dog", color_map_image=_cm(),
             color_context={(0, 0, 255): "dog,2.5"}, seed=11),
    ]
    singles = np.concatenate([
        pipe_f32.generate(num_inference_steps=2, output_type="np",
                          weight_function=wf, **r)
        for r in reqs
    ])
    batch = pipe_f32.generate_batch(reqs, num_inference_steps=2,
                                    weight_function=wf, output_type="np")
    np.testing.assert_array_equal(singles, batch)


def test_profile_records_phases():
    from pww_tpu.config import SDModelConfig

    p = PwwPipeline(config=SDModelConfig.tiny(), profile=True)
    p.generate(prompt="a cat", color_map_image=_cm(),
               color_context=dict(CTX), num_inference_steps=2, seed=0,
               output_type="np")
    s = p.timers.summary()
    assert set(s) >= {"encode", "denoise", "decode"}
    assert all(v["count"] == 1 for v in s.values())


def test_facade_inpaint_accepts_numpy_mask(pipe9):
    """Regression: numpy arrays have a .resize too — the facade must convert
    to PIL before the reference-parity resize (found in final verify)."""
    from pww_tpu import paint_with_words_inpaint

    init = Image.fromarray(np.full((64, 64, 3), 120, np.uint8))
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    img = paint_with_words_inpaint(
        color_context={(255, 0, 0): "cat,1.0"},
        color_map_image=_cm(), init_image=init, mask_image=mask,
        input_prompt="a cat", num_inference_steps=2, seed=0,
        preloaded_utils=pipe9,
    )
    assert img.size == (64, 64)


def test_euler_ancestral_end_to_end():
    """Regression: ancestral sampling needs a per-step rng inside the scan."""
    p = PwwPipeline(config=SDModelConfig.tiny(), scheduler="euler_ancestral")
    kw = dict(prompt="a cat", color_map_image=_cm(),
              color_context=dict(CTX), num_inference_steps=3, seed=0,
              output_type="np")
    a = p.generate(**kw)
    b = p.generate(**kw)
    np.testing.assert_array_equal(a, b)  # ancestral noise is seed-deterministic


def test_inpaint_non_multiple_of_32_init(pipe9):
    """A 130x130 init image floors to 128x128; the original-size mask must be
    re-gridded rather than raising (the reference interpolates the mask to the
    latent grid independently, paint_with_words_inpaint.py:211-214)."""
    init = Image.fromarray(np.full((130, 130, 3), 120, np.uint8))
    m = np.zeros((130, 130), np.uint8)
    m[30:100, 30:100] = 255
    out = pipe9.generate(
        prompt="a cat", color_map_image=_cm(128),
        color_context={(255, 0, 0): "cat,1.0"},
        init_image=init, mask_image=Image.fromarray(m, "L"),
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert out.shape == (1, 128, 128, 3)


def test_hub_path_fails_clearly():
    """hf_model_path that isn't on disk must raise a clear no-egress error,
    not fail deep in the checkpoint reader (reference downloads from the hub
    with HF_TOKEN, paint_with_words.py:149-189)."""
    from pww_tpu.pipeline.facade import pww_load_tools

    with pytest.raises(FileNotFoundError, match="network egress"):
        pww_load_tools(hf_model_path="runwayml/stable-diffusion-v1-5")
    with pytest.raises(FileNotFoundError, match="does not exist"):
        pww_load_tools(local_model_path="/nonexistent/ckpt-dir")


def test_toy_tokenizer_warns_on_full_size_config():
    """A full-size CLIP config with no tokenizer must warn loudly — the
    hash-based fallback would silently mismatch every region label
    (VERDICT weak #4)."""
    import warnings

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        PwwPipeline(config=SDModelConfig.sd15(),
                    params={"unet": {}, "clip": {}, "vae": {}})
    assert any("toy tokenizer" in str(w.message) for w in rec)

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        PwwPipeline(config=SDModelConfig.tiny())  # tiny config: no warning
    assert not any("toy tokenizer" in str(w.message) for w in rec)


def test_fused_denoise_decode_matches_separate_stages(pipe_f32):
    """The single-dispatch fused program (denoise+decode in one jit) must
    produce exactly what the separate-stage path produces."""
    from pww_tpu.pipeline.pipeline import run_decode

    kw = dict(prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
              num_inference_steps=3, seed=2)
    fused = pipe_f32.generate(output_type="np", **kw)
    lat = pipe_f32.generate(return_latents=True, **kw)
    separate = np.asarray(
        run_decode(pipe_f32.vae, pipe_f32.params["vae"], lat)
    )
    np.testing.assert_array_equal(fused, separate)


def test_deepcache_interval_one_is_exact(pipe):
    """cache_interval=1 must be the exact trajectory (every step full)."""
    kw = dict(prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
              num_inference_steps=4, seed=6, output_type="np")
    base = pipe.generate(**kw)
    cached = pipe.generate(cache_interval=1, **kw)
    np.testing.assert_array_equal(base, cached)


def test_deepcache_speedup_path_runs_and_approximates(pipe):
    """cache_interval>1 (DeepCache, Ma et al. 2023) reuses the deep trunk on
    non-multiple steps: output differs from exact but stays far closer to it
    than an unrelated seed does (sanity bound for the approximation)."""
    kw = dict(prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
              num_inference_steps=6, seed=6, output_type="np")
    exact = pipe.generate(**kw)
    approx = pipe.generate(cache_interval=3, **kw)
    assert approx.shape == exact.shape
    d_cache = np.abs(exact.astype(int) - approx.astype(int)).mean()
    other = pipe.generate(**{**kw, "seed": 99})
    d_seed = np.abs(exact.astype(int) - other.astype(int)).mean()
    assert 0 < d_cache < d_seed, (d_cache, d_seed)


def test_deepcache_rejects_unsupported_combos(pipe):
    import jax.numpy as jnp

    kw = dict(prompt="a cat", color_map_image=_cm(), color_context=dict(CTX),
              num_inference_steps=4, seed=0, output_type="np")
    with pytest.raises(ValueError, match="callback"):
        pipe.generate(cache_interval=2, callback=lambda *a: None, **kw)
    with pytest.raises(ValueError, match="batched CFG"):
        pipe.generate(
            cache_interval=2,
            weight_function=lambda w, s, qk: 0.1 * w * jnp.max(qk), **kw,
        )


def test_negative_region_strength(pipe):
    """Negative region strength = the reference README's open 'negative
    region' TODO (reference README.md:465): a region whose tokens are
    actively suppressed (the bias formulation supports it directly).
    Flows through parsing (mask scaled negative), bias (negative logit
    add), and produces a distinct, finite image. Merged from two prior
    definitions (seed-4 _cm() variant + 64x64 variant, VERDICT r3 weak #5)."""
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    for cmap, seed in ((cm, 0), (_cm(), 4)):
        kw = dict(prompt="a cat", color_map_image=cmap, num_inference_steps=2,
                  seed=seed, output_type="np")
        pos = np.asarray(pipe.generate(color_context={(255, 0, 0): "cat,2.0"}, **kw))
        neg = np.asarray(pipe.generate(color_context={(255, 0, 0): "cat,-2.0"}, **kw))
        zero = np.asarray(pipe.generate(color_context={(255, 0, 0): "cat,0.0"}, **kw))
        assert np.isfinite(neg.astype(np.float64)).all()
        assert np.abs(pos.astype(int) - neg.astype(int)).mean() > 0
        assert np.abs(neg.astype(int) - zero.astype(int)).mean() > 0


def test_encode_cache_hit_identical_and_warns(pipe):
    """Seed sweeps reuse the cached encode prologue (identical outputs for
    different seeds' shared conditioning), warnings still fire on every
    call (reference warns per call), and TI/LoRA invalidation hooks exist."""
    import warnings

    cm = _cm()
    kw = dict(prompt="a cat", color_map_image=cm,
              color_context={(255, 0, 0): "unicorn,1.0"},
              num_inference_steps=2, output_type="np")
    pipe._encode_cache.clear()
    with warnings.catch_warnings(record=True) as r1:
        warnings.simplefilter("always")
        a = np.asarray(pipe.generate(seed=0, **kw))
    n_cached = len(pipe._encode_cache)
    assert n_cached >= 1
    with warnings.catch_warnings(record=True) as r2:
        warnings.simplefilter("always")
        b = np.asarray(pipe.generate(seed=1, **kw))
    assert len(pipe._encode_cache) == n_cached  # second call hit the cache
    has_warn = lambda rec: any(  # noqa: E731
        "not found in prompt" in str(w.message) for w in rec)
    assert has_warn(r1) and has_warn(r2)
    assert not np.array_equal(a, b)  # seeds still differ
    # same seed + cached encode -> bit-identical
    a2 = np.asarray(pipe.generate(seed=0, **kw))
    np.testing.assert_array_equal(a, a2)


def test_encode_cache_key_distinguishes_lambdas_and_pins_them(pipe):
    """Custom callables key by OBJECT identity (not repr, whose embedded
    id() can be recycled after GC) and the stored key keeps the callable
    alive so a dead lambda's address can never alias a different one."""
    import gc
    import weakref

    import jax.numpy as jnp

    mk = dict(prompt="a cat", color_map=None, color_context={},
              negative_prompt="", prompt_weighting=False, clip_skip=0,
              long_prompts=False)
    f1 = lambda w, s, qk: w * jnp.max(qk)  # noqa: E731
    f2 = lambda w, s, qk: w * 2.0 * jnp.max(qk)  # noqa: E731
    k1 = pipe._encode_cache_key(weight_function=f1, **mk)
    k2 = pipe._encode_cache_key(weight_function=f2, **mk)
    assert k1 is not None and k2 is not None and k1 != k2
    # value-equal structured weight functions share a key across instances
    from pww_tpu.ops.weight_functions import WeightFunction

    s1 = pipe._encode_cache_key(weight_function=WeightFunction(0.3), **mk)
    s2 = pipe._encode_cache_key(weight_function=WeightFunction(0.3), **mk)
    assert s1 == s2
    # caching under the key pins the lambda: id() can't be reused
    pipe._encode_cache.clear()
    pipe._encode_cache[k1] = ("sentinel", [])
    ref = weakref.ref(f1)
    del f1, k1
    gc.collect()
    assert ref() is not None  # alive while its cache entry exists
    pipe.invalidate_encode_caches()
    gc.collect()
    assert ref() is None and len(pipe._encode_cache) == 0


def test_prompt_editing_alternation_conds_memoized(pipe, monkeypatch):
    """[a|b] at N steps must build conditioning for the 2 distinct prompts,
    not one per schedule row."""
    calls = {"n": 0}
    orig = type(pipe)._tile_cfg

    def counting(self, enc, n):
        calls["n"] += 1
        return orig(self, enc, n)

    monkeypatch.setattr(type(pipe), "_tile_cfg", counting)
    cm = _cm()
    out = pipe.generate(
        prompt="a [cat|dog]", color_map_image=cm,
        color_context={(255, 0, 0): "a,1.0"},
        num_inference_steps=8, seed=0, output_type="np",
        prompt_editing=True,
    )
    assert np.isfinite(np.asarray(out).astype(np.float64)).all()
    # 1 base encode + 2 distinct edit variants (not 8 rows)
    assert calls["n"] <= 3, calls["n"]
