"""Prompt editing through the full pipeline (tiny config).

The exactness anchor: with a stateless scheduler (ddim), editing
``[a:b:k]`` must equal running the first k steps with ``a``
(``denoising_end``) and resuming the remaining steps with ``b``
(``denoising_start`` on the returned latents) — two independent code
paths that must land on the same trajectory.
"""
import numpy as np
import pytest

from pww_tpu import PwwPipeline
from pww_tpu.config import SDModelConfig


@pytest.fixture(scope="module")
def pipe():
    # ddim: stateless scheduler, so the ensemble resume used as the
    # ground truth below carries no hidden state across the split
    return PwwPipeline(config=SDModelConfig.tiny(), scheduler="ddim")


def _cm(size=64):
    cm = np.zeros((size, size, 3), np.uint8)
    cm[:, : size // 2] = (255, 0, 0)
    cm[:, size // 2 :] = (0, 0, 255)
    return cm


CTX = {(255, 0, 0): "cat,1.0", (0, 0, 255): "dog,1.0"}
KW = dict(color_map_image=_cm(), color_context=CTX, seed=11,
          num_inference_steps=4, output_type="np")


def test_editing_matches_ensemble_split(pipe):
    # denoising_end=0.5 over 4 steps -> first expert runs scan steps 0-1,
    # exactly where [cat:dog:2] reads "cat" (1-indexed steps 1-2)
    edited = pipe.generate(
        prompt="a [cat:dog:2] next to a dog",
        prompt_editing=True, **KW,
    )
    lat = pipe.generate(
        prompt="a cat next to a dog", denoising_end=0.5,
        return_latents=True, **KW,
    )
    resumed = pipe.generate(
        prompt="a dog next to a dog", init_latents=np.asarray(lat),
        denoising_start=0.5, **KW,
    )
    np.testing.assert_allclose(
        edited.astype(np.int32), resumed.astype(np.int32), atol=1
    )


def test_editing_differs_from_both_constants(pipe):
    edited = pipe.generate(
        prompt="a [cat:dog:2] next to a dog", prompt_editing=True, **KW
    )
    cat = pipe.generate(prompt="a cat next to a dog", **KW)
    dog = pipe.generate(prompt="a dog next to a dog", **KW)
    assert np.abs(edited.astype(int) - cat.astype(int)).mean() > 0
    assert np.abs(edited.astype(int) - dog.astype(int)).mean() > 0


def test_editing_off_treats_brackets_as_text(pipe):
    # without the opt-in flag the bracket text goes to the tokenizer as-is
    a = pipe.generate(prompt="a [cat:dog:2] next to a dog", **KW)
    b = pipe.generate(prompt="a [cat:dog:2] next to a dog",
                      prompt_editing=False, **KW)
    np.testing.assert_array_equal(a, b)


def test_editing_deterministic_and_callback_consistent(pipe):
    kw = dict(prompt="[cat|dog] portrait", prompt_editing=True, **KW)
    a = pipe.generate(**kw)
    b = pipe.generate(**kw)
    np.testing.assert_array_equal(a, b)
    seen = []
    c = pipe.generate(callback=lambda i, t, lat: seen.append(i),
                      callback_steps=2, **kw)
    assert seen == [1, 3]
    np.testing.assert_allclose(a.astype(np.int32), c.astype(np.int32), atol=1)


def test_negative_prompt_editing(pipe):
    a = pipe.generate(prompt="a cat", negative_prompt="[blurry:sharp:2]",
                      prompt_editing=True, **KW)
    b = pipe.generate(prompt="a cat", negative_prompt="blurry", **KW)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 0


def test_editing_rejects_deepcache_and_sag(pipe):
    kw = dict(prompt="a [cat:dog:2]", prompt_editing=True, **KW)
    with pytest.raises(ValueError, match="DeepCache"):
        pipe.generate(cache_interval=3, **kw)
    with pytest.raises(ValueError, match="sag_scale"):
        pipe.generate(sag_scale=0.5, **kw)


@pytest.mark.parametrize("kind", ["pndm", "heun"])
def test_editing_with_multi_visit_schedulers(kind):
    """pndm/heun visit some steps twice: switch bounds are mapped from
    sampler-step units to scan-visit indices (regression: the segment loop
    walked off the bounds list with IndexError)."""
    from pww_tpu import PwwPipeline
    from pww_tpu.config import SDModelConfig

    pipe = PwwPipeline(config=SDModelConfig.tiny(), scheduler=kind)
    out = pipe.generate(
        prompt="a [cat|dog]", prompt_editing=True, num_inference_steps=4,
        seed=0, color_map_image=np.zeros((64, 64, 3), np.uint8),
        output_type="np",
    )
    arr = np.asarray(out)
    assert arr.shape == (1, 64, 64, 3)
    assert np.isfinite(arr.astype(np.float64)).all()
