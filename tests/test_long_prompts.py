"""Long-prompt (>77 token) windowed encoding tests (A1111 scheme).

The reference silently truncates at 77 tokens (its tokenizer call uses
``truncation=True``, reference `paint_with_words.py:320-326`); opt-in
``long_prompts=True`` splits the untruncated stream into BOS/EOS-wrapped
windows and concatenates the hidden states, so region labels deep in a long
prompt still steer their masks.
"""
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig
from pww_tpu.conditioning.encode import _window_ids
from pww_tpu.pipeline.pipeline import PwwPipeline
from pww_tpu.tokenizer.clip_bpe import toy_tokenizer


def _long_prompt(n_words=90, marker="cat", at=80):
    words = [f"word{i}" for i in range(n_words)]
    words[at] = marker
    return " ".join(words)


def test_window_ids_structure():
    tok = toy_tokenizer()
    wins = _window_ids(tok, _long_prompt(), 77)
    assert len(wins) >= 2
    for w in wins:
        assert len(w) == 77
        assert w[0] == tok.bos_token_id
        assert tok.eos_token_id in w
    # short prompts give exactly the default single-window ids
    short = _window_ids(tok, "a cat", 77)
    assert len(short) == 1
    assert short[0] == tok(
        "a cat", max_length=77, truncation=True, padding=True
    )["input_ids"]


def _cm():
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    return cm


def test_short_prompt_long_mode_is_bitwise_default():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    kw = dict(
        prompt="a cat", color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="np",
    )
    a = np.asarray(pipe.generate(**kw))
    b = np.asarray(pipe.generate(long_prompts=True, **kw))
    np.testing.assert_array_equal(a, b)


def test_long_prompt_second_window_region_match():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    prompt = _long_prompt(90, "cat", 80)  # 'cat' lands in window 2
    enc = pipe.encode_inputs(
        prompt, _cm(), {(255, 0, 0): "cat,1.0"}, "", None, long_prompts=True
    )
    t = enc.text_states.shape[1]
    assert t % 77 == 0 and t >= 154
    # the match found the label (no absent-token warning path => nonzero
    # weights in the second window's columns)
    w = np.asarray(enc.pww.weights[8 * 8])  # (2, hw, T)
    assert w.shape[-1] == t
    assert np.abs(w[1, :, 77:]).sum() > 0  # bias lives in window 2

    out = pipe.generate(
        prompt=prompt, color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,1.0"}, long_prompts=True,
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert np.isfinite(np.asarray(out)).all()


def test_truncation_default_misses_what_windows_catch():
    """The default path truncates away a deep label (reference behavior);
    long_prompts keeps it — the two must differ."""
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    prompt = _long_prompt(90, "cat", 80)
    kw = dict(
        prompt=prompt, color_map_image=_cm(),
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="np",
    )
    with pytest.warns(UserWarning, match="not found"):
        a = np.asarray(pipe.generate(**kw))
    b = np.asarray(pipe.generate(long_prompts=True, **kw))
    assert not np.array_equal(a, b)


def test_long_prompts_on_xl():
    pipe = PwwPipeline(config=SDModelConfig.tiny_xl(), weights_dtype=None)
    out = pipe.generate(
        prompt=_long_prompt(90), color_map_image=_cm(),
        color_context={(255, 0, 0): "word10,1.0"}, long_prompts=True,
        num_inference_steps=2, seed=0, output_type="np",
    )
    assert np.isfinite(np.asarray(out)).all()


def test_long_prompts_excludes_prompt_weighting():
    pipe = PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None)
    with pytest.raises(ValueError, match="combined"):
        pipe.generate(
            prompt="a cat", color_map_image=_cm(),
            color_context={(255, 0, 0): "cat,1.0"},
            long_prompts=True, prompt_weighting=True,
            num_inference_steps=2,
        )
