"""A1111 prompt-weighting tests: parser, tokenization, encode integration."""
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig
from pww_tpu.conditioning.prompt_weighting import (apply_token_weights,
                                                   parse_prompt_attention,
                                                   weighted_prompt_ids)
from pww_tpu.pipeline.pipeline import PwwPipeline


@pytest.mark.parametrize(
    "text,want",
    [
        ("a cat", [["a cat", 1.0]]),
        ("a (big) cat", [["a ", 1.0], ["big", 1.1], [" cat", 1.0]]),
        ("((big)) cat", [["big", 1.1 * 1.1], [" cat", 1.0]]),
        ("[small] cat", [["small", 1 / 1.1], [" cat", 1.0]]),
        ("(cat:1.5) dog", [["cat", 1.5], [" dog", 1.0]]),
        ("(a (b:2.0) c)", [["a ", 1.1], ["b", 2.2], [" c", 1.1]]),
        (r"\(literal\)", [["(literal)", 1.0]]),
        ("(unclosed", [["unclosed", 1.1]]),
        ("", [["", 1.0]]),
        ("(neg:-0.5)", [["neg", -0.5]]),
    ],
)
def test_parse_prompt_attention(text, want):
    got = parse_prompt_attention(text)
    assert len(got) == len(want)
    for (gf, gw), (wf, ww) in zip(got, want):
        assert gf == wf
        assert abs(gw - ww) < 1e-9, (gf, gw, ww)


def test_weighted_ids_match_plain_tokenization():
    """Stripping the syntax yields the same token ids as the plain prompt."""
    from pww_tpu.tokenizer.clip_bpe import toy_tokenizer

    tok = toy_tokenizer(1000)
    ids_w, w = weighted_prompt_ids(tok, "a (big:1.4) cat")
    ids_plain = tok("a big cat", max_length=tok.model_max_length,
                    truncation=True, padding=True)["input_ids"]
    assert ids_w == list(ids_plain)
    assert len(w) == tok.model_max_length
    # 'big' is weighted, 'a'/'cat'/specials are not
    assert w.max() == pytest.approx(1.4)
    assert w[0] == 1.0 and w[-1] == 1.0
    assert (w != 1.0).sum() == 1


def test_apply_token_weights_preserves_mean():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((77, 32)).astype(np.float32)
    w = np.ones(77, np.float32)
    w[5] = 1.8
    import jax.numpy as jnp

    y = np.asarray(apply_token_weights(jnp.asarray(x), w))
    np.testing.assert_allclose(y.mean(), x.mean(), rtol=1e-5)
    # the weighted row moved, others only by the global renorm factor
    ratio = y[3] / x[3]
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-4)
    np.testing.assert_allclose(y[5] / x[5], 1.8 * ratio[0], rtol=1e-4)


def _kwargs(prompt):
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    return dict(
        prompt=prompt, color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="latent",
    )


def test_generate_weighting_neutral_and_active():
    pipe = PwwPipeline(config=SDModelConfig.tiny())
    base = np.asarray(pipe.generate(**_kwargs("a cat")))
    # weight 1.0 everywhere -> bitwise identical to the plain path
    neutral = np.asarray(
        pipe.generate(prompt_weighting=True, **_kwargs("a (cat:1.0)"))
    )
    np.testing.assert_array_equal(base, neutral)
    emphasized = np.asarray(
        pipe.generate(prompt_weighting=True, **_kwargs("a (cat:1.8)"))
    )
    assert not np.array_equal(base, emphasized)


def test_generate_weighting_region_match_still_works(recwarn):
    """(cat:1.4) must still match the 'cat' color-context label."""
    import warnings

    pipe = PwwPipeline(config=SDModelConfig.tiny())
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        pipe.generate(prompt_weighting=True, **_kwargs("a (cat:1.4) outside"))
    assert not any("not found in prompt" in str(r.message) for r in rec)


def test_generate_weighting_xl_dual_tower():
    pipe = PwwPipeline(config=SDModelConfig.tiny_xl())
    out = pipe.generate(prompt_weighting=True, **_kwargs("a (cat:1.6)"))
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize(
    "text,want",
    [
        # A1111's re_attention appends unmatched ')' / ']' / ':w)' as literal
        # text (its final else-branch); merged with neighbors at weight 1.0.
        ("a ) cat", [["a ) cat", 1.0]]),
        ("a ] cat", [["a ] cat", 1.0]]),
        ("cat:1.5) dog", [["cat:1.5) dog", 1.0]]),
        ("a (big) ) cat", [["a ", 1.0], ["big", 1.1], [" ) cat", 1.0]]),
    ],
)
def test_unmatched_brackets_stay_literal(text, want):
    got = parse_prompt_attention(text)
    assert got == want


def test_weighted_ids_keep_interior_pad_id_token():
    """OpenCLIP towers pad with id 0, which is ALSO the legitimate
    non-word-final '!' token: the pad guard must only strip trailing pads,
    never interior tokens (regression: SDXL tokenizer_2 dropped '!' from
    'hey!?' under prompt_weighting, shifting every later position)."""

    class _Tok:
        model_max_length = 8
        bos_token_id = 100
        eos_token_id = 101
        pad_token_id = 0

        def __call__(self, text, **kw):
            # 'hey!?' → [bos, hey, !(id 0, non-word-final), ?</w>, eos, pad]
            return {"input_ids": [100, 71, 0, 286, 101, 0, 0]}

    ids, weights = weighted_prompt_ids(_Tok(), "hey!?")
    # interior 0 kept, trailing pads stripped, then padded back out
    assert ids == [100, 71, 0, 286, 101, 0, 0, 0]
    assert list(weights) == [1.0] * 8
