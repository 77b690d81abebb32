"""CLIP BPE tokenizer tests (self-contained vocab; no hub access needed)."""
import json
import os

import pytest

from pww_tpu.tokenizer.clip_bpe import CLIPTokenizer, bytes_to_unicode, toy_tokenizer


def _mini_tokenizer():
    """Build a small but real BPE vocab covering a couple of words."""
    base = list(bytes_to_unicode().values())
    vocab = {}
    for v in base:
        vocab[v] = len(vocab)
    for v in base:
        vocab[v + "</w>"] = len(vocab)
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return CLIPTokenizer(vocab, merges)


def test_bpe_merges_applied():
    tok = _mini_tokenizer()
    ids = tok.tokenize("cat dog")
    assert ids == [tok.encoder["cat</w>"], tok.encoder["dog</w>"]]


def test_call_adds_special_tokens_and_pads():
    tok = _mini_tokenizer()
    out = tok("cat", padding=True)["input_ids"]
    assert len(out) == 77
    assert out[0] == tok.bos_token_id
    assert out[1] == tok.encoder["cat</w>"]
    assert out[2] == tok.eos_token_id
    assert all(i == tok.eos_token_id for i in out[2:])


def test_unmerged_word_falls_back_to_chars():
    tok = _mini_tokenizer()
    ids = tok.tokenize("ta")
    assert ids == [tok.encoder["t"], tok.encoder["a</w>"]]


def test_lowercase_and_whitespace_cleanup():
    tok = _mini_tokenizer()
    assert tok.tokenize("  CAT   dog ") == tok.tokenize("cat dog")


def test_decode_roundtrip():
    tok = _mini_tokenizer()
    ids = tok.tokenize("cat dog")
    assert tok.decode(ids).strip() == "cat dog"


def test_from_dir(tmp_path):
    tok = _mini_tokenizer()
    d = tmp_path / "tokenizer"
    d.mkdir()
    with open(d / "vocab.json", "w") as f:
        json.dump(tok.encoder, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>")]:
            f.write(f"{a} {b}\n")
    tok2 = CLIPTokenizer.from_dir(str(tmp_path))
    assert tok2.tokenize("cat") == tok.tokenize("cat")


def test_toy_tokenizer_deterministic():
    tok = toy_tokenizer()
    a = tok("a cat and a dog", padding=True)["input_ids"]
    b = tok("a cat and a dog", padding=True)["input_ids"]
    assert a == b and len(a) == 77
    # label tokens appear as a contiguous substring of the prompt tokens
    label = tok("cat")["input_ids"][1:-1]
    joined = ",".join(map(str, a))
    assert ",".join(map(str, label)) in joined
