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


@pytest.fixture(scope="module")
def parity_pair(tmp_path_factory):
    """(ours, transformers.CLIPTokenizer) built from the SAME vocab files."""
    transformers = pytest.importorskip("transformers")
    tok = _mini_tokenizer()
    d = tmp_path_factory.mktemp("tok")
    vocab_file = os.path.join(d, "vocab.json")
    merges_file = os.path.join(d, "merges.txt")
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(tok.encoder, f)
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for (a, b), _ in sorted(tok.bpe_ranks.items(), key=lambda kv: kv[1]):
            f.write(f"{a} {b}\n")
    hf = transformers.CLIPTokenizer(vocab_file=vocab_file, merges_file=merges_file)
    return tok, hf


@pytest.mark.parametrize(
    "text",
    [
        "a cat and a dog",
        "don't stop, it's 2024!",
        "café naïve résumé",       # Latin-1 letters
        "猫と犬",                            # CJK
        "über straße élève",
        "emoji \U0001f431\U0001f436 mix",
        "кошка и собака",  # Cyrillic
    ],
)
def test_tokenizer_matches_transformers(parity_pair, text):
    """Byte-level BPE + unicode split parity with transformers.CLIPTokenizer,
    including non-ASCII prompts (the reference's token-match semantics depend
    on identical ids, paint_with_words.py:222-227)."""
    ours, hf = parity_pair
    got = ours(text, max_length=77, truncation=True, padding=True)["input_ids"]
    want = hf(text, max_length=77, truncation=True, padding="max_length")["input_ids"]
    assert got == want


def test_tokenizer_assets_roundtrip_pad_token(tmp_path):
    """save_tokenizer_assets/from_dir must preserve a non-EOS pad id (SDXL's
    tokenizer_2 pads with id 0)."""
    from pww_tpu.tokenizer.clip_bpe import save_tokenizer_assets

    tok = _mini_tokenizer()
    tok.pad_token_id = 0
    d = str(tmp_path / "tokenizer_2")
    assert save_tokenizer_assets(tok, d)
    tok2 = CLIPTokenizer.from_dir(d)
    assert tok2.pad_token_id == 0
    ids = tok2("cat", max_length=8, truncation=True, padding=True)["input_ids"]
    assert ids[-1] == 0 and ids[2] == tok2.eos_token_id
    # toy tokenizers have no serializable vocab
    assert not save_tokenizer_assets(toy_tokenizer(), str(tmp_path / "toy"))


def test_synthetic_tokenizer_real_bpe_path():
    """synthetic_tokenizer: full 49408 vocab, canonical special ids, real
    BPE merges (multi-token words), deterministic, decode round-trips."""
    from pww_tpu.tokenizer.clip_bpe import synthetic_tokenizer

    tok = synthetic_tokenizer()
    assert len(tok.encoder) == 49408
    assert tok.bos_token_id == 49406 and tok.eos_token_id == 49407
    out = tok("a cat sitting next to a dog")["input_ids"]
    assert out[0] == tok.bos_token_id and tok.eos_token_id in out
    assert out == tok("a cat sitting next to a dog")["input_ids"]
    body = [i for i in out if i not in (tok.bos_token_id, tok.eos_token_id)]
    assert tok.decode(body).strip().startswith("a cat")
    # the merge ladder actually fires: 'cat' encodes in < 3 byte tokens + 1
    cat = tok("cat", max_length=77, truncation=True)["input_ids"]
    assert len(cat) < 5  # bos + merged token(s) + eos


def test_added_token_prefix_not_eaten():
    """Multi-vector TI placeholders: '<cat>_1' must tokenize as its own id,
    not '<cat>' + BPE('_1') (regression: Python re alternation is
    leftmost-first, so insertion order made the prefix win)."""
    tok = _mini_tokenizer()
    id0 = tok.added_tokens.setdefault  # noqa: F841  (readability)
    tok.add_tokens("<cat>")
    tok.add_tokens("<cat>_1")
    a, b = tok.added_tokens["<cat>"], tok.added_tokens["<cat>_1"]
    ids = tok.tokenize("<cat> <cat>_1")
    assert ids == [a, b], ids


def test_added_token_uppercase_matches_raw_and_lowered():
    """CLIP lowercases plain text, but added tokens are extracted from the
    RAW text (transformers semantics): an uppercase placeholder must match
    as written, and — via the lowercase alias — in lowercased prompts too,
    resolving to the SAME id (one embedding row)."""
    tok = _mini_tokenizer()
    n_before = tok("cat")["input_ids"]
    tok.add_tokens("<MyStyle>")
    tid = tok.added_tokens["<MyStyle>"]
    assert tid in tok.tokenize("a cat <MyStyle>")
    assert tid in tok.tokenize("a cat <mystyle>")
    assert tok.convert_tokens_to_ids("<mystyle>") == tid
    # plain text tokenization unaffected
    assert tok("cat")["input_ids"] == n_before


def test_toy_tokenizer_added_token_case_and_prefix():
    tok = toy_tokenizer(512)
    tok.add_tokens("<S>")
    tok.add_tokens("<S>_1")
    a, b = tok.added_tokens["<S>"], tok.added_tokens["<S>_1"]
    assert tok.tokenize("<S> <S>_1") == [a, b]
    assert a in tok.tokenize("a photo of <s>")
