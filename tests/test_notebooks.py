"""The walkthrough notebooks must stay executable (tiny-config cells)."""
import json
import os

import pytest

NB_DIR = os.path.join(os.path.dirname(__file__), "..", "notebooks")


@pytest.mark.parametrize("name", [
    "paint_with_words.ipynb",
    "paint_with_words_textual_inversion.ipynb",
])
def test_notebook_code_cells_execute(name):
    with open(os.path.join(NB_DIR, name)) as f:
        nb = json.load(f)
    src = "\n".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    )
    exec(compile(src, name, "exec"), {})
