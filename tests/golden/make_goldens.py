"""Regenerate the golden-latent files (run from the repo root, forces CPU
like the test suite so the committed numbers match CI):

    python tests/golden/make_goldens.py [case ...]
"""
import os
import sys

# Match tests/conftest.py exactly: the 8-virtual-device CPU flag changes
# XLA:CPU thread partitioning and therefore FP accumulation order; goldens
# generated without it drift ~1% over a 3-step trajectory.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from golden_cases import CASES, generate, generate_image  # noqa: E402


def main():
    names = sys.argv[1:] or list(CASES)
    here = os.path.dirname(__file__)
    for name in names:
        out = generate(name)
        path = os.path.join(here, f"{name}.npy")
        np.save(path, out)
        print(f"{name}: saved {out.shape} -> {path}")
        img = generate_image(name)
        ipath = os.path.join(here, f"{name}_img.npy")
        np.save(ipath, img)
        print(f"{name}: saved image {img.shape} {img.dtype} -> {ipath}")


if __name__ == "__main__":
    main()
