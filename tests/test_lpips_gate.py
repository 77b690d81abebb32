"""The LPIPS north-star gate, proven live with synthetic calibration files.

The real gate (BASELINE.json: LPIPS < 0.05 vs the reference's committed
outputs, reference `contents/*.png` via `runner.py:19,45,58,71`) needs the
torchvision-AlexNet + official LPIPS weight files, which don't exist in
this environment. These tests prove the ENTIRE evidence path is working
code, not dormant wiring: synthetic `alexnet.pth`/`lpips_alex.pth` files
are written to a tmp ``$PWW_LPIPS_WEIGHTS``, the file loader + JAX metric
must match the in-test torch replica, ``benchmarks.fidelity.try_lpips``
must pick the files up, and the ``--model`` gate must exit nonzero when a
case's LPIPS exceeds the ceiling.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pww_tpu.metrics.lpips import (  # noqa: E402
    load_lpips_from_files,
    lpips_distance,
)
from test_lpips import _random_torch_state, _torch_lpips  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")
REF_CONTENTS = "/root/reference/contents"


def _write_weight_files(tmp_path, seed=0):
    alexnet_sd, lin_sd = _random_torch_state(seed)
    bp = tmp_path / "alexnet.pth"
    lp = tmp_path / "lpips_alex.pth"
    torch.save(alexnet_sd, bp)
    torch.save(lin_sd, lp)
    return str(tmp_path), alexnet_sd, lin_sd


def test_load_from_files_matches_torch_replica(tmp_path):
    """torch.save → load_lpips_from_files → lpips_distance must equal the
    torch replica run directly on the saved state dicts."""
    wdir, alexnet_sd, lin_sd = _write_weight_files(tmp_path)
    params = load_lpips_from_files(
        os.path.join(wdir, "alexnet.pth"), os.path.join(wdir, "lpips_alex.pth")
    )
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(lpips_distance(params, a, b))
    want = _torch_lpips(
        alexnet_sd, lin_sd,
        torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2)),
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
    assert (got > 0).all()


def test_try_lpips_activates_on_weight_files(tmp_path, monkeypatch):
    """fidelity.try_lpips: n/a (None) without weights, a real value with
    them — the activation switch the gate depends on."""
    sys.path.insert(0, REPO)
    import benchmarks.fidelity as fid

    rng = np.random.default_rng(1)
    a = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    b = (rng.random((64, 64, 3)) * 255).astype(np.uint8)

    monkeypatch.setattr(fid, "_LPIPS_PARAMS", None)
    monkeypatch.setenv("PWW_LPIPS_WEIGHTS", str(tmp_path / "nope"))
    assert fid.try_lpips(a, b) is None  # no files, no pip lpips -> n/a

    wdir, alexnet_sd, lin_sd = _write_weight_files(tmp_path)
    monkeypatch.setenv("PWW_LPIPS_WEIGHTS", wdir)
    monkeypatch.setattr(fid, "_LPIPS_PARAMS", None)
    got = fid.try_lpips(a, b)
    assert got is not None and got > 0
    want = float(_torch_lpips(
        alexnet_sd, lin_sd,
        torch.from_numpy(a.transpose(2, 0, 1)[None]).float() / 127.5 - 1,
        torch.from_numpy(b.transpose(2, 0, 1)[None]).float() / 127.5 - 1,
    ).numpy()[0])
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)
    assert fid.try_lpips(a, a) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_CONTENTS),
                    reason="reference assets not mounted")
def test_model_gate_exits_nonzero_past_lpips_ceiling(tmp_path):
    """--model mode must exit 1 when LPIPS exceeds the ceiling: a saved
    tiny-config checkpoint runs the cat_dog case against the committed
    reference output with synthetic calibration weights and an impossible
    ceiling; the failure line must name LPIPS (PSNR/SSIM floors disabled,
    isolating the LPIPS leg of the gate)."""
    from pww_tpu.config import SDModelConfig
    from pww_tpu.pipeline.pipeline import PwwPipeline

    ckpt = tmp_path / "ckpt"
    PwwPipeline(config=SDModelConfig.tiny()).save_pretrained(str(ckpt))
    wdir, _, _ = _write_weight_files(tmp_path)

    env = dict(
        os.environ,
        PWW_LPIPS_WEIGHTS=wdir,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # skip TPU registration entirely
        PYTHONPATH=REPO,
    )
    cmd = [
        sys.executable, os.path.join(REPO, "benchmarks", "fidelity.py"),
        "--model", str(ckpt), "--only", "cat_dog", "--steps", "2",
        "--size", "128", "--reference-dir", REF_CONTENTS,
        "--psnr-floor", "-1", "--ssim-floor", "-1",
        "--lpips-ceiling", "0.000001",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=540,
                       env=env)
    out = r.stdout + r.stderr
    assert r.returncode == 1, out
    assert "LPIPS" in out and "ceiling" in out, out
    assert "fidelity gate FAILED" in out, out

    # --no-gate: same metrics, but reporting-only must exit 0
    r2 = subprocess.run(cmd + ["--no-gate"], capture_output=True, text=True,
                        timeout=540, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
