#!/usr/bin/env python
"""Full-suite runner with per-group process isolation.

Full-suite runs (~330 tests, hundreds of XLA:CPU compiles in one process)
have intermittently segfaulted inside LLVM late in the run; every module
passes in isolation (see tests/conftest.py). Instead of relying on
``jax.clear_caches()`` ordering, the heavy modules run in their own pytest
processes and the remainder in one process — compiler state is bounded by
construction, and a crash in one group cannot take down the others' results.

Usage:
    python run_tests.py            # whole suite, grouped
    python run_tests.py -q -x ...  # extra args forwarded to every pytest
"""
import ast
import glob
import subprocess
import sys
import time


def lint_redefinitions() -> int:
    """F811-style check: a test function defined twice in one module silently
    shadows the first definition, so one written test never runs (this bit
    round 3 — duplicate test_negative_region_strength). AST walk over every
    test module; returns the number of shadowed top-level defs found."""
    bad = 0
    for path in sorted(glob.glob("tests/*.py")):
        tree = ast.parse(open(path).read(), filename=path)
        seen = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name in seen:
                    print(f"REDEFINITION: {path}:{node.lineno} {node.name} "
                          f"shadows definition at line {seen[node.name]}",
                          flush=True)
                    bad += 1
                seen[node.name] = node.lineno
    return bad

def lint_perf_defaults() -> int:
    """Cross-check PERF_DEFAULTS.md against pww_tpu/config.py.

    Round 4 shipped fused-norm kernels default-on against the repo's own
    A/B evidence and the official b1 scoreboard regressed 26-35%. This lint
    makes that structurally impossible: (1) every perf-named knob in
    UNetConfig/VAEConfig must have a row in PERF_DEFAULTS.md, (2) the row's
    stated default must equal the code's actual default, (3) the row's
    evidence cell must cite at least one file that exists. Returns the
    number of violations."""
    import re

    perf_name = re.compile(r"^(fused_|flash|xattn_|conv_)|^tome_ratio$")
    # knob defaults from config.py, keyed "Class.field"
    actual = {}
    tree = ast.parse(open("pww_tpu/config.py").read())
    for cls in tree.body:
        if not isinstance(cls, ast.ClassDef):
            continue
        for node in cls.body:
            if (isinstance(node, ast.AnnAssign) and node.value is not None
                    and isinstance(node.target, ast.Name)
                    and perf_name.search(node.target.id)):
                try:
                    val = ast.literal_eval(node.value)
                except ValueError:
                    continue  # non-literal default: not a simple knob
                actual[f"{cls.name}.{node.target.id}"] = val

    rows = {}  # "Class.field" -> (stated_default_str, evidence_cell)
    for line in open("PERF_DEFAULTS.md"):
        m = re.match(r"\|\s*`(\w+\.\w+)`\s*\|\s*`([^`]+)`[^|]*\|[^|]*\|"
                     r"([^|]*)\|", line)
        if m:
            rows[m.group(1)] = (m.group(2), m.group(3))

    bad = 0
    for key, val in sorted(actual.items()):
        if key not in rows:
            print(f"PERF_DEFAULTS: {key} (default {val!r}) has no evidence "
                  f"row in PERF_DEFAULTS.md", flush=True)
            bad += 1
            continue
        stated, evidence = rows[key]
        stated_norm = stated.strip().strip("\"'")
        if str(val).strip("\"'") != stated_norm:
            print(f"PERF_DEFAULTS: {key} stated default `{stated}` != "
                  f"actual {val!r} in config.py", flush=True)
            bad += 1
        cited = re.findall(r"(?:benchmarks|docs)/[\w.]+\.(?:json|md)",
                           evidence)
        if not cited:
            print(f"PERF_DEFAULTS: {key} evidence cell cites no artifact "
                  f"path", flush=True)
            bad += 1
        for path in cited:
            if not glob.glob(path):
                print(f"PERF_DEFAULTS: {key} cites missing artifact {path}",
                      flush=True)
                bad += 1
    for key in rows:
        if key not in actual:
            print(f"PERF_DEFAULTS: row {key} has no matching perf knob in "
                  f"config.py (renamed or removed?)", flush=True)
            bad += 1
    return bad


# Modules with the largest XLA program counts (many pipeline/jit variants):
# each gets its own interpreter so LLVM state never accumulates across them.
HEAVY = [
    "tests/test_pipeline.py",
    "tests/test_sharding.py",
    "tests/test_sdxl.py",
    "tests/test_serving.py",
    "tests/test_batch_img2img.py",
    "tests/test_sd2.py",
    "tests/test_ip_adapter.py",
    "tests/test_fidelity_harness.py",
    "tests/test_schedulers.py",
]


def main() -> int:
    extra = sys.argv[1:] or ["-q"]
    if lint_redefinitions():
        print("redefinition lint FAILED", flush=True)
        return 2
    if lint_perf_defaults():
        print("perf-defaults lint FAILED (see PERF_DEFAULTS.md rules)",
              flush=True)
        return 2
    groups = [["tests/", *(f"--ignore={m}" for m in HEAVY)]]
    groups += [[m] for m in HEAVY]

    rc = 0
    t_all = time.time()
    for g in groups:
        label = g[0] if len(g) == 1 else "tests/ (light modules)"
        t0 = time.time()
        print(f"=== {label} ===", flush=True)
        r = subprocess.run([sys.executable, "-m", "pytest", *g, *extra])
        print(f"=== {label}: rc={r.returncode} in {time.time()-t0:.0f}s ===",
              flush=True)
        rc = rc or r.returncode
    print(f"total: {time.time()-t_all:.0f}s  overall rc={rc}", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
