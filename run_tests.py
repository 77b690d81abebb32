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
