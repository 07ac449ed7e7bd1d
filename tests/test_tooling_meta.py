"""Tool/doc hygiene pins (r13) — no Spark session needed.

Covers the r12/r13 advisor findings:
- tools/scale_probe.py shipped its ``__main__`` guard ABOVE
  probe_streaming, so the documented CLI died with NameError after the
  batch probes and the streaming curves never ran via the CLI.
- mpeg1 _mc_block accepted malformed motion vectors: negative window
  starts wrap under numpy slicing (silent garbage decode), far-positive
  ones raise an opaque broadcast ValueError.
- README hard-coded a query count (130) that drifted from the registry
  (131) in the same document.
- check_oracles --batched: a chunk killed mid-run (OOM) must report the
  queries it never reached as explicit failures, not silently omit
  them (judge r12 'What's missing' #1b).
"""

from __future__ import annotations

import ast
import importlib.util
import os
import re

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- scale_probe


def test_scale_probe_entry_point_is_last_statement():
    """The ``if __name__`` guard must be the final top-level statement
    so every function main() calls is already bound when it fires —
    r12 shipped it above probe_streaming and `python tools/scale_probe.py`
    raised NameError mid-run, skipping the streaming curves AND the
    cleanup code below the call."""
    src = open(os.path.join(ROOT, "tools", "scale_probe.py")).read()
    tree = ast.parse(src)
    guards = [
        i
        for i, node in enumerate(tree.body)
        if isinstance(node, ast.If)
        and isinstance(node.test, ast.Compare)
        and isinstance(node.test.left, ast.Name)
        and node.test.left.id == "__name__"
    ]
    assert guards, "scale_probe.py lost its __main__ guard"
    assert guards[-1] == len(tree.body) - 1, (
        "__main__ guard is not the last top-level statement — functions "
        "defined below it are unbound when main() runs"
    )


def test_scale_probe_main_callees_resolve():
    """Every bare-name function main() calls must exist at module
    level (the import-time analog of actually running the CLI)."""
    mod = _load(os.path.join(ROOT, "tools", "scale_probe.py"), "scale_probe_ut")
    src = open(os.path.join(ROOT, "tools", "scale_probe.py")).read()
    tree = ast.parse(src)
    main_def = next(
        n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    callees = {
        n.func.id
        for n in ast.walk(main_def)
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Name)
    }
    import builtins

    missing = [
        c for c in sorted(callees) if not hasattr(mod, c) and not hasattr(builtins, c)
    ]
    assert not missing, f"main() calls unresolvable names: {missing}"


# ------------------------------------------------------------- mpeg1 bounds


def test_mc_block_rejects_out_of_picture_vectors():
    from jagular_spark.operators.mpeg1 import _mc_block

    ref = np.arange(32 * 32, dtype=np.int64).reshape(32, 32)
    # in-bounds full-pel vector: plain slice copy
    got = _mc_block(ref, 0, 0, 4, 4, 16)  # half-pel (4,4) = full-pel (2,2)
    assert np.array_equal(got, ref[2:18, 2:18])
    # negative start (would silently wrap to the bottom of the plane)
    with pytest.raises(ValueError, match="motion vector outside picture"):
        _mc_block(ref, 0, 0, -4, 0, 16)
    with pytest.raises(ValueError, match="motion vector outside picture"):
        _mc_block(ref, 0, 0, 0, -4, 16)
    # far-positive start (previously an opaque broadcast ValueError)
    with pytest.raises(ValueError, match="motion vector outside picture"):
        _mc_block(ref, 16, 16, 40, 0, 16)
    # half-pel tap needs ONE extra sample: block at the right edge with
    # hx=1 reads column 32 — out of a 32-wide plane
    with pytest.raises(ValueError, match="motion vector outside picture"):
        _mc_block(ref, 0, 16, 0, 1, 16)
    # ...but the same half-pel vector away from the edge is fine
    half = _mc_block(ref, 0, 0, 0, 1, 16)
    assert half.shape == (16, 16)
    assert np.array_equal(half, (ref[0:16, 0:16] + ref[0:16, 1:17] + 1) >> 1)


# ---------------------------------------------------------------- README


def test_readme_query_counts_match_registry():
    """Any 'N-query registry' / 'the N driver-checked queries' claim in
    README must equal len(SPARK_QUERIES) — r12 shipped 130 on line 38
    and 131 on line 61 of the same file."""
    from jagular_spark.workloads import SPARK_QUERIES

    text = open(os.path.join(ROOT, "README.md")).read()
    claims = [
        int(m)
        for m in re.findall(r"(\d+)-query registry", text)
        + re.findall(r"the (\d+) driver-checked queries", text)
        + re.findall(r"(\d+)/\1\b", text)  # 'N/N' full-sweep claims
    ]
    assert claims, "README no longer states the registry size anywhere"
    wrong = [c for c in claims if c != len(SPARK_QUERIES)]
    assert not wrong, (
        f"README claims registry size(s) {sorted(set(wrong))} but "
        f"len(SPARK_QUERIES) == {len(SPARK_QUERIES)}"
    )


# --------------------------------------------- check_oracles killed chunk


def test_batched_reports_unreached_queries_as_failures(monkeypatch, capsys):
    """Simulate a chunk OOM-killed mid-run: subprocess stdout carries a
    status line for only the FIRST query. _run_batched must (a) print
    an explicit 'not executed' FAIL for every unreached query, (b) echo
    the chunk's stderr tail, (c) exit nonzero."""
    co = _load(os.path.join(ROOT, "tools", "check_oracles.py"), "check_oracles_ut")
    names = list(co.SPARK_QUERIES)[:3]

    class FakeResult:
        def __init__(self):
            self.stdout = f"OK   {names[0]}: rows=5\n"
            self.stderr = "java.lang.OutOfMemoryError: boom\nKilled\n"
            self.returncode = -9

    import subprocess

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: FakeResult())
    rc = co._run_batched("/nonexistent", set(names))
    out = capsys.readouterr().out
    assert rc == 1
    for name in names[1:]:
        assert f"FAIL {name}: not executed" in out, name
    assert f"OK   {names[0]}" in out
    assert "stderr tail" in out and "Killed" in out


# ------------------------------------------------------------ registry shape


def test_every_query_has_an_oracle_and_no_orphans():
    """The correctness gate is only as wide as the oracle map: every
    SPARK_QUERIES entry must have an ORACLE_SQL twin (the driver
    records a weaker rows-only check otherwise — this registry has
    kept full coverage since r6 and a silent omission would look like
    a pass), and every oracle must correspond to a registered query
    (an orphan oracle is dead certification)."""
    from jagular_spark.workloads import ORACLE_SQL, SPARK_QUERIES

    missing = set(SPARK_QUERIES) - set(ORACLE_SQL)
    orphans = set(ORACLE_SQL) - set(SPARK_QUERIES)
    assert not missing, f"queries without oracles: {sorted(missing)}"
    assert not orphans, f"oracles without queries: {sorted(orphans)}"


def test_round_touched_queries_are_registered_and_windowed():
    """ROUND_TOUCHED names must exist in the registry (rotation raises
    on unknowns, but only when the tool runs) and sit inside the
    driver's 50-query window — changed code whose query the driver
    cannot see this round would carry a stale green."""
    from jagular_spark.rotation import WINDOW_SIZE
    from jagular_spark.workloads import ROUND_TOUCHED, SPARK_QUERIES

    names = list(SPARK_QUERIES)
    window = set(names[:WINDOW_SIZE])
    assert ROUND_TOUCHED <= set(names)
    assert ROUND_TOUCHED <= window, sorted(ROUND_TOUCHED - window)
