"""bench.py metadata helpers — no Spark session needed.

_next_round mis-numbered the detail file in r10 (the driver wrote
CORRECTNESS_r10.json BEFORE running bench, so the old
newest-correctness+1 rule produced BENCH_r11_local.json mid-round-10).
Pin the max-of-floors rule under BOTH driver write orders."""

from __future__ import annotations

import importlib.util
import os


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_next_round_bench_then_correctness(tmp_path):
    """Driver order A (r9 and earlier): bench runs first, so at bench
    time the newest artifacts are round N-1's."""
    bench = _load_bench()
    (tmp_path / "CORRECTNESS_r09.json").write_text("{}")
    (tmp_path / "BENCH_r09.json").write_text("{}")
    assert bench._next_round(str(tmp_path)) == 10


def test_next_round_correctness_then_bench(tmp_path):
    """Driver order B (observed in r10): correctness for the CURRENT
    round is already on disk when bench runs — the old +1 rule
    produced 11 here; the max-of-floors rule must say 10."""
    bench = _load_bench()
    (tmp_path / "CORRECTNESS_r10.json").write_text("{}")
    (tmp_path / "BENCH_r09.json").write_text("{}")
    assert bench._next_round(str(tmp_path)) == 10


def test_next_round_empty_repo(tmp_path):
    bench = _load_bench()
    assert bench._next_round(str(tmp_path)) == 1


def test_next_round_ignores_local_and_driver_detail_files(tmp_path):
    """Only CORRECTNESS_r{N}.json and BENCH_r{N}.json count —
    BENCH_r{N}_local.json (our own detail output) must not feed back
    into the round estimate, or every local run would inflate it."""
    bench = _load_bench()
    (tmp_path / "CORRECTNESS_r10.json").write_text("{}")
    (tmp_path / "BENCH_r10.json").write_text("{}")
    (tmp_path / "BENCH_r11_local.json").write_text("{}")
    (tmp_path / "BENCH_r10_driver_detail.json").write_text("{}")
    assert bench._next_round(str(tmp_path)) == 11
