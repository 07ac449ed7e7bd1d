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


def test_drift_vs_previous_common_set_and_top_deltas(tmp_path):
    """r12 verdict task #5: the drift block must compare only the
    common query set (new queries excluded from the ratio), pick the
    newest EARLIER round's _local detail as reference, and rank the
    top increases."""
    import json

    bench = _load_bench()
    (tmp_path / "BENCH_r11_local.json").write_text(
        json.dumps({"queries": {"a": 1.0, "b": 2.0, "c": 3.0, "gone": 9.9}})
    )
    # an even older file must NOT win; a same/later-round file must be
    # ignored (a same-round rerun would compare a run to itself)
    (tmp_path / "BENCH_r09_local.json").write_text(
        json.dumps({"queries": {"a": 99.0}})
    )
    (tmp_path / "BENCH_r13_local.json").write_text(
        json.dumps({"queries": {"a": 0.0}})
    )
    timings = {"a": 1.1, "b": 4.0, "c": 2.5, "new_query": 7.0, "err": None}
    d = bench._drift_vs_previous(str(tmp_path), 13, timings)
    assert d["reference_file"] == "BENCH_r11_local.json"
    assert d["n_common"] == 3 and d["n_new"] == 1
    assert d["common_total_prev_s"] == 6.0
    assert d["common_total_now_s"] == 7.6
    assert d["top_deltas"][0]["query"] == "b"  # +2.0, the largest increase
    assert d["top_deltas"][0]["ratio"] == 2.0


def test_drift_vs_previous_no_reference(tmp_path):
    bench = _load_bench()
    assert bench._drift_vs_previous(str(tmp_path), 13, {"a": 1.0}) is None


def test_cold_block_counts_material_recoveries_only():
    """r13 verdict task #6: the artifact must carry per-query
    run1-minus-best and a count of MATERIAL cold recoveries — both the
    ratio bound (>1.5x) and the absolute bound (>=0.5 s) must hold, so
    neither tiny-query blips nor sub-noise deltas on long queries count."""
    bench = _load_bench()
    env = {
        # material cold start: run1 12.2 s, best 5.8 s (the measured
        # first-stateful-stream shape)
        "lsh_streamed": {"run1_s": 12.2, "run2_s": 5.8},
        # ratio trips but absolute delta is sub-noise: NOT cold
        "tiny": {"run1_s": 0.3, "run2_s": 0.1},
        # absolute delta trips but ratio does not (noise on a long
        # query): NOT cold
        "long": {"run1_s": 10.6, "run2_s": 10.0},
        # rerun did not help at all
        "flat": {"run1_s": 3.0, "run2_s": 3.2},
        # non-query env entries must be ignored
        "calibration_start": {"matmul_512_ms": 5.0},
    }
    timings = {"lsh_streamed": 5.8, "tiny": 0.1, "long": 10.0, "flat": 3.0}
    cold = bench._cold_block(env, timings)
    assert cold["n_cold_recovered"] == 1
    assert cold["run1_minus_best_s"]["lsh_streamed"] == 6.4
    assert cold["run1_minus_best_s"]["tiny"] == 0.2
    assert cold["run1_minus_best_s"]["long"] == 0.6
    assert cold["run1_minus_best_s"]["flat"] == 0.0
    assert "calibration_start" not in cold["run1_minus_best_s"]


def test_cold_block_uses_cross_pass_best():
    """timings holds the best across passes; a query whose best came
    from ANOTHER pass still gets its delta measured against that best."""
    bench = _load_bench()
    cold = bench._cold_block({"q": {"run1_s": 4.0}}, {"q": 1.0})
    assert cold["run1_minus_best_s"]["q"] == 3.0
    assert cold["n_cold_recovered"] == 1


def test_drift_vs_previous_skips_other_sf(tmp_path):
    """An sf0.001 smoke run must not 'drift' against the sf0.1 record —
    it walks back to the newest earlier round at the SAME sf."""
    import json

    bench = _load_bench()
    (tmp_path / "BENCH_r12_local.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 5.0}})
    )
    (tmp_path / "BENCH_r11_local.json").write_text(
        json.dumps({"sf": 0.001, "queries": {"a": 1.0}})
    )
    d = bench._drift_vs_previous(str(tmp_path), 13, {"a": 1.2}, sf=0.001)
    assert d["reference_file"] == "BENCH_r11_local.json"
    d2 = bench._drift_vs_previous(str(tmp_path), 13, {"a": 5.2}, sf=0.1)
    assert d2["reference_file"] == "BENCH_r12_local.json"


def test_prev_timings_loader_and_drift_rerun_threshold(tmp_path):
    """r15: _prev_timings feeds the drift-triggered rerun thresholds —
    it must pick the newest earlier round AT THE SAME sf, ignore
    same-round files, and return (None, None) with no reference (so
    the rerun rule degrades to RERUN_ABOVE-only). The threshold rule
    itself (>1.5x prior + 0.3 s floor) is pinned arithmetically here
    since it lives in a main() closure."""
    import json

    bench = _load_bench()
    (tmp_path / "BENCH_r14_local.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 0.86, "b": None}})
    )
    (tmp_path / "BENCH_r15_local.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 99.0}})
    )
    name, prev = bench._prev_timings(str(tmp_path), 15, sf=0.1)
    assert name == "BENCH_r14_local.json" and prev == {"a": 0.86, "b": None}
    assert bench._prev_timings(str(tmp_path), 15, sf=0.001) == (None, None)
    assert bench._prev_timings(str(tmp_path), 14, sf=0.1) == (None, None)

    def drifted(name, dt, prev_t=prev):
        p = prev_t.get(name)
        return isinstance(p, (int, float)) and dt > 1.5 * p + 0.3

    assert drifted("a", 2.09)       # the r14 adpcm case recovers
    assert not drifted("a", 1.5)    # inside 1.5x + floor
    assert not drifted("b", 50.0)   # prior errored -> no threshold
    assert not drifted("c", 50.0)   # no prior at all


def test_rerun_verdict_classification():
    """r17 verdict task #3: each drift top-delta row carries the rerun
    evidence + a verdict so 'cold tail or genuinely slow?' is answered
    by the artifact instead of re-litigated per round."""
    bench = _load_bench()
    v = bench._rerun_verdict

    # no rerun record -> single measurement, nothing to attribute
    assert v(None, 3.0) == {"verdict": "single_run"}
    assert v({}, 3.0) == {"verdict": "single_run"}
    # reruns recovered a material cold start (both _cold_block bounds)
    assert (
        v({"run1_s": 5.0, "run2_s": 2.0, "run2_steal_ticks": 3}, 2.0)["verdict"]
        == "cold_tail"
    )
    # reruns stayed slow but the measurement hit hypervisor steal
    assert (
        v({"run1_s": 5.0, "run2_s": 4.9, "run2_steal_ticks": 400}, 4.9)[
            "verdict"
        ]
        == "steal_hit"
    )
    # rerun within 15% of run1, low steal: genuinely slow in this window
    r = v({"run1_s": 5.0, "run2_s": 4.8, "run2_steal_ticks": 3}, 4.8)
    assert r["verdict"] == "run2_stable"
    assert r["run1_s"] == 5.0 and r["run2_s"] == 4.8  # evidence rides along
    # partial recovery below the cold bounds
    assert (
        v({"run1_s": 2.0, "run2_s": 1.6, "run2_steal_ticks": 3}, 1.6)["verdict"]
        == "rerun_minor_recovery"
    )


def test_drift_top_deltas_carry_rerun_verdict(tmp_path):
    import json

    bench = _load_bench()
    (tmp_path / "BENCH_r11_local.json").write_text(
        json.dumps({"queries": {"a": 1.0, "b": 2.0}})
    )
    env = {"b": {"run1_s": 4.1, "run2_s": 4.0, "run2_steal_ticks": 2}}
    d = bench._drift_vs_previous(
        str(tmp_path), 13, {"a": 1.0, "b": 4.0}, env=env
    )
    rows = {r["query"]: r for r in d["top_deltas"]}
    assert rows["b"]["verdict"] == "run2_stable"
    assert rows["a"]["verdict"] == "single_run"
