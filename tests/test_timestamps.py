"""Timestamp hygiene ops vs in-core numpy oracles (SURVEY §5 plan #1-#3).

Oracle logic is the reference *algorithm* re-run in-core (sorted numpy
arrays), including the doctest vector from ``jagular/utils.py:145-149``.
"""

from __future__ import annotations

import numpy as np
import pytest

from jagular_spark.operators import (
    check_timestamps,
    contiguous_segments,
    dedup_keep_first,
    duplicate_timestamps,
    gap_lengths,
    infer_step,
    is_sorted,
)


def _samples_df(spark, ts, values=None, channel=0):
    values = values if values is not None else np.zeros(len(ts), dtype=np.int16)
    rows = [
        (int(channel), int(i), int(t), int(v))
        for i, (t, v) in enumerate(zip(ts, values))
    ]
    return spark.createDataFrame(rows, "channel_id int, packet_idx long, ts long, value short")


def _oracle_segments(ts, step=1, gap_factor=2.0):
    """Reference semantics in-core: break where diff >= gap_factor*step;
    stop exclusive = last + step (utils.py:124-248)."""
    ts = np.sort(np.asarray(ts))
    brk = np.flatnonzero(np.diff(ts) >= gap_factor * step)
    starts = np.concatenate(([0], brk + 1))
    stops = np.concatenate((brk, [len(ts) - 1]))
    return [(int(ts[a]), int(ts[b]) + step) for a, b in zip(starts, stops)]


def test_segments_doctest_vector(spark):
    # utils.py:145-149: [1,2,3,4,10,11,12] -> [[1,5],[10,13]]
    df = _samples_df(spark, [1, 2, 3, 4, 10, 11, 12])
    segs = contiguous_segments(df, step=1).orderBy("segment_id").collect()
    assert [(r.ts_start, r.ts_stop) for r in segs] == [(1, 5), (10, 13)]
    assert [r.n_samples for r in segs] == [4, 3]


@pytest.mark.parametrize("num_partitions", [1, 3, 16])
def test_segments_match_oracle_across_partitionings(spark, num_partitions):
    rng = np.random.default_rng(7)
    # contiguous runs with gaps of varied sizes
    ts, cur = [], 100
    for _ in range(40):
        run = int(rng.integers(5, 200))
        ts.extend(range(cur, cur + run))
        cur += run + int(rng.integers(1, 50))  # gap of 1..49 (gap>=2 splits)
    df = _samples_df(spark, ts)
    got = [
        (r.ts_start, r.ts_stop)
        for r in contiguous_segments(df, step=1, num_partitions=num_partitions)
        .orderBy("segment_id")
        .collect()
    ]
    assert got == _oracle_segments(ts)


def test_segments_partitioned_by_channel(spark):
    df1 = _samples_df(spark, [1, 2, 3, 10, 11], channel=0)
    df2 = _samples_df(spark, [5, 6, 7], channel=1)
    df = df1.unionByName(df2)
    for strategy in ("window", "range"):
        segs = contiguous_segments(df, step=1, partition_cols=["channel_id"], strategy=strategy)
        got = {
            (r.channel_id, r.segment_id): (r.ts_start, r.ts_stop)
            for r in segs.collect()
        }
        assert got == {(0, 0): (1, 4), (0, 1): (10, 12), (1, 0): (5, 8)}, strategy


def test_gap_lengths(spark):
    df = _samples_df(spark, [1, 2, 3, 4, 10, 11, 12, 30])
    segs = contiguous_segments(df, step=1)
    gaps = gap_lengths(segs).orderBy("gap_start").collect()
    # segments [1,5) [10,13) [30,31): gaps 5..10 (5), 13..30 (17)
    assert [(r.gap_start, r.gap_stop, r.gap_len) for r in gaps] == [(5, 10, 5), (13, 30, 17)]


def test_dedup_keep_first(spark):
    # duplicate ts=5: first occurrence (packet_idx order) keeps value 100
    rows = [(0, 0, 4, 1), (0, 1, 5, 100), (0, 2, 5, 200), (0, 3, 6, 3)]
    df = spark.createDataFrame(rows, "channel_id int, packet_idx long, ts long, value short")
    out = dedup_keep_first(df, tiebreak_cols=["packet_idx"], partition_cols=["channel_id"])
    got = {(r.ts): r.value for r in out.collect()}
    assert got == {4: 1, 5: 100, 6: 3}
    dups = duplicate_timestamps(df, tiebreak_cols=["packet_idx"], partition_cols=["channel_id"]).collect()
    assert [(r.ts, r.value) for r in dups] == [(5, 200)]


def test_is_sorted(spark):
    df = _samples_df(spark, [1, 2, 3, 4, 5])
    assert is_sorted(df, order_cols=["packet_idx"])
    df2 = _samples_df(spark, [1, 2, 9, 4, 5])  # decreases w.r.t. packet order
    assert not is_sorted(df2, order_cols=["packet_idx"])


def test_check_timestamps_audit(spark):
    rows = [(0, 0, 4, 1), (0, 1, 5, 2), (0, 2, 5, 3)]
    df = spark.createDataFrame(rows, "channel_id int, packet_idx long, ts long, value short")
    audit = check_timestamps(df, partition_cols=["channel_id"]).collect()[0]
    assert audit.n == 3 and audit.n_distinct == 2 and audit.has_duplicates
    assert audit.ts_min == 4 and audit.ts_max == 5


def test_infer_step(spark):
    df = _samples_df(spark, list(range(0, 1000, 3)))
    step = infer_step(df, exact=True).collect()[0].step
    assert step == 3.0
