"""Gap interpolation vs in-core numpy oracle (reference utils.py:459-528
semantics: fill interior gaps ≤ max_gap_size, linear interp, truncate to
storage dtype; larger gaps untouched)."""

from __future__ import annotations

import numpy as np
import pytest

from jagular_spark.operators import interpolate_gaps


def _df(spark, ts, vals, channel=0):
    rows = [(channel, int(t), int(v)) for t, v in zip(ts, vals)]
    return spark.createDataFrame(rows, "channel_id int, ts long, value short")


def _oracle(ts, vals, max_gap, step=1):
    ts = np.asarray(ts)
    vals = np.asarray(vals, dtype=np.float64)
    out_ts, out_v = list(ts), list(vals.astype(np.int16))
    for i in range(len(ts) - 1):
        n_missing = (ts[i + 1] - ts[i]) // step - 1
        if 1 <= n_missing <= max_gap:
            new_ts = np.arange(ts[i] + step, ts[i + 1], step)
            new_v = np.interp(new_ts, [ts[i], ts[i + 1]], [vals[i], vals[i + 1]]).astype(np.int16)
            out_ts.extend(new_ts.tolist())
            out_v.extend(new_v.tolist())
    order = np.argsort(out_ts)
    return [int(out_ts[i]) for i in order], [int(out_v[i]) for i in order]


@pytest.mark.parametrize("num_partitions", [1, 4, 13])
def test_interpolation_matches_oracle(spark, num_partitions):
    # gaps: 2-missing (fill), exactly max_gap=5 missing (fill, inclusive
    # boundary utils.py:463), 9-missing (too big, skip)
    ts = [0, 1, 2, 5, 6, 12, 13, 23, 24, 25]
    vals = [10, 20, 30, 60, 70, 100, -50, -80, 0, 5]
    df = _df(spark, ts, vals)
    out = interpolate_gaps(
        df, value_cols=["value"], max_gap_size=5, step=1,
        partition_cols=["channel_id"], num_partitions=num_partitions,
    ).orderBy("ts").collect()
    ots, ovs = _oracle(ts, vals, max_gap=5)
    assert [r.ts for r in out] == ots
    assert [r.value for r in out] == ovs
    # the 9-missing gap 13→23 must NOT be filled
    assert 14 not in [r.ts for r in out]


def test_interpolation_across_partition_boundary(spark):
    # small gap that lands on a partition boundary when n_partitions high:
    # every partitioning must produce identical output (edge-row pass).
    ts = list(range(0, 50)) + list(range(53, 100))  # gap 50,51,52 (3 missing)
    vals = list(range(0, 50)) + list(range(153, 200))
    df = _df(spark, ts, vals)
    outs = []
    for n in (1, 8, 25):
        out = interpolate_gaps(
            df, value_cols=["value"], max_gap_size=3, step=1,
            partition_cols=["channel_id"], num_partitions=n,
        ).orderBy("ts").collect()
        outs.append([(r.ts, r.value) for r in out])
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 100  # all filled
    ots, ovs = _oracle(ts, vals, max_gap=3)
    assert outs[0] == list(zip(ots, ovs))


def test_interpolation_multi_column(spark):
    rows = [(0, 0, 0, 0.0), (0, 4, 40, 4.0)]
    df = spark.createDataFrame(rows, "channel_id int, ts long, a short, b double")
    out = interpolate_gaps(
        df, value_cols=["a", "b"], max_gap_size=3, step=1, partition_cols=["channel_id"]
    ).orderBy("ts").collect()
    assert [(r.ts, r.a, r.b) for r in out] == [
        (0, 0, 0.0), (1, 10, 1.0), (2, 20, 2.0), (3, 30, 3.0), (4, 40, 4.0)
    ]


def test_no_interpolation_when_disabled(spark):
    df = _df(spark, [0, 10], [0, 100])
    out = interpolate_gaps(df, value_cols=["value"], max_gap_size=0)
    assert out.count() == 2
