"""asof_join vs pandas merge_asof (an independent reference
implementation), plus tolerance and partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd

from jagular_spark.operators.asof import asof_join


def _frames(seed=7, n_left=200, n_right=80, n_keys=5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": rng.integers(0, 1000, n_left),
            "lv": rng.normal(size=n_left),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, n_keys, n_right),
                "ts": rng.integers(0, 1000, n_right),
                "rv": rng.normal(size=n_right),
            }
        )
        .drop_duplicates(["k", "ts"])  # deterministic: unique (key, ts)
        .reset_index(drop=True)
    )
    left["lid"] = np.arange(n_left)
    return left, right


def _want(left, right, tolerance=None):
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    m = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
        suffixes=("", "_r"),
        **kw,
    )
    return {
        (int(r.lid), None if pd.isna(r.rv) else round(float(r.rv), 9))
        for r in m.itertuples(index=False)
    }


def test_asof_join_matches_pandas_merge_asof(spark):
    left, right = _frames()
    ldf = spark.createDataFrame(left[["k", "ts", "lv", "lid"]])
    rdf = spark.createDataFrame(right)
    out = asof_join(ldf, rdf, on=["k"], ts_col="ts", right_cols=("rv",)).collect()
    got = {
        (int(r.lid), None if r.rv_asof is None else round(float(r.rv_asof), 9))
        for r in out
    }
    assert got == _want(left, right)
    assert len(got) == len(left)  # left join: every left row survives


def test_asof_join_tolerance(spark):
    left, right = _frames(seed=9)
    ldf = spark.createDataFrame(left[["k", "ts", "lv", "lid"]])
    rdf = spark.createDataFrame(right)
    out = asof_join(
        ldf, rdf, on=["k"], ts_col="ts", right_cols=("rv",), tolerance=50
    ).collect()
    got = {
        (int(r.lid), None if r.rv_asof is None else round(float(r.rv_asof), 9))
        for r in out
    }
    assert got == _want(left, right, tolerance=50)


def test_asof_join_null_payload_stays_synchronized(spark):
    """A right row whose PAYLOAD is NULL is still the as-of match: the
    matched ts and every payload column must come from that same row
    (per-column last(ignorenulls) carries would resurrect an older
    row's value under the newer row's timestamp)."""
    ldf = spark.createDataFrame(
        [(1, 100, 0), (1, 250, 1)], "k int, ts long, lid int"
    )
    rdf = spark.createDataFrame(
        [(1, 50, 7.0), (1, 200, None)], "k int, ts long, rv double"
    )
    rows = {
        r.lid: (r.ts_asof, r.rv_asof)
        for r in asof_join(ldf, rdf, on=["k"], ts_col="ts", right_cols=("rv",)).collect()
    }
    assert rows[0] == (50, 7.0)
    # the ts=200 NULL-payload row IS the match: rv must be NULL, not 7.0
    assert rows[1] == (200, None)
    # pandas agrees
    left = pd.DataFrame({"k": [1, 1], "ts": [100, 250], "lid": [0, 1]})
    right = pd.DataFrame({"k": [1, 1], "ts": [50, 200], "rv": [7.0, None]})
    m = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k"
    ).set_index("lid")
    assert m.loc[0, "rv"] == 7.0 and pd.isna(m.loc[1, "rv"])


def test_asof_join_partition_invariance(spark):
    left, right = _frames(seed=11)
    ldf = spark.createDataFrame(left[["k", "ts", "lv", "lid"]])
    rdf = spark.createDataFrame(right)
    a = sorted(map(tuple, asof_join(ldf, rdf, on=["k"], ts_col="ts", right_cols=("rv",)).collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                ldf.repartition(13), rdf.repartition(3), on=["k"], ts_col="ts", right_cols=("rv",)
            ).collect(),
        )
    )
    assert a == b


def test_asof_forward_and_nearest_match_pandas(spark):
    """forward/nearest directions against pandas merge_asof on random
    keyed timelines, with and without tolerance, including NULL right
    payloads (the struct carry must keep ts/payload from one row)."""
    import numpy as np
    import pandas as pd

    from jagular_spark.operators.asof import asof_join

    rng = np.random.default_rng(13)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 60),
            "ts": rng.integers(0, 200, 60),
            "lv": np.arange(60),
        }
    ).drop_duplicates(["k", "ts"])
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 40),
            "ts": rng.integers(0, 200, 40),
            "value": rng.normal(size=40).round(3),
        }
    ).drop_duplicates(["k", "ts"])
    right.loc[right.index[::7], "value"] = None  # NULL payloads

    ldf = spark.createDataFrame(left.astype({"k": "int64", "ts": "int64"}))
    rdf = spark.createDataFrame(right.astype({"k": "int64", "ts": "int64"}))

    for direction in ("forward", "nearest"):
        for tol in (None, 15):
            got = {
                (r.k, r.ts): (r.ts_asof, r.value_asof)
                for r in asof_join(
                    ldf, rdf, on=["k"], right_cols=["value"],
                    tolerance=tol, direction=direction,
                ).collect()
            }
            kw = {} if tol is None else {"tolerance": tol}
            want_df = pd.merge_asof(
                left.sort_values("ts"),
                right.sort_values("ts").rename(columns={"ts": "rts"}),
                left_on="ts", right_on="rts", by="k",
                direction=direction, **kw,
            )
            for row in want_df.itertuples(index=False):
                w_ts = None if pd.isna(row.rts) else int(row.rts)
                w_v = None if (pd.isna(row.value) if row.value is not None else True) else row.value
                g_ts, g_v = got[(row.k, row.ts)]
                assert g_ts == w_ts, (direction, tol, row.k, row.ts, g_ts, w_ts)
                # when the matched right row carried a NULL payload the
                # engine must still report THAT row's ts with NULL value
                if w_ts is not None and not pd.isna(row.value):
                    assert g_v == row.value
