"""Native jagular_rec Python data source: parity with the helper scan
on the reference's own .rec fixtures, and optimizer-driven file
pruning BEFORE the scan (the SURVEY §4 DataSourceV2 promotion)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from jagular_spark.sources.rec import read_config, read_packets
from jagular_spark.sources.rec_datasource import JagularRecReader, register

SAMPLES = sorted(glob.glob("/root/reference/sample_data/*.rec"))


def _load(spark, **opts):
    register(spark)
    r = spark.read.format("jagular_rec")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_native_source_matches_helper_scan(spark):
    got = sorted(
        map(tuple, _load(spark, path=",".join(SAMPLES)).collect())
    )
    want = sorted(map(tuple, read_packets(spark, SAMPLES).collect()))
    assert got == want and len(got) > 0


def test_native_source_channel_projection(spark):
    df = _load(spark, path=SAMPLES[0], channels="3,0")
    rows = df.limit(5).collect()
    full = read_packets(spark, [SAMPLES[0]], channels=[3, 0]).limit(5).collect()
    assert [r.channels for r in rows] == [r.channels for r in full]
    assert all(len(r.channels) == 2 for r in rows)


def test_catalyst_filter_prunes_files_before_scan(spark):
    """A ts predicate written as a plain DataFrame filter must reach
    pushFilters and drop whole files at PLANNING time: with a bound
    beyond file 1's ts_stop, the planned partition count shrinks to
    the later files' splits — observed on the reader itself — and the
    query result still matches the helper scan exactly."""
    from pyspark.sql.datasource import GreaterThanOrEqual

    cfg = read_config(SAMPLES[0])
    from jagular_spark.sources.rec import _bounds_one

    bounds = [_bounds_one(p, cfg) for p in SAMPLES]
    cut = bounds[0][1] + 1  # past file 0's last ts

    # 1. planning-level proof: pushFilters -> fewer partitions
    r_all = JagularRecReader({"path": ",".join(SAMPLES)})
    n_all = len(r_all.partitions())
    r_cut = JagularRecReader({"path": ",".join(SAMPLES)})
    unhandled = list(r_cut.pushFilters([GreaterThanOrEqual(("ts",), cut)]))
    assert len(unhandled) == 1  # all filters handed back for exact re-apply
    n_cut = len(r_cut.partitions())
    assert n_cut < n_all, (n_cut, n_all)
    pruned_paths = {p.path for p in r_cut.partitions()}
    assert SAMPLES[0] not in pruned_paths

    # 2. end-to-end through Catalyst: same rows as the helper's pruned
    # read (session enables spark.sql.python.filterPushdown.enabled)
    got = sorted(
        map(
            tuple,
            _load(spark, path=",".join(SAMPLES)).where(F.col("ts") >= cut).collect(),
        )
    )
    want = sorted(
        map(tuple, read_packets(spark, SAMPLES, ts_start=cut).collect())
    )
    assert got == want and len(got) > 0


def test_explicit_bounds_option_fallback(spark):
    """ts_start/ts_stop options prune without relying on the pushdown
    config — the vanilla-session fallback path."""
    cfg = read_config(SAMPLES[0])
    from jagular_spark.sources.rec import _bounds_one

    lo, hi, _ = _bounds_one(SAMPLES[2], cfg)
    got = sorted(
        map(
            tuple,
            _load(spark, path=",".join(SAMPLES), ts_start=lo, ts_stop=hi)
            .where((F.col("ts") >= lo) & (F.col("ts") <= hi))
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            read_packets(spark, SAMPLES, ts_start=lo, ts_stop=hi).collect(),
        )
    )
    assert got == want and len(got) > 0
