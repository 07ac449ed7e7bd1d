"""shuffle_width: the shared parallelism lookup tolerates non-numeric
spark.sql.shuffle.partitions values ("auto" under Databricks AQE
conventions) by falling back to defaultParallelism, at every call site
that hashes by it (codec spread, repeated_kgram_spans).

OSS Spark 4 validates the conf as an int at set() time, so the "auto"
deployment is simulated by patching the RuntimeConfig getter — the
exact read path shuffle_width uses."""

from __future__ import annotations

import pytest

from jagular_spark.session import shuffle_width


@pytest.fixture()
def auto_conf(spark, monkeypatch):
    real_get = spark.conf.get

    _unset = object()

    def fake_get(key, default=_unset):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        if default is _unset:
            return real_get(key)
        return real_get(key, default)

    monkeypatch.setattr(spark.conf, "get", fake_get)
    yield spark


def test_shuffle_width_numeric(spark):
    assert shuffle_width(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_shuffle_width_auto_falls_back(auto_conf):
    assert shuffle_width(auto_conf) == auto_conf.sparkContext.defaultParallelism


def test_repeated_kgram_spans_builds_under_auto(auto_conf):
    # r11 verdict finding #2: text.py had a raw int(conf.get(...)) that
    # raised ValueError at plan-build time under "auto". Pin that the
    # plan now builds AND executes.
    from jagular_spark.operators.text import repeated_kgram_spans

    df = auto_conf.createDataFrame(
        [(1, "a b c d e a b c d e"), (2, "a b c d e x y z w v")],
        ["doc_id", "text"],
    )
    out = repeated_kgram_spans(df, k=4, min_count=2).collect()
    assert len(out) > 0


def test_codec_spread_builds_under_auto(auto_conf):
    from jagular_spark.workloads import _codec_spread

    df = auto_conf.createDataFrame([(1, b"x"), (2, b"y")], ["media_id", "payload"])
    assert _codec_spread(df).count() == 2
