"""U1/U2/U4 utility surface (reference jagular/utils.py:17-36,552-675)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from jagular_spark.functions import frange, pairwise, pretty_bytes, pretty_duration, pretty_int


def test_frange_linspace_semantics(spark):
    # reference: np.linspace(start, stop, floor((stop-start)/step), endpoint=False)
    cases = [(0.0, 1.0, 0.25), (1.0, 2.05, 0.3), (0.0, 5.0, 1.0)]
    rows = spark.range(1).select(*[frange(*c).alias(f"g{i}") for i, c in enumerate(cases)]).collect()
    for i, (start, stop, step) in enumerate(cases):
        num = int(np.floor((stop - start) / step))
        want = np.linspace(start, stop, num=num, endpoint=False)
        got = np.asarray(rows[0][f"g{i}"])
        assert np.allclose(got, want, rtol=0, atol=1e-12), (start, stop, step)


def test_pairwise_matches_zip(spark):
    mylist = [2, 3, 6, 8, 7]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(mylist)], "pos int, x int")
    got = [
        (r.a, r.b)
        for r in pairwise(df, "x", order_cols=["pos"]).orderBy("a", "b").collect()
    ]
    assert sorted(got) == sorted(zip(mylist, mylist[1:]))


def test_pretty_formatting(spark):
    df = spark.createDataFrame(
        [(123, 123456, 1.5), (2048, 1000, 3661.5)], "b long, i long, d double"
    )
    rows = (
        df.select(
            pretty_bytes("b").alias("pb"),
            pretty_int("i").alias("pi"),
            pretty_duration("d").alias("pd"),
        )
        .collect()
    )
    assert rows[0].pb == "123 bytes"
    assert rows[0].pi == "123,456"
    assert rows[0].pd == "1.5 seconds"
    assert rows[1].pb == "2.000 kilobytes"
    assert rows[1].pi == "1,000"
    assert rows[1].pd == "1:01:01:500 hours"


def test_pretty_duration_cases(spark):
    vals = [(0.1234,), (-1.5,), (62.5,), (90000.0,), (float("inf"),)]
    df = spark.createDataFrame(vals, "d double")
    got = [r.p for r in df.select(pretty_duration("d").alias("p")).collect()]
    assert got[0] == "123.4 milliseconds"
    assert got[1] == "-1.5 seconds"
    assert got[2] == "1:02:500 minutes"
    assert got[3] == "1 days 1:00:00 hours"
    assert got[4] == "inf"


def test_lit_array_builders_bit_identical_to_lit(spark):
    # r18: the single-parse expr builders must produce literals
    # bit-identical to F.lit(list) — including doubles through the
    # repr round-trip (math.log outputs are the production case) and
    # int64 extremes.
    import math
    import struct

    from jagular_spark.functions import (
        lit_bigint_array,
        lit_bigint_matrix,
        lit_double_array,
    )

    ints = [0, 1, -1, 2**62, -(2**62), 7919 * 10**12, -3]
    dbls = [0.0, -0.0, 0.1, math.log(3 / 7) - math.log(2 / 5), 1e-300, -1.7e308,
            math.log(4097 / 4096)]
    mat = [[1, -(2**40)], [0, 2**40]]
    row = spark.range(1).select(
        lit_bigint_array(ints).alias("a"),
        F.lit(ints).cast("array<bigint>").alias("a0"),
        lit_double_array(dbls).alias("d"),
        F.lit(dbls).cast("array<double>").alias("d0"),
        lit_bigint_matrix(mat).alias("m"),
        F.lit(mat).cast("array<array<bigint>>").alias("m0"),
    ).first()
    assert row.a == row.a0 == ints
    assert row.m == row.m0 == mat
    bits = [struct.pack("<d", v) for v in row.d]
    bits0 = [struct.pack("<d", v) for v in row.d0]
    assert bits == bits0 == [struct.pack("<d", float(v)) for v in dbls]
    # empty arrays keep their declared element types
    empt = spark.range(1).select(
        lit_bigint_array([]).alias("a"),
        lit_double_array([]).alias("d"),
        lit_bigint_matrix([]).alias("m"),
    )
    assert [f.dataType.simpleString() for f in empt.schema.fields] == [
        "array<bigint>", "array<double>", "array<array<bigint>>",
    ]
    assert empt.first() == ([], [], [])
