"""The `_us()` timestamp seam (workloads.py).

The driver's events.parquet has shipped BOTH parquet timestamp
encodings across rounds — TIMESTAMP(NANOS) (read as raw nano longs via
spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS) (read as
TIMESTAMP_NTZ).  Round 3's correctness run went red on exactly this
seam, so the dispatch is pinned here: both encodings of the same
instants must yield identical unix-microsecond BIGINTs, equal to
DuckDB's epoch_us on the same files.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jagular_spark import workloads as W

# instants with non-zero sub-microsecond nanos to pin the truncation
# (DuckDB nanos->micros truncates toward zero; so does `DIV 1000` on
# the post-1970 data contract)
_NANOS = [
    1_600_000_000_000_000_123,   # ...123 ns remainder
    1_600_000_000_000_001_999,   # ...999 ns remainder -> truncates, not rounds
    1_700_000_000_123_456_789,
    981_173_106_000_000_000,     # exact microsecond boundary
]
_EXPECTED_US = [n // 1000 for n in _NANOS]


def _write(tmpdir: str, unit: str) -> str:
    path = f"{tmpdir}/events_{unit}.parquet"
    if unit == "ns":
        arr = pa.array(_NANOS, type=pa.int64()).cast(pa.timestamp("ns"))
    else:
        arr = pa.array(_EXPECTED_US, type=pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(pa.table({"ts": arr, "event_id": list(range(len(_NANOS)))}), path)
    return path


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_us_dispatch_both_encodings(spark, tmp_path, unit):
    path = _write(str(tmp_path), unit)
    df = spark.read.parquet(path)
    # encoding sanity: nanos files must arrive as raw longs, micros as
    # native timestamps — otherwise the dispatch under test is bypassed
    dtype = dict(df.dtypes)["ts"]
    assert dtype == ("bigint" if unit == "ns" else "timestamp_ntz")
    got = [
        r["us"]
        for r in df.select("event_id", W._us(df).alias("us"))
        .orderBy("event_id")
        .collect()
    ]
    assert got == _EXPECTED_US
    # and the DuckDB oracle sees the same instants through epoch_us
    oracle = [
        row[0]
        for row in duckdb.sql(
            f"SELECT epoch_us(ts) FROM read_parquet('{path}') ORDER BY event_id"
        ).fetchall()
    ]
    assert oracle == _EXPECTED_US
