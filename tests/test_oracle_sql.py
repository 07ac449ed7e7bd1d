"""Every ORACLE_SQL entry must at least PLAN in DuckDB against the real
table schemas — catches SQL typos/renames in seconds instead of at the
driver's harness run. (Execution-level parity is the harness's job:
tools/check_oracles.py.)"""

from __future__ import annotations

import duckdb
import pytest

from jagular_spark.workloads import ORACLE_SQL, SPARK_QUERIES, TABLES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_every_query_has_an_oracle():
    assert set(SPARK_QUERIES) == set(ORACLE_SQL)


def test_all_oracles_plan(con):
    bad = []
    for name, sql in ORACLE_SQL.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad
