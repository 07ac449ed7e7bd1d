"""Every ORACLE_SQL entry must at least PLAN in DuckDB against the real
table schemas — catches SQL typos/renames in seconds instead of at the
driver's harness run. (Execution-level parity is the harness's job:
tools/check_oracles.py.)"""

from __future__ import annotations

import duckdb
import pytest

from jagular_spark.workloads import (
    EXPECT_EMPTY,
    ORACLE_SQL,
    SPARK_QUERIES,
    TABLES,
)

SF = "/root/testdata/sf0.001"
SF_CONTRACT = "/root/testdata/sf0.01"  # the driver's correctness sf


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


def test_vacuity_guard_logic():
    """tools/check_oracles fails a 0-vs-0 'match' unless the query is
    allowlisted — the r9 docs_media_mpeg1_color lesson (its 768 B gate
    matched zero docs at every shipped sf, so a never-executed color
    path carried a green correctness row for a full round)."""
    import importlib.util
    import os

    # explicit-location import: does NOT touch sys.path, so the tools
    # dir cannot shadow same-named modules in later test imports
    spec = importlib.util.spec_from_file_location(
        "check_oracles_under_test",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "tools",
            "check_oracles.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    vacuity_problem = mod.vacuity_problem

    assert vacuity_problem(0, 0, "docs_media_mpeg1_color") is not None
    assert vacuity_problem(1, 1, "docs_media_mpeg1_color") is None
    assert vacuity_problem(0, 5, "anything") is None  # rowcount catches it
    try:
        EXPECT_EMPTY.add("__vacuity_test__")
        assert vacuity_problem(0, 0, "__vacuity_test__") is None
    finally:
        EXPECT_EMPTY.discard("__vacuity_test__")


@pytest.mark.parametrize("sf_dir", [SF_CONTRACT, "/root/testdata/sf0.1"])
def test_no_oracle_is_vacuous(sf_dir):
    """Registry-wide vacuity sweep: every oracle selects >= 1 row at
    the driver's correctness sf (0.01) AND the bench sf (0.1) unless
    declared in EXPECT_EMPTY — a gate can go vacuous at one sf and not
    the other (the r9 mpeg1-color 768 B gate matched zero docs at
    EVERY shipped sf; a threshold picked differently could match at
    0.01 and zero at 0.1 where the bench would silently measure
    nothing). Oracle-side only (DuckDB) — the Spark side is covered by
    rowcount equality in the harness, so a non-empty oracle forces a
    non-empty Spark result there."""
    c = duckdb.connect()
    # same caps as tools/check_oracles.py: the funnel-v2 oracle at
    # sf0.1 OOM-killed an uncapped DuckDB next to a resident Spark JVM
    # (and under pytest a session-scoped Spark fixture is usually
    # alive), so bound the buffer pool and give it a spill directory
    c.execute("SET memory_limit='40GB'")
    c.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    empty = [
        name
        for name, sql in ORACLE_SQL.items()
        if name not in EXPECT_EMPTY
        and c.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0] == 0
    ]
    assert not empty, f"vacuous oracles at {sf_dir}: {empty}"
