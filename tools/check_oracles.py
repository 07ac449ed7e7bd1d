"""Local replica of the driver's t2 correctness harness.

Runs every SPARK_QUERIES entry and its ORACLE_SQL twin at the given sf
dir, compares row count, column-name set, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified
with float repr). Exit code 1 on any mismatch.

Vacuity guard (r10): a query whose Spark AND oracle outputs are BOTH
empty fails the run unless it is listed in workloads.EXPECT_EMPTY —
a 0-rows-vs-0-rows green proves nothing about the operator (the r9
docs_media_mpeg1_color row certified a color codec the driver had
never executed on a single frame).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from jagular_spark.session import get_spark
from jagular_spark.workloads import (
    EXPECT_EMPTY,
    ORACLE_SQL,
    SPARK_QUERIES,
    TABLES,
)


def vacuity_problem(n_spark: int, n_oracle: int, name: str) -> str | None:
    """r10 vacuity guard: a 0-rows-vs-0-rows 'match' certifies nothing
    about the operator, so it is a FAILURE unless the query declares
    EXPECT_EMPTY membership."""
    if n_spark == 0 and n_oracle == 0 and name not in EXPECT_EMPTY:
        return (
            "vacuous: 0 rows on BOTH engines (a 0-vs-0 match "
            "certifies nothing; add to EXPECT_EMPTY only if the "
            "query is genuinely expected to select nothing)"
        )
    return None


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_repr(df: pd.DataFrame) -> list[tuple]:
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return out


def main() -> int:
    args = sys.argv[1:]
    batched = "--batched" in args
    args = [a for a in args if a != "--batched"]
    # first arg is the sf dir only if it IS a directory; a bare query
    # name as the first arg is a filter (common invocation mistake)
    if args and os.path.isdir(args[0]):
        sf_dir, only = args[0], set(args[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.01", set(args)
    unknown = only - set(SPARK_QUERIES)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 1
    if batched:
        return _run_batched(sf_dir, only)
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    # DuckDB's default memory_limit is ~80% of RAM and its buffer pool
    # grows greedily across a long sweep; next to the 32g Spark JVM
    # that OOM-killed the 129-query sf0.1 run (the heavy funnel-v2
    # oracle arrived with ~100 GB already resident). Cap it and give
    # it a spill directory so big oracle intermediates go to disk
    # instead of the OOM killer.
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    executed = 0
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        executed += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only); rows={len(sdf)}")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        vac = vacuity_problem(len(sdf), len(odf), name)
        if vac:
            problems.append(vac)
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            a, b = canon(sdf), canon(odf)
            va, vb = value_repr(a), value_repr(b)
            if va != vb:
                n_bad = sum(1 for x, y in zip(va, vb) if x != y)
                problems.append(f"values differ in {n_bad}/{len(va)} rows")
                for x, y in list(zip(va, vb))[:200]:
                    if x != y:
                        problems.append(f"  spark={x}\n  duck ={y}")
                        break
        if problems:
            failures.append((name, "; ".join(problems[:3])))
            print(f"FAIL {name}: " + " | ".join(problems[:3]))
        else:
            print(f"OK   {name}: rows={len(sdf)}", flush=True)
        # Long sweeps at big sf: canon/value_repr build millions of
        # transient Python strings per large frame; the allocator
        # retains those pages, so RSS grows monotonically (~GBs/query
        # at sf0.1) even though nothing is referenced. Eager del+gc
        # bounds the live set; --batched bounds the retention itself.
        del sdf, odf
        import gc

        gc.collect()
    # report what THIS run executed, not the registry size — a filtered
    # run must not claim it proved the whole registry
    print(f"\n{executed - len(failures)}/{executed} queries match")
    return 1 if failures else 0


def _run_batched(sf_dir: str, only: set[str], chunk: int = 20) -> int:
    """Full-sweep mode for big scale factors: re-exec this script in
    fresh subprocesses of ``chunk`` queries each. The single-process
    sweep retains allocator pages from the per-query canonicalization
    strings (millions of transient Python strings per large frame at
    sf0.1) and grows ~GBs/query until the OOM killer fires; a fresh
    process per chunk bounds retention at one chunk's worth. Spark
    startup (~30 s) re-pays per chunk — the price of surviving."""
    import subprocess

    names = [n for n in SPARK_QUERIES if not only or n in only]
    rc = 0
    matched = 0
    for i in range(0, len(names), chunk):
        batch = names[i : i + chunk]
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, *batch],
            capture_output=True,
            text=True,
        )
        import re

        seen: set[str] = set()
        for line in r.stdout.splitlines():
            # progress-bar \r junk can prefix a status line; anchor on
            # the status token anywhere in the line
            m = re.search(r"\b(OK   |FAIL |SKIP )([a-z0-9_]+.*)", line)
            if m:
                seen.add(m.group(2).split(":")[0].strip())
                print(m.group(1) + m.group(2), flush=True)
        # a chunk killed mid-run (e.g. OOM) reports neither OK nor FAIL
        # for the queries it never reached — surface them explicitly so
        # the final tally accounts for every query
        for name in batch:
            if name not in seen:
                print(f"FAIL {name}: not executed (chunk died before it)",
                      flush=True)
                rc = 1
        m = re.search(r"(\d+)/(\d+) queries match", r.stdout)
        if m:
            matched += int(m.group(1))
        if r.returncode != 0:
            rc = 1
            tail = "\n".join(r.stderr.splitlines()[-15:])
            if tail:
                print(f"# chunk {i // chunk} stderr tail:\n{tail}",
                      flush=True)
    print(f"\n{matched}/{len(names)} queries match (batched)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
