"""Mechanical driver-window rotation.

The correctness harness oracle-checks only the FIRST 50 entries of
``workloads.SPARK_QUERIES`` per round, so registry order IS the
verification schedule. Through r11 that order was maintained by hand;
the r11 verdict's #1 task asks for it to be DERIVED: per-query
last-driver-green round comes from the ``CORRECTNESS_r*.json``
artifacts the driver writes at the repo root, and the window is

    touched/new queries this round  (policy a — unconditional)
  + stalest-first fill to 50        (policy b — oldest last-green)

with ties broken by name. Everything outside the window is also
ordered stalest-first, so the whole dict is reproducible from
(artifacts, ROUND_TOUCHED, REGISTRY_ROUND) — ``tools/rotate_window.py``
prints it, ``tests/test_rotation.py`` pins that the shipped registry
matches it exactly.

Determinism note: only artifacts from rounds STRICTLY BEFORE
``REGISTRY_ROUND`` feed the derivation. The driver writes
CORRECTNESS_r{N}.json for the round being judged AFTER the registry
ships; if the derivation read it, the test's notion of "stalest"
would flip the moment the round's own results landed.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Iterable, Mapping

WINDOW_SIZE = 50


def artifact_dir() -> str:
    """Repo root — where the driver writes CORRECTNESS_r*.json."""
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def query_green(result: Mapping) -> bool:
    """A driver row certifies a query only if rows+schema matched, the
    value hash matched where one was computed (streaming twins get a
    weaker rows-only check → hash_match is None), and no error."""
    return bool(
        result.get("rows_match")
        and result.get("schema_match")
        and result.get("hash_match") is not False
        and not result.get("err")
    )


def last_green_rounds(
    before_round: int, directory: str | None = None
) -> dict[str, int]:
    """Per-query newest driver round (< before_round) with a green row.

    Queries never green (or never windowed) are absent — treat missing
    as 0 ("infinitely stale"), which also puts NEW queries first.
    """
    directory = directory or artifact_dir()
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(directory, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd >= before_round:
            continue
        with open(path) as fh:
            results = json.load(fh)
        for name, res in results.items():
            if query_green(res):
                last[name] = max(last.get(name, 0), rnd)
    return last


def window_order(
    names: Iterable[str],
    last_green: Mapping[str, int],
    touched: Iterable[str] = (),
    size: int = WINDOW_SIZE,
) -> list[str]:
    """The full mandated registry order: window first, then the rest,
    both stalest-first (last-green round, then name).

    ``touched`` queries are forced into the window regardless of
    freshness (their operator code changed this round, so their last
    green certifies a plan that no longer exists). If touched alone
    overflows ``size`` the window grows to hold them — correctness of
    changed code outranks rotation budget.
    """
    names = list(names)
    unknown = set(touched) - set(names)
    if unknown:
        raise ValueError(f"touched queries not in registry: {sorted(unknown)}")

    def key(n: str) -> tuple[int, str]:
        return (last_green.get(n, 0), n)

    forced = sorted((n for n in names if n in set(touched)), key=key)
    rest = sorted((n for n in names if n not in set(touched)), key=key)
    n_fill = max(size - len(forced), 0)
    window = sorted(forced + rest[:n_fill], key=key)
    return window + rest[n_fill:]
