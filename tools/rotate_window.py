#!/usr/bin/env python
"""Print the mandated SPARK_QUERIES registry order for this round.

Usage:
    python tools/rotate_window.py            # paste-ready dict body
    python tools/rotate_window.py --check    # exit 1 if the shipped
                                             # registry deviates

Derivation inputs: CORRECTNESS_r*.json (rounds < REGISTRY_ROUND),
workloads.ROUND_TOUCHED, rotation.window_order. The per-round rotation
workflow is: bump REGISTRY_ROUND, update ROUND_TOUCHED to the queries
whose operator code changed / are new, run this script, paste the body
into workloads.py. tests/test_rotation.py enforces the result.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jagular_spark.rotation import WINDOW_SIZE, last_green_rounds, window_order


def main() -> int:
    from jagular_spark.workloads import (
        REGISTRY_ROUND,
        ROUND_TOUCHED,
        SPARK_QUERIES,
    )

    last = last_green_rounds(REGISTRY_ROUND)
    order = window_order(SPARK_QUERIES, last, ROUND_TOUCHED)

    if "--check" in sys.argv:
        shipped = list(SPARK_QUERIES)
        if shipped == order:
            print(f"registry order matches derivation ({len(order)} queries, "
                  f"window {WINDOW_SIZE}, round {REGISTRY_ROUND})")
            return 0
        for i, (a, b) in enumerate(zip(shipped, order)):
            if a != b:
                print(f"first deviation at index {i}: shipped={a!r} derived={b!r}")
                break
        return 1

    print(f"# derived for REGISTRY_ROUND={REGISTRY_ROUND}, "
          f"touched={sorted(ROUND_TOUCHED)}")
    for i, name in enumerate(order):
        if i == 0:
            print(f"    # ---- driver window: first {WINDOW_SIZE}, stalest-first "
                  "(forced: ROUND_TOUCHED) ----")
        if i == WINDOW_SIZE:
            print("    # ---- driver window ends here ----")
        print(f'    "{name}": {name},  # last green r{last.get(name, 0)}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
