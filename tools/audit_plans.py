"""Plan auditor: explain EVERY registry query and flag scale hazards.

Checks per plan (on the physical plan string):
- SinglePartition exchanges are flagged UNLESS the exchange input is a
  partial scalar aggregate (keys=[], functions=[partial_...]) — that merge
  moves one row per partition, not the data.  Anything else shuffling into
  one partition (global windows, global sorts mid-plan) is a 100 TB killer.
- join strategies reported (BroadcastHashJoin should come from AQE or a
  fixed-size dim, never a forced hint on a scale-growing table)

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Exit 1 if any plan is flagged.
"""

from __future__ import annotations

import sys
import time

JOINS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]

_AGG_NODES = ("HashAggregate", "ObjectHashAggregate", "SortAggregate")


def single_partition_hazards(plan: str) -> list[str]:
    """Lines with a SinglePartition exchange whose input is NOT a partial
    scalar aggregate (those emit one row per input partition — benign)."""
    lines = plan.splitlines()
    bad: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        if any(a in nxt for a in _AGG_NODES) and "keys=[]" in nxt and "partial_" in nxt:
            continue
        # with_row_index offsets: aggregate keyed by the spark partition id —
        # one row per input partition flows through, never the data
        if any(a in nxt for a in _AGG_NODES) and "keys=[__pid__" in nxt:
            continue
        bad.append(ln.strip())
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, ".")
    from polars_spark.queries import QUERIES
    from polars_spark.session import get_spark

    spark = get_spark("audit")
    bad = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            bad += 1
            continue
        joins = sorted({j for j in JOINS if j in plan})
        hazards = single_partition_hazards(plan)
        n_single = plan.count("SinglePartition")
        flag = f"  !! {len(hazards)} SINGLE-PARTITION" if hazards else ""
        if hazards:
            bad += 1
        print(
            f"{name}: joins={joins or '-'} exchanges={plan.count('Exchange ')} "
            f"single_partition={n_single} scalar_ok={n_single - len(hazards)}"
            f"{flag} [{time.time() - t0:.1f}s]"
        )
        for h in hazards:
            print(f"    {h[:160]}")
    print(f"\n{'OK — no non-scalar single-partition exchanges' if bad == 0 else f'{bad} PLANS FLAGGED'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
