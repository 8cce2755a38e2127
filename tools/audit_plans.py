"""Plan auditor: explain EVERY registry query and flag scale hazards.

Checks per plan (on the physical plan string):
- SinglePartition exchanges are flagged UNLESS the exchange input is a
  partial scalar aggregate (keys=[], functions=[partial_...]) — that merge
  moves one row per partition, not the data.  Anything else shuffling into
  one partition (global windows, global sorts mid-plan) is a 100 TB killer.
- join strategies reported (BroadcastHashJoin should come from AQE or a
  fixed-size dim, never a forced hint on a scale-growing table)
- row-at-a-time Python UDFs (BatchEvalPython) are flagged — every Python
  hop must be Arrow-batched (ArrowEvalPython / mapInPandas / mapInArrow)
- CartesianProduct is flagged unless the query opted in via
  ALLOW_CARTESIAN (an explicit cross-join query); a cartesian that
  Catalyst synthesized from a bad join condition is a 100 TB killer

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

# queries whose SEMANTICS are a cross join (explicit cross/theta products)
ALLOW_CARTESIAN = {"join_cross", "join_where_theta", "join_where_strict",
                   "join_where_nonstrict", "join_where_single"}

# queries whose single-partition exchange IS the requested polars semantics
# (global running folds over the scan order are inherently sequential —
# documented in PERFORMANCE.md since round 6; reviewed every round)
DOCUMENTED_SEQUENTIAL = {"io_scan_order_cumsum", "io_scan_order_shift_first"}


def single_partition_hazards(plan: str) -> list[str]:
    """Lines with a SinglePartition exchange whose input is NOT a partial
    scalar aggregate (those emit one row per input partition — benign)."""
    lines = plan.splitlines()
    bad: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        # HashAggregate prints "keys=[]", SortAggregate prints "key=[]"
        # (string min/max take the sort-based aggregate)
        if (
            any(a in nxt for a in _AGG_NODES)
            and ("keys=[]" in nxt or "key=[]" in nxt)
            and "partial_" in nxt
        ):
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
        sp_hazards = single_partition_hazards(plan)
        hazards = list(sp_hazards)
        if "BatchEvalPython" in plan:
            hazards.append("BatchEvalPython: row-at-a-time Python UDF (must be Arrow-batched)")
        if "CartesianProduct" in plan and name not in ALLOW_CARTESIAN:
            hazards.append("CartesianProduct outside an explicit cross-join query")
        n_single = plan.count("SinglePartition")
        if hazards and name in DOCUMENTED_SEQUENTIAL and not any(
            "BatchEvalPython" in h or "CartesianProduct" in h for h in hazards
        ):
            flag = "  (documented sequential fold — PERFORMANCE.md)"
        else:
            flag = f"  !! {len(hazards)} HAZARDS" if hazards else ""
            if hazards:
                bad += 1
        print(
            f"{name}: joins={joins or '-'} exchanges={plan.count('Exchange ')} "
            f"single_partition={n_single} scalar_ok={n_single - len(sp_hazards)}"
            f"{flag} [{time.time() - t0:.1f}s]"
        )
        for h in hazards:
            print(f"    {h[:160]}")
    print(f"\n{'OK — no non-scalar single-partition exchanges' if bad == 0 else f'{bad} PLANS FLAGGED'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
