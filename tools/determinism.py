"""Determinism sweep: run every registry query TWICE on the same session
and hash-compare the (column-sorted, row-sorted) results.  A mismatch
means the driver's correctness rerun could flake (any_value / unordered
first / rand leaks) — the gate queries must be replay-stable."""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def result_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    s = pdf.round(9).astype(str)
    rows = sorted("\x1f".join(r) for r in s.itertuples(index=False, name=None))
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    import __spark_entry__ as e
    from polars_spark.session import get_spark

    spark = get_spark()
    qs = e.queries()
    bad = 0
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            h1 = result_hash(fn(spark, sf_dir).toPandas())
            h2 = result_hash(fn(spark, sf_dir).toPandas())
        except Exception as exc:
            print(f"ERR   {name}: {exc}")
            bad += 1
            continue
        if h1 != h2:
            print(f"FLAKY {name}: {h1} != {h2}")
            bad += 1
        else:
            print(f"ok    {name}")
    print(f"\n{'FAIL' if bad else 'OK'}: {bad} nondeterministic/erroring")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
