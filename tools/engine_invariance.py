"""Dual-engine gate, Spark edition: the reference requires its whole unit
suite to pass under BOTH executors (in-memory and streaming).  The Spark
analogue of "a different engine picked different physical plans" is
Adaptive Query Execution — run every registry query with AQE ON and OFF
and hash-compare the results.  A mismatch means a value depends on the
physical plan (broadcast-vs-shuffle join, coalesced partitions), which
would also diverge on a real cluster.

Usage: python tools/engine_invariance.py [sf_dir] [names...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from determinism import result_hash  # noqa: E402  (same hashing policy)


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
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            h1 = result_hash(fn(spark, sf_dir).toPandas())
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            h2 = result_hash(fn(spark, sf_dir).toPandas())
        except Exception as exc:
            print(f"ERR   {name}: {str(exc)[:200]}")
            bad += 1
            continue
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        if h1 != h2:
            print(f"VARIES {name}: {h1} != {h2}")
            bad += 1
        else:
            print(f"ok    {name}")
    print(f"\n{'FAIL' if bad else 'OK'}: {bad} plan-dependent/erroring")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
