"""Partition-invariance sweep: run every registry query under two very
different ``spark.sql.shuffle.partitions`` settings (32 vs 7) and
hash-compare the (column-sorted, row-sorted) results.

This is the strongest local[32] proxy for the 1000-executor question: a
result that depends on how the shuffle is partitioned (positional
assumptions, per-partition state leaking into values, non-commutative
accumulation orders surviving rounding) WILL change on a real cluster.
Queries whose values are honestly partition-dependent must not exist in
the gate registry — every row here must be `ok`.

Usage: python tools/partition_invariance.py [sf_dir] [names...]
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
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            h1 = result_hash(fn(spark, sf_dir).toPandas())
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            h2 = result_hash(fn(spark, sf_dir).toPandas())
        except Exception as exc:
            print(f"ERR   {name}: {str(exc)[:200]}")
            bad += 1
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        if h1 != h2:
            print(f"VARIES {name}: {h1} != {h2}")
            bad += 1
        else:
            print(f"ok    {name}")
    print(f"\n{'FAIL' if bad else 'OK'}: {bad} partition-dependent/erroring")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
