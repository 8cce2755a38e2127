"""Generate a local sf1.0 dataset by 10x key-remapped replication of sf0.1.

The driver's generator isn't shipped, so sf1.0 is synthesized from sf0.1:
each fact table is replicated K=10 times with every PRIMARY and FOREIGN key
shifted by copy_index * key_stride — join fan-outs, group cardinalities and
value distributions scale like real data (each copy is a disjoint key
universe), while dims (region/nation) stay fixed like TPC-H.  Purpose is
the SHUFFLE-STRESS bench (PERFORMANCE.md): wall-clock scaling, plan-shape
stability and skew behavior at 10x — not oracle correctness (sf0.01 stays
the correctness gate).

Usage: python tools/gen_sf1.py [out_dir]   (default /root/repo/testdata_sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10

# per-table key columns to shift per copy (stride = global per-KEY max + 1,
# so e.g. l_orderkey and o_orderkey shift by the SAME stride and joins stay
# consistent across tables)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key families: columns sharing a stride
FAMILY = {
    "c_custkey": "cust", "o_custkey": "cust",
    "o_orderkey": "order", "l_orderkey": "order",
    "p_partkey": "part", "l_partkey": "part",
    "s_suppkey": "supp", "l_suppkey": "supp",
    "event_id": "event", "user_id": "user",
    "doc_id": "doc", "vec_id": "vec",
}
DIMS = ["region", "nation"]


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    src = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from polars_spark.session import get_spark

    spark = get_spark("gen_sf1")

    # stride per key family = max over every column in the family
    strides: dict[str, int] = {}
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        for k in keys:
            fam = FAMILY[k]
            mx = df.agg(F.max(k)).collect()[0][0] or 0
            strides[fam] = max(strides.get(fam, 0), int(mx) + 1)

    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"{t}: copied")

    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(K):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * strides[FAMILY[k]]))
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.repartition(32).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
