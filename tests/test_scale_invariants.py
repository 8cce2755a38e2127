"""Round 7 scale-stress invariants (VERDICT r6 item 4).

The round-6 with_row_index bug lost 37% of rows at 10⁶ while every gate
at sf0.1 stayed green — that bug class must be HUNTED.  These tests run
the round-6 machinery far past gate sizes (10⁷ rows / 100+ files) and
assert row-conservation invariants: where semantics demand it, input
count == output count, indexes are dense and unique, and keyed kernels
conserve per-key cardinality.

Slow by design — skipped unless RUN_SCALE=1:
    RUN_SCALE=1 python -m pytest tests/test_scale_invariants.py -q
"""

from __future__ import annotations

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SCALE") != "1", reason="scale-stress: set RUN_SCALE=1"
)

N = 10_000_000


@pytest.fixture(scope="module")
def big(spark):
    """10⁷ rows, ~2.5 GB in memory: a skewed key, a dense key, a float."""
    from pyspark.sql import functions as F

    df = (
        spark.range(N, numPartitions=64)
        .withColumn("g", (F.col("id") % 1500).cast("string"))
        .withColumn("x", F.rand(7))
        .withColumn("v", (F.col("id") * 2654435761) % 1000003)
    )
    import polars_spark as pl

    return pl.LazyFrame(df)


def test_ordered_with_row_index_conserves_rows(big, pl):
    out = big.sort("x").with_row_index("i")
    agg = out.select(
        pl.len().alias("n"),
        pl.col("i").n_unique().alias("d"),
        pl.col("i").min().alias("mn"),
        pl.col("i").max().alias("mx"),
    ).rows()[0]
    assert agg == (N, N, 0, N - 1), agg


def test_ewm_kernel_many_keys_conserves_rows(big, pl):
    out = big.sort("id").with_columns(e=pl.col("x").ewm_mean(span=20).over("g"))
    agg = out.select(
        pl.len().alias("n"),
        pl.col("e").is_not_null().sum().alias("nn"),
    ).rows()[0]
    assert agg[0] == N and agg[1] == N, agg


def test_ewm_kernel_single_key_conserves_rows(big, pl):
    out = big.sort("id").with_columns(e=pl.col("x").ewm_mean(span=100))
    agg = out.select(pl.len().alias("n"), pl.col("e").is_not_null().sum().alias("nn")).rows()[0]
    assert agg == (N, N), agg


def test_order_contract_over_many_files(spark, pl, tmp_path_factory):
    """120-file scan: cum_sum over file order must see every row exactly
    once and the global running total must equal the eager sum."""
    root = str(tmp_path_factory.mktemp("manyfiles"))
    from pyspark.sql import functions as F

    n = 1_200_000
    spark.range(n, numPartitions=120).withColumn("w", F.lit(1)).write.mode(
        "overwrite"
    ).parquet(root)
    lf = pl.scan_parquet(root)
    out = lf.with_columns(c=pl.col("w").cum_sum())
    agg = out.select(
        pl.len().alias("n"),
        pl.col("c").max().alias("mx"),
        pl.col("c").n_unique().alias("d"),
    ).rows()[0]
    assert agg == (n, n, n), agg


def test_band_join_row_bounds(spark, pl):
    """Equi-bucket band join at 10⁶ x 10⁵: every output pair must satisfy
    the band predicate, and the count must match a DuckDB oracle."""
    import duckdb
    import polars_spark.functions as plf

    n_l, n_r = 1_000_000, 100_000
    from pyspark.sql import functions as F

    ldf = spark.range(n_l).select(
        F.col("id").alias("lid"), (F.rand(1) * 10000).alias("lv")
    )
    rdf = spark.range(n_r).select(
        F.col("id").alias("rid"), (F.rand(2) * 10000).alias("rv")
    )
    left, right = pl.LazyFrame(ldf), pl.LazyFrame(rdf)
    joined = plf.band_join(left, right, "lv", "rv", band=0.005)
    got = joined.select(pl.len().alias("n")).rows()[0][0]
    lp = ldf.toPandas()
    rp = rdf.toPandas()
    con = duckdb.connect()
    con.register("l", lp)
    con.register("r", rp)
    want = con.execute(
        "SELECT count(*) FROM l, r WHERE abs(lv - rv) <= 0.005"
    ).fetchone()[0]
    assert got == want, (got, want)


def test_minhash_dedup_conservation(spark, pl):
    """MinHash-LSH at 2x10⁵ docs with planted dups: each planted pair is
    found, and the pair list contains no (a, a) self-pairs or reversed
    duplicates."""
    import pandas as pd

    from polars_spark.llm import minhash_lsh_pairs

    rng = np.random.RandomState(11)
    words = np.array([f"w{i}" for i in range(5000)])
    n = 200_000
    docs = [" ".join(words[rng.randint(0, 5000, 30)]) for i in range(n // 2)]
    all_docs = docs + docs  # every doc duplicated once
    pdf = pd.DataFrame({"doc_id": np.arange(n), "text": all_docs})
    lf = pl.from_pandas(pdf, spark=spark)
    from pyspark.sql import functions as F

    pairs = minhash_lsh_pairs(
        lf.to_spark(), id_col="doc_id", text_col="text", threshold=0.8
    )
    got = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("d1") < F.col("d2")).alias("ordered"),
    ).collect()[0]
    # exact duplicates MUST all collide in at least one band
    assert got[0] >= n // 2, got
    assert got[1] is True


def test_asof_join_conserves_left_rows(spark, pl):
    """Backward as-of at 10⁷ left x 10⁵ right: a left/backward asof join
    must return EXACTLY one row per left row (polars semantics), and every
    matched right timestamp must be <= the left's."""
    from pyspark.sql import functions as F

    n_l, n_r = 10_000_000, 100_000
    left = pl.LazyFrame(
        spark.range(n_l, numPartitions=64).select(
            (F.col("id") * 7 % 100_000_000).alias("t"), F.col("id").alias("lid")
        )
    ).sort("t")
    right = pl.LazyFrame(
        spark.range(n_r).select(
            (F.col("id") * 997 % 100_000_000).alias("t"), F.col("id").alias("rid")
        )
    ).sort("t")
    j = left.join_asof(right, on="t", strategy="backward", suffix="_r")
    agg = j.select(
        pl.len().alias("n"),
        pl.col("lid").n_unique().alias("d"),
    ).rows()[0]
    assert agg == (n_l, n_l), agg


def test_group_by_dynamic_conserves_rows(spark, pl):
    """Tumbling 1h windows over 10⁷ timestamped rows: the per-window counts
    must sum back to the input row count (no row lost or double-counted
    with closed='left')."""
    from pyspark.sql import functions as F

    n = 10_000_000
    df = spark.range(n, numPartitions=64).select(
        F.timestamp_micros(
            F.lit(1_600_000_000_000_000) + F.col("id") * 3_600_000  # 3.6s apart
        ).alias("ts"),
        (F.col("id") % 97).alias("v"),
    )
    lf = pl.LazyFrame(df).sort("ts")
    out = lf.group_by_dynamic("ts", every="1h").agg(pl.len().alias("n"))
    total = out.select(pl.col("n").sum().alias("s")).rows()[0][0]
    assert total == n, total


def test_distinct_at_scale_matches_construction(spark, pl):
    """unique() over 10⁷ rows with a known duplication factor: exactly
    1,000,003 distinct hashed keys were constructed (modulus), so distinct
    must return exactly that many rows."""
    from pyspark.sql import functions as F

    df = spark.range(10_000_000, numPartitions=64).select(
        ((F.col("id") * 2654435761) % 1000003).alias("v")
    )
    got = pl.LazyFrame(df).unique().select(pl.len().alias("n")).rows()[0][0]
    want = df.select("v").distinct().count()
    assert got == want, (got, want)
