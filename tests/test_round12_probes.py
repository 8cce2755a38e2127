"""Round-12 adversarial-probe pins (VERDICT r11 #6): the correctness
half of the PERFORMANCE.md probe table, kept fast enough for pytest.

The timing rows live in PERFORMANCE.md; these tests pin the exactness
properties the probes established: the ngram df-cap boundary is
inclusive, and the interval/band equi-bucket rewrites count every
qualifying pair exactly once even when EVERY pair qualifies.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ngram_df_cap_boundary_inclusive(spark):
    """max_df is <= (a shingle in exactly max_df docs survives); one doc
    more and the stop-shingle is dropped before the quadratic join."""
    from polars_spark.llm import ngram_jaccard_pairs

    rows = [(i, f"a b c filler{i} x{i} y{i}") for i in range(5)] + [
        (100 + i, f"p q r filler{100 + i} x{100 + i} y{100 + i}") for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.05, max_df=5
    ).collect()
    kept = {(r.d1, r.d2) for r in got}
    assert len([p for p in kept if p[0] < 100]) == 10  # C(5,2) via kept shingle
    assert len([p for p in kept if p[0] >= 100]) == 0  # df=6 shingle dropped


def test_interval_join_total_overlap_counts_once(spark, pl):
    """All intervals span the same range: every pair overlaps, and the
    once-only bucket rule must yield exactly n*m (no dup, no loss)."""
    from polars_spark.functions import interval_join

    n = 60
    li = pl.LazyFrame(
        spark.range(n).select(
            F.col("id").alias("lid"), F.lit(0.0).alias("lo"), F.lit(100.0).alias("hi")
        )
    )
    ri = pl.LazyFrame(
        spark.range(n).select(
            F.col("id").alias("rid"), F.lit(0.0).alias("lo"), F.lit(100.0).alias("hi")
        )
    )
    cnt = interval_join(
        li,
        ri,
        left_lo="lo",
        left_hi="hi",
        right_lo="lo",
        right_hi="hi",
        bucket_width=10.0,  # intervals span 11 buckets: the dedup rule is live
    ).to_spark().count()
    assert cnt == n * n


def test_band_join_all_equal_counts_once(spark, pl):
    from polars_spark.functions import band_join

    n = 60
    lb = pl.LazyFrame(spark.range(n).select(F.col("id").alias("lid"), F.lit(5.0).alias("v")))
    rb = pl.LazyFrame(spark.range(n).select(F.col("id").alias("rid"), F.lit(5.0).alias("w")))
    assert band_join(lb, rb, "v", "w", band=1.0).to_spark().count() == n * n


def test_contamination_exact_probe_counts(spark):
    """Every corpus doc shares one 8-gram with every probe doc: n_hits and
    n_probe_docs must both be exact under maximal collision."""
    from polars_spark.llm import contamination_check

    phrase = "the quick brown fox jumps over the lazy"
    corpus = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"doc {phrase} tail "), F.col("id").cast("string")).alias("text"),
    )
    probes = spark.range(7).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"probe {phrase} q"), F.col("id").cast("string")).alias("text"),
    )
    out = contamination_check(corpus, probes, n=8).collect()
    assert len(out) == 50
    assert {r.n_probe_docs for r in out} == {7}
