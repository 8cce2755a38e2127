"""The reference's committed benchmark corpus: the 10 h2oai db-benchmark
group-by queries (py-polars/tests/benchmark/test_group_by.py:19 ff.,
datagen_groupby.py:53-80), expressed over the lineitem table with the same
id/value shape: id1/id2 low-card strings, id3 high-card string, id4/id5
low-card ints, id6 high-card int, v1 small int, v2/v3 continuous.

Float discipline: v2/v3 are 2-decimal money columns — the classic
cross-engine rounding trap (group means of 2-decimal data land exactly on
round-tie boundaries).  Everything is therefore computed on integer CENTS
(exact in both engines) and only converted with a final deterministic
divide; std/corr, which are genuinely order-sensitive, go through fround.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_spark.queries import fround, query, table

_SQL_BASE = """
  SELECT l_returnflag AS id1, l_linestatus AS id2,
         'id' || CAST(l_partkey % 2000 AS VARCHAR) AS id3,
         CAST(l_suppkey % 100 AS INT) AS id4,
         CAST(l_partkey % 100 AS INT) AS id5,
         l_orderkey AS id6,
         CAST(l_quantity AS BIGINT) AS v1,
         CAST(round(l_discount * 100) AS BIGINT) AS v2c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v3c,
         l_linenumber AS ln
  FROM lineitem
"""


def _base(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_returnflag").alias("id1"),
        F.col("l_linestatus").alias("id2"),
        F.concat(F.lit("id"), (F.col("l_partkey") % 2000).cast("string")).alias("id3"),
        (F.col("l_suppkey") % 100).cast("int").alias("id4"),
        (F.col("l_partkey") % 100).cast("int").alias("id5"),
        F.col("l_orderkey").alias("id6"),
        F.col("l_quantity").cast("bigint").alias("v1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("v2c"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v3c"),
        F.col("l_linenumber").alias("ln"),
    )


@query(
    "h2o_q1",
    oracle=f"WITH t AS ({_SQL_BASE}) SELECT id1, CAST(sum(v1) AS BIGINT) AS v1_sum FROM t GROUP BY id1",
)
def h2o_q1(spark, sf_dir):
    """h2oai q1: sum(v1) by low-card string key — one partial-agg shuffle."""
    return _base(spark, sf_dir).groupBy("id1").agg(F.sum("v1").alias("v1_sum"))


@query(
    "h2o_q2",
    oracle=f"WITH t AS ({_SQL_BASE}) SELECT id1, id2, CAST(sum(v1) AS BIGINT) AS v1_sum FROM t GROUP BY id1, id2",
)
def h2o_q2(spark, sf_dir):
    """h2oai q2: sum(v1) by two low-card keys."""
    return _base(spark, sf_dir).groupBy("id1", "id2").agg(F.sum("v1").alias("v1_sum"))


@query(
    "h2o_q3",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT id3, CAST(sum(v1) AS BIGINT) AS v1_sum, sum(v3c) / 100.0 / count(*) AS v3_mean
    FROM t GROUP BY id3""",
)
def h2o_q3(spark, sf_dir):
    """h2oai q3: sum + mean by HIGH-card string key (the shuffle-heavy one);
    mean derived from the exact integer-cents sum so both engines agree
    bit-for-bit."""
    return (
        _base(spark, sf_dir)
        .groupBy("id3")
        .agg(
            F.sum("v1").alias("v1_sum"),
            (F.sum("v3c") / F.lit(100.0) / F.count(F.lit(1))).alias("v3_mean"),
        )
    )


@query(
    "h2o_q4",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT id4, CAST(sum(v1) AS DOUBLE) / count(*) AS v1_mean,
           sum(v2c) / 100.0 / count(*) AS v2_mean,
           sum(v3c) / 100.0 / count(*) AS v3_mean
    FROM t GROUP BY id4""",
)
def h2o_q4(spark, sf_dir):
    """h2oai q4: three means by low-card int key."""
    g = _base(spark, sf_dir).groupBy("id4")
    n = F.count(F.lit(1))
    return g.agg(
        (F.sum("v1").cast("double") / n).alias("v1_mean"),
        (F.sum("v2c") / F.lit(100.0) / n).alias("v2_mean"),
        (F.sum("v3c") / F.lit(100.0) / n).alias("v3_mean"),
    )


@query(
    "h2o_q5",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT id6, CAST(sum(v1) AS BIGINT) AS v1_sum, sum(v2c) / 100.0 AS v2_sum, sum(v3c) / 100.0 AS v3_sum
    FROM t GROUP BY id6""",
)
def h2o_q5(spark, sf_dir):
    """h2oai q5: three sums by HIGH-card int key (~N/4 groups)."""
    return (
        _base(spark, sf_dir)
        .groupBy("id6")
        .agg(
            F.sum("v1").alias("v1_sum"),
            (F.sum("v2c") / F.lit(100.0)).alias("v2_sum"),
            (F.sum("v3c") / F.lit(100.0)).alias("v3_sum"),
        )
    )


@query(
    "h2o_q6",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT id4, id5, quantile_cont(v3c, 0.5) / 100.0 AS v3_median,
           floor(stddev_samp(v3c) / 100.0 * 10000.0 + 0.5) / 10000.0 AS v3_std
    FROM t GROUP BY id4, id5""",
)
def h2o_q6(spark, sf_dir):
    """h2oai q6: median + std by two keys.  Median interpolates integer
    cents (deterministic); std is order-sensitive so it goes through
    fround(4)."""
    return (
        _base(spark, sf_dir)
        .groupBy("id4", "id5")
        .agg(
            (F.percentile("v3c", 0.5) / F.lit(100.0)).alias("v3_median"),
            fround(F.stddev_samp("v3c") / F.lit(100.0), 4).alias("v3_std"),
        )
    )


@query(
    "h2o_q7",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT id3, max(v1) - min(v2c) AS range_v1_v2 FROM t GROUP BY id3""",
)
def h2o_q7(spark, sf_dir):
    """h2oai q7: max - min by high-card string key (exact integers)."""
    return (
        _base(spark, sf_dir)
        .groupBy("id3")
        .agg((F.max("v1") - F.min("v2c")).alias("range_v1_v2"))
    )


@query(
    "h2o_q8",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT id6, v3c / 100.0 AS v3, rk FROM (
      SELECT id6, v3c, row_number() OVER (PARTITION BY id6 ORDER BY v3c DESC, ln) AS rk
      FROM t
    ) WHERE rk <= 2""",
)
def h2o_q8(spark, sf_dir):
    """h2oai q8: top-2 v3 per high-card group — one window exchange keyed
    by id6, no global sort; ties broken on the unique line number."""
    w = Window.partitionBy("id6").orderBy(F.col("v3c").desc(), F.col("ln"))
    return (
        _base(spark, sf_dir)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("id6", (F.col("v3c") / F.lit(100.0)).alias("v3"), "rk")
    )


@query(
    "h2o_q9",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT id2, id4, round(pow(corr(v1, v2c), 2), 6) AS r2
    FROM t GROUP BY id2, id4""",
)
def h2o_q9(spark, sf_dir):
    """h2oai q9: corr(v1, v2)^2 by two keys (round-6 absorbs
    summation-order noise; same pattern as agg_corr_r2)."""
    return (
        _base(spark, sf_dir)
        .groupBy("id2", "id4")
        .agg(F.round(F.pow(F.corr("v1", "v2c"), 2), 6).alias("r2"))
    )


@query(
    "h2o_q10",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT id1, id2, id3, id4, id5, id6,
           sum(v3c) / 100.0 AS v3_sum, count(*) AS n
    FROM t GROUP BY id1, id2, id3, id4, id5, id6""",
)
def h2o_q10(spark, sf_dir):
    """h2oai q10: sum + count by ALL six keys (near-row-level cardinality —
    the partial-agg stress case)."""
    return (
        _base(spark, sf_dir)
        .groupBy("id1", "id2", "id3", "id4", "id5", "id6")
        .agg((F.sum("v3c") / F.lit(100.0)).alias("v3_sum"), F.count(F.lit(1)).alias("n"))
    )


# -- the reference's filter benchmark family (test_filter.py:12,24):
#    one selective equality filter + sums, and its negation ----------------


@query(
    "h2o_f1_selective",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT count(*) AS n, CAST(sum(v1) AS BIGINT) AS v1_sum, sum(v3c) / 100.0 AS v3_sum
    FROM t WHERE id3 = 'id123'""",
)
def h2o_f1_selective(spark, sf_dir):
    """Selective filter (one of 2000 high-card keys) + sums."""
    return (
        _base(spark, sf_dir)
        .filter(F.col("id3") == "id123")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v1").alias("v1_sum"),
            (F.sum("v3c") / F.lit(100.0)).alias("v3_sum"),
        )
    )


@query(
    "h2o_f2_negated",
    oracle=f"""WITH t AS ({_SQL_BASE})
    SELECT count(*) AS n, CAST(sum(v1) AS BIGINT) AS v1_sum, sum(v3c) / 100.0 AS v3_sum
    FROM t WHERE id3 <> 'id123'""",
)
def h2o_f2_negated(spark, sf_dir):
    """Negated filter (keeps ~all rows) + sums — the anti-selective case."""
    return (
        _base(spark, sf_dir)
        .filter(F.col("id3") != "id123")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v1").alias("v1_sum"),
            (F.sum("v3c") / F.lit(100.0)).alias("v3_sum"),
        )
    )
