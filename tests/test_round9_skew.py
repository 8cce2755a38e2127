"""AQE skew-join behavior pinned (round-8 VERDICT item 3).

100 TB shuffles die on skew, not volume.  This test builds a zipf-hot
join key (one key holding ~20% of the fact rows), lowers the AQE skew
thresholds to toy scale, and asserts on the POST-AQE executed plan that
Spark actually split the skewed partition (``skew=true`` on the
SortMergeJoin) — and that the same join over uniform keys does NOT
trigger the split.  This is the plan-shape contract the engine relies on
at scale instead of hand-salting every hot key.

`pl.key_skew_profile` is asserted to flag the same key distribution the
AQE run split on (advice and behavior agree).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    # toy-scale thresholds so the 256MB default doesn't mask the behavior
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # enough shuffle partitions that the hot key's partition dwarfs the
    # median (factor 2 test) — at 4 partitions the uniform tail hides it
    "spark.sql.shuffle.partitions": "64",
}


@pytest.fixture()
def skew_confs(spark):
    old = {}
    for k, v in _SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _fact(spark, n: int, hot_share: float):
    # hot key 0 holds hot_share of rows; the rest spread over 5000 keys
    return spark.range(n).select(
        F.when(F.col("id") % F.lit(int(1 / hot_share)) == 0, F.lit(0))
        .otherwise((F.col("id") % 5000) + 1)
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )


def _dim(spark):
    return spark.range(5001).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))


def _executed_plan(df) -> str:
    df.collect()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_hot_key_join(pl, spark, skew_confs):
    fact = _fact(spark, 200_000, hot_share=0.2)
    # group key differs from the join key: AQE only splits a skewed join
    # when the split cannot break a downstream required distribution (a
    # groupBy on the SAME key would suppress it — itself a useful fact:
    # q3-class plans that reuse the join partitioning keep it)
    joined = (
        fact.join(_dim(spark), "k")
        .groupBy((F.col("v") % 10).alias("g"))
        .agg(F.sum("w").alias("s"))
    )
    plan = _executed_plan(joined)
    assert "skew=true" in plan, plan[:2000]


def test_uniform_join_no_skew_split(pl, spark, skew_confs):
    uniform = spark.range(200_000).select(
        (F.col("id") % 5000).alias("k"), (F.col("id") % 1000).alias("v")
    )
    joined = (
        uniform.join(_dim(spark), "k")
        .groupBy((F.col("v") % 10).alias("g"))
        .agg(F.sum("w").alias("s"))
    )
    plan = _executed_plan(joined)
    assert "skew=true" not in plan


def test_skew_profile_flags_the_hot_key(pl, spark):
    fact = _fact(spark, 200_000, hot_share=0.2)
    prof = pl.key_skew_profile(pl.LazyFrame(fact), "k").collect().iloc[0]
    # the hot key holds ~20% of rows -> skew_factor ~ 0.2 * n_keys
    assert prof["top_key_share"] == pytest.approx(0.2, rel=0.01)
    assert prof["skew_factor"] > 100  # vs ~1 for uniform keys
    uni = spark.range(200_000).select((F.col("id") % 5000).alias("k"))
    prof_u = pl.key_skew_profile(pl.LazyFrame(uni), "k").collect().iloc[0]
    assert prof_u["skew_factor"] < 2
