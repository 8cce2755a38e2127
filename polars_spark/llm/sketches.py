"""Mergeable cardinality sketches over corpus slices (Apache DataSketches
HLL via Spark's hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

The 100 TB pattern this enables: distinct-count statistics (unique
documents / urls / shingles per source, per day) maintained INCREMENTALLY —
build one small sketch table per ingest batch, persist it as plain parquet
(the sketch is a binary column), and answer "distincts so far" by unioning
sketches instead of rescanning the corpus.  A year of daily batches is 365
tiny sketch rows per key, not a 100 TB re-aggregation; sketches also union
across keys (e.g. per-source -> global) losslessly at fixed error
(~1.6%/sqrt(2^lgk) standard error, lgk=12 default -> ~1.6%).

polars has approx_n_unique (HyperLogLog++, polars-compute/
hyperloglogplus.rs) but no persistable/mergeable sketch surface — this is
the Spark-native upgrade of that §2.3 row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["build_distinct_sketches", "union_sketch_estimates", "incremental_distinct"]


def build_distinct_sketches(
    df: DataFrame,
    keys,
    value_col: str,
    *,
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch per key group over ``value_col`` -> (keys..., sketch,
    batch_rows).  The output is small (keys x ~2^lgk bytes) and writable to
    parquet as-is."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, lgk).alias(sketch_col),
        F.count(F.lit(1)).alias("batch_rows"),
    )


def union_sketch_estimates(
    sketches: DataFrame,
    keys,
    *,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketch rows per key (across batches/partitions/days) ->
    (keys..., distinct_est, total_rows).  Any regrouping is valid — union
    is associative and lossless at the sketch's precision."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("distinct_est"),
    ]
    if "batch_rows" in sketches.columns:
        agg.append(F.sum("batch_rows").alias("total_rows"))
    return sketches.groupBy(*keys).agg(*agg)


def incremental_distinct(
    existing_sketches: DataFrame | None,
    new_batch: DataFrame,
    keys,
    value_col: str,
    *,
    lgk: int = 12,
) -> DataFrame:
    """Fold one new ingest batch into the persisted sketch table: sketch
    the batch, union with the existing sketches per key.  The returned
    frame replaces the sketch table (same schema), so the pattern is
    read-parquet -> incremental_distinct -> overwrite-parquet — cost
    proportional to the BATCH, never the corpus."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    fresh = build_distinct_sketches(new_batch, keys, value_col, lgk=lgk)
    if existing_sketches is None:
        return fresh
    both = existing_sketches.select(*keys, "sketch", "batch_rows").unionByName(
        fresh.select(*keys, "sketch", "batch_rows")
    )
    return both.groupBy(*keys).agg(
        F.hll_union_agg("sketch").alias("sketch"),
        F.sum("batch_rows").alias("batch_rows"),
    )
