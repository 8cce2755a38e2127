"""Embedding compression operators: symmetric int8 quantization and
quantized similarity search.

At 100 TB an embedding column dominates storage and shuffle width: 64-dim
float32 = 256 B/row, int8 + one scale = 72 B/row (3.5x less scan, shuffle
and memory per vector — the difference between a corpus fitting executor
memory or spilling).  Everything here is JVM-side higher-order-function
column algebra; the integer dot products are EXACT, so the only float in
the pipeline is the per-vector scale — which makes the whole search replay
bit-identically in any engine (see the sim_int8_topk oracle).

Quantization scheme: per-vector symmetric absmax — scale = max|x| / 127,
q_i = clamp(floor(x_i / scale + 0.5), -127, 127) (floor(x+0.5) instead of
round() for cross-engine tie stability, same rule as queries.fround).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quantize_int8", "dequantize_int8", "int8_dot", "quantized_topk"]


def quantize_int8(vec: Column) -> Column:
    """array<double> -> struct(scale double, q array<int>) symmetric absmax
    int8 quantization (q values in [-127, 127]; int storage keeps the DDL
    portable — parquet dictionary/byte-packing shrinks it on disk)."""
    scale = F.array_max(F.transform(vec, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.transform(
        vec,
        lambda x: F.when(scale == 0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)).cast("int")),
            )
        ),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qs: Column) -> Column:
    """Inverse of quantize_int8: struct(scale, q) -> array<double>."""
    scale = qs["scale"]
    return F.transform(qs["q"], lambda v: v.cast("double") * scale)


def int8_dot(qa: Column, qb: Column) -> Column:
    """Exact integer dot product of two quantized arrays (bigint — no
    float noise; 64 * 127 * 127 is far inside int64)."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda a, b: (a * b).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k cosine over int8-quantized vectors.

    The corpus is scanned once with the small probe set broadcast
    (BroadcastNestedLoopJoin — the right plan for few probes; for many
    probes compose with the LSH/IVF bucketing in polars_spark.llm).  The
    candidate score is (integer dot) * scale_a * scale_b over L2-normalized
    inputs — approximate cosine whose only inexactness is the quantization
    itself, measured by the emb_quantize_error gate query.
    """
    def prep(df, prefix):
        v = F.col(vec_col).cast("array<double>")
        nrm = F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
            )
        )
        unit = F.transform(v, lambda x: x / nrm)
        qs = quantize_int8(unit)
        return df.select(
            F.col(id_col).alias(f"{prefix}id"),
            qs["scale"].alias(f"{prefix}scale"),
            qs["q"].alias(f"{prefix}q"),
        )

    corpus = prep(emb, "n")
    probes = prep(queries, "q")
    scored = (
        corpus.join(F.broadcast(probes), F.col("qid") != F.col("nid"))
        .withColumn(
            "sim",
            F.floor(
                (int8_dot(F.col("qq"), F.col("nq")) * F.col("qscale")) * F.col("nscale")
                * 1e6
                + F.lit(0.5),
            )
            / 1e6,
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "sim", "rk")
    )
