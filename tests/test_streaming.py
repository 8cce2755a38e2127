"""Structured Streaming: file-source windowed aggregation with watermark,
availableNow trigger, memory sink — deterministic end-to-end."""

import pandas as pd
import pytest


def test_stream_windowed_counts(spark, pl, tmp_path):
    from polars_spark.streaming import dynamic_stream_agg, scan_stream_parquet, sink_stream_memory
    from pyspark.sql import functions as F

    src = str(tmp_path / "stream_src")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:05", "2024-01-01 00:20", "2024-01-01 00:35", "2024-01-01 01:05"]
            ),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    pl.from_pandas(pdf).sink_parquet(src)

    stream = scan_stream_parquet(src, schema="ts timestamp, v double", spark=spark)
    agg = dynamic_stream_agg(
        stream,
        index_column="ts",
        every="30m",
        watermark="2h",
        aggs=[F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")],
    )
    q = sink_stream_memory(agg, "win_counts")
    q.awaitTermination(120)

    out = spark.sql("SELECT * FROM win_counts ORDER BY ts").toPandas()
    assert out["ts"].tolist() == [
        pd.Timestamp("2024-01-01 00:00"),
        pd.Timestamp("2024-01-01 00:30"),
        pd.Timestamp("2024-01-01 01:00"),
    ]
    assert out["total"].tolist() == [3.0, 3.0, 4.0]
    assert out["n"].tolist() == [2, 1, 1]


def test_stream_parquet_sink_roundtrip(spark, pl, tmp_path):
    from polars_spark.streaming import scan_stream_parquet, sink_stream_parquet

    src = str(tmp_path / "s2_src")
    out = str(tmp_path / "s2_out")
    ckpt = str(tmp_path / "s2_ckpt")
    pl.from_pandas(pd.DataFrame({"x": [1, 2, 3]})).sink_parquet(src)

    stream = scan_stream_parquet(src, schema="x bigint", spark=spark)
    q = sink_stream_parquet(stream.where("x > 1"), out, ckpt)
    q.awaitTermination(120)

    back = pl.scan_parquet(out).collect()
    assert sorted(back["x"].tolist()) == [2, 3]


def test_stateful_running_totals(spark, pl, tmp_path):
    from polars_spark.streaming import scan_stream_parquet, stateful_running_totals

    src = str(tmp_path / "s3_src")
    pdf = pd.DataFrame({"user_id": [1, 1, 2, 2, 2], "value": [1.0, 2.0, 10.0, 20.0, 30.0]})
    pl.from_pandas(pdf).sink_parquet(src)

    stream = scan_stream_parquet(src, schema="user_id long, value double", spark=spark)
    totals = stateful_running_totals(stream, key="user_id", value="value")
    q = (
        totals.writeStream.format("memory")
        .queryName("run_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM run_totals ORDER BY user_id").toPandas()
    got = {int(r.user_id): (int(r.n), float(r.total)) for r in out.itertuples()}
    assert got == {1: (2, 3.0), 2: (3, 60.0)}


def test_stateful_dedup(spark, pl, tmp_path):
    from polars_spark.streaming import scan_stream_parquet, stateful_dedup

    src = str(tmp_path / "s4_src")
    pdf = pd.DataFrame({"fp": [7, 7, 8, 9, 9, 9], "payload": list("abcdef")})
    pl.from_pandas(pdf).sink_parquet(src)

    stream = scan_stream_parquet(src, schema="fp long, payload string", spark=spark)
    deduped = stateful_dedup(stream, key="fp")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").toPandas()
    assert sorted(out["fp"].tolist()) == [7, 8, 9]  # one row per key
