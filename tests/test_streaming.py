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


def test_stream_interval_join(spark, pl, tmp_path):
    """Impressions joined to clicks by user within [imp_ts, imp_ts + 30m]."""
    from polars_spark.streaming import scan_stream_parquet, sink_stream_memory, stream_interval_join
    from pyspark.sql import functions as F

    imp_src, clk_src = str(tmp_path / "imp"), str(tmp_path / "clk")
    pl.from_pandas(
        pd.DataFrame(
            {
                "user": [1, 1, 2],
                "imp_ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 10:00"]),
                "ad": ["a", "b", "c"],
            }
        )
    ).sink_parquet(imp_src)
    pl.from_pandas(
        pd.DataFrame(
            {
                "user": [1, 1, 2],
                "clk_ts": pd.to_datetime(["2024-01-01 10:10", "2024-01-01 11:45", "2024-01-01 10:20"]),
            }
        )
    ).sink_parquet(clk_src)

    imps = scan_stream_parquet(imp_src, schema="user bigint, imp_ts timestamp, ad string", spark=spark)
    clks = scan_stream_parquet(clk_src, schema="user bigint, clk_ts timestamp", spark=spark)
    joined = stream_interval_join(
        imps, clks, on="user", left_ts="imp_ts", right_ts="clk_ts", lower="0s", upper="30m", watermark="2h"
    ).select(F.col("l.user").alias("user"), "ad", "clk_ts")
    q = sink_stream_memory(joined, "ij_out", output_mode="append")
    q.awaitTermination(120)

    out = spark.sql("SELECT user, ad FROM ij_out ORDER BY user, ad").toPandas()
    # user1 10:10 click matches only the 10:00 impression (11:45 is outside
    # 11:00+30m); user2 10:20 matches c
    assert list(map(tuple, out.itertuples(index=False, name=None))) == [(1, "a"), (2, "c")]


def test_stream_late_rows_dropped(spark, pl, tmp_path):
    """Append-mode watermark semantics across micro-batches: a row older
    than the watermark is DROPPED (its window never materializes), and only
    watermark-finalized windows are emitted."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from polars_spark.streaming import dynamic_stream_agg, scan_stream_parquet, sink_stream_memory
    from pyspark.sql import functions as F

    src = tmp_path / "late_src"
    src.mkdir()

    def write(name, ts_list, mtime):
        t = pa.table({"ts": pa.array(pd.to_datetime(ts_list), type=pa.timestamp("us"))})
        p = str(src / name)
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    now = _time.time()
    # Spark >= 3.4 filters late rows with the PREVIOUS batch's watermark
    # (eventTimeWatermarkForLateEvents) while evicting with the current one,
    # so the late row must arrive two batches after the data that outdates it.
    # batch 0: events 10:05, 10:20 -> watermark 10:05 (15m delay)
    write("f1.parquet", ["2024-01-01 10:05", "2024-01-01 10:20"], now - 300)
    # batch 1: advances the watermark to 11:15
    write("f2.parquet", ["2024-01-01 11:30"], now - 200)
    # batch 2: 09:50 is older than the late-events watermark (10:05) -> DROPPED
    write("f3.parquet", ["2024-01-01 09:50", "2024-01-01 12:00"], now - 100)

    stream = scan_stream_parquet(src.as_posix(), schema="ts timestamp", spark=spark, max_files_per_trigger=1)
    agg = dynamic_stream_agg(
        stream, index_column="ts", every="30m", watermark="15m", aggs=[F.count(F.lit(1)).alias("n")]
    )
    q = sink_stream_memory(agg, "late_out", output_mode="append")
    q.awaitTermination(120)

    out = spark.sql("SELECT ts, n FROM late_out ORDER BY ts").toPandas()
    got = list(map(tuple, out.itertuples(index=False, name=None)))
    # the 09:30-10:00 window (late 09:50 row) must NOT appear; the 10:00-10:30
    # window (2 on-time rows) is finalized once the watermark passes 10:30
    assert (pd.Timestamp("2024-01-01 09:30"), 1) not in got
    assert (pd.Timestamp("2024-01-01 10:00"), 2) in got
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1


def test_session_stream_agg(spark, pl, tmp_path):
    """Two sessions per user separated by > gap inactivity; session bounds
    merge transitively (a-b-c chained within gap = one session)."""
    from pyspark.sql import functions as F

    from polars_spark.streaming import scan_stream_parquet, session_stream_agg, sink_stream_memory

    src = str(tmp_path / "sess_src")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:19",  # one session (chained)
                    "2024-01-01 02:00",                                          # second session
                ]
            ),
            "user": ["u1"] * 4,
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    pl.from_pandas(pdf).sink_parquet(src)
    stream = scan_stream_parquet(src, schema="ts timestamp, user string, v double", spark=spark)
    agg = session_stream_agg(
        stream,
        index_column="ts",
        gap="15m",
        group_by="user",
        watermark="4h",
        aggs=[F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")],
    )
    q = sink_stream_memory(agg, "sessions")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sessions ORDER BY session_start").toPandas()
    assert len(out) == 2
    assert out["n"].tolist() == [3, 1]
    assert out["total"].tolist() == [6.0, 4.0]
    # chained merge: session 1 spans 00:00 .. 00:19+gap
    assert out["session_start"].tolist()[0] == pd.Timestamp("2024-01-01 00:00")
    assert out["session_end"].tolist()[0] == pd.Timestamp("2024-01-01 00:34")


def test_dedup_within_watermark(spark, pl, tmp_path):
    from polars_spark.streaming import dedup_within_watermark, scan_stream_parquet, sink_stream_memory

    src = str(tmp_path / "dwm_src")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:02", "2024-01-01 00:03"]
            ),
            "k": ["a", "a", "b", "a"],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    pl.from_pandas(pdf).sink_parquet(src)
    stream = scan_stream_parquet(src, schema="ts timestamp, k string, v double", spark=spark)
    out_stream = dedup_within_watermark(stream, key="k", index_column="ts", watermark="1h")
    # no aggregation in the plan -> append mode (complete needs agg state)
    q = sink_stream_memory(out_stream, "dwm_out", output_mode="append")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dwm_out ORDER BY k").toPandas()
    assert out["k"].tolist() == ["a", "b"]


def test_stateful_topk_transform_with_state(spark, pl, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API): per-key top-3
    leaderboard maintained in a ListState across micro-batches.  Skipped
    where protobuf (the TWS state protocol) is absent from the image."""
    import pytest

    pytest.importorskip("google.protobuf")
    from polars_spark.streaming import scan_stream_parquet, stateful_topk

    src = str(tmp_path / "twsip_src")
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "value": [5.0, 9.0, 1.0, 7.0, 3.0, 4.0],
        }
    )
    pl.from_pandas(pdf).sink_parquet(src)

    stream = scan_stream_parquet(src, schema="user_id long, value double", spark=spark)
    top = stateful_topk(stream, key="user_id", value="value", k=3)
    q = (
        top.writeStream.format("memory")
        .queryName("topk_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT * FROM topk_out ORDER BY user_id, rank"
    ).toPandas()
    by_user = {
        u: g.sort_values("rank")["value"].tolist()
        for u, g in out.groupby("user_id")
    }
    assert by_user[1] == [9.0, 7.0, 5.0]
    assert by_user[2] == [4.0, 3.0]


def test_sink_stream_upsert_idempotent(spark, pl, tmp_path):
    """foreachBatch ingest-dedup: re-delivered keys never duplicate on disk."""
    from polars_spark.streaming import scan_stream_parquet, sink_stream_upsert

    src = str(tmp_path / "ups_src")
    out = str(tmp_path / "ups_out")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")

    pd1 = pd.DataFrame({"k": [1, 1, 2], "v": ["a", "a2", "b"]})
    pl.from_pandas(pd1).sink_parquet(src)
    stream = scan_stream_parquet(src, schema="k long, v string", spark=spark)
    q = sink_stream_upsert(stream, out, ck1, key="k")
    q.awaitTermination(120)

    # second run, fresh checkpoint (simulates a replay): overlapping keys
    # 1/2 must not duplicate, new key 3 lands
    src2 = str(tmp_path / "ups_src2")
    pd2 = pd.DataFrame({"k": [2, 3], "v": ["b-again", "c"]})
    pl.from_pandas(pd2).sink_parquet(src2)
    stream2 = scan_stream_parquet(src2, schema="k long, v string", spark=spark)
    q2 = sink_stream_upsert(stream2, out, ck2, key="k")
    q2.awaitTermination(120)

    final = spark.read.parquet(out).toPandas()
    assert sorted(final["k"].tolist()) == [1, 2, 3]


def test_stream_enrich_static_join(spark, pl, tmp_path):
    from polars_spark.streaming import scan_stream_parquet, stream_enrich

    src = str(tmp_path / "enr_src")
    pl.from_pandas(pd.DataFrame({"user_id": [1, 2, 3], "v": [10.0, 20.0, 30.0]})).sink_parquet(src)
    dim = pl.DataFrame({"user_id": [1, 2], "tier": ["gold", "basic"]})
    stream = scan_stream_parquet(src, schema="user_id long, v double", spark=spark)
    out = stream_enrich(stream, dim, on="user_id")
    q = (
        out.writeStream.format("memory").queryName("enr_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM enr_out ORDER BY user_id").toPandas()
    assert got["tier"].tolist() == ["gold", "basic", None]


def test_streaming_gate_queries_smoke(pl, spark):
    """The 4 streaming registry queries run end-to-end at the smallest SF
    and produce the batch-equivalent shapes (full value parity is the
    oracle sweep's job)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    tumb = qs["stream_tumbling_1h"](spark, sf)
    assert set(tumb.columns) == {"event_type", "ts", "total", "n"}
    assert tumb.count() > 0
    dd = qs["stream_dedup_keys"](spark, sf)
    assert dd.count() == dd.select("user_id", "event_type").distinct().count()


def test_linear_fit_matches_numpy(pl, lf):
    import numpy as np

    x = [1.0, 2.0, 3.0, 4.0, 5.0]
    y = [2.0, 4.1, 5.9, 8.2, 9.8]
    f = lf(x=x, y=y)
    got = (
        f.select(pl.linear_fit(pl.col("y"), pl.col("x")).alias("f"))
        .collect()["f"]
        .iloc[0]
    )
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(got["slope"] - slope) < 1e-9
    assert abs(got["intercept"] - intercept) < 1e-9
    assert got["n"] == 5
    r = np.corrcoef(x, y)[0, 1] ** 2
    assert abs(got["r2"] - r) < 1e-9
