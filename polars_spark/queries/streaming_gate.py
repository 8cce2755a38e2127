"""Structured Streaming gate queries: REAL streaming runs (readStream ->
watermark/window/state -> memory sink, availableNow trigger) whose final
output is hash-compared against a batch DuckDB oracle.

availableNow gives exactly-once batch-catchup over the static fixture
files, so the streaming result must equal the batch aggregation — that
equivalence IS the correctness contract (the same code then runs unchanged
against an unbounded directory/Kafka source at 100 TB/day, with state
bounded by the watermark horizon).

The memory-sink table is read once and materialized to a driver-local
result before returning (results are small aggregates); each run uses a
fresh query name so in-session reruns (the determinism sweep) never
collide on sink tables.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from polars_spark.queries import query

_SEQ = itertools.count()

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _events_stream_dir(sf_dir: str) -> str:
    """Spark's file streaming source reads a DIRECTORY (it tails new files
    as they arrive).  The fixtures are single parquet files, so stage a
    stable per-sf temp directory holding a symlink to the file — in
    production this path is the landing directory itself."""
    import hashlib
    import os

    src = os.path.join(sf_dir, "events.parquet")
    # key the staging dir on the SOURCE CONTENT fingerprint, not the path
    # alone: degenerate-sweep scratch dirs embed pids, and a recycled pid
    # (or any stale /tmp state) must never serve another run's symlinks —
    # round-9 preflight saw exactly one such cross-mode read
    try:
        st = os.stat(src)
        fp = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        fp = sf_dir
    d = f"/tmp/polars_spark_stream/{hashlib.md5(fp.encode()).hexdigest()[:12]}/events"
    os.makedirs(d, exist_ok=True)
    # a Spark-written fixture is a DIRECTORY of part files: symlink each
    # part file (a directory symlink hides the data from the file stream
    # source, which lists *files* — silently zero rows, r8 sf1 bench)
    targets = (
        sorted(
            os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
        )
        if os.path.isdir(src)
        else [src]
    )
    legacy = os.path.join(d, "events.parquet")  # pre-r8 single-link layout
    if os.path.islink(legacy):
        try:
            os.unlink(legacy)
        except OSError:
            pass
    for i, t in enumerate(targets):
        link = os.path.join(d, f"events_{i}.parquet")
        # tolerate the create race: two concurrent processes staging the
        # same sf_dir both point the link at the same target, losing is fine
        try:
            os.symlink(t, link)
        except FileExistsError:
            pass
    return d


def _run_to_batch(spark, stream_df, *, output_mode: str) -> "object":
    """Start the stream into a memory sink, drain with availableNow, and
    return the sink contents re-materialized as a plain batch DataFrame."""
    name = f"sgate_{next(_SEQ)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pdf = spark.table(name).toPandas()
    return spark.createDataFrame(pdf) if len(pdf) else spark.table(name)


@query(
    "stream_tumbling_1h",
    oracle="""
    SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS ts,
           floor(sum(value) * 1e4 + 0.5) / 1e4 AS total, count(*) AS n
    FROM events WHERE ts IS NOT NULL GROUP BY event_type, 2
    """,
)
def stream_tumbling_1h(spark, sf_dir):
    """Streaming tumbling-window aggregate == its batch twin
    (tmp_tumbling_1h): readStream over the events files, 2h watermark
    (bounds window state on an unbounded source), 1h windows keyed by
    event_type, complete mode so every window emits under availableNow."""
    from polars_spark.queries import fround
    from polars_spark.streaming import scan_stream_parquet

    src = scan_stream_parquet(
        _events_stream_dir(sf_dir), schema=_EVENTS_SCHEMA, spark=spark
    )
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            fround(F.sum("value"), 4).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("event_type", F.col("w.start").alias("ts"), "total", "n")
    )
    return _run_to_batch(spark, agg, output_mode="complete")


@query(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_keys(spark, sf_dir):
    """Streaming exact dedup with BOUNDED state
    (dropDuplicatesWithinWatermark): first occurrence of each
    (user_id, event_type) passes, duplicates are suppressed while the key
    is inside the watermark horizon.  The fixture's event stream spans far
    less than the 30-day horizon, so the streaming result equals batch
    DISTINCT — the unbounded-source behavior (state eviction) is what the
    horizon parameter controls in production."""
    from polars_spark.streaming import dedup_within_watermark, scan_stream_parquet

    src = scan_stream_parquet(
        _events_stream_dir(sf_dir), schema=_EVENTS_SCHEMA, spark=spark
    )
    deduped = dedup_within_watermark(
        src, key=["user_id", "event_type"], index_column="ts", watermark="720h"
    )
    out = deduped.select("user_id", "event_type")
    return _run_to_batch(spark, out, output_mode="append")


@query(
    "stream_running_totals",
    oracle="""
    SELECT user_id, count(*) AS n,
           floor(coalesce(sum(value), 0) * 1e4 + 0.5) / 1e4 AS total
    FROM events GROUP BY user_id
    """,
)
def stream_running_totals(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user running
    (count, sum) in the state store.  Under availableNow each key's LAST
    emitted update is the full-history total, so taking the final state per
    key equals the batch aggregate.  The fixture is one file -> one
    micro-batch; multi-batch runs emit intermediate updates too, which the
    max-n filter below would still reduce to the final row per key."""
    from polars_spark.queries import fround
    from polars_spark.streaming import scan_stream_parquet, stateful_running_totals

    src = scan_stream_parquet(
        _events_stream_dir(sf_dir), schema=_EVENTS_SCHEMA, spark=spark
    )
    totals = stateful_running_totals(src, key="user_id", value="value")
    batch = _run_to_batch(spark, totals, output_mode="update")
    # keep the final (largest-n) update per key, then pin float repr
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        batch.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("user_id", "n", fround(F.col("total"), 4).alias("total"))
    )


@query(
    "stream_interval_join_agg",
    oracle="""
    SELECT a.event_type AS etype_a, b.event_type AS etype_b, count(*) AS n,
           floor(sum(b.value) * 1e4 + 0.5) / 1e4 AS total_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts + INTERVAL 1 SECOND
     AND b.ts <= a.ts + INTERVAL 30 MINUTE
    GROUP BY 1, 2
    """,
)
def stream_interval_join_agg(spark, sf_dir):
    """Stream-stream event-time interval join (both sides watermarked, so
    the join state store is bounded by the interval + watermark horizon):
    same-user event pairs within (0, 30m].  The joined stream lands in the
    sink append-mode; the tiny pair set is then aggregated batch-side —
    at production scale the aggregation would chain as a second stateful
    operator, the join itself is the part with distributed state."""
    from polars_spark.queries import fround
    from polars_spark.streaming import scan_stream_parquet, stream_interval_join

    d = _events_stream_dir(sf_dir)
    left = scan_stream_parquet(d, schema=_EVENTS_SCHEMA, spark=spark)
    right = scan_stream_parquet(d, schema=_EVENTS_SCHEMA, spark=spark)
    joined = stream_interval_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower="1s",
        upper="30m",
        watermark="1h",
    ).select(
        F.col("l.event_type").alias("etype_a"),
        F.col("r.event_type").alias("etype_b"),
        F.col("r.value").alias("value_b"),
    )
    pairs = _run_to_batch(spark, joined, output_mode="append")
    return pairs.groupBy("etype_a", "etype_b").agg(
        F.count(F.lit(1)).alias("n"),
        fround(F.sum("value_b"), 4).alias("total_b"),
    )


@query(
    "stream_session_windows",
    # identical gaps-and-islands replay as the batch twin tmp_session_windows
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events WHERE ts IS NOT NULL
    ), g AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           floor(sum(value) * 1e4 + 0.5) / 1e4 AS total
    FROM g GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark, sf_dir):
    """STREAMING sessionization (F.session_window on an unbounded source):
    gap-merged variable-length windows per user, state bounded by the
    watermark horizon; availableNow + complete mode makes the result equal
    the batch twin (tmp_session_windows), which is the gate's contract.
    At 100 TB/day the same plan runs on a directory/Kafka source with the
    session state store keyed (user_id, session) and evicted by watermark."""
    from polars_spark.queries import fround
    from polars_spark.streaming import scan_stream_parquet

    src = scan_stream_parquet(
        _events_stream_dir(sf_dir), schema=_EVENTS_SCHEMA, spark=spark
    )
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fround(F.sum("value"), 4).alias("total"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total",
        )
    )
    return _run_to_batch(spark, agg, output_mode="complete")
