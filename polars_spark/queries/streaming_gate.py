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


def _stream_dir(sf_dir: str, table: str = "events") -> str:
    """Spark's file streaming source reads a DIRECTORY (it tails new files
    as they arrive).  The fixtures are single parquet files, so stage a
    stable per-sf temp directory holding a symlink to the file — in
    production this path is the landing directory itself."""
    import hashlib
    import os

    src = os.path.join(sf_dir, f"{table}.parquet")
    # key the staging dir on the SOURCE CONTENT fingerprint, not the path
    # alone: degenerate-sweep scratch dirs embed pids, and a recycled pid
    # (or any stale /tmp state) must never serve another run's symlinks —
    # round-9 preflight saw exactly one such cross-mode read
    try:
        st = os.stat(src)
        fp = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        fp = sf_dir
    d = f"/tmp/polars_spark_stream/{hashlib.md5(fp.encode()).hexdigest()[:12]}/{table}"
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
    legacy = os.path.join(d, f"{table}.parquet")  # pre-r8 single-link layout
    if os.path.islink(legacy):
        try:
            os.unlink(legacy)
        except OSError:
            pass
    for i, t in enumerate(targets):
        link = os.path.join(d, f"{table}_{i}.parquet")
        # tolerate the create race: two concurrent processes staging the
        # same sf_dir both point the link at the same target, losing is fine
        try:
            os.symlink(t, link)
        except FileExistsError:
            pass
    return d


def _events_stream_dir(sf_dir: str) -> str:
    return _stream_dir(sf_dir, "events")


def _run_to_batch(spark, stream_df, *, output_mode: str) -> "object":
    """Start the stream into a memory sink, drain with availableNow, and
    return the sink table as a batch DataFrame.

    Returned DIRECTLY (r13, guide §4): the old toPandas->createDataFrame
    round trip pulled every sink row through the driver and re-parallelized
    it just so the caller could sink it again — a pure Python-boundary tax
    in the timed path.  The sink table is already driver-local (memory sink
    semantics), stable after awaitTermination, and uniquely named per run,
    so reading it lazily is equivalent."""
    name = f"sgate_{next(_SEQ)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


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


_DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


@query(
    "stream_minhash_suppress",
    # exact-jaccard oracle (dedup_minhash_lsh rationale: in-stream
    # verification makes precision 1.0, and the deterministic hashes give
    # 100% recall on this corpus's clique-shaped clusters): a doc is
    # suppressed iff a SMALLER doc is >= 0.8-similar, and its representative
    # is the smallest such doc — exactly the star-link construction the
    # stateful operator reproduces under an availableNow catch-up run.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
             generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1) AS pos
      FROM documents WHERE text IS NOT NULL
    ),
    sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    jac AS (
      SELECT s1.doc_id AS d1, s2.doc_id AS d2,
             count(*)::DOUBLE / (a.n + b.n - count(*)) AS j
      FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
      JOIN sizes a ON a.doc_id = s1.doc_id
      JOIN sizes b ON b.doc_id = s2.doc_id
      GROUP BY s1.doc_id, s2.doc_id, a.n, b.n
      HAVING count(*)::DOUBLE / (a.n + b.n - count(*)) >= 0.8
    ),
    reps AS (SELECT d2 AS doc, min(d1) AS rep FROM jac GROUP BY d2)
    SELECT r.doc, r.rep, floor(j.j * 1e6 + 0.5) / 1e6 AS jaccard
    FROM reps r JOIN jac j ON j.d2 = r.doc AND j.d1 = r.rep
    """,
)
def stream_minhash_suppress(spark, sf_dir):
    """Streaming near-duplicate suppression at ingest
    (streaming.streaming_minhash_suppress): per-band bucket representatives
    in the state store, exact-verified matches emitted continuously.  A doc
    can match its representative in several bands — the final projection
    keeps the (min-rep, jaccard) match per doc, which under availableNow
    equals the batch star-link edge set."""
    from polars_spark.streaming import scan_stream_parquet, streaming_minhash_suppress

    src = scan_stream_parquet(
        _stream_dir(sf_dir, "documents"), schema=_DOCS_SCHEMA, spark=spark
    )
    static_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    matches = streaming_minhash_suppress(
        src, static_docs, id_col="doc_id", text_col="text"
    )
    batch = _run_to_batch(spark, matches, output_mode="update")
    return (
        batch.groupBy("doc")
        .agg(F.min(F.struct("rep", "jaccard")).alias("m"))
        .select("doc", F.col("m.rep").alias("rep"), F.col("m.jaccard").alias("jaccard"))
    )
