"""Structured Streaming surface.

The reference's "streaming engine" is an out-of-core *batch* executor
(polars-stream/ — morsel-driven, no watermarks or late-data policy; SURVEY
§2.10), so every polars streaming workload is covered by the batch API here.
This module adds what Spark gives beyond the reference: true incremental
event-stream processing with watermarks and windowed state — the natural way
to run the same `events`-style aggregations continuously at 100 TB/day.

Patterns:
- ``scan_stream_parquet(dir)`` — file-arrival streaming over a growing
  directory (the common data-lake tail-read).
- ``dynamic_stream_agg`` — the streaming twin of
  ``LazyFrame.group_by_dynamic``: tumbling/sliding window + watermark for
  late data; state is bounded by the watermark horizon.
- ``sink_stream_parquet/memory`` — checkpointed sinks; ``availableNow``
  trigger gives exactly-once batch-catchup semantics in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_spark.plans.frame import LazyFrame, _duration_str

__all__ = [
    "scan_stream_parquet",
    "scan_stream_rate",
    "dynamic_stream_agg",
    "stateful_running_totals",
    "stateful_dedup",
    "stateful_topk",
    "session_stream_agg",
    "dedup_within_watermark",
    "stream_interval_join",
    "stream_enrich",
    "sink_stream_memory",
    "sink_stream_parquet",
    "sink_stream_upsert",
]


def scan_stream_parquet(
    path: str,
    *,
    schema: str,
    spark: SparkSession | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental scan of a directory that accumulates parquet files.
    Schema must be explicit (streaming sources cannot infer).
    ``max_files_per_trigger`` bounds each micro-batch (files are taken
    oldest-modification-first), which also makes multi-batch watermark
    semantics testable with a static fixture set."""
    spark = spark or SparkSession.getActiveSession()
    from polars_spark.session import ensure_engine_confs

    ensure_engine_confs(spark)
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def scan_stream_rate(rows_per_second: int = 100, *, spark: SparkSession | None = None) -> DataFrame:
    spark = spark or SparkSession.getActiveSession()
    from polars_spark.session import ensure_engine_confs

    ensure_engine_confs(spark)
    return (
        spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    )


def dynamic_stream_agg(
    stream: DataFrame,
    *,
    index_column: str,
    every: str,
    period: str | None = None,
    group_by: Sequence[str] | str | None = None,
    watermark: str = "1h",
    aggs: Sequence | None = None,
) -> DataFrame:
    """Streaming group_by_dynamic: window + watermark.

    Late rows beyond ``watermark`` are dropped and their windows finalized —
    the state store stays bounded no matter how long the stream runs (the
    polars batch engine has no equivalent; SURVEY §2.10)."""
    gb = [group_by] if isinstance(group_by, str) else list(group_by or [])
    win = F.window(
        F.col(index_column), _duration_str(period or every), _duration_str(every)
    )
    agg_cols = list(aggs) if aggs else [F.count(F.lit(1)).alias("n")]
    out = (
        stream.withWatermark(index_column, _duration_str(watermark))
        .groupBy(*gb, win.alias("__w__"))
        .agg(*agg_cols)
    )
    return out.withColumn(index_column, F.col("__w__.start")).drop("__w__")


def session_stream_agg(
    stream: DataFrame,
    *,
    index_column: str,
    gap: str,
    group_by: Sequence[str] | str | None = None,
    watermark: str = "1h",
    aggs: Sequence | None = None,
) -> DataFrame:
    """Sessionization: variable-length session windows that close after
    ``gap`` of inactivity per key (F.session_window — merging window state,
    no batch equivalent in the reference).  Watermark bounds the state
    store: a session finalizes once the watermark passes its end + gap."""
    gb = [group_by] if isinstance(group_by, str) else list(group_by or [])
    win = F.session_window(F.col(index_column), _duration_str(gap))
    agg_cols = list(aggs) if aggs else [F.count(F.lit(1)).alias("n")]
    out = (
        stream.withWatermark(index_column, _duration_str(watermark))
        .groupBy(*gb, win.alias("__s__"))
        .agg(*agg_cols)
    )
    return (
        out.withColumn("session_start", F.col("__s__.start"))
        .withColumn("session_end", F.col("__s__.end"))
        .drop("__s__")
    )


def dedup_within_watermark(
    stream: DataFrame, *, key: str | Sequence[str], index_column: str, watermark: str = "1h"
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: dropDuplicatesWithinWatermark
    keeps each key only until the watermark passes it (the unbounded-state
    trap of plain dropDuplicates on an infinite stream).  The batch twin is
    llm.exact_dedup / LazyFrame.unique."""
    keys = [key] if isinstance(key, str) else list(key)
    return stream.withWatermark(index_column, _duration_str(watermark)).dropDuplicatesWithinWatermark(keys)


def stateful_running_totals(
    stream: DataFrame,
    *,
    key: str,
    value: str,
    state_timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-key running (count, sum) maintained in the state store across
    micro-batches.  The pattern for any user-defined streaming accumulator
    (sessionization, dedup-with-memory, rate limiting)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = f"{key} long, n long, total double"
    state_schema = "n long, total double"

    def update(key_tuple, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value].sum())
        state.update((n, total))
        yield pd.DataFrame({key: [key_tuple[0]], "n": [n], "total": [total]})

    return stream.groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "update", state_timeout
    )


def stateful_dedup(stream: DataFrame, *, key: str) -> DataFrame:
    """Streaming exact-dedup: emit each key's row only the FIRST time it is
    seen, remembering seen keys in the state store — the continuous version
    of llm.exact_dedup for ingest pipelines (dedup-with-memory)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    cols = stream.columns
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in stream.schema)

    def keep_first(key_tuple, pdfs, state: GroupState):
        seen = state.exists
        first = None
        for pdf in pdfs:
            if not seen and len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if not seen:
            state.update((1,))
            if first is not None:
                yield first[cols]
        else:
            yield pd.DataFrame(columns=cols)

    return stream.groupBy(key).applyInPandasWithState(
        keep_first, out_schema, "seen int", "update", "NoTimeout"
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on,
    left_ts: str,
    right_ts: str,
    lower: str = "0s",
    upper: str = "1h",
    watermark: str = "1h",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: rows pair when keys match and
    ``right_ts`` falls in [left_ts + lower, left_ts + upper].

    Both sides carry watermarks, so Spark bounds the join state store: a
    buffered left row can be evicted once the right watermark passes
    left_ts + upper (and vice versa) — the streaming analogue of
    join_asof/join_where for unbounded inputs.  ``how`` may be inner or the
    outer variants Spark supports for stream-stream joins (leftOuter etc.,
    which emit nulls only after watermark expiry)."""
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withWatermark(left_ts, _duration_str(watermark)).alias("l")
    r = right.withWatermark(right_ts, _duration_str(watermark)).alias("r")
    conds = [f"l.{k} = r.{k}" for k in keys]
    conds.append(f"r.{right_ts} >= l.{left_ts} + INTERVAL {_duration_str(lower)}")
    conds.append(f"r.{right_ts} <= l.{left_ts} + INTERVAL {_duration_str(upper)}")
    return l.join(r, F.expr(" AND ".join(conds)), how)


def sink_stream_memory(
    stream: DataFrame, name: str, *, available_now: bool = True, output_mode: str = "complete"
):
    """Memory sink (tests/debug): returns the started query; with
    ``available_now`` it processes the current backlog then stops cleanly.
    Use ``output_mode='append'`` to observe real watermark semantics
    (late-row dropping / window finalization) — in complete mode Spark
    keeps all state and the watermark drops nothing."""
    w = stream.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def sink_stream_parquet(stream: DataFrame, path: str, checkpoint: str, *, available_now: bool = True):
    w = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stateful_topk(
    stream: DataFrame,
    *,
    key: str,
    value: str,
    k: int = 5,
    ttl: str | None = None,
) -> DataFrame:
    """Per-key streaming top-k via transformWithStateInPandas (the Spark 4
    successor to applyInPandasWithState: typed state variables, optional
    per-state TTL, timers).

    Keeps each key's k largest values in a ListState across micro-batches
    and re-emits the refreshed leaderboard whenever the key receives data.
    State is O(k) per key, and with ``ttl`` set (e.g. "1h") idle keys are
    dropped by the state store itself — bounded state on an unbounded
    keyspace, which is what makes the operator safe on a 100 TB/day feed.
    """
    import pandas as pd

    try:
        # the TWS state protocol speaks protobuf between the JVM and the
        # Python state server; without it the streaming runner crashes at
        # init, so fail fast with the fix
        import google.protobuf.descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(absent from this image); applyInPandasWithState-based "
            "operators (stateful_running_totals, stateful_dedup) cover the "
            "same patterns without it"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from polars_spark.plans.frame import _duration_us

    ttl_ms = int(_duration_us(ttl) // 1000) if ttl else None
    out_schema = f"{key} bigint, rank int, {value} double"

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("topk", "v double", ttl_ms)

        def handleInputRows(self, key_, rows, timerValues):
            cur = [t[0] for t in self._top.get()] if self._top.exists() else []
            for pdf in rows:
                cur.extend(float(x) for x in pdf[value].dropna())
            cur = sorted(cur, reverse=True)[:k]
            self._top.put([(v,) for v in cur])
            yield pd.DataFrame(
                {
                    key: [key_[0]] * len(cur),
                    "rank": range(1, len(cur) + 1),
                    value: cur,
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=TopKProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def sink_stream_upsert(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    *,
    key: str,
    available_now: bool = True,
):
    """Idempotent insert-if-absent parquet ingest via foreachBatch.

    Each micro-batch is deduplicated on ``key``, anti-joined against the
    keys already on disk, and appended.  foreachBatch gives at-least-once
    batch delivery; the anti-join makes the append idempotent per key, so
    the sink is effectively exactly-once per key even across retries or
    replayed batches — the standard lakehouse ingest-dedup pattern when no
    transactional table format is available.

    Scale note: the existing-keys side is a key-column-only scan of the
    target (column pruning keeps it narrow); for very large targets swap
    in a bucketed key table or Delta MERGE when the connector is present.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([key])
        try:
            existing = spark.read.parquet(path).select(key).distinct()
            batch = batch.join(existing, key, "left_anti")
        except Exception:
            pass  # first batch: target does not exist yet
        batch.write.mode("append").parquet(path)

    w = stream.writeStream.foreachBatch(upsert).option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame | LazyFrame,
    *,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to each
    event as it arrives.  The static side is re-read per micro-batch (so a
    slowly-changing dim stays current) and Spark broadcasts it when small
    — the standard shape for decorating a 100 TB/day event feed with
    reference data, no state store involved."""
    d = dim.to_spark() if isinstance(dim, LazyFrame) else dim
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(d, keys, how)


def streaming_minhash_suppress(
    stream: DataFrame,
    static_corpus: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Streaming near-duplicate SUPPRESSION at ingest: the continuous form
    of llm.minhash_lsh_dedup's star-link construction.

    Two stages, split so the state store stays tiny:

    1. Candidate discovery (stateful): each document's MinHash band keys
       are computed JVM-side on the stream (same shingle/signature/band
       lowering as the batch path); per band bucket an
       applyInPandasWithState operator holds ONE LONG — the first-seen
       representative id — and emits (doc, rep) candidate edges for every
       later arrival.  State is linear in distinct content and independent
       of duplicate multiplicity; no payload rides the band shuffle.
    2. Verification (stateless stream-static join): candidates join the
       static corpus (in production: the landing table the stream appends
       to, re-read per micro-batch) on both endpoints and the exact
       jaccard is computed JVM-side (array_intersect on the distinct
       shingle sets) — only candidates are ever verified.

    Within one micro-batch, rows are processed in ``id_col`` order, so the
    min-id doc of a batch becomes the bucket representative — under an
    availableNow catch-up run this reproduces the batch star-link
    construction exactly (the correctness contract the gate checks).
    Carrying shingle sets in the state instead measured 7.5x slower on the
    gate corpus (the arrays ride the shuffle 8x and every bucket pays the
    python set arithmetic)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    from polars_spark.llm import lsh_band_keys, minhash_signature, shingles

    rows_per = k // bands
    base = stream.select(
        F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0)
    banded = base.select(
        "doc",
        F.explode(
            lsh_band_keys(minhash_signature(F.col("sh"), k=k), bands=bands, rows=rows_per)
        ).alias("band"),
    )

    def update(key_tuple, pdfs, state: GroupState):
        rep = state.get[0] if state.exists else None
        # buffer EVERY Arrow chunk before sorting: a band bucket larger than
        # arrow maxRecordsPerBatch arrives as several pdfs, and a per-chunk
        # sort could elect a non-minimal representative, breaking the
        # "min-id doc of the micro-batch is the bucket representative"
        # contract that makes availableNow replay equal the batch star-link
        # construction.  State is one long either way.
        docs = sorted(int(d) for pdf in pdfs for d in pdf["doc"])
        out = []
        for doc in docs:
            if rep is None:
                rep = doc
                continue
            out.append((doc, rep))
        if rep is not None:
            state.update((rep,))
        # most band buckets are singletons (they only elect a
        # representative and emit nothing) — yielding NO frame for them
        # skips a per-key pandas DataFrame construction, which dominated
        # the micro-batch at ~40k buckets (r13 driver thread dump: every
        # task blocked on the Python worker; same rows either way)
        if out:
            yield pd.DataFrame(out, columns=["doc", "rep"])

    # NO dropDuplicates here: shuffling applyInPandasWithState output hits
    # a Spark serializer bug (its Arrow ColumnarBatchRow reaches
    # UnsafeRowSerializer); the broadcast verification joins below never
    # shuffle the stream side, and consumers aggregate per doc anyway (a
    # doc matching its representative in several bands emits one row per
    # band, all with the same jaccard)
    cands = banded.groupBy("band").applyInPandasWithState(
        update, "doc long, rep long", "rep long", "update", "NoTimeout"
    )

    corpus_sh = static_corpus.select(
        F.col(id_col).alias("__cid"), shingles(F.col(text_col), n).alias("__csh")
    )
    # materialize the static side once (at scale this is the persisted
    # shingle table anyway); also keeps the broadcast build row-based
    corpus_sh = corpus_sh.localCheckpoint(eager=True)
    d_side = corpus_sh.select(F.col("__cid").alias("doc"), F.col("__csh").alias("dsh"))
    r_side = corpus_sh.select(F.col("__cid").alias("rep"), F.col("__csh").alias("rsh"))
    joined = cands.join(d_side, "doc").join(r_side, "rep")
    inter = F.size(F.array_intersect("dsh", "rsh"))
    union = F.size("dsh") + F.size("rsh") - inter
    j = inter.cast("double") / union
    return (
        joined.withColumn("jaccard", F.floor(j * 1e6 + F.lit(0.5)) / 1e6)
        .filter(F.col("jaccard") >= threshold)
        .select("doc", "rep", "jaccard")
    )
