"""streaming_minhash_suppress: multi-micro-batch state persistence.

The oracle gate (stream_minhash_suppress) runs one availableNow batch;
this test forces TWO micro-batches (maxFilesPerTrigger=1) and asserts
the ingest-suppression contract across them: batch 1 establishes the
bucket representatives, and a near-duplicate arriving in batch 2 is
suppressed against the BATCH-1 representative (state store persistence),
not against anything in its own batch.  Also pins the verification plan:
the stream side must reach the corpus via broadcast joins (no sort-merge
of the streaming side).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

_TEXTS = {
    1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2: "one two three four five six seven eight nine ten",
    3: "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # dup of 1
    4: "totally different words nothing shared here at all whatsoever now",
}


def _write_batch(spark, path, ids):
    rows = [(i, _TEXTS[i], "en", "src", len(_TEXTS[i])) for i in ids]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_suppression_across_micro_batches(pl, spark, tmp_path):
    from polars_spark.streaming import streaming_minhash_suppress

    land = str(tmp_path / "landing")
    _write_batch(spark, land, [1, 2])  # batch 1: establishes representatives
    _write_batch(spark, land, [3, 4])  # batch 2: 3 duplicates 1

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    static_docs = spark.read.parquet(land)
    matches = streaming_minhash_suppress(src, static_docs, id_col="doc_id", text_col="text")
    q = (
        matches.writeStream.format("memory")
        .queryName("sup_mb")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    out = spark.table("sup_mb").select("doc", "rep", "jaccard").distinct().collect()
    pairs = {(r.doc, r.rep): r.jaccard for r in out}
    # doc 3 suppressed against the batch-1 representative 1, jaccard 1.0
    assert (3, 1) in pairs and pairs[(3, 1)] == 1.0, (pairs, n_batches)
    # nothing else is similar
    assert set(pairs) == {(3, 1)}, pairs
    assert n_batches >= 2, "expected multiple micro-batches (maxFilesPerTrigger=1)"


def test_verification_joins_are_broadcast(pl, spark, tmp_path):
    from polars_spark.streaming import streaming_minhash_suppress

    land = str(tmp_path / "landing2")
    _write_batch(spark, land, [1, 2, 3, 4])
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    src = spark.readStream.schema(schema).parquet(land)
    static_docs = spark.read.parquet(land)
    matches = streaming_minhash_suppress(src, static_docs, id_col="doc_id", text_col="text")
    q = (
        matches.writeStream.format("memory")
        .queryName("sup_plan")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    plan = q.explain(extended=False) or ""
    # q.explain prints; re-fetch via lastExecution
    jplan = q._jsq.explainInternal(False)
    assert "BroadcastHashJoin" in jplan, jplan[:1500]
    assert "SortMergeJoin" not in jplan, jplan[:1500]
    assert "FlatMapGroupsInPandasWithState" in jplan


def test_group_spanning_arrow_chunks_elects_min_representative(pl, spark, tmp_path):
    """Round-10 (ADVICE r9): a band bucket larger than arrow
    maxRecordsPerBatch arrives at the state handler as SEVERAL pandas
    chunks in one micro-batch.  The representative must be the min id of
    the WHOLE group (batch star-link contract), not of whichever chunk
    came first — force 1-row chunks and descending-id arrival so a
    per-chunk election would pick 9, and assert every edge points at 7."""
    from polars_spark.streaming import streaming_minhash_suppress

    land = str(tmp_path / "landing3")
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, text, "en", "src", len(text)) for i in (9, 8, 7)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("append").parquet(land)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
        src = spark.readStream.schema(schema).parquet(land)
        static_docs = spark.read.parquet(land)
        matches = streaming_minhash_suppress(src, static_docs, id_col="doc_id", text_col="text")
        q = (
            matches.writeStream.format("memory")
            .queryName("sup_chunks")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    out = spark.table("sup_chunks").select("doc", "rep").distinct().collect()
    pairs = {(r.doc, r.rep) for r in out}
    assert pairs == {(8, 7), (9, 7)}, pairs
