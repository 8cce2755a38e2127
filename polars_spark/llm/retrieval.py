"""Lexical retrieval over a document corpus — BM25 scoring and top-k search.

The classic training-data-pipeline retrieval primitive (hard-negative
mining, dedup-by-retrieval, eval-set construction): build an inverted
index from the corpus, score candidate documents per query with
Okapi BM25, keep the top-k per query.

Scale design: every stage is a keyed shuffle —
  * postings: one explode + groupBy (doc, token);
  * document frequency / IDF: one groupBy token over the postings;
  * corpus stats (N, avgdl): 1-row aggregate broadcast-cross-joined
    (never a global window);
  * the query-terms x postings join is keyed by token, so it
    distributes like any inverted-index join (posting lists of stop
    tokens are the skew hazard at 100 TB — cap with max_df exactly as
    ngram_jaccard_pairs does);
  * top-k per query is a window partitioned by qid.
No UDFs anywhere — the whole plan is JVM column algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from polars_spark.llm import _spread, tokenize


def _postings(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = _spread(corpus).select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("token"),
    )
    return toks.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k corpus documents per query under Okapi BM25.

    IDF uses the Robertson/Sparck-Jones smoothed form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive, the Lucene
    convention).  Ties are broken on (rounded score desc, doc asc) so the
    ranking is deterministic across engines.

    ``max_df`` drops tokens appearing in more than that many documents
    (stopword posting lists are the scale hazard — same df-cap rule as the
    jaccard/minhash family).  ``exclude_self`` removes doc==qid matches for
    probe sets drawn from the corpus itself.
    """
    from pyspark.sql import Window

    postings = _postings(corpus, id_col, text_col).cache()
    dl = postings.groupBy("doc").agg(F.sum("tf").alias("dl"))
    dft = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dft = dft.filter(F.col("df") <= max_df)
    # 1-row corpus stats, broadcast — never a global window.  n_docs rides
    # the same broadcast row instead of a blocking corpus.count() at plan
    # construction (round 12): one fewer full pass over the corpus per
    # call, same exact value (count cast to double == float(count)).
    stats = dl.agg(F.avg("dl").alias("avgdl")).crossJoin(
        F.broadcast(corpus.agg(F.count(F.lit(1)).cast("double").alias("n_docs")))
    )

    qterms = queries.select(
        F.col(id_col).alias("qid"),
        F.explode(F.array_distinct(tokenize(F.lower(F.col(text_col))))).alias("token"),
    )

    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )

    scored = (
        qterms.join(postings, "token")
        .join(dft, "token")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
    )
    if exclude_self:
        scored = scored.filter(F.col("doc") != F.col("qid"))
    agg = scored.groupBy("qid", "doc").agg(F.sum(idf * tf_norm).alias("raw"))
    rounded = agg.select(
        "qid",
        "doc",
        (F.floor(F.col("raw") * 1e6 + F.lit(0.5)) / 1e6).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        rounded.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "doc", "score", "rk")
    )


def tf_idf_vectors(
    corpus: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Sparse TF-IDF representation: one (doc, token, weight) row per
    distinct doc-token, weight = tf * ln(N / df).  The long-format sparse
    matrix every downstream retrieval / clustering op consumes; stays
    distributed (no vocabulary collect)."""
    postings = _postings(corpus, id_col, text_col)
    dft = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dft = dft.filter(F.col("df") <= max_df)
    # n_docs as a broadcast 1-row aggregate instead of a blocking count at
    # construction (round 12) — same float64 value in the weight
    n = F.broadcast(corpus.agg(F.count(F.lit(1)).cast("double").alias("n_docs")))
    return postings.join(dft, "token").crossJoin(n).select(
        "doc",
        "token",
        (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("weight"),
    )


def rrf_fuse(
    rankings,
    *,
    k: int = 60,
    query_col: str = "qid",
    doc_col: str = "doc",
    rank_col: str = "rk",
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion over N per-query rankings (hybrid retrieval:
    BM25 + dense ANN is the classic pair): score(q, d) = sum over rankings
    of 1 / (k + rank).  Input frames carry (query_col, doc_col, rank_col).

    Scale shape: one union (no shuffle), one keyed aggregate on
    (query, doc), and a per-query top-k window — fusion cost is linear in
    the candidate lists, independent of corpus size."""
    from functools import reduce

    from pyspark.sql import Window

    parts = [
        r.select(
            F.col(query_col).alias("qid"),
            F.col(doc_col).alias("doc"),
            F.col(rank_col).cast("bigint").alias("rk"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    fused = u.groupBy("qid", "doc").agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rk"))).alias("raw"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    out = fused.select(
        "qid",
        "doc",
        (F.floor(F.col("raw") * 1e6 + F.lit(0.5)) / 1e6).alias("rrf"),
        "n_lists",
    )
    w = Window.partitionBy("qid").orderBy(F.col("rrf").desc(), F.col("doc").asc())
    out = out.withColumn("fused_rk", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("fused_rk") <= topk)
    return out
