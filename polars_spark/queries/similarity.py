"""Similarity-search registry queries over the embeddings table
(polars_spark.llm): brute-force cosine top-k (exact, oracle-checked) and
random-hyperplane LSH ANN (approximate, recall-tested in pytest).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_spark.llm import cosine_topk_bruteforce, cosine_topk_lsh
from polars_spark.queries import ltable, query, table


def _queries_subset(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return emb, emb.filter(F.col("vec_id") < 20)


@query(
    "sim_cosine_topk",
    oracle="""
    SELECT qid, nid, sim, rk FROM (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
                        c.vec_id ASC) AS rk
      FROM (SELECT * FROM embeddings WHERE vec_id < 20) q
      CROSS JOIN embeddings c
      WHERE q.vec_id != c.vec_id
    ) WHERE rk <= 5
    """,
)
def sim_cosine_topk(spark, sf_dir):
    """Exact top-5 cosine neighbors for 20 probe vectors — the ANN
    correctness baseline.  Ties broken on (rounded sim desc, id asc) in both
    engines so ranks are deterministic."""
    emb, probes = _queries_subset(spark, sf_dir)
    return cosine_topk_bruteforce(emb, probes, k=5)


def _ann_oracle() -> str:
    """Mirror cosine_topk_lsh exactly in DuckDB: same seeded hyperplanes
    (literals), same sign-bit bucketing, same hamming-1 multiprobe, same
    rerank and tie-break."""
    from polars_spark.llm import _rhp_planes

    planes = _rhp_planes(64, 6, seed=7)
    bit_terms = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"[{', '.join(repr(float(x)) for x in p)}]) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probe_list = ", ".join(["b0"] + [f"xor(b0, {1 << i})" for i in range(6)])
    return f"""
    WITH c AS (
      SELECT vec_id AS nid, embedding AS nv, {bit_terms} AS bkt FROM embeddings
    ),
    q0 AS (SELECT nid AS qid, nv AS qv, bkt AS b0 FROM c WHERE nid < 20),
    probes AS (SELECT qid, qv, unnest([{probe_list}]) AS bkt FROM q0),
    scored AS (
      SELECT DISTINCT qid, nid,
             round(list_cosine_similarity(qv::DOUBLE[], nv::DOUBLE[]), 6) AS sim
      FROM probes JOIN c USING (bkt)
      WHERE qid != nid
    )
    SELECT qid, nid, sim, rk FROM (
      SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
      FROM scored
    ) WHERE rk <= 5
    """


@query("sim_ann_lsh", oracle=_ann_oracle())
def sim_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH (6 planes, hamming-1 multiprobe) + exact rerank
    within buckets.  Candidate scoring drops from Q*N to ~Q*N*7/64; the
    oracle replays the identical deterministic construction in DuckDB, and
    recall vs brute force is asserted in tests/test_llm_ops.py."""
    emb, probes = _queries_subset(spark, sf_dir)
    return cosine_topk_lsh(emb, probes, k=5, n_planes=6, dim=64)


@query(
    "sim_label_centroid",
    oracle="""
    WITH dims AS (SELECT unnest(generate_series(1, 64)) AS d),
    flat AS (
      SELECT label, d, avg(embedding[d]::DOUBLE) AS m
      FROM embeddings, dims GROUP BY label, d
    )
    SELECT label, round(sum(m * m), 6) AS centroid_norm2, count(*) AS dim
    FROM flat GROUP BY label
    """,
)
def sim_label_centroid(spark, sf_dir):
    """Per-label centroid of the embedding column computed with
    posexplode + re-aggregation — the distributed pattern for vector
    averaging (no driver collect)."""
    emb = table(spark, sf_dir, "embeddings")
    flat = emb.select("label", F.posexplode("embedding").alias("d", "v"))
    cent = flat.groupBy("label", "d").agg(F.avg(F.col("v").cast("double")).alias("m"))
    return cent.groupBy("label").agg(
        F.round(F.sum(F.col("m") * F.col("m")), 6).alias("centroid_norm2"),
        F.count(F.lit(1)).alias("dim"),
    )


@query(
    "mm_extract_features",
    # Full oracle for the multimodal featurizer: the (deliberately fake,
    # deterministic) decode is a 16-bin byte histogram over the utf-8
    # payload; the corpus is pure ASCII, so ord(char)//16 replays the bins
    # and CAST(cnt/total AS FLOAT) reproduces numpy's
    # (hist/total).astype(float32) bit-for-bit (one correctly-rounded
    # divide + one correctly-rounded narrowing on exact integers).
    oracle="""
    WITH ch AS (
      SELECT doc_id, ord(unnest(regexp_split_to_array(text, ''))) // 16 AS bin
      FROM documents
    ),
    h AS (SELECT doc_id, bin, count(*) AS cnt FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, count(*) AS total FROM ch GROUP BY 1),
    grid AS (
      SELECT t.doc_id, b.b, coalesce(h.cnt, 0) AS cnt, t.total
      FROM tot t
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) b
      LEFT JOIN h ON h.doc_id = t.doc_id AND h.bin = b.b
    )
    SELECT doc_id,
           list(CAST(CAST(cnt AS DOUBLE) / total AS FLOAT) ORDER BY b) AS features
    FROM grid GROUP BY 1
    """,
)
def mm_extract_features(spark, sf_dir):
    """Multimodal plumbing: text bytes as a stand-in binary payload ->
    Arrow-batched mapInPandas featurizer (byte histogram, FAKE decode step —
    see polars_spark.multimodal) -> per-document feature vector."""
    from polars_spark.multimodal import attach_fake_image_bytes, extract_features

    docs = table(spark, sf_dir, "documents")
    media = attach_fake_image_bytes(docs, "text")
    feats = extract_features(media, "image")
    return feats.select("doc_id", "features")
