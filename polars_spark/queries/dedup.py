"""Deduplication registry queries over the documents table
(polars_spark.llm): exact, n-gram-jaccard (exact, inverted-index), MinHash-
LSH (approximate, banded), SimHash (approximate, chunk-bucketed).

The exact variants have DuckDB oracles; the LSH variants are rows-only here
(their hash functions don't exist in DuckDB) and carry recall tests in
tests/test_llm_ops.py against the exact pair set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_spark.llm import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from polars_spark.queries import query, table


@query(
    "dedup_exact",
    oracle=r"""
    SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text")


@query(
    "dedup_ngram_jaccard",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
             generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    dfreq AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
    shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)),
    sizes AS (SELECT doc_id, count(*) n FROM shc GROUP BY 1),
    pairs AS (
      SELECT s1.doc_id d1, s2.doc_id d2, count(*) shared
      FROM shc s1 JOIN shc s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, round(shared::DOUBLE / (a.n + b.n - shared), 6) AS jaccard
    FROM pairs JOIN sizes a ON a.doc_id = d1 JOIN sizes b ON b.doc_id = d2
    WHERE shared::DOUBLE / (a.n + b.n - shared) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard >= 0.8 pairs via inverted-index join with the
    stop-shingle cap ON (max_df=100, mirrored in the oracle) — the
    configuration that bounds the worst bucket at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8, max_df=100)
    return out.select("d1", "d2", F.round("jaccard", 6).alias("jaccard"))


@query(
    "dedup_minhash_lsh",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
             generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
    pairs AS (
      SELECT s1.doc_id d1, s2.doc_id d2, count(*) shared
      FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, round(shared::DOUBLE / (a.n + b.n - shared), 6) AS jaccard
    FROM pairs JOIN sizes a ON a.doc_id = d1 JOIN sizes b ON b.doc_id = d2
    WHERE shared::DOUBLE / (a.n + b.n - shared) >= 0.8
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash (k=32) + banded LSH (8x4) candidates, exact-jaccard-verified
    at 0.8.  The verification step makes the output a SUBSET of the exact
    pair set (precision 1.0 by construction); on this corpus LSH recall is
    100% with these deterministic hashes (asserted at two SFs in
    tests/test_llm_ops.py), so the exact-jaccard oracle matches.  At
    degraded recall the oracle would catch it as a row-count miss."""
    docs = table(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(docs, "doc_id", "text", n=3, k=32, bands=8, threshold=0.8)
    return out.select("d1", "d2", F.round("jaccard", 6).alias("jaccard"))


@query(
    "dedup_simhash",
    # Full replay of the SimHash pipeline in SQL: the md5-derived 60-bit
    # token hash is computable in both engines, so signature bits, 15-bit
    # pigeonhole buckets, candidate join and hamming filter are all verified
    # end to end (the xxhash64 variant is the same algorithm with a faster,
    # JVM-only hash).
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
      FROM documents
    ),
    th AS (
      SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM toks
    ),
    bits AS (
      SELECT doc_id, b.b,
             sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) b
      GROUP BY 1, 2
    ),
    sig AS (
      SELECT doc_id, sum(CASE WHEN acc > 0 THEN (1::BIGINT << b) ELSE 0 END) AS s
      FROM bits GROUP BY 1
    ),
    ch AS (
      SELECT doc_id, s, i.i, (s >> (15 * i.i)) & 32767 AS cv
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.s AS s1, b.s AS s2
      FROM ch a JOIN ch b ON a.i = b.i AND a.cv = b.cv AND a.doc_id < b.doc_id
    )
    SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(s1, s2)) <= 3
    """,
)
def dedup_simhash(spark, sf_dir):
    """60-bit md5-SimHash near-pairs (hamming <= 3) with 15-bit-chunk
    pigeonhole bucketing (llm.simhash_near_pairs)."""
    docs = table(spark, sf_dir, "documents")
    out = simhash_near_pairs(docs, "doc_id", "text", max_hamming=3, hash_fn="md5")
    return out.select("d1", "d2", F.col("hamming").cast("bigint").alias("hamming"))


@query(
    "dedup_clusters",
    oracle=r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
             generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
    p0 AS (
      SELECT s1.doc_id d1, s2.doc_id d2, count(*) shared
      FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d1, d2 FROM p0 JOIN sizes a ON a.doc_id = d1 JOIN sizes b ON b.doc_id = d2
      WHERE shared::DOUBLE / (a.n + b.n - shared) >= 0.8
    ),
    edges AS (SELECT d1 u, d2 v FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach AS (
      SELECT u AS doc, u AS node FROM edges
      UNION
      SELECT r.doc, e.v FROM reach r JOIN edges e ON e.u = r.node
    )
    SELECT doc, min(node) AS cluster FROM reach GROUP BY doc
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS: minhash-LSH pairs -> connected components
    (min-label propagation, one shuffle per round).  Oracle: transitive
    closure over the exact-jaccard pair set via a recursive CTE (valid
    because the verified LSH pairs equal the exact pairs on this corpus)."""
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=3, k=32, bands=8, threshold=0.8)
    from polars_spark.llm import connected_components

    return connected_components(pairs)


def _embed_neardup_oracle(n_tables: int = 3, n_planes: int = 4, threshold: float = 0.40) -> str:
    """Replay embedding_near_dup_pairs in DuckDB: same seeded hyperplanes
    (literals), same per-table sign-bit buckets, same any-table candidate
    union, same exact-cosine verify at the same rounded threshold."""
    from polars_spark.llm import _rhp_planes

    parts = []
    for t in range(n_tables):
        planes = _rhp_planes(64, n_planes, seed=100 + t)
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(x)) for x in p)}]) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        parts.append(f"SELECT vec_id AS id, {t * (1 << n_planes)} + {bits} AS tb FROM e")
    union = " UNION ALL ".join(parts)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    bk AS ({union}),
    cand AS (
      SELECT DISTINCT a.id AS d1, b.id AS d2
      FROM bk a JOIN bk b ON a.tb = b.tb AND a.id < b.id
    )
    SELECT d1, d2, sim FROM (
      SELECT d1, d2, round(list_cosine_similarity(ea.v, eb.v), 6) AS sim
      FROM cand JOIN e ea ON ea.vec_id = d1 JOIN e eb ON eb.vec_id = d2
    ) WHERE sim >= {threshold}
    """


@query("dedup_embedding_cosine", oracle=_embed_neardup_oracle())
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs: 3 hash tables x 4 random
    hyperplanes generate within-bucket candidates (~18% of all pairs at
    sf0.01), one exact-cosine pass verifies >= 0.40 (this corpus has no
    pairs above ~0.51, so the gate threshold sits below the 0.9 design
    point; recall at the design point is asserted on planted near-dups in
    tests/test_llm_ops.py).  Oracle replays the identical construction."""
    from polars_spark.llm import embedding_near_dup_pairs

    emb = table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, threshold=0.40, n_tables=3, n_planes=4, seed=100
    )


@query(
    "dedup_span_ngrams",
    # suffix-array-style exact substring dedup at 5-gram resolution: the
    # oracle replays positioned grams, duplicated-gram cover, and the
    # gaps-and-islands merge.
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
        i -> {'pos': i, 'gram': toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]})) AS pg
      FROM t
    ), g2 AS (
      SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g
    ), dup AS (
      SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2
    ), cov AS (
      SELECT DISTINCT doc_id, p FROM (
        SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS p
        FROM g2 WHERE gram IN (SELECT gram FROM dup))
    )
    SELECT doc_id, min(p)::BIGINT AS span_start, max(p)::BIGINT AS span_end,
           count(*)::BIGINT AS span_len
    FROM (SELECT doc_id, p, p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp FROM cov)
    GROUP BY doc_id, grp
    """,
)
def dedup_span_ngrams(spark, sf_dir):
    """Exact duplicated-substring spans (Lee et al. 2022 suffix-array dedup
    at 5-gram resolution): gram counts -> covered positions -> islands;
    linear passes, no pair blowup."""
    from polars_spark.llm import duplicated_spans

    docs = table(spark, sf_dir, "documents")
    return duplicated_spans(docs, n=5)


@query(
    "dedup_span_removal",
    # keep-one-copy rewrite: canonical occurrence per duplicated 5-gram is
    # the (doc,pos)-least (row_number over the gram on both engines).
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS otoks,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
        i -> {'pos': i, 'gram': toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]})) AS pg
      FROM t
    ), g2 AS (
      SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g
    ), rem AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos, row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        FROM g2) WHERE rn > 1
    ), cov AS (
      SELECT DISTINCT doc_id, p FROM (
        SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS p FROM rem)
    ), tok_tbl AS (
      SELECT doc_id, unnest(otoks) AS w, generate_subscripts(otoks, 1) AS pos FROM t
    ), kept AS (
      SELECT tok_tbl.doc_id, string_agg(w, ' ' ORDER BY pos) AS kept_text, count(*) AS n_kept
      FROM tok_tbl LEFT JOIN cov ON cov.doc_id = tok_tbl.doc_id AND cov.p = tok_tbl.pos
      WHERE cov.p IS NULL
      GROUP BY tok_tbl.doc_id
    )
    SELECT t.doc_id,
           CASE WHEN t.otoks IS NULL THEN NULL
                ELSE coalesce(kept_text, '') END AS kept_text,
           len(t.otoks)::BIGINT AS n_tokens,
           (len(t.otoks) - coalesce(n_kept, 0))::BIGINT AS n_removed
    FROM t LEFT JOIN kept ON kept.doc_id = t.doc_id
    """,
)
def dedup_span_removal(spark, sf_dir):
    """Keep-one-copy duplicated-substring removal (Lee et al. 2022): the
    rewrite half of dedup_span_ngrams — canonical-occurrence window +
    higher-order index filter, all linear passes."""
    from polars_spark.llm import remove_duplicated_spans

    docs = table(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, n=5)


@query(
    "dedup_incremental_index",
    # exact cross-jaccard oracle (same rationale as dedup_minhash_lsh:
    # verification makes precision 1.0; recall is 100% at this scale with
    # the deterministic hashes, so the exact pair set matches)
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
             generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
    pairs AS (
      SELECT s1.doc_id AS new_id, s2.doc_id AS index_id, count(*) AS shared
      FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle
      WHERE s1.doc_id % 2 = 1 AND s2.doc_id % 2 = 0
      GROUP BY 1, 2
    )
    SELECT new_id, index_id,
           round(shared::DOUBLE / (a.n + b.n - shared), 6) AS jaccard
    FROM pairs JOIN sizes a ON a.doc_id = new_id JOIN sizes b ON b.doc_id = index_id
    WHERE shared::DOUBLE / (a.n + b.n - shared) >= 0.8
    """,
)
def dedup_incremental_index(spark, sf_dir):
    """Incremental ingestion dedup: the even-id half is the EXISTING corpus
    whose minhash index is persisted once (build_minhash_index); the odd-id
    half is the new crawl batch, band-joined against the stored index and
    exact-verified — the existing corpus is never re-shingled."""
    import tempfile

    from polars_spark.llm import build_minhash_index, dedup_against_index

    docs = table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    # per-application path: two concurrent sessions running this query
    # (e.g. parallel CI sweeps) must not clobber each other's index commit
    app = spark.sparkContext.applicationId
    path = tempfile.gettempdir() + f"/polars_spark_mh_index_{app}"
    build_minhash_index(existing, path, id_col="doc_id", text_col="text")
    out = dedup_against_index(new, path, id_col="doc_id", text_col="text", threshold=0.8)
    return out.select("new_id", "index_id", F.round("jaccard", 6).alias("jaccard"))


@query(
    "dedup_tfidf_cosine",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS doc, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM documents
    ),
    tf AS (SELECT doc, token, count(*) AS tf FROM toks GROUP BY doc, token),
    doclen AS (SELECT doc, sum(tf) AS len FROM tf GROUP BY doc),
    n AS (SELECT count(*) AS n_docs FROM documents),
    dfreq AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token
      HAVING count(*) <= (SELECT CAST(0.5 * n_docs AS BIGINT) FROM n)
    ),
    w AS (
      SELECT tf.doc, tf.token,
             (tf.tf / CAST(doclen.len AS DOUBLE)) * ln((SELECT n_docs FROM n) / CAST(dfreq.df AS DOUBLE)) AS w
      FROM tf JOIN dfreq USING (token) JOIN doclen USING (doc)
    ),
    nrm AS (SELECT doc, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc),
    unit AS (SELECT w.token, w.doc, w.w / nrm.nrm AS u FROM w JOIN nrm USING (doc)),
    pairs AS (
      SELECT a.doc AS d1, b.doc AS d2, sum(a.u * b.u) AS cosine
      FROM unit a JOIN unit b ON a.token = b.token AND a.doc < b.doc
      GROUP BY a.doc, b.doc
    )
    SELECT d1, d2, floor(cosine * 1e6 + 0.5) / 1e6 AS cosine
    FROM pairs WHERE cosine >= 0.5
    """,
)
def dedup_tfidf_cosine(spark, sf_dir):
    """llm.tfidf_cosine_pairs: sparse TF-IDF cosine near-dup pairs via the
    inverted-index posting join (candidates only where tokens are shared,
    stop-token df cap bounds the blowup) — the sparse counterpart of
    dedup_embedding_cosine, replayed relationally in the oracle."""
    from polars_spark.llm import tfidf_cosine_pairs
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    pairs = tfidf_cosine_pairs(docs, threshold=0.5)
    return pairs.select("d1", "d2", fround(F.col("cosine"), 6).alias("cosine"))


@query(
    "dedup_minhash_star",
    # same transitive-closure-over-exact-pairs oracle as dedup_clusters:
    # star edges are a SUBSET of the all-pairs candidates, so components can
    # only ever split, never merge — on this corpus (clusters are mutually
    # similar, 8 bands) the star components equal the exact components, and
    # any recall regression shows as a row mismatch
    oracle=r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
             generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
    p0 AS (
      SELECT s1.doc_id d1, s2.doc_id d2, count(*) shared
      FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d1, d2 FROM p0 JOIN sizes a ON a.doc_id = d1 JOIN sizes b ON b.doc_id = d2
      WHERE shared::DOUBLE / (a.n + b.n - shared) >= 0.8
    ),
    edges AS (SELECT d1 u, d2 v FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach AS (
      SELECT u AS doc, u AS node FROM edges
      UNION
      SELECT r.doc, e.v FROM reach r JOIN edges e ON e.u = r.node
    )
    SELECT doc, min(node) AS cluster FROM reach GROUP BY doc
    """,
)
def dedup_minhash_star(spark, sf_dir):
    """LINEAR-cost near-dup clustering (llm.minhash_lsh_dedup): band-bucket
    star edges (doc -> bucket-min) instead of all intra-bucket pairs, exact
    verification on the star edges only, min-label CC.  The scale path for
    boilerplate-heavy corpora where all-pairs candidates are quadratic in
    duplicate multiplicity."""
    docs = table(spark, sf_dir, "documents")
    from polars_spark.llm import minhash_lsh_dedup

    return minhash_lsh_dedup(docs, "doc_id", "text", n=3, k=32, bands=8, threshold=0.8)


@query(
    "dedup_fuzzy_names",
    # all-pairs levenshtein with a length-band prefilter — DuckDB can afford
    # it at sf0.01 (1500^2); the ENGINE side must get the same answer from
    # segment-pigeonhole blocking (recall-guaranteed) + verify-on-candidates
    oracle="""
    SELECT a.c_name AS c_name, b.c_name AS c_name_right,
           levenshtein(a.c_name, b.c_name) AS edit_distance
    FROM customer a JOIN customer b
      ON a.c_name < b.c_name
     AND abs(length(a.c_name) - length(b.c_name)) <= 1
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def dedup_fuzzy_names(spark, sf_dir):
    """Entity-resolution fuzzy self-join (llm.fuzzy_string_pairs): every
    distinct customer-name pair within edit distance 1, via PassJoin
    segment-pigeonhole blocking + one exact JVM levenshtein verify pass —
    never all-pairs on the engine side."""
    from polars_spark.llm import fuzzy_string_pairs

    cust = table(spark, sf_dir, "customer")
    return fuzzy_string_pairs(cust, left_on="c_name", max_distance=1)
