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
      SELECT vec_id AS nid, embedding AS nv, {bit_terms} AS bkt
      FROM embeddings WHERE embedding IS NOT NULL
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
      FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) embeddings,
           dims GROUP BY label, d
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
    , feats AS (
      SELECT doc_id,
             list(CAST(CAST(cnt AS DOUBLE) / total AS FLOAT) ORDER BY b) AS features
      FROM grid GROUP BY 1
    )
    SELECT d.doc_id,
           array_to_string(list_transform(f.features,
             x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS VARCHAR)),
             ',') AS features_q6,
           len(f.features) AS n_dims
    FROM documents d LEFT JOIN feats f ON d.doc_id = f.doc_id
    """,
)
def mm_extract_features(spark, sf_dir):
    """Multimodal plumbing: text bytes as a stand-in binary payload ->
    Arrow-batched mapInPandas featurizer (byte histogram, FAKE decode step —
    see polars_spark.multimodal) -> per-document feature vector.

    The FINAL float vector renders as a scaled-int CSV (floor(x*1e6+0.5),
    identical IEEE on both engines) plus its length: the driver's hash
    canon cannot sort ndarray cells (round-10 red), so gate finals must be
    scalar-only — extract_features itself still returns array<float>."""
    from polars_spark.multimodal import attach_fake_image_bytes, extract_features

    docs = table(spark, sf_dir, "documents")
    media = attach_fake_image_bytes(docs, "text")
    feats = extract_features(media, "image")
    return feats.select(
        "doc_id",
        F.array_join(
            F.transform(
                "features",
                lambda x: F.floor(x.cast("double") * 1e6 + F.lit(0.5))
                .cast("long")
                .cast("string"),
            ),
            ",",
        ).alias("features_q6"),
        F.size("features").cast("long").alias("n_dims"),
    )


def _kmeans_ctes(k_clusters: int, iters: int):
    """Shared DuckDB CTE chain replaying _spherical_kmeans: deterministic
    init (K lowest-id vectors), Lloyd rounds, final `lists` assignment —
    every cross-engine decision frounded identically to the Spark side.
    Returns (ctes, argmax_window_sql)."""
    norm = "list_transform(embedding::DOUBLE[], x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))"
    ctes = [
        f"e AS (SELECT vec_id, {norm} AS v FROM embeddings WHERE embedding IS NOT NULL)",
        f"""cent0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                 list_transform(v, x -> floor(x * 1e10 + 0.5) / 1e10) AS cv
          FROM e ORDER BY vec_id LIMIT {k_clusters})""",
    ]
    argmax = (
        "row_number() OVER (PARTITION BY e.vec_id "
        "ORDER BY floor(list_dot_product(e.v, c.cv) * 1e6 + 0.5) / 1e6 DESC, c.cid)"
    )
    for i in range(iters):
        ctes += [
            f"""a{i} AS (
              SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, c.cid, {argmax} AS rn
                FROM e CROSS JOIN cent{i} c) WHERE rn = 1)""",
            f"""m{i} AS (
              SELECT cid, dd.d AS d, avg(v[dd.d]) AS m
              FROM a{i} CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) dd
              GROUP BY cid, dd.d)""",
            f"r{i} AS (SELECT cid, list(m ORDER BY d) AS raw FROM m{i} GROUP BY cid)",
            f"""cent{i + 1} AS (
              SELECT c.cid,
                     coalesce(list_transform(r.raw,
                       x -> floor(x / sqrt(list_dot_product(r.raw, r.raw)) * 1e10 + 0.5) / 1e10), c.cv) AS cv
              FROM cent{i} c LEFT JOIN r{i} r ON r.cid = c.cid)""",
        ]
    ctes += [
        f"""lists AS (
          SELECT vec_id AS nid, v AS nv, cid FROM (
            SELECT e.vec_id, e.v, c.cid, {argmax} AS rn
            FROM e CROSS JOIN cent{iters} c) WHERE rn = 1)""",
    ]
    return ctes, argmax


def _ivf_oracle(k_clusters: int = 8, iters: int = 2, n_probe: int = 2, k: int = 5) -> str:
    ctes, argmax = _kmeans_ctes(k_clusters, iters)
    ctes += [
        f"""pr AS (
          SELECT qid, qv, cid FROM (
            SELECT e.vec_id AS qid, e.v AS qv, c.cid, {argmax} AS rn
            FROM e CROSS JOIN cent{iters} c WHERE e.vec_id < 20) WHERE rn <= {n_probe})""",
        """scored AS (
          SELECT DISTINCT qid, nid, round(list_dot_product(qv, nv), 6) AS sim
          FROM pr JOIN lists USING (cid) WHERE qid != nid)""",
    ]
    return f"""
    WITH {', '.join(ctes)}
    SELECT qid, nid, sim, rk FROM (
      SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
      FROM scored
    ) WHERE rk <= {k}
    """


@query("sim_ivf_topk", oracle=_ivf_oracle())
def sim_ivf_topk(spark, sf_dir):
    """IVF ANN: spherical k-means (K=8, 2 Lloyd rounds, deterministic
    lowest-id init) + 2-probe search + exact rerank — the scale path where
    each query scores ~n_probe/K of the corpus.  The oracle replays the
    entire iterative construction in chained DuckDB CTEs; recall vs brute
    force is asserted in tests/test_llm_ops.py."""
    from polars_spark.llm import ivf_topk

    emb, probes = _queries_subset(spark, sf_dir)
    return ivf_topk(emb, probes, k=5, n_clusters=8, n_probe=2, iters=2)


@query(
    "mm_sample_frames",
    # Fake container = fixed 64-byte chunks (pure-ASCII corpus, so
    # bytes == chars); keep every 2nd frame.  The series cap (0..40) just
    # needs to exceed max(len(text))/64 at the gate SF (553/64 = 9).
    oracle="""
    WITH f AS (
      SELECT doc_id, k.k AS frame_idx, substr(text, k.k * 64 + 1, 64) AS fr
      FROM documents, (SELECT unnest(generate_series(0, 40)) AS k) k
      WHERE k.k * 64 < length(text) AND k.k % 2 = 0
    )
    SELECT doc_id, frame_idx, length(fr) AS frame_len, md5(fr) AS frame_md5
    FROM f
    """,
)
def mm_sample_frames(spark, sf_dir):
    """Video-style frame sampling: binary payload -> one-to-many
    mapInPandas demux (FAKE fixed-size-chunk container, real Arrow
    batch-out shape) -> every-2nd 64-byte frame with its md5."""
    from polars_spark.multimodal import attach_fake_image_bytes, sample_frames

    docs = table(spark, sf_dir, "documents")
    media = attach_fake_image_bytes(docs, "text", out_col="video")
    frames = sample_frames(media, "video", frame_bytes=64, every_n=2)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame").alias("frame_len"),
        F.md5("frame").alias("frame_md5"),
    )


@query(
    "mm_resize",
    # FAKE decode: square grayscale of side floor(sqrt(len)); resize is
    # real nearest-neighbor (src = dst*side // 4), replayed per pixel via
    # 1-based substr + ord on the ASCII corpus.
    oracle="""
    WITH px AS (
      SELECT d.doc_id,
             CAST(floor(sqrt(length(d.text))) AS INT) AS side,
             rc.r, rc.c,
             ord(substr(
               d.text,
               ((rc.r * CAST(floor(sqrt(length(d.text))) AS INT)) // 4)
                 * CAST(floor(sqrt(length(d.text))) AS INT)
                 + ((rc.c * CAST(floor(sqrt(length(d.text))) AS INT)) // 4) + 1,
               1)) AS p
      FROM documents d
      CROSS JOIN (
        SELECT r.r, c.c
        FROM (SELECT unnest(generate_series(0, 3)) AS r) r,
             (SELECT unnest(generate_series(0, 3)) AS c) c
      ) rc
    )
    , res AS (
      SELECT doc_id, side, list(p ORDER BY r, c) AS pixels
      FROM px WHERE side IS NOT NULL GROUP BY doc_id, side
    )
    SELECT d.doc_id, res.side,
           array_to_string(list_transform(res.pixels, p -> CAST(p AS VARCHAR)), ',')
             AS pixels_csv
    FROM documents d LEFT JOIN res ON d.doc_id = res.doc_id
    """,
)
def mm_resize(spark, sf_dir):
    """Image resize plumbing: binary payload -> mapInPandas numpy
    nearest-neighbor resize to 4x4 (FAKE square-grayscale decode, real
    vectorized resize) -> row-major pixel grid.

    The FINAL pixel grid renders as a CSV string on both sides (driver
    hash canon is scalar-only, round-10 red); resize_images itself still
    returns the real array<int>."""
    from polars_spark.multimodal import attach_fake_image_bytes, resize_images

    docs = table(spark, sf_dir, "documents")
    media = attach_fake_image_bytes(docs, "text")
    return resize_images(media, "image", out_side=4).select(
        "doc_id",
        "side",
        F.array_join(F.transform("pixels", lambda p: p.cast("string")), ",").alias(
            "pixels_csv"
        ),
    )


@query(
    "mm_audio_features",
    # FAKE decode: uint8 waveform centered at 128; rms per 100-sample
    # window.  x*x is exact integer math, avg is one double divide, and
    # floor(sqrt(.)*1e6+0.5)/1e6 is identical IEEE on both engines.
    oracle="""
    WITH s AS (
      SELECT doc_id, (i.i - 1) // 100 AS win,
             CAST(ord(substr(text, i.i, 1)) - 128 AS DOUBLE) AS x
      FROM documents, (SELECT unnest(generate_series(1, 2000)) AS i) i
      WHERE i.i <= length(text)
    )
    SELECT doc_id, win, count(*) AS n_samples,
           floor(sqrt(avg(x * x)) * 1e6 + 0.5) / 1e6 AS rms
    FROM s GROUP BY doc_id, win
    """,
)
def mm_audio_features(spark, sf_dir):
    """Audio featurization plumbing: binary payload -> one-to-many
    mapInPandas (FAKE uint8-waveform decode, real numpy windowing) ->
    per-100-sample-window RMS."""
    from polars_spark.multimodal import attach_fake_image_bytes, extract_audio_features

    docs = table(spark, sf_dir, "documents")
    media = attach_fake_image_bytes(docs, "text", out_col="audio")
    return extract_audio_features(media, "audio", window=100).select(
        "doc_id", "win", "n_samples", "rms"
    )


_QNORM = (
    "list_transform(embedding::DOUBLE[], x -> x / "
    "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))"
)

# symmetric absmax int8: scale = max|x|/127, q = clamp(floor(x/scale+0.5))
_QSCALE = "list_max(list_transform(u, x -> abs(x))) / 127.0"
_QLIST = (
    "list_transform(u, x -> (CASE WHEN scale = 0 THEN 0 ELSE "
    "greatest(-127, least(127, floor(x / scale + 0.5)))::INT END))"
)


@query(
    "emb_quantize_error",
    oracle=f"""
    WITH n AS (SELECT vec_id, {_QNORM} AS u FROM embeddings),
    s AS (SELECT vec_id, u, {_QSCALE} AS scale FROM n),
    qq AS (SELECT vec_id, u, scale, {_QLIST} AS q FROM s)
    SELECT vec_id,
           floor(scale * 1e9 + 0.5) / 1e9 AS scale_r,
           floor(list_max(list_transform(range(1, 65),
                 i -> abs(u[i] - q[i] * scale))) * 1e6 + 0.5) / 1e6 AS max_err
    FROM qq
    """,
)
def emb_quantize_error(spark, sf_dir):
    """int8 quantization round-trip error per vector (the compression
    -accuracy monitor for quantized search).  Pure projection: higher-order
    functions only, zero shuffles at any scale."""
    from polars_spark.llm import _l2_normalize
    from polars_spark.llm.embedding import dequantize_int8, quantize_int8

    emb = table(spark, sf_dir, "embeddings")
    u = _l2_normalize(F.col("embedding").cast("array<double>"))
    qs = quantize_int8(u)
    scale = qs["scale"]
    # dequantize (one-eval-per-row shape) then elementwise |x - x̂|; keeping
    # `scale` OUT of any lambda avoids the O(dim^2) interpreted blowup
    err = F.array_max(
        F.zip_with(u, dequantize_int8(qs), lambda x, v: F.abs(x - v))
    )
    return emb.select(
        "vec_id",
        (F.floor(scale * 1e9 + F.lit(0.5)) / 1e9).alias("scale_r"),
        (F.floor(err * 1e6 + F.lit(0.5)) / 1e6).alias("max_err"),
    )


@query(
    "sim_int8_topk",
    oracle=f"""
    WITH n AS (SELECT vec_id, {_QNORM} AS u FROM embeddings),
    s AS (SELECT vec_id, u, {_QSCALE} AS scale FROM n),
    qq AS (SELECT vec_id, scale, {_QLIST} AS q FROM s),
    scored AS (
      SELECT p.vec_id AS qid, c.vec_id AS nid,
             floor(((list_sum(list_transform(range(1, 65),
                      i -> (p.q[i] * c.q[i])::BIGINT)) * p.scale) * c.scale)
                   * 1e6 + 0.5) / 1e6 AS sim
      FROM (SELECT * FROM qq WHERE vec_id < 20) p
      CROSS JOIN qq c WHERE p.vec_id != c.vec_id
    )
    SELECT qid, nid, sim, rk FROM (
      SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
)
def sim_int8_topk(spark, sf_dir):
    """Top-5 cosine neighbors computed entirely on int8-quantized vectors
    (exact integer dots x two scales — replayed bit-identically in the
    oracle).  3.5x narrower scan/shuffle than float32 at the same plan
    shape as sim_cosine_topk."""
    from polars_spark.llm.embedding import quantized_topk

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    return quantized_topk(emb, probes, k=5)


def _semdedup_oracle(k_clusters: int = 8, iters: int = 2, threshold: float = 0.95) -> str:
    """Replay semdedup in DuckDB on the shared k-means CTE chain: a vector
    is dropped when a lower-id cluster-mate has frounded cosine >= t."""
    ctes, _ = _kmeans_ctes(k_clusters, iters)
    ctes += [
        f"""dropped AS (
          SELECT DISTINCT a.nid
          FROM lists a JOIN lists b USING (cid)
          WHERE b.nid < a.nid
            AND floor(list_dot_product(a.nv, b.nv) * 1e6 + 0.5) / 1e6 >= {threshold})""",
    ]
    return f"""
    WITH {', '.join(ctes)}
    SELECT l.nid AS vec_id, l.cid, (d.nid IS NULL) AS kept
    FROM lists l LEFT JOIN dropped d ON l.nid = d.nid
    """


@query("dedup_semdedup", oracle=_semdedup_oracle())
def dedup_semdedup(spark, sf_dir):
    """SemDeDup (cluster-then-intra-cluster-cosine semantic dedup): the
    pairwise pass never leaves a cluster (join on cid — corpus^2/K
    candidates), assignment/Lloyd shuffles shared with sim_ivf_topk.
    Oracle replays k-means + the keep-lowest-id drop rule in chained CTEs."""
    from polars_spark.llm import semdedup

    emb = table(spark, sf_dir, "embeddings")
    return semdedup(emb, threshold=0.95)


@query(
    "emb_contrastive_triplets",
    oracle="""
    WITH pairs AS (
      SELECT qid AS anchor, nid AS positive FROM (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
                          c.vec_id) AS rk
        FROM (SELECT * FROM embeddings WHERE vec_id < 20) q
        CROSS JOIN embeddings c WHERE q.vec_id != c.vec_id
      ) WHERE rk = 1),
    pool AS (
      SELECT vec_id AS neg FROM embeddings
      WHERE ('0x' || substring(md5(vec_id::VARCHAR || ':13'), 1, 8))::UBIGINT::BIGINT < 1073741824),
    cand AS (
      SELECT anchor, positive, neg,
             ('0x' || substring(md5(anchor::VARCHAR || ':' || neg::VARCHAR || ':13'), 1, 8))::UBIGINT::BIGINT AS h
      FROM pairs CROSS JOIN pool WHERE neg != anchor AND neg != positive)
    SELECT anchor, positive, neg, rn FROM (
      SELECT anchor, positive, neg,
             row_number() OVER (PARTITION BY anchor, positive ORDER BY h, neg) AS rn
      FROM cand) WHERE rn <= 2
    """,
)
def emb_contrastive_triplets(spark, sf_dir):
    """Contrastive training triplets: top-1 cosine neighbor as the
    positive, negatives md5-ranked from a 25% deterministic pool (broadcast
    — the pair x pool join never shuffles the corpus).  Fully replayed in
    the oracle: same md5 ordering, same pool."""
    from polars_spark.llm import contrastive_triplets

    emb, probes = _queries_subset(spark, sf_dir)
    pairs = cosine_topk_bruteforce(emb, probes, k=1).select(
        F.col("qid").alias("d1"), F.col("nid").alias("d2")
    )
    return contrastive_triplets(
        pairs, emb, anchor="d1", positive="d2", id_col="vec_id",
        k_neg=2, pool_fraction=0.25, seed=13,
    )


@query(
    "mm_image_ahash_pairs",
    # FAKE square-grayscale decode (as mm_resize) -> real 8x8 nearest
    # resize -> mean-threshold 64-bit aHash packed as 4x16-bit bands ->
    # pigeonhole band join -> exact hamming via XOR popcounts.  Integer
    # -exact except the mean (sum/64 — exact: power-of-two divide).
    oracle="""
    WITH d AS (SELECT doc_id, text, CAST(floor(sqrt(length(text))) AS INT) AS side FROM documents),
    px AS (
      SELECT d.doc_id, rc.r * 8 + rc.c AS i,
             ord(substr(d.text, ((rc.r * side) // 8) * side + ((rc.c * side) // 8) + 1, 1)) AS p
      FROM d CROSS JOIN (SELECT r.r, c.c FROM (SELECT unnest(generate_series(0,7)) AS r) r,
                         (SELECT unnest(generate_series(0,7)) AS c) c) rc
    ), m AS (SELECT doc_id, avg(p::DOUBLE) AS mean FROM px GROUP BY doc_id),
    bits AS (SELECT px.doc_id, i, (p > mean)::INT AS bit FROM px JOIN m USING (doc_id)),
    bands AS (SELECT doc_id,
      sum(CASE WHEN i // 16 = 0 THEN bit << (i % 16) ELSE 0 END)::INT AS b0,
      sum(CASE WHEN i // 16 = 1 THEN bit << (i % 16) ELSE 0 END)::INT AS b1,
      sum(CASE WHEN i // 16 = 2 THEN bit << (i % 16) ELSE 0 END)::INT AS b2,
      sum(CASE WHEN i // 16 = 3 THEN bit << (i % 16) ELSE 0 END)::INT AS b3
      FROM bits GROUP BY doc_id)
    SELECT d1, d2, hamming FROM (
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             (bit_count(xor(a.b0,b.b0)) + bit_count(xor(a.b1,b.b1))
            + bit_count(xor(a.b2,b.b2)) + bit_count(xor(a.b3,b.b3)))::INT AS hamming
      FROM bands a JOIN bands b ON a.doc_id < b.doc_id
      WHERE a.b0=b.b0 OR a.b1=b.b1 OR a.b2=b.b2 OR a.b3=b.b3
    ) WHERE hamming <= 3
    """,
)
def mm_image_ahash_pairs(spark, sf_dir):
    """Image near-duplicate pairs by perceptual average-hash: pigeonhole
    band join (only (id, band) shuffles — pixels never leave the hash
    stage) + exact XOR-popcount verification."""
    from polars_spark.multimodal import attach_fake_image_bytes, image_ahash_pairs

    docs = table(spark, sf_dir, "documents")
    media = attach_fake_image_bytes(docs, "text")
    return image_ahash_pairs(media, "doc_id", "image", max_hamming=3)


@query(
    "sim_rrf_fusion",
    # RRF over two rankings of the same probe set: cosine top-10 and
    # (negative) L2-distance top-10, fused with k=60, top-5 kept.  Both
    # rankings, the 1/(60+rk) sum, fround(6), and the fused tie-break are
    # replayed literally.
    oracle="""
    WITH probes AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT p.qid, c.vec_id AS doc,
             round(list_cosine_similarity(p.qv::DOUBLE[], c.embedding::DOUBLE[]), 6) AS sim,
             round(list_distance(p.qv::DOUBLE[], c.embedding::DOUBLE[]), 6) AS dist
      FROM probes p CROSS JOIN embeddings c
      WHERE p.qid != c.vec_id
    ),
    r1 AS (
      SELECT qid, doc, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, doc ASC) AS rk
      FROM pairs
    ),
    r2 AS (
      SELECT qid, doc, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, doc ASC) AS rk
      FROM pairs
    ),
    u AS (
      SELECT * FROM (SELECT qid, doc, rk FROM r1 WHERE rk <= 10)
      UNION ALL
      SELECT * FROM (SELECT qid, doc, rk FROM r2 WHERE rk <= 10)
    ),
    fused AS (
      SELECT qid, doc,
             floor(sum(1.0 / (60.0 + rk)) * 1000000 + 0.5) / 1000000 AS rrf,
             count(*) AS n_lists
      FROM u GROUP BY qid, doc
    )
    SELECT qid, doc, rrf, n_lists, fused_rk FROM (
      SELECT qid, doc, rrf, n_lists,
             row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc ASC) AS fused_rk
      FROM fused
    ) WHERE fused_rk <= 5
    """,
)
def sim_rrf_fusion(spark, sf_dir):
    """llm.retrieval.rrf_fuse: hybrid-retrieval Reciprocal Rank Fusion of a
    cosine ranking and an L2-distance ranking (the lexical+dense fusion
    shape), top-5 fused per query.  Fusion is one union + one keyed
    aggregate + a per-query window — linear in the candidate lists."""
    from pyspark.sql import Window

    from polars_spark.llm import _spread
    from polars_spark.llm.retrieval import rrf_fuse

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    q = probes.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    c = _spread(emb).select(F.col("vec_id").alias("doc"), F.col("embedding").alias("nv"))
    dot = F.aggregate(
        F.zip_with("qv", "nv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda col_: F.sqrt(F.aggregate(F.transform(col_, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))  # noqa: E731
    sq_diff = F.aggregate(
        F.zip_with("qv", "nv", lambda a, b: (a - b) * (a - b)), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("doc"))
        .select(
            "qid",
            "doc",
            F.round(dot / (norm(F.col("qv")) * norm(F.col("nv"))), 6).alias("sim"),
            F.round(F.sqrt(sq_diff), 6).alias("dist"),
        )
        .cache()
    )
    w1 = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("doc").asc())
    w2 = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("doc").asc())
    r1 = pairs.withColumn("rk", F.row_number().over(w1)).filter(F.col("rk") <= 10)
    r2 = pairs.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= 10)
    return rrf_fuse([r1, r2], k=60, topk=5)
