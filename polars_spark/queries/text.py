"""Text-analysis registry queries over the documents table: token counting,
quality scoring, language ID, fingerprinting (polars_spark.llm.text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_spark.llm import fingerprint, normalize_text
from polars_spark.llm.text import (
    STOPWORDS,
    bpe_ish_token_count,
    lang_id,
    quality_score,
    token_count,
)
from polars_spark.queries import query, table


@query(
    "txt_token_stats",
    oracle=r"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+'))                       AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))    AS n_bpe_ish,
           length(text)                                                        AS n_chars,
           round(length(text)::DOUBLE
                 / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 6) AS chars_per_token
    FROM documents
    """,
)
def txt_token_stats(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_ish"),
        F.length(t).alias("n_chars"),
        F.round(F.length(t) / F.greatest(token_count(t), F.lit(1)), 6).alias("chars_per_token"),
    )


@query(
    "txt_quality",
    oracle=r"""
    SELECT doc_id, round(
        0.3 * (CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 1.0 ELSE 0.5 END)
      + 0.2 * (CASE WHEN length(text)::DOUBLE / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)
                    BETWEEN 3 AND 12 THEN 1.0 ELSE 0.5 END)
      + 0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / greatest(length(text), 1))
      + 0.2 * (1 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                         / greatest(length(text), 1) * 10, 1.0)), 6) AS quality
    FROM documents
    """,
)
def txt_quality(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(quality_score(F.col("text")), 6).alias("quality"))


def _lang_oracle() -> str:
    """Mirror llm.text.lang_id in DuckDB SQL (same stopword lists, same
    tie-break order)."""
    score = {
        lang: (
            f"len(list_intersect(list_distinct(regexp_split_to_array(lower(text), '\\s+')), "
            f"{words!r}))::DOUBLE / greatest(len(list_distinct(regexp_split_to_array(lower(text), '\\s+'))), 1)"
        )
        for lang, words in STOPWORDS.items()
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    whens = " ".join(
        f"WHEN {score[lang]} = best AND best >= 0.01 THEN '{lang}'" for lang in STOPWORDS
    )
    return f"""
    SELECT doc_id, CASE {whens} ELSE 'unknown' END AS lang_guess
    FROM (SELECT doc_id, text, {best} AS best FROM documents)
    """


@query("txt_lang_id", oracle=_lang_oracle())
def txt_lang_id(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_guess"))


@query(
    "txt_fingerprint",
    oracle=r"""
    SELECT source,
           count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_distinct,
           count(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def txt_fingerprint(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", fingerprint(F.col("text")))
        .groupBy("source")
        .agg(F.countDistinct("fp").alias("n_distinct"), F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "txt_normalize",
    oracle=r"""
    SELECT doc_id, substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 40) AS norm_head
    FROM documents
    """,
)
def txt_normalize(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.substring(normalize_text(F.col("text")), 1, 40).alias("norm_head")
    )


@query(
    "txt_contamination",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, w, pos FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
               generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1) AS pos
        FROM documents)
    ),
    grams AS (
      SELECT DISTINCT t0.doc_id,
             t0.w||' '||t1.w||' '||t2.w||' '||t3.w||' '||t4.w||' '||t5.w||' '||t6.w||' '||t7.w AS sh
      FROM toks t0 JOIN toks t1 ON t1.doc_id=t0.doc_id AND t1.pos=t0.pos+1
                   JOIN toks t2 ON t2.doc_id=t0.doc_id AND t2.pos=t0.pos+2
                   JOIN toks t3 ON t3.doc_id=t0.doc_id AND t3.pos=t0.pos+3
                   JOIN toks t4 ON t4.doc_id=t0.doc_id AND t4.pos=t0.pos+4
                   JOIN toks t5 ON t5.doc_id=t0.doc_id AND t5.pos=t0.pos+5
                   JOIN toks t6 ON t6.doc_id=t0.doc_id AND t6.pos=t0.pos+6
                   JOIN toks t7 ON t7.doc_id=t0.doc_id AND t7.pos=t0.pos+7
    ),
    probe AS (SELECT DISTINCT doc_id AS probe, sh FROM grams WHERE doc_id < 10),
    corpus AS (SELECT doc_id AS doc, sh FROM grams WHERE doc_id >= 10)
    SELECT doc, count(*) AS n_hits, count(DISTINCT probe) AS n_probe_docs
    FROM corpus JOIN probe USING (sh)
    GROUP BY doc
    """,
)
def txt_contamination(spark, sf_dir):
    """8-gram benchmark-contamination check: corpus (doc_id >= 10) vs a probe
    set (doc_id < 10) — exact inverted-index collision, oracle-mirrored."""
    from polars_spark.llm import contamination_check

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") >= 10)
    probes = docs.filter(F.col("doc_id") < 10)
    return contamination_check(corpus, probes, n=8)


@query(
    "txt_token_df_idf",
    oracle=r"""
    WITH per_doc AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS token
      FROM documents
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT token, count(*) AS df,
           round(ln(n.n_docs::DOUBLE / count(*)), 6) AS idf
    FROM per_doc, n
    GROUP BY token, n.n_docs
    """,
)
def txt_token_df_idf(spark, sf_dir):
    """Vocabulary document-frequency + IDF (the TF-IDF pre-pass)."""
    from polars_spark.llm import token_doc_frequency

    docs = table(spark, sf_dir, "documents")
    return token_doc_frequency(docs)


@query(
    "txt_chunk_documents",
    # chunk k covers whitespace tokens [k*48, k*48+64); stride 48 = 64-16;
    # ceil((n-16)/48) chunks, minimum 1; final partial chunk kept.
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ),
    d AS (
      SELECT doc_id, toks, len(toks) AS n,
             greatest(CAST(ceil((len(toks) - 16) / 48.0) AS INT), 1) AS n_chunks
      FROM t
    ),
    k AS (
      SELECT doc_id, n, unnest(generate_series(0, n_chunks - 1)) AS chunk_id, toks
      FROM d
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text,
           CAST(least(n - chunk_id * 48, 64) AS INT) AS chunk_len
    FROM k
    """,
)
def txt_chunk_documents(spark, sf_dir):
    """Training-pipeline chunking: overlapping 64-token windows (stride 48)
    per document — tokenize once, sequence + posexplode, no UDF."""
    from polars_spark.llm.text import chunk_documents

    docs = table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, overlap=16).select(
        "doc_id", F.col("chunk_id").cast("int").alias("chunk_id"), "chunk_text",
        F.col("chunk_len").cast("int").alias("chunk_len"),
    )


@query(
    "txt_deterministic_sample",
    # md5-threshold Bernoulli: engine-independent (unlike rand(seed), whose
    # stream depends on partitioning), so DuckDB selects the same rows.
    oracle="""
    SELECT doc_id, source FROM documents
    WHERE ('0x' || substring(md5(doc_id::VARCHAR || ':7'), 1, 8))::UBIGINT::BIGINT <
          CASE WHEN source IN ('src0','src1','src2') THEN 4294967296
               WHEN source IN ('src3','src4')        THEN 2147483648
               ELSE 429496729 END
    """,
)
def txt_deterministic_sample(spark, sf_dir):
    """Training-data mixing: per-source deterministic Bernoulli sampling
    (keep 100% of src0-2, 50% of src3-4, 10% of the rest) via an md5
    threshold — pure map-side filter, reproducible at any partitioning."""
    from polars_spark.llm import deterministic_sample

    docs = table(spark, sf_dir, "documents")
    fractions = {"src0": 1.0, "src1": 1.0, "src2": 1.0, "src3": 0.5, "src4": 0.5}
    fractions.update({f"src{i}": 0.1 for i in range(5, 20)})
    out = deterministic_sample(docs, key_col="doc_id", by="source", fractions=fractions, seed=7)
    return out.select("doc_id", "source")


@query(
    "txt_pack_sequences",
    # contiguous greedy packing = floor((running_sum - own)/budget) over a
    # per-source ordered window — replayed verbatim as a SQL window.
    oracle="""
    SELECT doc_id, source, n_chars,
           CAST(floor((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) - n_chars)
                      / 2000) AS BIGINT) AS bin_id
    FROM documents
    """,
)
def txt_pack_sequences(spark, sf_dir):
    """Training-batch assembly: greedy contiguous packing of documents into
    ~2000-char bins per source — ONE windowed shuffle on the source key, no
    global window (SURVEY §2.4 order contract)."""
    from polars_spark.llm import pack_sequences

    docs = table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, target_tokens=2000, token_col="n_chars", order_col="doc_id", by="source"
    ).select("doc_id", "source", "n_chars", "bin_id")


@query(
    "txt_gopher_quality",
    # Every signal is the same IEEE arithmetic on both engines (small-int
    # divisions), so the pass flag needs no rounding; the double signals are
    # fround(6)'d for the value hash.
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
             regexp_split_to_array(text, '\n') AS lines
      FROM documents WHERE text IS NOT NULL
    ), s AS (
      SELECT doc_id,
        len(toks)::BIGINT AS n_words,
        length(regexp_replace(text, '\s', '', 'g'))::DOUBLE / greatest(len(toks), 1) AS mean_word_len,
        len(regexp_extract_all(text, '#|\.\.\.'))::DOUBLE / greatest(len(toks), 1) AS symbol_word_ratio,
        len(list_filter(lines, x -> regexp_matches(trim(x), '^[-*•]')))::DOUBLE / greatest(len(lines), 1) AS bullet_line_frac,
        len(list_filter(lines, x -> regexp_matches(trim(x), '\.\.\.$')))::DOUBLE / greatest(len(lines), 1) AS ellipsis_line_frac,
        len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / greatest(len(toks), 1) AS alpha_word_frac,
        len(list_intersect(list_distinct(toks), ['the','be','to','of','and','that','have','with']))::BIGINT AS n_stopword_hits,
        1.0 - len(list_distinct(lines))::DOUBLE / greatest(len(lines), 1) AS dup_line_frac,
        1.0 - len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1) AS dup_word_frac,
        1.0 - len(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                               i -> toks[i] || ' ' || toks[i + 1])))::DOUBLE
            / greatest(len(toks) - 1, 1) AS dup_2gram_frac,
        1.0 - len(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])))::DOUBLE
            / greatest(len(toks) - 2, 1) AS dup_3gram_frac
      FROM t
    )
    , g AS (
    SELECT doc_id, n_words,
           floor(mean_word_len * 1000000 + 0.5) / 1000000 AS mean_word_len,
           n_stopword_hits,
           floor(dup_word_frac * 1000000 + 0.5) / 1000000 AS dup_word_frac,
           floor(dup_2gram_frac * 1000000 + 0.5) / 1000000 AS dup_2gram_frac,
           floor(dup_3gram_frac * 1000000 + 0.5) / 1000000 AS dup_3gram_frac,
           (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
           AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
           AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
           AND n_stopword_hits >= 1 AND dup_line_frac <= 0.3
           AND dup_word_frac <= 0.5 AND dup_2gram_frac <= 0.05 AS passes_gopher
    FROM s)
    SELECT d.doc_id, g.n_words, g.mean_word_len, g.n_stopword_hits,
           g.dup_word_frac, g.dup_2gram_frac, g.dup_3gram_frac, g.passes_gopher
    FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id
    """,
)
def txt_gopher_quality(spark, sf_dir):
    """Gopher-style repetition/quality pre-filter (Rae et al. 2021 A1.1):
    zero-shuffle row-local signals + pass flag; at 100 TB this fuses into
    the scan as one mapper stage."""
    from polars_spark.llm.text import gopher_filter
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    out = gopher_filter(docs)
    return out.select(
        "doc_id",
        "n_words",
        fround(F.col("mean_word_len"), 6).alias("mean_word_len"),
        "n_stopword_hits",
        fround(F.col("dup_word_frac"), 6).alias("dup_word_frac"),
        fround(F.col("dup_2gram_frac"), 6).alias("dup_2gram_frac"),
        fround(F.col("dup_3gram_frac"), 6).alias("dup_3gram_frac"),
        "passes_gopher",
    )


@query(
    "txt_top_ngram",
    # char-weighted top-bigram repetition mass; ties break lexically on both
    # engines.
    oracle=r"""
    WITH t AS (
      SELECT doc_id, greatest(length(text), 1) AS n_chars_doc,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, n_chars_doc,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM t
    ), cnt AS (
      SELECT doc_id, n_chars_doc, gram, count(*)::BIGINT AS gram_count
      FROM g GROUP BY doc_id, n_chars_doc, gram
    )
    SELECT doc_id, gram AS top_gram, gram_count,
           floor(gram_count * length(gram) / n_chars_doc::DOUBLE * 1000000 + 0.5) / 1000000
             AS top_gram_char_frac
    FROM cnt
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY gram_count DESC, gram ASC) = 1
    """,
)
def txt_top_ngram(spark, sf_dir):
    """Gopher's char-weighted top-2-gram mass: explode + (doc, gram) count +
    per-doc argmax — two doc-keyed shuffles, both partial-aggregated."""
    from polars_spark.llm.text import top_ngram_stats
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    out = top_ngram_stats(docs, n=2)
    return out.select(
        "doc_id",
        "top_gram",
        "gram_count",
        fround(F.col("top_gram_char_frac"), 6).alias("top_gram_char_frac"),
    )


@query(
    "txt_c4_clean",
    # corpus-calibrated params: no terminal punct in the synthetic docs, so
    # variance comes from the word-count floor and the banned substring.
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\n') AS lines FROM documents
    ), k AS (
      SELECT doc_id, len(lines)::BIGINT AS n_lines_total,
             list_filter(lines, x -> len(regexp_split_to_array(trim(x), '\s+')) >= 30
                                      AND NOT contains(lower(x), 'customer')) AS kept
      FROM t
    )
    SELECT doc_id, n_lines_total, len(kept)::BIGINT AS n_lines_kept,
           CASE WHEN kept IS NULL THEN NULL
                ELSE coalesce(length(array_to_string(kept, chr(10))), 0) END::BIGINT
             AS cleaned_len,
           len(kept) >= 1 AS doc_kept
    FROM k
    """,
)
def txt_c4_clean(spark, sf_dir):
    """C4-style line filtering (Raffel et al. 2020 §2.2) — higher-order
    array filter over split lines, zero shuffle."""
    from polars_spark.llm.text import c4_clean

    docs = table(spark, sf_dir, "documents")
    out = c4_clean(
        docs,
        require_terminal_punct=False,
        min_words_per_line=30,
        banned_substrings=["customer"],
        min_lines_kept=1,
    )
    return out.select(
        "doc_id",
        "n_lines_total",
        "n_lines_kept",
        F.length("cleaned_text").cast("bigint").alias("cleaned_len"),
        "doc_kept",
    )


@query(
    "txt_pii_redact",
    # The corpus carries no PII, so the query deterministically plants
    # class-conditional PII (email always, IP on doc_id%3=0, phone on
    # doc_id%2=0) and both engines scrub it with the SAME regex set, in the
    # SAME order (email, ip, phone).
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             'reach ' || source || '.' || doc_id || '@corp.example'
             || CASE WHEN doc_id % 3 = 0 THEN ' at 10.0.' || (doc_id % 256) || '.7' ELSE '' END
             || CASE WHEN doc_id % 2 = 0 THEN ' or 415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
             || ' ' || substr(text, 1, 40) AS pii_text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
           len(regexp_extract_all(pii_text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
           len(regexp_extract_all(pii_text, '\+?\d{3}[-. ]\d{3}[-. ]\d{4}'))::BIGINT AS n_phone,
           regexp_replace(regexp_replace(regexp_replace(pii_text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[PII]', 'g'),
               '\+?\d{3}[-. ]\d{3}[-. ]\d{4}', '[PII]', 'g') AS redacted
    FROM t
    """,
)
def txt_pii_redact(spark, sf_dir):
    """PII scrubbing (emails / IPv4 / phone shapes): row-local regex counts
    + ordered redaction — a map-side pass before tokenization."""
    from polars_spark.llm.text import pii_counts, redact_pii

    docs = table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.lit("reach "),
        F.col("source"),
        F.lit("."),
        F.col("doc_id").cast("string"),
        F.lit("@corp.example"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" at 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" or 415-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" "),
        F.substring("text", 1, 40),
    )
    base = docs.select("doc_id", pii_text.alias("pii_text"))
    counts = pii_counts(F.col("pii_text"))
    return base.select(
        "doc_id",
        *[c.alias(n) for n, c in counts.items()],
        redact_pii(F.col("pii_text")).alias("redacted"),
    )


@query(
    "txt_leakage_split",
    # clusters: the dedup_clusters transitive-closure CTE (valid on this
    # corpus: verified LSH pairs == exact-jaccard pairs); split: the
    # txt_hash_split md5 thresholds, keyed on the COMPONENT label with
    # singleton fallback to doc_id.
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
    ),
    comp AS (SELECT doc, min(node) AS cluster FROM reach GROUP BY doc),
    g AS (
      SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS group_key
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc
    )
    SELECT doc_id, group_key,
           CASE WHEN h < 3435973836 THEN 'train'
                WHEN h < 3865470566 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, group_key,
                 ('0x' || substring(md5(group_key::VARCHAR || ':11'), 1, 8))::UBIGINT::BIGINT AS h
          FROM g)
    """,
)
def txt_leakage_split(spark, sf_dir):
    """Leakage-safe 80/10/10 split: near-duplicate components (minhash-LSH
    pairs -> connected components) share one split, so no eval document has
    a near-copy in train — the contamination mode a per-doc hash split
    cannot prevent.  Singletons key on their own id; the split rule is the
    same stable md5 bucket as txt_hash_split."""
    from polars_spark.llm import leakage_safe_split, minhash_lsh_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=3, k=32, bands=8, threshold=0.8)
    out = leakage_safe_split(
        docs, pairs, id_col="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1}, seed=11,
    )
    return out.select("doc_id", "group_key", "split")


@query(
    "txt_hash_split",
    # cumulative md5-bucket thresholds: int(0.8*2^32)=3435973836,
    # int((0.8+0.1)*2^32)=3865470566 (same float accumulation as the op).
    oracle="""
    SELECT doc_id,
           CASE WHEN h < 3435973836 THEN 'train'
                WHEN h < 3865470566 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 ('0x' || substring(md5(doc_id::VARCHAR || ':11'), 1, 8))::UBIGINT::BIGINT AS h
          FROM documents)
    """,
)
def txt_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split keyed on doc_id — a pure
    md5-bucket projection, stable as the corpus grows."""
    from polars_spark.llm import hash_split

    docs = table(spark, sf_dir, "documents")
    out = hash_split(
        docs, key_col="doc_id", fractions={"train": 0.8, "val": 0.1, "test": 0.1}, seed=11
    )
    return out.select("doc_id", "split")


@query(
    "txt_global_shuffle",
    oracle="""
    SELECT doc_id, md5(doc_id::VARCHAR || ':5') AS shuffle_key
    FROM documents ORDER BY shuffle_key LIMIT 50
    """,
)
def txt_global_shuffle(spark, sf_dir):
    """Deterministic global training-data shuffle: md5 sort key + Spark's
    sampled range-partitioned sort (skew-free, no single partition); the
    head-50 pins the exact order against the oracle."""
    from polars_spark.llm import global_shuffle

    docs = table(spark, sf_dir, "documents")
    return global_shuffle(docs, key_col="doc_id", seed=5).select("doc_id", "shuffle_key").limit(50)


@query(
    "txt_heavy_hitters",
    # the sketch only proposes candidates; the exact recount decides, so
    # the result equals the exact top-k (tie-break count desc, item asc).
    oracle=r"""
    SELECT w AS item, count(*)::BIGINT AS item_count
    FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w FROM documents)
    GROUP BY w
    ORDER BY item_count DESC, item ASC
    LIMIT 20
    """,
)
def txt_heavy_hitters(spark, sf_dir):
    """Top-20 corpus tokens via bounded-memory Misra-Gries candidates +
    exact recount — the unbounded-cardinality path where a plain groupBy
    top-k would need the full distinct item set in the shuffle."""
    from polars_spark.functions import heavy_hitters
    from polars_spark.llm import tokenize

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize(F.lower(F.col("text")))).alias("token"))
    return heavy_hitters(toks, "token", k=20, capacity=64)


@query(
    "txt_unigram_logprob",
    # mean of ~n_words -ln(p) terms: both engines do the identical division
    # count/total and ln; the mean is fround(6)'d on both sides (same
    # discipline as agg_product_entropy).
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents
    ), vocab AS (
      SELECT token, count(*) AS tok_count FROM toks GROUP BY token
    ), total AS (
      SELECT sum(tok_count) AS tok_total FROM vocab
    )
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           floor(avg(-ln(tok_count::DOUBLE / tok_total)) * 1000000 + 0.5) / 1000000 AS mean_nll
    FROM toks JOIN vocab USING (token), total
    GROUP BY doc_id
    """,
)
def txt_unigram_logprob(spark, sf_dir):
    """CCNet-style LM quality proxy: per-doc mean -ln p(token) under the
    corpus unigram model — two linear passes, AQE-sized vocabulary join."""
    from polars_spark.llm.text import unigram_logprob_score
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    out = unigram_logprob_score(docs)
    return out.select("doc_id", "n_tokens", fround(F.col("mean_nll"), 6).alias("mean_nll"))


@query(
    "txt_filter_funnel",
    oracle=r"""
    WITH f AS (
      SELECT n_chars BETWEEN 100 AND 5000                                   AS c1,
             len(regexp_split_to_array(trim(text), '\s+')) >= 20            AS c2,
             lang = 'en'                                                    AS c3
      FROM documents
    )
    SELECT 1 AS stage_idx, 'len_chars' AS stage,
           count(*) AS n_in,
           count(*) FILTER (c1) AS n_out,
           count(*) - count(*) FILTER (c1) AS n_dropped FROM f
    UNION ALL
    SELECT 2, 'min_tokens',
           count(*) FILTER (c1),
           count(*) FILTER (c1 AND c2),
           count(*) FILTER (c1) - count(*) FILTER (c1 AND c2) FROM f
    UNION ALL
    SELECT 3, 'english',
           count(*) FILTER (c1 AND c2),
           count(*) FILTER (c1 AND c2 AND c3),
           count(*) FILTER (c1 AND c2) - count(*) FILTER (c1 AND c2 AND c3) FROM f
    """,
)
def txt_filter_funnel(spark, sf_dir):
    """One-pass pipeline funnel: three chained quality filters, survival
    counts from a single aggregate over a single scan (no per-stage count
    jobs)."""
    from polars_spark.llm import filter_funnel

    docs = table(spark, sf_dir, "documents")
    _, funnel = filter_funnel(
        docs,
        [
            ("len_chars", F.col("n_chars").between(100, 5000)),
            ("min_tokens", token_count(F.col("text")) >= 20),
            ("english", F.col("lang") == "en"),
        ],
    )
    return funnel


@query(
    "txt_bigram_logprob",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS arr
      FROM documents
    ), bi AS (
      SELECT doc_id, unnest(list_transform(range(1, len(arr)),
                                           i -> arr[i] || ' ' || arr[i + 1])) AS bg
      FROM d
    ), vocab AS (
      SELECT bg, count(*) AS bg_count FROM bi GROUP BY bg
    ), prefix AS (
      SELECT split_part(bg, ' ', 1) AS w1, sum(bg_count) AS w1_count
      FROM vocab GROUP BY 1
    )
    SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           floor(avg(-ln(bg_count::DOUBLE / w1_count)) * 1000000 + 0.5) / 1000000 AS mean_nll
    FROM bi JOIN vocab USING (bg)
    JOIN prefix ON split_part(bg, ' ', 1) = prefix.w1
    GROUP BY doc_id
    """,
)
def txt_bigram_logprob(spark, sf_dir):
    """Bigram conditional-LM quality proxy: mean -ln p(w_i | w_{i-1}) per
    doc; prefix counts derived from the bigram table (no second corpus
    pass)."""
    from polars_spark.llm.text import bigram_logprob_score
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    out = bigram_logprob_score(docs)
    return out.select(
        "doc_id", "n_bigrams", fround(F.col("mean_nll"), 6).alias("mean_nll")
    )


@query(
    "txt_materialize_packed",
    # same window replay as txt_pack_sequences, plus string_agg in doc order
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source, text,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      FROM documents
    ), binned AS (
      SELECT doc_id, source, text, n_tok,
             CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok) / 2000.0) AS BIGINT) AS bin_id
      FROM t
    )
    SELECT source, bin_id, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
           coalesce(string_agg(text, chr(10) || chr(10) ORDER BY doc_id), '') AS packed_text
    FROM binned GROUP BY source, bin_id
    """,
)
def txt_materialize_packed(spark, sf_dir):
    """Sequence packing materialized: per-bin concatenated training
    sequences (docs joined in deterministic doc_id order), one window
    shuffle + one aggregate shuffle."""
    from polars_spark.llm import materialize_packed

    docs = table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    out = materialize_packed(
        docs, target_tokens=2000, token_col="n_tok", text_col="text",
        order_col="doc_id", by="source",
    )
    return out.select(
        "source", "bin_id", "n_docs",
        F.col("n_tokens").cast("bigint").alias("n_tokens"), "packed_text",
    )


def _script_oracle() -> str:
    from polars_spark.llm.text import SCRIPT_RANGES

    def rng_re2(rng: str) -> str:
        # Spark side uses Java \uXXXX escapes; RE2 spells them \x{XXXX}
        import re as _re

        return _re.sub(r"\\u([0-9A-Fa-f]{4})", r"\\x{\1}", rng)

    fr = {
        name: (
            f"length(regexp_replace(text, '[^{rng_re2(rng)}]', '', 'g'))::DOUBLE"
            f" / greatest(length(text), 1)"
        )
        for name, rng in SCRIPT_RANGES.items()
    }
    cols = ", ".join(
        f"floor(({e}) * 1e6 + 0.5) / 1e6 AS frac_{n}" for n, e in fr.items()
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, '{n}' AS s, {e} AS fval FROM documents"
        for n, e in fr.items()
        if n != "digit"
    )
    return f"""
    WITH u AS ({unions}),
    dom AS (
      SELECT doc_id, s AS dominant_script FROM (
        SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
                         ORDER BY fval DESC, s DESC) AS rn FROM u) WHERE rn = 1)
    SELECT d.doc_id, {cols}, dom.dominant_script
    FROM documents d LEFT JOIN dom ON d.doc_id = dom.doc_id
    """


@query("txt_script_profile", oracle=_script_oracle())
def txt_script_profile(spark, sf_dir):
    """Unicode-script composition per document (multilingual routing /
    mojibake detection): zero-shuffle regexp projection; dominant script by
    (fraction desc, name desc) — identical tie rule in the oracle."""
    from polars_spark.llm.text import script_profile
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    out = script_profile(docs)
    frac_cols = [c for c in out.columns if c.startswith("frac_")]
    return out.select(
        "doc_id",
        *[fround(F.col(c), 6).alias(c) for c in frac_cols],
        "dominant_script",
    )


@query(
    "txt_winnow_fingerprints",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS arr
      FROM documents
    ), g AS (
      SELECT doc_id, i - 1 AS pos,
             ((('0x' || substring(md5(arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                 || ' ' || arr[i+3] || ' ' || arr[i+4]), 1, 8))::UBIGINT::BIGINT) + 1)
               * 1048576 - (i - 1) AS key
      FROM d, unnest(range(1, len(arr) - 3)) AS t(i)
    ), wm AS (
      SELECT doc_id, pos,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wk,
             max(pos) OVER (PARTITION BY doc_id) AS max_pos
      FROM g
    ), sel AS (
      SELECT doc_id, wk,
             (1048576 - (wk % 1048576)) % 1048576 AS pos_rec
      FROM wm WHERE pos <= max_pos - 3
    )
    SELECT doc_id,
           (floor((wk + pos_rec) / 1048576))::BIGINT - 1 AS fingerprint,
           min(pos_rec)::BIGINT AS first_pos
    FROM sel GROUP BY doc_id, fingerprint
    """,
)
def txt_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) fingerprints: md5-hashed word 5-grams, min per
    4-window with the rightmost tie rule packed into one integer key —
    one doc-keyed window shuffle; the oracle replays the identical key
    arithmetic."""
    from polars_spark.llm.text import winnow_fingerprints

    docs = table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=5, window=4)


@query(
    "txt_dsir_weights",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, (lang = 'en')::INT AS it,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents
    ), vocab AS (
      SELECT token, count(*) AS q_count, sum(it) AS t_count
      FROM toks GROUP BY token
    ), totals AS (
      SELECT sum(q_count) AS q_total, sum(t_count) AS t_total, count(*) AS v_size
      FROM vocab
    )
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           floor(sum(ln((t_count + 1)::DOUBLE / (t_total + v_size))
                   - ln((q_count + 1)::DOUBLE / (q_total + v_size))) * 10000 + 0.5)
             / 10000 AS log_weight
    FROM toks JOIN vocab USING (token), totals
    GROUP BY doc_id
    """,
)
def txt_dsir_weights(spark, sf_dir):
    """DSIR importance weights toward the lang='en' slice: unigram
    log-likelihood ratio with add-1 smoothing; fround(4) absorbs
    summation-order float noise."""
    from polars_spark.llm.text import dsir_weights
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    out = dsir_weights(docs, target_cond=F.col("lang") == "en")
    return out.select(
        "doc_id", "n_tokens", fround(F.col("log_weight"), 4).alias("log_weight")
    )


@query(
    "txt_boilerplate_lines",
    oracle=r"""
    WITH d0 AS (
      SELECT doc_id, source,
             text || (CASE WHEN doc_id % 2 = 0
                           THEN chr(10) || 'Copyright ' || source ELSE '' END)
                  || chr(10) || 'All rights reserved' AS text
      FROM documents
    ), d AS (
      SELECT doc_id, source, regexp_split_to_array(text, chr(10)) AS ls FROM d0
    ), lines AS (
      SELECT doc_id, source, i - 1 AS ln_pos, ls[i] AS line,
             md5(trim(lower(ls[i]))) AS lk
      FROM d, unnest(range(1, len(ls) + 1)) AS t(i)
    ), freq AS (
      SELECT source, lk, count(DISTINCT doc_id) AS ldf
      FROM lines WHERE length(trim(line)) >= 1 GROUP BY source, lk
    ), j AS (
      SELECT l.doc_id, l.ln_pos, l.line,
             coalesce(f.ldf, 0) <= 5 AS keep
      FROM lines l LEFT JOIN freq f ON l.source = f.source AND l.lk = f.lk
    )
    SELECT doc_id,
           coalesce(string_agg(line, chr(10) ORDER BY ln_pos) FILTER (keep), '') AS cleaned_text,
           count(*)::BIGINT AS n_lines_total,
           sum(keep::INT)::BIGINT AS n_lines_kept
    FROM j GROUP BY doc_id
    """,
)
def txt_boilerplate_lines(spark, sf_dir):
    """Corpus-level boilerplate line removal (CCNet/RefinedWeb pass): a
    line repeating across >5 docs of the same source is stripped from all
    of them — per-source copyright footers vanish, unique content stays.
    One line-keyed shuffle + positional reassembly."""
    from polars_spark.llm.text import remove_boilerplate_lines

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.concat(F.lit("\nCopyright "), F.col("source"))).otherwise(F.lit("")),
            F.lit("\nAll rights reserved"),
        ).alias("text"),
    )
    return remove_boilerplate_lines(
        docs, group_col="source", max_line_df=5
    )


@query(
    "txt_mix_to_budget",
    # fractions derive from corpus token sums; the oracle recomputes the
    # SAME double arithmetic (w*budget/avail, trunc to the md5 threshold)
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      FROM documents
    ), avail AS (
      SELECT source, sum(n_tok)::BIGINT AS a FROM t GROUP BY source
    ), frac AS (
      SELECT source,
             least(1.0, (CASE source
                           WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.4
                           WHEN 'src2' THEN 0.05 WHEN 'src3' THEN 0.05
                           WHEN 'src4' THEN 0.05 WHEN 'src5' THEN 0.05
                           ELSE 0.0 END * 30000) / a) AS f
      FROM avail
    )
    SELECT t.doc_id, t.source, t.n_tok::BIGINT AS n_tok
    FROM t JOIN frac USING (source)
    WHERE ('0x' || substring(md5(t.doc_id::VARCHAR || ':5'), 1, 8))::UBIGINT::BIGINT
          < CAST(trunc(f * 4294967296) AS BIGINT)
    """,
)
def txt_mix_to_budget(spark, sf_dir):
    """Token-budget mixture sampling: 40/40/5x4 weights over sources to a
    30k-token budget; per-source fractions from one tiny aggregate, then
    the deterministic md5 Bernoulli filter (map-side)."""
    from polars_spark.llm import mix_to_budget

    docs = table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    weights = {"src0": 0.4, "src1": 0.4, "src2": 0.05, "src3": 0.05, "src4": 0.05, "src5": 0.05}
    sampled, _ = mix_to_budget(
        docs, token_col="n_tok", by="source", weights=weights,
        total_tokens=30000, key_col="doc_id", seed=5,
    )
    return sampled.select("doc_id", "source", F.col("n_tok").cast("bigint").alias("n_tok"))


@query(
    "txt_perplexity_buckets",
    # CCNet's head/middle/tail split: tertile breakpoints of the unigram
    # mean-NLL (exact linear-interp percentiles, broadcast scalar agg),
    # bucket counts are robust to 1-ulp interpolation differences
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents
    ), vocab AS (
      SELECT token, count(*) AS tok_count FROM toks GROUP BY token
    ), total AS (SELECT sum(tok_count) AS tok_total FROM vocab),
    nll AS (
      SELECT doc_id, avg(-ln(tok_count::DOUBLE / tok_total)) AS mean_nll
      FROM toks JOIN vocab USING (token), total GROUP BY doc_id
    ), b AS (
      SELECT quantile_cont(mean_nll, 1.0/3) AS b1,
             quantile_cont(mean_nll, 2.0/3) AS b2
      FROM nll
    )
    SELECT CASE WHEN mean_nll <= b1 THEN 'head'
                WHEN mean_nll <= b2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           count(*) AS n_docs
    FROM nll, b GROUP BY 1
    """,
)
def txt_perplexity_buckets(spark, sf_dir):
    """CCNet perplexity bucketing: head/middle/tail tertiles of the
    corpus-LM mean NLL (low NLL = boilerplate-like 'head').  The qcut
    breakpoints are a broadcast scalar aggregate — never a global window."""
    import polars_spark as pl
    from polars_spark.llm.text import unigram_logprob_score
    from polars_spark.plans.frame import LazyFrame

    docs = table(spark, sf_dir, "documents")
    nll = LazyFrame(unigram_logprob_score(docs))
    labeled = nll.with_columns(
        bucket=pl.col("mean_nll").qcut([1.0 / 3, 2.0 / 3], labels=["head", "middle", "tail"])
    )
    return labeled.group_by("bucket").agg(pl.len().alias("n_docs")).to_spark()


@query(
    "txt_corpus_report",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_ch,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    ), g AS (
      SELECT count(*)::DOUBLE AS n_docs, sum(n_tok) AS n_tokens,
             sum(n_ch) AS n_chars, avg(n_tok) AS mean_tokens,
             quantile_cont(n_tok, 0.5) AS median_tokens,
             1 - count(DISTINCT fp)::DOUBLE / count(*) AS exact_dup_rate
      FROM t
    )
    SELECT 'n_docs' AS metric, n_docs AS value FROM g
    UNION ALL SELECT 'n_tokens', n_tokens FROM g
    UNION ALL SELECT 'n_chars', n_chars FROM g
    UNION ALL SELECT 'mean_tokens', floor(mean_tokens * 1e6 + 0.5) / 1e6 FROM g
    UNION ALL SELECT 'median_tokens', median_tokens FROM g
    UNION ALL SELECT 'exact_dup_rate', floor(exact_dup_rate * 1e6 + 0.5) / 1e6 FROM g
    UNION ALL SELECT 'n_docs_lang_' || lang, count(*)::DOUBLE FROM t GROUP BY lang
    """,
)
def txt_corpus_report(spark, sf_dir):
    """Dataset-card metrics in two jobs: global scalar aggregate (incl.
    exact-dup rate via countDistinct of the content fingerprint) + one
    language group-by, long format."""
    from polars_spark.llm.text import corpus_report
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    out = corpus_report(docs)
    return out.select(
        "metric",
        F.when(
            F.col("metric").isin("mean_tokens", "exact_dup_rate"),
            F.floor(F.col("value") * 1e6 + F.lit(0.5)) / 1e6,
        ).otherwise(F.col("value")).alias("value"),
    )


# fixed demo vocabulary for the tokenizer gate (ids = position+1, 0 = UNK);
# includes multi-char subwords to exercise greedy longest-match and enough
# single letters that UNK still appears (f, v, x, z are absent on purpose)
TOKENIZER_VOCAB = ['ta', 'ble', 'val', 'ue', 'scan', 'fast', 'win', 'dow', 'a', 'b', 'c', 'd', 'e', 'g', 'h', 'i', 'j', 'k', 'l', 'm', 'n', 'o', 'p', 'q', 'r', 's', 't', 'u', 'w', 'y']


@query(
    "txt_tokenize_wordpiece",
    oracle="""
    WITH RECURSIVE vocab(id, tok) AS (
      VALUES (1,'ta'),(2,'ble'),(3,'val'),(4,'ue'),(5,'scan'),(6,'fast'),(7,'win'),(8,'dow'),(9,'a'),(10,'b'),(11,'c'),(12,'d'),(13,'e'),(14,'g'),(15,'h'),(16,'i'),(17,'j'),(18,'k'),(19,'l'),(20,'m'),(21,'n'),(22,'o'),(23,'p'),(24,'q'),(25,'r'),(26,'s'),(27,'t'),(28,'u'),(29,'w'),(30,'y')
    ),
    words AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(arr)+1), i -> {'pos': i, 'word': arr[i]}), recursive := true)
      FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS arr FROM documents)
    ),
    w2 AS (SELECT doc_id, pos, word FROM words WHERE word <> ''),
    dwords AS (SELECT DISTINCT word FROM w2),
    step AS (
      SELECT word, 1 AS pos, CAST([] AS INT[]) AS ids FROM dwords
      UNION ALL
      SELECT s.word, s.pos + coalesce(len(b.tok), 1), list_append(s.ids, coalesce(b.id, 0))
      FROM step s
      LEFT JOIN LATERAL (
        SELECT v.id, v.tok FROM vocab v
        WHERE substr(s.word, s.pos, len(v.tok)) = v.tok
        ORDER BY len(v.tok) DESC, v.id LIMIT 1
      ) b ON true
      WHERE s.pos <= len(s.word)
    ),
    mapping AS (SELECT word, ids FROM step WHERE pos > len(word))
    SELECT w2.doc_id,
           array_to_string(list_transform(flatten(list(m.ids ORDER BY w2.pos)),
                                          x -> CAST(x AS VARCHAR)), ',') AS token_ids_csv,
           len(flatten(list(m.ids ORDER BY w2.pos))) AS n_tokens
    FROM w2 JOIN mapping m USING (word)
    GROUP BY w2.doc_id
    """,
)
def txt_tokenize_wordpiece(spark, sf_dir):
    """llm.tokenizer.tokenize_documents: greedy longest-match subword
    tokenization — Python runs only on DISTINCT words (Zipf dedup), the
    mapping joins back and one doc-keyed shuffle reassembles order.  The
    oracle replays the greedy matcher as a recursive CTE over the same
    distinct-word set.

    The FINAL token_ids column renders as a CSV string on both sides: the
    driver's hash canon cannot sort/hash ndarray cells (round-10 red), so
    gate finals must be scalar-only — the library API (tokenize_documents)
    still returns the real array<int>."""
    from polars_spark.llm.tokenizer import tokenize_documents

    docs = table(spark, sf_dir, "documents")
    toks = tokenize_documents(docs, TOKENIZER_VOCAB)
    return toks.select(
        "doc_id",
        F.array_join(F.transform("token_ids", lambda x: x.cast("string")), ",").alias(
            "token_ids_csv"
        ),
        "n_tokens",
    )


@query(
    "txt_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id % 4 <> 0
    ), new AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(
               CASE WHEN doc_id % 4 = 1 THEN text || ' edited' ELSE text END
             ), '\\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id % 4 <> 2
    )
    SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.fp IS NULL THEN 'added'
                WHEN new.fp IS NULL THEN 'removed'
                WHEN old.fp = new.fp THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old FULL JOIN new ON old.doc_id = new.doc_id
    """,
)
def txt_snapshot_diff(spark, sf_dir):
    """llm.snapshot_diff: incremental-crawl bookkeeping — one full outer
    join on doc id, portable md5 fingerprints; the synthetic 'new' snapshot
    drops doc_id%4==2 (removed), adds %4==0 (added) and edits %4==1
    (changed), same arithmetic both engines."""
    from polars_spark.llm import snapshot_diff

    docs = table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    old = docs.filter(d % 4 != 0)
    new = docs.filter(d % 4 != 2).withColumn(
        "text",
        F.when(d % 4 == 1, F.concat(F.col("text"), F.lit(" edited"))).otherwise(
            F.col("text")
        ),
    )
    return snapshot_diff(old, new)


@query(
    "txt_pr_curve",
    oracle="""
    WITH scored AS (
      SELECT n_chars / 3000.0 AS score, (doc_id % 3 = 0) AS label FROM documents
    ), t(threshold) AS (VALUES (0.2),(0.4),(0.6),(0.8))
    SELECT t.threshold,
           CAST(sum(CASE WHEN score >= threshold AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN score >= threshold AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN score < threshold AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           floor(CASE WHEN sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END) > 0 THEN
             sum(CASE WHEN score >= threshold AND label THEN 1 ELSE 0 END)
             / CAST(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS DOUBLE) END * 1e9 + 0.5) / 1e9 AS precision,
           floor(CASE WHEN sum(CASE WHEN label THEN 1 ELSE 0 END) > 0 THEN
             sum(CASE WHEN score >= threshold AND label THEN 1 ELSE 0 END)
             / CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE) END * 1e9 + 0.5) / 1e9 AS recall
    FROM t LEFT JOIN scored ON TRUE
    GROUP BY t.threshold
    """,
)
def txt_pr_curve(spark, sf_dir):
    """llm.pr_curve: classifier-threshold calibration sweep — every
    threshold is a conditional aggregate in ONE corpus pass (no sort, no
    window); f1 omitted from the gate (pure function of the compared
    precision/recall)."""
    from polars_spark.llm import pr_curve
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        (F.col("n_chars") / 3000.0).alias("score"),
        (F.col("doc_id") % 3 == 0).alias("label"),
    )
    out = pr_curve(scored, [0.2, 0.4, 0.6, 0.8])
    return out.select(
        "threshold", "tp", "fp", "fn",
        fround(F.col("precision"), 9).alias("precision"),
        fround(F.col("recall"), 9).alias("recall"),
    )


_PASSK = 10
_PASSK_PROD = " * ".join(
    f"((n - c - {i}) / CAST(n - {i} AS DOUBLE))" for i in range(_PASSK)
)


@query(
    "txt_eval_em_f1",
    oracle="""
    WITH base AS (
      SELECT doc_id,
        array_to_string((string_split_regex(lower(text), '\\s+'))[1:8], ' ') AS ref_raw
      FROM documents
    ), pairs AS (
      SELECT doc_id, ref_raw AS reference,
        CASE WHEN doc_id % 3 = 0 THEN ref_raw
             WHEN doc_id % 3 = 1 THEN array_to_string(string_split(ref_raw, ' ')[1:6], ' ')
             ELSE 'the quick brown fox' END AS prediction
      FROM base
    ), norm AS (
      SELECT doc_id,
        trim(regexp_replace(regexp_replace(regexp_replace(lower(prediction),
          '[^a-z0-9 ]', ' ', 'g'), '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g')) AS p,
        trim(regexp_replace(regexp_replace(regexp_replace(lower(reference),
          '[^a-z0-9 ]', ' ', 'g'), '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g')) AS r
      FROM pairs
    ), ptok AS (
      SELECT doc_id, t, count(*) AS cp FROM (
        SELECT doc_id, unnest(list_filter(string_split(p, ' '), x -> x <> '')) AS t FROM norm
      ) GROUP BY doc_id, t
    ), rtok AS (
      SELECT doc_id, t, count(*) AS cr FROM (
        SELECT doc_id, unnest(list_filter(string_split(r, ' '), x -> x <> '')) AS t FROM norm
      ) GROUP BY doc_id, t
    ), inter AS (
      SELECT ptok.doc_id, sum(least(cp, cr)) AS common
      FROM ptok JOIN rtok ON ptok.doc_id = rtok.doc_id AND ptok.t = rtok.t
      GROUP BY ptok.doc_id
    ), sizes AS (
      SELECT norm.doc_id,
             len(list_filter(string_split(p, ' '), x -> x <> '')) AS np,
             len(list_filter(string_split(r, ' '), x -> x <> '')) AS nr,
             (p = r)::INT AS em,
             coalesce(inter.common, 0) AS common
      FROM norm LEFT JOIN inter ON norm.doc_id = inter.doc_id
    )
    SELECT doc_id, em,
      floor(CASE WHEN np IS NULL OR nr IS NULL THEN NULL
           WHEN np = 0 AND nr = 0 THEN 1.0
           WHEN np = 0 OR nr = 0 OR common = 0 THEN 0.0
           ELSE 2.0 * (common/CAST(np AS DOUBLE)) * (common/CAST(nr AS DOUBLE))
                / (common/CAST(np AS DOUBLE) + common/CAST(nr AS DOUBLE)) END * 1e9 + 0.5) / 1e9 AS f1
    FROM sizes
    """,
)
def txt_eval_em_f1(spark, sf_dir):
    """llm.eval.exact_match_f1: SQuAD-style EM + token F1 per prediction —
    pure column algebra (multiset intersection via array HOFs); oracle
    computes the intersection relationally (unnest + counted join)."""
    from polars_spark.llm.eval import exact_match_f1
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    ref = F.array_join(F.slice(F.split(F.lower(F.col("text")), r"\s+"), 1, 8), " ")
    pred = (
        F.when(d % 3 == 0, ref)
        .when(d % 3 == 1, F.array_join(F.slice(F.split(ref, " "), 1, 6), " "))
        .otherwise(F.lit("the quick brown fox"))
    )
    pairs = docs.select(d.alias("doc_id"), pred.alias("prediction"), ref.alias("reference"))
    out = exact_match_f1(pairs)
    return out.select("doc_id", "em", fround(F.col("f1"), 9).alias("f1"))


@query(
    "txt_pass_at_k",
    oracle=f"""
    WITH g AS (
      SELECT event_id % 40 AS task_id,
             count(*) AS n,
             CAST(sum(CASE WHEN value IS NULL THEN NULL
                           WHEN value < 100 THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM events GROUP BY event_id % 40
    )
    SELECT task_id, n, c,
      floor(CASE WHEN n - c < {_PASSK} THEN 1.0
            ELSE 1.0 - {_PASSK_PROD} END * 1e9 + 0.5) / 1e9 AS pass_at_k
    FROM g
    """,
)
def txt_pass_at_k(spark, sf_dir):
    """llm.eval.pass_at_k: the unbiased HumanEval pass@k estimator per
    task (product form, k unrolled) — one groupBy shuffle."""
    from polars_spark.llm.eval import pass_at_k
    from polars_spark.queries import fround

    ev = table(spark, sf_dir, "events")
    samples = ev.select(
        (F.col("event_id") % 40).alias("task_id"),
        (F.col("value") < 100).alias("passed"),
    )
    out = pass_at_k(samples, _PASSK)
    return out.select("task_id", "n", "c", fround(F.col("pass_at_k"), 9).alias("pass_at_k"))


@query(
    "txt_distinct_sketch",
    oracle="""
    SELECT source,
           count(DISTINCT t) AS distinct_tokens,
           TRUE AS est_within_5pct
    FROM (
      SELECT source, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t
      FROM documents
    )
    GROUP BY source
    """,
)
def txt_distinct_sketch(spark, sf_dir):
    """llm.sketches: mergeable HLL distinct sketches (DataSketches via
    hll_sketch_agg) — the incremental corpus-statistics path.  The oracle
    pins the EXACT per-source distinct token count (computed distributed on
    the Spark side too); the sketch estimate is asserted Spark-side to sit
    within 5% of that exact value (lgk=12 ~ 1.6% stderr), since an
    approximate value cannot hash-match a different engine by definition."""
    from polars_spark.llm.sketches import build_distinct_sketches, union_sketch_estimates

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    sk = build_distinct_sketches(toks, "source", "t")
    est = union_sketch_estimates(sk, "source")
    exact = toks.groupBy("source").agg(F.countDistinct("t").alias("distinct_tokens"))
    return exact.join(est, "source").select(
        "source",
        "distinct_tokens",
        (
            F.abs(F.col("distinct_est") - F.col("distinct_tokens"))
            / F.col("distinct_tokens")
            <= 0.05
        ).alias("est_within_5pct"),
    )


@query(
    "txt_dedup_lines",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             replace(substr(text, 1, 200), ' table ', chr(10)) AS doc
      FROM documents
    ), lines AS (
      SELECT doc_id, string_split(doc, chr(10)) AS ls FROM t
    ), kept AS (
      SELECT doc_id,
             list_filter(range(1, len(ls) + 1), i -> list_position(ls, ls[i]) = i) AS ki,
             ls
      FROM lines
    )
    SELECT doc_id,
           array_to_string(list_transform(ki, i -> ls[i]), chr(10)) AS deduped
    FROM kept
    """,
)
def txt_dedup_lines(spark, sf_dir):
    """llm.text.dedup_lines: within-document repeated-line removal (first
    occurrence wins) — synthetic multi-line docs made by turning a common
    token into newlines, same construction both engines."""
    from polars_spark.llm.text import dedup_lines

    docs = table(spark, sf_dir, "documents")
    doc = F.replace(F.substring(F.col("text"), 1, 200), F.lit(" table "), F.lit("\n"))
    return docs.select(F.col("doc_id"), dedup_lines(doc).alias("deduped"))


@query(
    "txt_bm25_topk",
    # Full BM25 replay: postings -> df/idf -> dl/avgdl -> per-(qid,doc)
    # term-sum -> fround(6) -> top-5 per query with (score desc, doc asc)
    # tie-break.  IDF is the smoothed ln(1 + (N-df+.5)/(df+.5)) form.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS doc,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents
    ),
    postings AS (SELECT doc, token, count(*) AS tf FROM toks GROUP BY doc, token),
    dl AS (SELECT doc, sum(tf) AS dl FROM postings GROUP BY doc),
    dft AS (SELECT token, count(*) AS df FROM postings GROUP BY token),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT avg(dl) FROM dl) AS avgdl
    ),
    qterms AS (
      SELECT doc_id AS qid,
             unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS token
      FROM documents WHERE doc_id < 8
    ),
    scored AS (
      SELECT q.qid, p.doc,
             sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                  * p.tf * (1.2 + 1.0)
                  / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)) ) AS raw
      FROM qterms q
      JOIN postings p USING (token)
      JOIN dft d USING (token)
      JOIN dl l ON l.doc = p.doc
      CROSS JOIN stats s
      WHERE p.doc != q.qid
      GROUP BY q.qid, p.doc
    )
    SELECT qid, doc, score, rk FROM (
      SELECT qid, doc,
             floor(raw * 1000000 + 0.5) / 1000000 AS score,
             row_number() OVER (
               PARTITION BY qid
               ORDER BY floor(raw * 1000000 + 0.5) / 1000000 DESC, doc ASC) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
)
def txt_bm25_topk(spark, sf_dir):
    """llm.retrieval.bm25_topk: Okapi BM25 top-5 per probe query (8 probes
    drawn from the corpus, self-match excluded) over the inverted index.
    Every stage is a keyed shuffle; corpus stats are a broadcast 1-row agg."""
    from polars_spark.llm.retrieval import bm25_topk

    docs = table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") < 8)
    return bm25_topk(docs, probes, k=5)


@query(
    "txt_stratified_sample",
    # exact 20-per-source sample: md5(doc_id || ':0') rank within source,
    # replayed literally (md5 is engine-independent)
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR || ':0') ASC, doc_id ASC) AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
)
def txt_stratified_sample(spark, sf_dir):
    """llm.stratified_sample: exact-count per-stratum sampling (balanced
    eval sets / per-source quotas) — one window keyed on the stratum, rank
    by engine-independent md5 so any engine replays the same rows."""
    from polars_spark.llm import stratified_sample

    docs = table(spark, sf_dir, "documents")
    return stratified_sample(docs, by="source", n_per_group=20, key_col="doc_id").select(
        "doc_id", "source"
    )


@query(
    "pipeline_curation",
    # END-TO-END curation chain (each stage individually gated elsewhere):
    # exact dedup on the normalized fingerprint (keep min doc_id) ->
    # quality threshold -> 30-per-source cap by md5 rank.  Every stage
    # replayed literally in one SQL chain.
    oracle=r"""
    WITH fp AS (
      SELECT doc_id, source, text,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS dk
        FROM fp
      ) WHERE dk = 1
    ),
    scored AS (
      SELECT doc_id, source,
             0.3 * (CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 1.0 ELSE 0.5 END)
           + 0.2 * (CASE WHEN length(text)::DOUBLE / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)
                         BETWEEN 3 AND 12 THEN 1.0 ELSE 0.5 END)
           + 0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / greatest(length(text), 1))
           + 0.2 * (1 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                              / greatest(length(text), 1) * 10, 1.0)) AS q
      FROM dedup
    ),
    kept AS (SELECT doc_id, source FROM scored WHERE q >= 0.5),
    capped AS (
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                 PARTITION BY source
                 ORDER BY md5(doc_id::VARCHAR || ':0') ASC, doc_id ASC) AS rk
        FROM kept
      ) WHERE rk <= 30
    )
    SELECT source, count(*) AS n_docs, min(doc_id) AS first_doc
    FROM capped GROUP BY source
    """,
)
def pipeline_curation(spark, sf_dir):
    """Composite web-curation pipeline — the end-to-end shape a training
    -data team actually runs, built ONLY from the engine's own gated ops:
    exact dedup (normalized fingerprint, keep lowest id) -> quality-score
    filter -> per-source quota (stratified md5 rank) -> per-source stats.
    Three keyed shuffles total (fingerprint, source-quota window, final
    group-by); every stage is the same code path its standalone gate
    verifies."""
    from pyspark.sql import Window

    from polars_spark.llm import fingerprint, stratified_sample
    from polars_spark.llm.text import quality_score

    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    dedup = (
        docs.withColumn("fp", fingerprint(F.col("text")))
        .withColumn("dk", F.row_number().over(w))
        .filter(F.col("dk") == 1)
    )
    kept = dedup.filter(quality_score(F.col("text")) >= 0.5).select("doc_id", "source")
    capped = stratified_sample(kept, by="source", n_per_group=30, key_col="doc_id")
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc")
    )


@query(
    "txt_weighted_sample",
    # same md5 uniform, same exponential race key (Efraimidis-Spirakis),
    # same top-k — engine-independent by construction, so the SELECTED SET
    # matches exactly; the key itself compares at 6dp
    oracle="""
    SELECT doc_id, floor(key * 1000000 + 0.5) / 1000000 AS sample_key
    FROM (
      SELECT doc_id,
             -ln((('0x' || substring(md5(doc_id::VARCHAR || ':13'), 1, 8))::UBIGINT
                  + 0.5) / 4294967296.0) / length(text) AS key
      FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    )
    ORDER BY key
    LIMIT 25
    """,
)
def txt_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus sampling (llm.weighted_sample): 25 docs
    without replacement, probability proportional to text length, via the
    A-ES exponential race over deterministic md5 uniforms — reproducible
    on any engine/partitioning, top-k never materializes a global sort."""
    from polars_spark.llm import weighted_sample
    import pyspark.sql.functions as F

    docs = table(spark, sf_dir, "documents").withColumn("w", F.length("text"))
    out = weighted_sample(docs, key_col="doc_id", weight_col="w", k=25, seed=13)
    return out.select("doc_id", (F.floor(F.col("sample_key") * 1e6 + F.lit(0.5)) / 1e6).alias("sample_key"))
