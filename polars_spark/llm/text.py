"""Text analysis operators: language ID, quality scoring, token counting,
fingerprinting — all pure pyspark.sql.functions (codegen'd, zero UDFs).

These run per-document, so they scale linearly and shuffle nothing;
at 100 TB they are a single mapper stage fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from polars_spark.llm import tokenize

__all__ = ["token_count", "bpe_ish_token_count", "stopword_ratio", "lang_scores", "lang_id", "quality_score"]


# tiny per-language stopword lists — enough signal for a heuristic voter
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "les"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den"],
}


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(c))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-approximating token count: words + punctuation + number runs
    counted separately (the regex mirrors a GPT-2-style pre-tokenizer
    split); a cheap, deterministic stand-in for a real tokenizer count."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def stopword_ratio(c: Column, words: list[str]) -> Column:
    toks = tokenize(F.lower(c))
    hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))
    return hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))


def lang_scores(c: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_ratio(c, words)) for lang, words in STOPWORDS.items()]


def lang_id(c: Column, *, min_score: float = 0.01) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit ratios,
    'unknown' when no list scores above ``min_score``."""
    scores = lang_scores(c)
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("unknown")
    # reverse order so earlier languages win exact ties (when() chains
    # short-circuit on the first match)
    expr = None
    for lang, s in scores:
        cond = (s == best) & (best >= min_score)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(out)


def quality_score(c: Column) -> Column:
    """Composite document-quality heuristic in [0,1]: length band, mean word
    length band, alpha ratio, low punctuation density.  The standard cheap
    pre-filter before expensive model-based scoring."""
    n_chars = F.length(c)
    toks = tokenize(c)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    mean_wl = n_chars / n_tok
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / F.greatest(n_chars, F.lit(1))
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")) / F.greatest(n_chars, F.lit(1))
    len_band = F.when((n_chars >= 100) & (n_chars <= 10000), 1.0).otherwise(0.5)
    wl_band = F.when((mean_wl >= 3) & (mean_wl <= 12), 1.0).otherwise(0.5)
    return (0.3 * len_band + 0.2 * wl_band + 0.3 * alpha + 0.2 * (1 - F.least(punct * 10, F.lit(1.0)))).cast(
        "double"
    )


def chunk_documents(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
):
    """Split documents into overlapping fixed-token-count chunks — the
    standard pre-tokenization windowing step of a training pipeline.

    Whitespace tokens; chunk k covers tokens [k*stride, k*stride+chunk)
    with stride = chunk - overlap; the final partial chunk is kept.  All
    JVM-side: tokenize once, sequence() over chunk starts, one posexplode
    — no UDF, parallel over input splits at scale.
    """
    from pyspark.sql import functions as F

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return (
        df.select(F.col(id_col), toks.alias("__toks"), n.alias("n_tokens"), starts.alias("__ks"))
        .select(F.col(id_col), "n_tokens", "__toks", F.posexplode("__ks").alias("chunk_id", "__k"))
        .select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice(F.col("__toks"), F.col("__k") * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.col("n_tokens").cast("int") - F.col("__k") * stride,
                F.lit(chunk_tokens),
            ).alias("chunk_len"),
        )
    )
