"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator (SURVEY.md §2) to a callable ``(spark, sf_dir) ->
DataFrame``; ``oracle_sql()`` gives the DuckDB-equivalent SQL per query.

The driver verifies ``list(queries())[:50]``, so the dict's ORDER is the
sampling policy.  Rounds 1-7 exposed 77 distinct names; from round 8 the
order rotates: the 22 TPC-H flagships stay as the prefix (plan-pinned,
always re-verified), and the next 28 slots cycle through never-yet-sampled
registry entries (the full local strict sweep covers the whole registry —
245 queries at round 9 — every round, so rotation converts local-only
green into driver green at zero risk).
Round 8 window: win_ewm_*/win_* order-dependent tail, tmp_*, stream_*,
udf_*, dedup_* (all 28 driver-green, CORRECTNESS_r08).  Round 9 window:
the scalar/dtype sf_* gates, agg_* tail, rel_* relational tail, io_*
round-trips, h2o_* group-by suite (26/28 green; the 2 reds were the
decimal-final hash-representation gates, fixed round 10).

Round 10 (VERDICT r9 next-round #2/#6): the pinned flagship prefix
shrinks from 22 to 6 (q1/q3/q6/q9/q18/q21 — the plan-audit sentinels),
widening the rotation window to 44 slots so full driver coverage of the
246-gate registry lands in ~2.5 rounds instead of 4.  Window #3 leads
with the LLM scale-path flagships that had zero driver evidence
(dedup_minhash_star, sim_ivf_topk, txt_bm25_topk, web_pagerank,
stream_minhash_suppress), then closes out dedup/sim/emb/mm/web/stream
entirely plus the first third of txt_*.

Round-11 backlog (77 never-sampled after window #3, incl. round-10
additions): txt_* 26, h2o_* 9, io_* 8, sf_* 7, agg_* 7, join_* 5
(incl. join_asof_nearest), evt_* 4, sql_* 4, scale_* 3, win_ewm
null-decay + long-series, dedup_fuzzy_names, rel_with_context —
window #4 takes 44 (lead with txt_* + h2o_*), window #5 the last 33.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from polars_spark.queries import QUERIES, ORACLE_SQL

_FLAGSHIP_PREFIX = [f"q{i}_" for i in (1, 3, 6, 9, 18, 21)]

# round-10 rotation window (44 names, all first-time driver exposure) plus
# the two round-9 hash reds re-exposed with their round-10 VARCHAR-rendered
# finals (they must convert red -> green under the driver's own hash).
_ROTATION = [
    "sf_decimal_exact",
    "rel_match_schema",
    # LLM scale-path flagships (VERDICT r9 #6: zero driver evidence so far)
    "dedup_minhash_star",
    "sim_ivf_topk",
    "txt_bm25_topk",
    "web_pagerank",
    "stream_minhash_suppress",
    # dedup family tail
    "dedup_clusters",
    "dedup_semdedup",
    "dedup_tfidf_cosine",
    "dedup_incremental_index",
    "dedup_span_ngrams",
    "dedup_span_removal",
    # similarity / embeddings
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_int8_topk",
    "sim_rrf_fusion",
    "sim_label_centroid",
    "emb_quantize_error",
    "emb_contrastive_triplets",
    # multimodal plumbing
    "mm_extract_features",
    "mm_sample_frames",
    "mm_resize",
    "mm_audio_features",
    "mm_image_ahash_pairs",
    # web curation
    "web_url_normalize",
    "web_domain_cap",
    "web_blocklist_stats",
    "web_url_dedup",
    "web_html_to_text",
    # streaming tail
    "stream_session_windows",
    # text-pipeline first third
    "txt_tokenize_wordpiece",
    "txt_token_stats",
    "txt_quality",
    "txt_lang_id",
    "txt_fingerprint",
    "txt_contamination",
    "txt_token_df_idf",
    "txt_chunk_documents",
    "txt_deterministic_sample",
    "txt_pack_sequences",
    "txt_gopher_quality",
    "txt_dedup_lines",
    "pipeline_curation",
    "evt_funnel",
]


def _ordered() -> list[str]:
    names = list(QUERIES)
    head = [n for n in names if any(n.startswith(p) for p in _FLAGSHIP_PREFIX)]
    rot = [n for n in _ROTATION if n in QUERIES]
    rest = [n for n in names if n not in set(head) | set(rot)]
    return head + rot + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
