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

Round 11 (VERDICT r10 next-round #1/#2/#5): window #4 leads with the 3
round-10 driver reds re-exposed with scalar-rendered finals (the array
columns now render as CSV strings on BOTH sides — the driver's hash
canon cannot sort ndarray cells), then the 5 round-10-new operators
(txt_weighted_sample, dedup_fuzzy_names, txt_leakage_split,
win_ewm_null_decay, join_asof_nearest), the 4 backlog array-final gates
re-rendered BEFORE their driver debut (agg_implode_counts, sf_find_many,
agg_groups_positions, agg_list_family), evt_funnel (fell off the end of
window #3), and closes with the txt_* tail (24) + h2o_* (7 of 9).

Round-12 backlog (36 never-sampled after window #4): io_* 8, sql_* 4,
evt_* 3, scale_* 3, join_* 4, sf_* 5, agg_* 4, h2o_f1/f2, win_ewm
long-series (weak by design), rel_with_context, dedup/win leftovers —
window #5 takes all 36.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from polars_spark.queries import QUERIES, ORACLE_SQL

_FLAGSHIP_PREFIX = [f"q{i}_" for i in (1, 3, 6, 9, 18, 21)]

# round-11 rotation window #4 (44 slots): the 3 round-10 driver reds
# re-exposed with scalar-rendered finals, the 5 round-10-new operators,
# the 4 re-rendered array-final backlog gates, evt_funnel (fell off
# window #3's end), then the txt_* tail + h2o_* lead per the backlog.
_ROTATION = [
    # round-10 reds: array finals now render as CSV strings on both sides
    "mm_extract_features",
    "mm_resize",
    "txt_tokenize_wordpiece",
    # round-10-new operators (driver evidence should not wait two rounds)
    "txt_weighted_sample",
    "dedup_fuzzy_names",
    "txt_leakage_split",
    "win_ewm_null_decay",
    "join_asof_nearest",
    # backlog array-final gates, re-rendered BEFORE their driver debut
    "agg_implode_counts",
    "sf_find_many",
    "agg_groups_positions",
    "agg_list_family",
    # fell off the end of window #3 (50-name cap)
    "evt_funnel",
    # text-pipeline tail (24)
    "txt_normalize",
    "txt_top_ngram",
    "txt_c4_clean",
    "txt_pii_redact",
    "txt_hash_split",
    "txt_global_shuffle",
    "txt_heavy_hitters",
    "txt_unigram_logprob",
    "txt_filter_funnel",
    "txt_bigram_logprob",
    "txt_materialize_packed",
    "txt_script_profile",
    "txt_winnow_fingerprints",
    "txt_dsir_weights",
    "txt_boilerplate_lines",
    "txt_mix_to_budget",
    "txt_perplexity_buckets",
    "txt_corpus_report",
    "txt_snapshot_diff",
    "txt_pr_curve",
    "txt_eval_em_f1",
    "txt_pass_at_k",
    "txt_distinct_sketch",
    "txt_stratified_sample",
    # h2o group-by suite lead (7 of 9; f1/f2 in window #5)
    "h2o_q2",
    "h2o_q3",
    "h2o_q4",
    "h2o_q5",
    "h2o_q6",
    "h2o_q8",
    "h2o_q9",
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
