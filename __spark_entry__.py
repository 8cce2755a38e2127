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

Round 12 (VERDICT r11 next-round #1): window #5 IS that backlog — all 36
never-sampled gates, after the one predicted red was resolved
(win_ewm_long_series now carries a truncated-banded-sum DuckDB oracle;
251/252 oracles became 252/252).  The remaining 8 slots re-expose the
operators this round's code touches (connected-components adaptive
pointer jump -> dedup_minhash_star + txt_leakage_split; fuzzy max_pairs
valve -> dedup_fuzzy_names; distributed scan_csv skip_rows ->
io_csv_roundtrip) plus the round-12 probe subjects (txt_contamination,
dedup_ngram_jaccard) and the two LSH-family anchors (dedup_minhash_lsh,
dedup_embedding_cosine) so any regression from this round's changes
surfaces as a driver row, not just locally.  After this window every
registry gate has driver evidence: never-sampled hits 0.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from polars_spark.queries import QUERIES, ORACLE_SQL

_FLAGSHIP_PREFIX = [f"q{i}_" for i in (1, 3, 6, 9, 18, 21)]

# round-12 rotation window #5 (44 slots): the complete never-sampled
# backlog (36 gates — after this window, every registry entry has driver
# evidence), then 8 re-exposures covering this round's code changes and
# probe subjects.
_ROTATION = [
    # --- the 36 never-sampled gates (driver-coverage close-out) ---
    # io_* (8)
    "io_frame_scan",
    "io_python_datasource",
    "io_pyarrow_dataset",
    "io_parquet_partitioned",
    "io_orc_roundtrip",
    "io_ipc_roundtrip",
    "io_bucketed_join",
    "io_scan_order_first_over",
    # sql_* (4)
    "sql_cte_window",
    "sql_set_ops",
    "sql_window_rank",
    "sql_table_functions",
    # join_* (4)
    "join_band_agg",
    "join_interval_agg",
    "join_where_strict_pair",
    "join_where_nonstrict_pair",
    # evt_* (3)
    "evt_retention",
    "evt_transitions",
    "evt_json_props",
    # scale_* (3)
    "scale_zorder_events",
    "scale_key_skew_profile",
    "scale_salted_join",
    # sf_* (6)
    "sf_enum_cast",
    "sf_bitwise",
    "sf_ranges_business",
    "sf_list_agg",
    "sf_cat_physical",
    "sf_bin_ops",
    # agg_* (4)
    "agg_product_entropy",
    "agg_cut_bands",
    "agg_non_null_first",
    "agg_arg_minmax",
    # the rest
    "h2o_f1_selective",
    "h2o_f2_negated",
    "rel_with_context",
    "win_ewm_long_series",  # now oracle-backed (round-12 digest oracle)
    # --- re-exposures: this round's touched operators + probe subjects ---
    "dedup_minhash_star",  # CC adaptive pointer jump (round-12 perf reclaim)
    "txt_leakage_split",  # depends on connected_components
    "dedup_fuzzy_names",  # fuzzy_string_pairs max_pairs valve
    "io_csv_roundtrip",  # distributed skip_rows lowering touches scan_csv
    "txt_contamination",  # round-12 adversarial-probe subject
    "dedup_ngram_jaccard",  # round-12 adversarial-probe subject (df cap)
    "dedup_minhash_lsh",  # LSH-family anchor
    "dedup_embedding_cosine",  # LSH-family anchor (r11 auto-params floor)
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
