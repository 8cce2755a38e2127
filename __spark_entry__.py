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
round-trips, h2o_* group-by suite — the families with the most
never-driver-sampled semantic surface (VERDICT r8 next-round #1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from polars_spark.queries import QUERIES, ORACLE_SQL

_FLAGSHIP_PREFIX = [
    f"q{i}_" for i in (1, 3, 5, 6, 10, 14, 18, 7, 8, 2, 4, 9, 11, 12, 13, 15, 16, 17, 19, 20, 21, 22)
]

# round-9 rotation window (28 names, all first-time driver exposure)
_ROTATION = [
    "sf_decimal_exact",
    "sf_enum_order",
    "sf_cat_lexical",
    "sf_bin_reinterpret",
    "sf_hist",
    "sf_value_counts",
    "sf_str_ops",
    "sf_dt_ops",
    "sf_list_ops",
    "sf_struct_ops",
    "agg_cube",
    "agg_spearman",
    "agg_nan_minmax",
    "agg_stats",
    "agg_moments",
    "agg_any_all_mode",
    "agg_linreg",
    "agg_bitwise",
    "rel_match_schema",
    "rel_hconcat",
    "rel_merge_sorted",
    "rel_unnest",
    "io_csv_roundtrip",
    "io_ndjson_roundtrip",
    "io_multifile_scan",
    "h2o_q1",
    "h2o_q7",
    "h2o_q10",
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
