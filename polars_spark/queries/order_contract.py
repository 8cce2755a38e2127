"""Scan file-order contract gates (SURVEY.md §1.1, round-6 headline).

polars row order is SEMANTIC on plain scans: ``scan_parquet(f).select(
col.cum_sum())`` accumulates in file order (reference:
polars-plan/src/plans/functions/mod.rs:33 RowIndex numbers SCAN order;
every cum_*/shift doctest relies on it).  Round 6 gives every file scan a
DEFERRED order contract — a hidden (file, block-offset, read-position)
struct materialized only when an order-sensitive op consumes it — so these
gates pin the semantics against DuckDB, whose scans preserve insertion
(file) order by default.  The elision side (order-free queries never carry
the order column) is pinned by tests/test_round6_order_contract.py.
"""

from __future__ import annotations

import polars_spark as pl
from polars_spark.queries import ltable, query


@query(
    "io_scan_order_cumsum",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_quantity, row_number() OVER () - 1 AS rn
      FROM lineitem
    )
    SELECT rn, l_orderkey,
           floor(sum(l_quantity) OVER (ORDER BY rn) * 100 + 0.5) / 100
             AS running_qty
    FROM t
    """,
)
def io_scan_order_cumsum(spark, sf_dir):
    """Order-sensitive fold on a PLAIN scan: cum_sum accumulates in file
    order with no explicit sort/with_row_index from the user — the deferred
    scan-order contract pays for itself on demand."""
    li = ltable(spark, sf_dir, "lineitem")
    return (
        li.with_row_index("rn")
        .select(
            "rn",
            "l_orderkey",
            ((pl.col("l_quantity").cum_sum() * 100 + 0.5).floor() / 100).alias(
                "running_qty"
            ),
        )
        .to_spark()
    )


@query(
    "io_scan_order_shift_first",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars, row_number() OVER () - 1 AS rn FROM documents
    )
    SELECT rn, doc_id,
           lag(doc_id) OVER (ORDER BY rn) AS prev_doc,
           first_value(doc_id) OVER () AS first_doc
    FROM t
    """,
)
def io_scan_order_shift_first(spark, sf_dir):
    """shift() and first() on a plain scan follow file order (polars
    Expr::shift / AggExpr::First semantics on an unsorted frame)."""
    docs = ltable(spark, sf_dir, "documents")
    return (
        docs.with_row_index("rn")
        .select(
            "rn",
            "doc_id",
            pl.col("doc_id").shift(1).alias("prev_doc"),
            pl.col("doc_id").first().alias("first_doc"),
        )
        .to_spark()
    )


@query(
    "tmp_time_of_day",
    oracle="""
    SELECT CAST(ts AS TIME) AS tod,
           extract(hour FROM ts) AS h,
           extract(minute FROM ts) AS m,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE CAST(ts AS TIME) >= TIME '06:30:00'
    GROUP BY 1, 2, 3
    ORDER BY tod
    LIMIT 500
    """,
)
def tmp_time_of_day(spark, sf_dir):
    """Native Time dtype gate (round 6: polars Time = Spark TIME(6), enabled
    via spark.sql.timeType.enabled — reference polars-time/src/chunkedarray/
    time.rs): Datetime -> Time cast, a Time-literal comparison, Time
    group-by keys and hour/minute accessors, all against DuckDB TIME."""
    import datetime as _dt

    ev = ltable(spark, sf_dir, "events")
    tod = pl.col("ts").dt.time()
    return (
        ev.filter(tod >= _dt.time(6, 30))
        .group_by(
            tod.alias("tod"),
            pl.col("ts").dt.hour().cast(pl.Int64).alias("h"),
            pl.col("ts").dt.minute().cast(pl.Int64).alias("m"),
        )
        .agg(pl.len().alias("n"))
        .sort("tod")
        .limit(500)
        .to_spark()
    )


@query(
    "io_scan_order_first_over",
    # DuckDB's first()/last() aggregates follow the single-file scan order,
    # the same file-order contract the engine defers on scans
    oracle="""
    SELECT l_returnflag AS flag,
           first(l_extendedprice) AS f_first,
           last(l_extendedprice) AS f_last,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def io_scan_order_first_over(spark, sf_dir):
    """first()/last() THROUGH THE WINDOW PATH (.over on a raw scan) follow
    FILE ORDER: the deferred scan-order contract must reach the window's
    orderBy (r8 fix: a bare partition window was only accidentally ordered
    — OrderNeeded now materializes the scan order and over() attaches it)."""
    li = ltable(spark, sf_dir, "lineitem")
    return (
        li.with_columns(
            f_first=pl.col("l_extendedprice").first().over("l_returnflag"),
            f_last=pl.col("l_extendedprice").last().over("l_returnflag"),
        )
        .group_by(pl.col("l_returnflag").alias("flag"))
        .agg(
            pl.col("f_first").first().alias("f_first"),
            pl.col("f_last").first().alias("f_last"),
            pl.len().alias("n"),
        )
        .to_spark()
    )
