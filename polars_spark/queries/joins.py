"""Join-family registry queries (SURVEY §2.2), exercised through the
polars_spark frame API so the correctness gate covers the join layer itself.

Reference semantics: JoinType enum polars-ops/src/frame/join/args.rs:62
(Inner/Left/Right/Full/AsOf/Semi/Anti/IEJoin/Cross), coalesce args.rs:90,
as-of strategies asof/mod.rs:262.

Scale notes: no query forces a broadcast of a scale-growing table; as-of is
one window shuffle partitioned by user_id (polars' hardest operator per
SURVEY §7, here a single pass); the theta join keeps an equality conjunct so
Spark plans a shuffled hash join, not a cartesian product.
"""

from __future__ import annotations

from polars_spark.queries import ltable, query

import polars_spark as pl


def _cust_rich(spark, sf_dir):
    return ltable(spark, sf_dir, "customer").filter(pl.col("c_acctbal") > 5000)


@query(
    "join_left_equi",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name
    FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o_custkey = c_custkey
    """,
)
def join_left_equi(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders")
    out = orders.join(
        _cust_rich(spark, sf_dir), left_on="o_custkey", right_on="c_custkey", how="left"
    )
    return out.select("o_orderkey", "o_custkey", "c_name").to_spark()


@query(
    "join_right_equi",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name
    FROM orders RIGHT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o_custkey = c_custkey
    """,
)
def join_right_equi(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders")
    out = orders.join(
        _cust_rich(spark, sf_dir), left_on="o_custkey", right_on="c_custkey", how="right"
    )
    return out.select("o_orderkey", "c_custkey", "c_name").to_spark()


@query(
    "join_full_coalesce",
    oracle="""
    SELECT coalesce(o.k, c.c_custkey) AS k, o.n_orders, c.c_name
    FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders
          WHERE o_totalprice > 400000 GROUP BY o_custkey) o
    FULL JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o.k = c.c_custkey
    """,
)
def join_full_coalesce(spark, sf_dir):
    big_orders = (
        ltable(spark, sf_dir, "orders")
        .filter(pl.col("o_totalprice") > 400000)
        .group_by(pl.col("o_custkey").alias("k"))
        .agg(pl.len().alias("n_orders"))
    )
    cust = _cust_rich(spark, sf_dir)
    out = big_orders.join(cust, left_on="k", right_on="c_custkey", how="full", coalesce=True)
    return out.select("k", "n_orders", "c_name").to_spark()


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer")
    f_orders = ltable(spark, sf_dir, "orders").filter(pl.col("o_orderstatus") == "F")
    out = cust.join(f_orders, left_on="c_custkey", right_on="o_custkey", how="semi")
    return out.select("c_custkey", "c_name").to_spark()


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_anti(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer")
    f_orders = ltable(spark, sf_dir, "orders").filter(pl.col("o_orderstatus") == "F")
    out = cust.join(f_orders, left_on="c_custkey", right_on="o_custkey", how="anti")
    return out.select("c_custkey", "c_name").to_spark()


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark, sf_dir):
    region = ltable(spark, sf_dir, "region")
    nation = ltable(spark, sf_dir, "nation")
    return region.join(nation, how="cross").select("r_name", "n_name").to_spark()


@query(
    "join_where_theta",
    oracle="""
    SELECT s_suppkey, count(*) AS n_richer, round(sum(c_acctbal), 2) AS bal_sum
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
    GROUP BY s_suppkey
    """,
)
def join_where_theta(spark, sf_dir):
    """polars join_where (IEJoin, polars-ops/src/frame/join/iejoin/mod.rs:381).
    The equality conjunct keeps Spark on a shuffled hash join; the inequality
    is applied as a post-join filter — never a full cartesian product."""
    supp = ltable(spark, sf_dir, "supplier")
    cust = ltable(spark, sf_dir, "customer")
    out = supp.join_where(
        cust,
        pl.col("s_nationkey") == pl.col("c_nationkey"),
        pl.col("c_acctbal") > pl.col("s_acctbal"),
    )
    return (
        out.group_by("s_suppkey")
        .agg(pl.len().alias("n_richer"), pl.col("c_acctbal").sum().round(2).alias("bal_sum"))
        .to_spark()
    )


def _click_purchase(spark, sf_dir):
    ev = ltable(spark, sf_dir, "events")
    clicks = ev.filter(pl.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.filter(pl.col("event_type") == "purchase").select(
        "user_id", "ts", pl.col("value").alias("purchase_value")
    )
    return clicks, buys


@query(
    "join_asof_backward",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, round(r.purchase_value, 2) AS purchase_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT user_id, ts, value AS purchase_value
                    FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof_backward(spark, sf_dir):
    clicks, buys = _click_purchase(spark, sf_dir)
    out = clicks.join_asof(buys, on="ts", by="user_id", strategy="backward")
    return out.select(
        "event_id", "user_id", "ts", pl.col("purchase_value").round(2).alias("purchase_value")
    ).to_spark()


@query(
    "join_asof_forward",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, round(r.purchase_value, 2) AS purchase_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT user_id, ts, value AS purchase_value
                    FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def join_asof_forward(spark, sf_dir):
    clicks, buys = _click_purchase(spark, sf_dir)
    out = clicks.join_asof(buys, on="ts", by="user_id", strategy="forward")
    return out.select(
        "event_id", "user_id", "ts", pl.col("purchase_value").round(2).alias("purchase_value")
    ).to_spark()


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           CASE WHEN r.ts IS NOT NULL AND l.ts - r.ts <= INTERVAL '1 hour'
                THEN round(r.purchase_value, 2) END AS purchase_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT user_id, ts, value AS purchase_value
                    FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof_tolerance(spark, sf_dir):
    clicks, buys = _click_purchase(spark, sf_dir)
    out = clicks.join_asof(buys, on="ts", by="user_id", strategy="backward", tolerance="1h")
    return out.select(
        "event_id", "user_id", "ts", pl.col("purchase_value").round(2).alias("purchase_value")
    ).to_spark()


@query(
    "join_asof_nearest",
    # DuckDB has no NEAREST strategy; replay it as backward + forward ASOF
    # joins and the polars tie rule (<= prefers backward, AsofStrategy
    # mod.rs:262 Nearest)
    oracle="""
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
    b AS (SELECT l.event_id, r.ts AS bts, r.value AS bval
          FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
    f AS (SELECT l.event_id, r.ts AS fts, r.value AS fval
          FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts)
    SELECT l.event_id, l.user_id, l.ts,
           round(CASE WHEN fts IS NULL THEN bval
                      WHEN bts IS NULL THEN fval
                      WHEN epoch_us(l.ts) - epoch_us(bts)
                           <= epoch_us(fts) - epoch_us(l.ts) THEN bval
                      ELSE fval END, 2) AS purchase_value
    FROM l JOIN b USING (event_id) JOIN f USING (event_id)
    """,
)
def join_asof_nearest(spark, sf_dir):
    clicks, buys = _click_purchase(spark, sf_dir)
    out = clicks.join_asof(buys, on="ts", by="user_id", strategy="nearest")
    return out.select(
        "event_id", "user_id", "ts", pl.col("purchase_value").round(2).alias("purchase_value")
    ).to_spark()


# -- reference inequality-join benchmark family (east_west fixture shape:
#    py-polars/tests/benchmark/test_join_where.py:15,29,43) ----------------
# Pure inequality joins (no equality conjunct) — Spark's plan is a
# BroadcastNestedLoopJoin with the SMALL side broadcast (the only correct
# strategy without an equi-key; polars uses IEJoin).  Inputs are filtered
# small like the reference's fixtures, output re-aggregated to stay
# bounded; money sums go through integer cents (exact both engines).

_JW_ORACLE = """
    WITH e AS (SELECT s_suppkey, s_acctbal, s_nationkey FROM supplier),
    w AS (
      SELECT c_custkey, c_acctbal, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS balc
      FROM customer WHERE c_acctbal > 9000
    )
    SELECT s_suppkey, count(*) AS n, sum(balc) / 100.0 AS bal_sum
    FROM e JOIN w ON {cond}
    GROUP BY s_suppkey
"""


def _jw(spark, sf_dir, *conds):
    supp = ltable(spark, sf_dir, "supplier")
    cust = (
        ltable(spark, sf_dir, "customer")
        .filter(pl.col("c_acctbal") > 9000)
        .with_columns((pl.col("c_acctbal") * 100).round(0).cast("bigint").alias("balc"))
    )
    out = supp.join_where(cust, *conds)
    return (
        out.group_by("s_suppkey")
        .agg(pl.len().alias("n"), (pl.col("balc").sum() / 100.0).alias("bal_sum"))
        .to_spark()
    )


@query(
    "join_where_strict",
    oracle=_JW_ORACLE.format(cond="s_acctbal < c_acctbal AND s_nationkey < c_nationkey"),
)
def join_where_strict(spark, sf_dir):
    """Two strict inequalities, no equi-key (reference test_join_where.py:15)."""
    return _jw(
        spark,
        sf_dir,
        pl.col("s_acctbal") < pl.col("c_acctbal"),
        pl.col("s_nationkey") < pl.col("c_nationkey"),
    )


@query(
    "join_where_nonstrict",
    oracle=_JW_ORACLE.format(cond="s_acctbal <= c_acctbal AND s_nationkey <= c_nationkey"),
)
def join_where_nonstrict(spark, sf_dir):
    """Non-strict variant (reference test_join_where.py:29)."""
    return _jw(
        spark,
        sf_dir,
        pl.col("s_acctbal") <= pl.col("c_acctbal"),
        pl.col("s_nationkey") <= pl.col("c_nationkey"),
    )


@query(
    "join_where_single",
    oracle=_JW_ORACLE.format(cond="s_acctbal < c_acctbal"),
)
def join_where_single(spark, sf_dir):
    """Single-inequality variant (reference test_join_where.py:43)."""
    return _jw(spark, sf_dir, pl.col("s_acctbal") < pl.col("c_acctbal"))


@query(
    "join_band_agg",
    oracle="""
    SELECT a.event_id,
           count(*) AS n_close,
           floor(avg(b.value) * 1e6 + 0.5) / 1e6 AS avg_close
    FROM events a JOIN events b
      ON abs(a.value - b.value) <= 0.25 AND a.event_id <> b.event_id
    WHERE a.event_id % 50 = 0
    GROUP BY a.event_id
    """,
)
def join_band_agg(spark, sf_dir):
    """pl.band_join: the |l-r| <= band inequality join rewritten as an
    equi-bucket join (O(n+m+output), one shuffle per side) instead of the
    BroadcastNestedLoopJoin Spark would pick for the raw predicate.  The
    oracle runs the raw inequality join (DuckDB IEJoin) — same pair set."""
    from polars_spark.queries import fround

    ev = ltable(spark, sf_dir, "events")
    left = ev.filter(pl.col("event_id") % 50 == 0)
    out = pl.band_join(left, ev, "value", "value", band=0.25)
    sdf = out.to_spark()
    import pyspark.sql.functions as F

    return (
        sdf.filter(F.col("event_id") != F.col("event_id_right"))
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_close"),
            fround(F.avg("value_right"), 6).alias("avg_close"),
        )
    )


@query(
    "join_interval_agg",
    oracle="""
    WITH l AS (
      SELECT event_id, value AS lo, value + (event_id % 10) / 10.0 AS hi
      FROM events WHERE event_id % 50 = 0
    ), r AS (
      SELECT event_id AS rid, value AS lo2, value + 0.5 AS hi2
      FROM events WHERE event_id % 50 = 25
    )
    SELECT l.event_id, count(*) AS n_overlap, min(r.rid) AS first_rid
    FROM l JOIN r ON l.lo <= r.hi2 AND r.lo2 <= l.hi
    GROUP BY l.event_id
    """,
)
def join_interval_agg(spark, sf_dir):
    """pl.interval_join: interval-overlap join via bucket replication with
    the count-once rule (bucket == floor(greatest(lo, lo2)/w)) — the
    distributed range-join shape vs the oracle's direct IEJoin."""
    import pyspark.sql.functions as F

    ev = ltable(spark, sf_dir, "events")
    d = pl.col("event_id")
    left = ev.filter(d % 50 == 0).select(
        "event_id",
        pl.col("value").alias("lo"),
        (pl.col("value") + (d % 10) / 10.0).alias("hi"),
    )
    right = ev.filter(d % 50 == 25).select(
        pl.col("event_id").alias("rid"),
        pl.col("value").alias("lo2"),
        (pl.col("value") + 0.5).alias("hi2"),
    )
    out = pl.interval_join(
        left, right, left_lo="lo", left_hi="hi",
        right_lo="lo2", right_hi="hi2", bucket_width=0.5,
    )
    return (
        out.to_spark()
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"), F.min("rid").alias("first_rid"))
    )


@query(
    "join_where_strict_pair",
    # the reference's inequality-join benchmark shape (tests/benchmark/
    # test_join_where.py): TWO strict inequalities, NO equality conjunct —
    # the pure IEJoin class.  Spark plans a broadcast-nested-loop with the
    # small side broadcast; the banded equi-join (join_band_agg) is the
    # 100 TB path when a band width exists.
    oracle="""
    SELECT s_suppkey, count(*) AS n, round(sum(c_acctbal), 2) AS bal
    FROM supplier JOIN customer
      ON s_acctbal < c_acctbal AND s_nationkey > c_nationkey
    GROUP BY s_suppkey
    """,
)
def join_where_strict_pair(spark, sf_dir):
    supp = ltable(spark, sf_dir, "supplier")
    cust = ltable(spark, sf_dir, "customer")
    out = supp.join_where(
        cust,
        pl.col("s_acctbal") < pl.col("c_acctbal"),
        pl.col("s_nationkey") > pl.col("c_nationkey"),
    )
    return (
        out.group_by("s_suppkey")
        .agg(pl.len().alias("n"), pl.col("c_acctbal").sum().round(2).alias("bal"))
        .to_spark()
    )


@query(
    "join_where_nonstrict_pair",
    oracle="""
    SELECT s_suppkey, count(*) AS n
    FROM supplier JOIN customer
      ON s_acctbal <= c_acctbal AND s_nationkey >= c_nationkey
    GROUP BY s_suppkey
    """,
)
def join_where_nonstrict_pair(spark, sf_dir):
    """Non-strict variant of the reference inequality-join benchmark."""
    supp = ltable(spark, sf_dir, "supplier")
    cust = ltable(spark, sf_dir, "customer")
    out = supp.join_where(
        cust,
        pl.col("s_acctbal") <= pl.col("c_acctbal"),
        pl.col("s_nationkey") >= pl.col("c_nationkey"),
    )
    return out.group_by("s_suppkey").agg(pl.len().alias("n")).to_spark()
