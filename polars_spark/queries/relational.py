"""Relational-operator registry queries (SURVEY §2.1/§2.5/§2.6), exercised
through the polars_spark frame API: with_columns, when/then, unique keep
strategies, slice/top-k, gather_every, concat, explode, unpivot, pivot.

Reference: DslPlan variants polars-plan/src/dsl/plan.rs:30 (HStack :95,
Distinct :129, Sort :134, Slice :141, Union :152, Pivot :117) and
UniqueKeepStrategy polars-core/src/frame/mod.rs:60.
"""

from __future__ import annotations

from polars_spark.queries import ltable, query

import polars_spark as pl


@query(
    "rel_with_columns",
    # Float discipline: the money columns are 2-decimal data, so we compare
    # scaled-INTEGER sums (round(x*100) is exact, int64 summation is exact
    # and order-independent on both engines) — no cross-engine rounding-tie
    # hazard, unlike round(sum(double), 2).
    oracle="""
    SELECT l_returnflag,
           CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round((1 - l_discount) * 100) AS BIGINT)), 0) AS BIGINT)  AS disc_total_c,
           CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round((1 - l_discount) * 100) AS BIGINT)
                    * CAST(round((1 + l_tax) * 100) AS BIGINT)), 0) AS BIGINT)       AS charge_total_c,
           CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT)          AS n_bulk,
           CAST(coalesce(sum(CAST(round(greatest(l_discount, l_tax) * 100) AS BIGINT)), 0) AS BIGINT) AS max_rate_sum_c
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rel_with_columns(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    out = (
        li.with_columns(
            price_c=(pl.col("l_extendedprice") * 100).round(0).cast("bigint"),
            disc_c=((1 - pl.col("l_discount")) * 100).round(0).cast("bigint"),
            tax_c=((1 + pl.col("l_tax")) * 100).round(0).cast("bigint"),
            bulk=pl.when(pl.col("l_quantity") > 25).then(1).otherwise(0),
            max_rate_c=(pl.max_horizontal("l_discount", "l_tax") * 100).round(0).cast("bigint"),
        )
        .with_columns(
            disc_price_c=pl.col("price_c") * pl.col("disc_c"),
            charge_c=pl.col("price_c") * pl.col("disc_c") * pl.col("tax_c"),
        )
        .group_by("l_returnflag")
        .agg(
            pl.col("disc_price_c").sum().alias("disc_total_c"),
            pl.col("charge_c").sum().alias("charge_total_c"),
            pl.col("bulk").sum().cast("bigint").alias("n_bulk"),
            pl.col("max_rate_c").sum().alias("max_rate_sum_c"),
        )
    )
    return out.to_spark()


@query(
    "rel_qcut_bands",
    # Gate for the scale-safe qcut path: breakpoints are exact linear-interp
    # percentiles (Spark F.percentile == DuckDB quantile_cont) computed as a
    # broadcast scalar aggregate, never a single-partition window.  Output is
    # band COUNTS — robust to 1-ulp interpolation differences because no data
    # point falls strictly between adjacent data values.
    oracle="""
    WITH b AS (
      SELECT quantile_cont(l_extendedprice, 0.25) AS b1,
             quantile_cont(l_extendedprice, 0.50) AS b2,
             quantile_cont(l_extendedprice, 0.75) AS b3
      FROM lineitem
    )
    SELECT CASE WHEN l_extendedprice IS NULL THEN NULL
                WHEN l_extendedprice <= b1 THEN 'q0'
                WHEN l_extendedprice <= b2 THEN 'q1'
                WHEN l_extendedprice <= b3 THEN 'q2'
                ELSE 'q3' END AS band,
           count(*) AS n
    FROM lineitem, b GROUP BY 1
    """,
)
def rel_qcut_bands(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    return (
        li.with_columns(band=pl.col("l_extendedprice").qcut([0.25, 0.5, 0.75]))
        .group_by("band")
        .agg(pl.len().alias("n"))
        .to_spark()
    )


@query(
    "rel_when_then_bands",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 8000 THEN 'mid'
                ELSE 'high' END AS band,
           count(*) AS n, round(coalesce(sum(c_acctbal), 0), 2) AS total
    FROM customer GROUP BY 1
    """,
)
def rel_when_then_bands(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer")
    band = (
        pl.when(pl.col("c_acctbal") < 0)
        .then(pl.lit("debt"))
        .when(pl.col("c_acctbal") < 5000)
        .then(pl.lit("low"))
        .when(pl.col("c_acctbal") < 8000)
        .then(pl.lit("mid"))
        .otherwise(pl.lit("high"))
        .alias("band")
    )
    return (
        cust.group_by(band)
        .agg(pl.len().alias("n"), pl.col("c_acctbal").sum().round(2).alias("total"))
        .to_spark()
    )


@query(
    "rel_unique_first",
    oracle="""
    SELECT o_custkey, o_orderkey FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) rn
      FROM orders) WHERE rn = 1
    """,
)
def rel_unique_first(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders").sort("o_orderdate", "o_orderkey")
    return orders.unique(subset="o_custkey", keep="first").select("o_custkey", "o_orderkey").to_spark()


@query(
    "rel_unique_last",
    oracle="""
    SELECT o_custkey, o_orderkey FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
      FROM orders) WHERE rn = 1
    """,
)
def rel_unique_last(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders").sort("o_orderdate", "o_orderkey")
    return orders.unique(subset="o_custkey", keep="last").select("o_custkey", "o_orderkey").to_spark()


@query(
    "rel_unique_none",
    oracle="""
    SELECT o_custkey FROM orders
    GROUP BY o_custkey HAVING count(*) = 1
    """,
)
def rel_unique_none(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders")
    return orders.unique(subset="o_custkey", keep="none").select("o_custkey").to_spark()


@query(
    "rel_distinct_any",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def rel_distinct_any(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", "c_nationkey").unique().to_spark()


@query(
    "rel_slice_offset",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def rel_slice_offset(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders").sort("o_orderkey")
    return orders.slice(100, 50).select("o_orderkey", "o_custkey").to_spark()


@query(
    "rel_top_k",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def rel_top_k(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders")
    out = orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(25)
    return out.select("o_orderkey", pl.col("o_totalprice").round(2).alias("o_totalprice")).to_spark()


@query(
    "rel_tail_gather",
    oracle="""
    WITH numbered AS (
      SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS pos,
             count(*) OVER () AS total
      FROM orders)
    SELECT o_orderkey FROM numbered
    WHERE pos >= total - 500 AND (pos % 100) = 0
    """,
)
def rel_tail_gather(spark, sf_dir):
    """tail + gather_every composed (Slice/Gather, dsl/plan.rs:141,89)."""
    orders = ltable(spark, sf_dir, "orders").sort("o_orderkey")
    # gather_every operates on the tail's positions; mirror the oracle:
    # global pos >= total-500 and pos % 100 == 0 -> tail(500).gather_every? No:
    # gather_every restarts positions at 0 inside the tail; total=15000 so the
    # tail positions align with global pos - (total-500); (total-500)%100==0
    # at sf where total is a multiple of 100 — keep exact by using slice.
    return orders.tail(500).gather_every(100).select("o_orderkey").to_spark()


@query(
    "rel_concat_vertical",
    oracle="""
    SELECT o_orderstatus, count(*) AS n FROM (
      SELECT * FROM orders WHERE o_totalprice > 450000
      UNION ALL
      SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
    ) GROUP BY o_orderstatus
    """,
)
def rel_concat_vertical(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders")
    big = orders.filter(pl.col("o_totalprice") > 450000)
    urgent = orders.filter(pl.col("o_orderpriority") == "1-URGENT")
    return pl.concat([big, urgent]).group_by("o_orderstatus").agg(pl.len().alias("n")).to_spark()


@query(
    "rel_explode_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(coalesce(regexp_split_to_array(p_type, ' '), [NULL])) AS token FROM part)
    GROUP BY token
    """,
)
def rel_explode_tokens(spark, sf_dir):
    part = ltable(spark, sf_dir, "part")
    out = (
        part.select(pl.col("p_type").str.split(" ").alias("token"))
        .explode("token")
        .group_by("token")
        .agg(pl.len().alias("n"))
    )
    return out.to_spark()


@query(
    "rel_unpivot",
    oracle="""
    SELECT variable, round(coalesce(sum(value), 0), 2) AS total, count(*) AS n FROM (
      SELECT 'l_quantity' AS variable, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    ) GROUP BY variable
    """,
)
def rel_unpivot(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    out = (
        li.unpivot(on=["l_quantity", "l_discount", "l_tax"], index=[])
        .group_by("variable")
        .agg(pl.col("value").sum().round(2).alias("total"), pl.len().alias("n"))
    )
    return out.to_spark()


@query(
    "rel_pivot",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def rel_pivot(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders")
    out = orders.pivot(
        "o_orderstatus", index="o_orderpriority", values="o_totalprice", aggregate_function="sum"
    )
    cols = [c for c in out.columns if c != "o_orderpriority"]
    return out.select(
        "o_orderpriority", *[pl.col(c).round(2).alias(c) for c in cols]
    ).to_spark()


@query(
    "rel_horizontal_fold",
    oracle="""
    SELECT l_orderkey,
           round(sum(coalesce(l_quantity, 0) + coalesce(l_discount, 0)
                     + coalesce(l_tax, 0)), 4)                    AS hsum,
           round(coalesce(sum(greatest(l_quantity, l_discount, l_tax)), 0), 2) AS hmax,
           round(coalesce(sum(least(l_quantity, l_discount, l_tax)), 0), 2)    AS hmin
    FROM lineitem GROUP BY l_orderkey
    """,
)
def rel_horizontal_fold(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    out = (
        li.with_columns(
            hsum=pl.sum_horizontal("l_quantity", "l_discount", "l_tax"),
            hmax=pl.max_horizontal("l_quantity", "l_discount", "l_tax"),
            hmin=pl.min_horizontal("l_quantity", "l_discount", "l_tax"),
        )
        .group_by("l_orderkey")
        .agg(
            pl.col("hsum").sum().round(4).alias("hsum"),
            pl.col("hmax").sum().round(2).alias("hmax"),
            pl.col("hmin").sum().round(2).alias("hmin"),
        )
    )
    return out.to_spark()


@query(
    "rel_update",
    # LazyFrame.update: non-null right values overwrite on the key; cents
    # math keeps the money column exact.
    oracle="""
    WITH delta AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 3 = 0
                  THEN CAST(round(s_acctbal * 100) AS BIGINT) + 100000 END AS balc
      FROM supplier WHERE s_suppkey <= 50
    ),
    base AS (
      SELECT s_suppkey, s_name, CAST(round(s_acctbal * 100) AS BIGINT) AS balc
      FROM supplier
    )
    SELECT b.s_suppkey, b.s_name, coalesce(d.balc, b.balc) AS balc
    FROM base b LEFT JOIN delta d USING (s_suppkey)
    """,
)
def rel_update(spark, sf_dir):
    """LazyFrame.update (join + coalesce): every third supplier under 51
    gets a bumped balance; null delta values leave the original in place."""
    supp = ltable(spark, sf_dir, "supplier").with_columns(
        (pl.col("s_acctbal") * 100).round(0).cast("bigint").alias("balc")
    )
    base = supp.select("s_suppkey", "s_name", "balc")
    delta = (
        supp.filter(pl.col("s_suppkey") <= 50)
        .select(
            "s_suppkey",
            pl.when(pl.col("s_suppkey") % 3 == 0)
            .then(pl.col("balc") + 100000)
            .otherwise(pl.lit(None))
            .alias("balc"),
        )
    )
    return base.update(delta, on="s_suppkey").to_spark()


@query(
    "rel_groupby_head_tail",
    oracle="""
    WITH h AS (
      SELECT c_nationkey, c_custkey, 'head' AS part
      FROM (
        SELECT c_nationkey, c_custkey,
               row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
        FROM customer
      ) WHERE rn <= 2
    ),
    t AS (
      SELECT c_nationkey, c_custkey, 'tail' AS part
      FROM (
        SELECT c_nationkey, c_custkey,
               row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey DESC) AS rn
        FROM customer
      ) WHERE rn <= 2
    )
    SELECT * FROM h UNION ALL SELECT * FROM t
    """,
)
def rel_groupby_head_tail(spark, sf_dir):
    """GroupBy.head/tail: first/last 2 customers per nation over the key
    order — per-group windows, no global sort."""
    cust = ltable(spark, sf_dir, "customer").sort("c_custkey")
    h = cust.group_by("c_nationkey").head(2).select(
        "c_nationkey", "c_custkey", pl.lit("head").alias("part")
    )
    t = cust.group_by("c_nationkey").tail(2).select(
        "c_nationkey", "c_custkey", pl.lit("tail").alias("part")
    )
    return pl.concat([h, t]).to_spark()

@query(
    "rel_unstack",
    oracle="""
    WITH t AS (
      SELECT n_name, row_number() OVER (ORDER BY n_nationkey) - 1 AS i FROM nation
    )
    SELECT
      max(CASE WHEN i // 5 = 0 THEN n_name END) AS n_name_0,
      max(CASE WHEN i // 5 = 1 THEN n_name END) AS n_name_1,
      max(CASE WHEN i // 5 = 2 THEN n_name END) AS n_name_2,
      max(CASE WHEN i // 5 = 3 THEN n_name END) AS n_name_3,
      max(CASE WHEN i // 5 = 4 THEN n_name END) AS n_name_4
    FROM t GROUP BY i % 5
    """,
)
def rel_unstack(spark, sf_dir):
    """DataFrame.unstack (reference dataframe/frame.py unstack): long-to-wide
    reshape as a distributed pivot over the row position."""
    nation = ltable(spark, sf_dir, "nation")
    out = nation.sort("n_nationkey").select("n_name").unstack(step=5, how="vertical")
    return out.to_spark()


@query(
    "rel_broadcast_agg",
    # polars scalar-broadcast rule (a projection mixing aggregates with
    # row-level values): Spark side lowers the aggregates to ONE partial
    # aggregate broadcast-cross-joined back (ctx.add_scalar), never a
    # single-partition window; the oracle replays it with a scalar subquery
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(coalesce(sum(l_extendedprice), 0) AS DOUBLE)          AS flag_rev,
           CASE WHEN (SELECT coalesce(sum(l_extendedprice), 0) FROM lineitem) = 0
                THEN 'NaN'::DOUBLE
                ELSE floor(coalesce(sum(l_extendedprice), 0)
                     / (SELECT sum(l_extendedprice) FROM lineitem)
                     * 1e9 + 0.5) / 1e9 END                           AS share,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)            AS n_total
    FROM lineitem
    GROUP BY 1
    """,
)
def rel_broadcast_agg(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    per_flag = (
        li.group_by(pl.col("l_returnflag").alias("flag"))
        .agg(pl.col("l_extendedprice").sum().alias("flag_rev"))
    )
    total = ltable(spark, sf_dir, "lineitem")
    from polars_spark.queries import fround
    from pyspark.sql import functions as F

    out = per_flag.with_columns(
        share=(pl.col("flag_rev") / pl.col("flag_rev").sum()),
        n_total=pl.lit(None),  # placeholder, replaced below
    ).drop("n_total")
    # frame-total row count broadcast from the source frame: a second
    # broadcast-agg projection (len over the scan)
    li2 = total.select(pl.len().alias("n_total"))
    sdf = out.to_spark().crossJoin(li2.to_spark())
    # keep NaN a NaN: F.floor lands in LONG, which would swallow the IEEE
    # 0/0 identity on an all-null column (degenerate-sweep find)
    sdf = sdf.withColumn(
        "share",
        F.when(F.isnan("share"), F.col("share")).otherwise(
            F.floor(F.col("share") * 1e9 + 0.5) / 1e9
        ),
    )
    sdf = sdf.withColumn("flag_rev", F.col("flag_rev").cast("double"))
    return sdf


@query(
    "rel_count_columns",
    # reference LazyFrame.count(): a 1-row frame of per-column NON-NULL
    # counts — one partial-agg pass, map-side combine
    oracle="""
    SELECT CAST(count(o_orderkey) AS BIGINT)     AS o_orderkey,
           CAST(count(o_orderstatus) AS BIGINT)  AS o_orderstatus,
           CAST(count(o_orderdate) AS BIGINT)    AS o_orderdate
    FROM orders
    """,
)
def rel_count_columns(spark, sf_dir):
    o = ltable(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderdate")
    return o.count().to_spark()


@query(
    "rel_frame_positional_mul",
    # positional frame-frame arithmetic over ordered frames: both sides are
    # key-sorted (nationkey), the product pairs row i with row i — the
    # oracle replays the pairing with ROW_NUMBER-joined sorted subqueries
    oracle="""
    WITH a AS (SELECT n_nationkey AS k, n_regionkey AS r,
                      row_number() OVER (ORDER BY n_nationkey) AS rn
               FROM nation),
         b AS (SELECT n_nationkey AS k, n_regionkey AS r,
                      row_number() OVER (ORDER BY n_nationkey DESC) AS rn
               FROM nation)
    SELECT CAST(a.k * b.k AS BIGINT) AS k, CAST(a.r * b.r AS BIGINT) AS r
    FROM a JOIN b USING (rn) ORDER BY rn
    """,
)
def rel_frame_positional_mul(spark, sf_dir):
    n1 = (
        ltable(spark, sf_dir, "nation")
        .select(pl.col("n_nationkey").alias("k"), pl.col("n_regionkey").alias("r"))
        .sort("k")
    )
    n2 = (
        ltable(spark, sf_dir, "nation")
        .select(pl.col("n_nationkey").alias("k"), pl.col("n_regionkey").alias("r"))
        .sort("k", descending=True)
    )
    out = n1 * n2
    return out.to_spark()
