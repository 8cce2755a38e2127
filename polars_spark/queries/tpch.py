"""TPC-H-style headline queries, written against the polars_spark frame API
(the same way a polars user would write them: scan → filter → join →
group_by → agg → sort).

These exercise the core relational pipeline from SURVEY.md §2.1/§2.3 through
the LazyFrame/Expr layer; the lowering is pure DataFrame lineage, so Catalyst
applies predicate pushdown, column pruning and join planning unchanged.

Scale notes: only fixed-size dims (nation: 25 rows, region: 5 rows) carry a
broadcast hint; customer/supplier grow linearly with SF and are left to AQE
(broadcast when the filtered side is small at runtime, shuffled hash with
skew splitting otherwise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_spark.queries import ltable, query

import polars_spark as pl


def _ts(s: str):
    return pl.lit(s).cast("Datetime")


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    disc_price = pl.col("l_extendedprice") * (1 - pl.col("l_discount"))
    return (
        li.filter(pl.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
        .group_by("l_returnflag", "l_linestatus")
        .agg(
            pl.col("l_quantity").sum().round(2).alias("sum_qty"),
            pl.col("l_extendedprice").sum().round(2).alias("sum_base_price"),
            disc_price.sum().round(2).alias("sum_disc_price"),
            (disc_price * (1 + pl.col("l_tax"))).sum().round(2).alias("sum_charge"),
            pl.col("l_quantity").mean().round(4).alias("avg_qty"),
            pl.col("l_extendedprice").mean().round(4).alias("avg_price"),
            pl.col("l_discount").mean().round(4).alias("avg_disc"),
            pl.len().alias("count_order"),
        )
        .sort("l_returnflag", "l_linestatus")
        .to_spark()
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    cutoff = _ts("1997-03-15 00:00:00")
    cust = ltable(spark, sf_dir, "customer").filter(pl.col("c_mktsegment") == "BUILDING")
    orders = ltable(spark, sf_dir, "orders").filter(pl.col("o_orderdate") < cutoff)
    li = ltable(spark, sf_dir, "lineitem").filter(pl.col("l_shipdate") > cutoff)
    return (
        li.join(orders, left_on="l_orderkey", right_on="o_orderkey")
        .join(cust, left_on="o_custkey", right_on="c_custkey")
        .group_by("l_orderkey", "o_orderdate")
        .agg(
            (pl.col("l_extendedprice") * (1 - pl.col("l_discount")))
            .sum()
            .round(2)
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .sort(["revenue", "o_orderdate", "l_orderkey"], descending=[True, False, False])
        .limit(10)
        .to_spark()
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer")
    orders = ltable(spark, sf_dir, "orders").filter(
        (pl.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (pl.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = ltable(spark, sf_dir, "lineitem")
    supp = ltable(spark, sf_dir, "supplier")
    nation = ltable(spark, sf_dir, "nation")
    region = ltable(spark, sf_dir, "region").filter(pl.col("r_name") == "ASIA")
    # fixed-size dims broadcast; supplier/customer joins left to AQE
    from polars_spark.plans.frame import LazyFrame

    dims = LazyFrame(
        supp.to_spark()
        .join(F.broadcast(nation.to_spark()), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.to_spark()), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    joined = (
        li.join(orders, left_on="l_orderkey", right_on="o_orderkey")
        .join(cust, left_on="o_custkey", right_on="c_custkey")
        .join_where(
            dims,
            pl.col("l_suppkey") == pl.col("s_suppkey"),
            pl.col("c_nationkey") == pl.col("s_nationkey"),
        )
    )
    return (
        joined.group_by("n_name")
        .agg(
            (pl.col("l_extendedprice") * (1 - pl.col("l_discount")))
            .sum()
            .round(2)
            .alias("revenue")
        )
        .sort(["revenue", "n_name"], descending=[True, False])
        .to_spark()
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(coalesce(sum(l_extendedprice * l_discount), 0.0), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (pl.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (pl.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & pl.col("l_discount").is_between(0.05, 0.07)
            & (pl.col("l_quantity") < 24)
        )
        .select((pl.col("l_extendedprice") * pl.col("l_discount")).sum().round(2).alias("revenue"))
        .to_spark()
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1998-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer")
    orders = ltable(spark, sf_dir, "orders").filter(
        (pl.col("o_orderdate") >= _ts("1998-10-01 00:00:00"))
        & (pl.col("o_orderdate") < _ts("1999-01-01 00:00:00"))
    )
    li = ltable(spark, sf_dir, "lineitem").filter(pl.col("l_returnflag") == "R")
    nation = ltable(spark, sf_dir, "nation")
    return (
        li.join(orders, left_on="l_orderkey", right_on="o_orderkey")
        # polars coalesces the join key into the left name: o_custkey survives
        .join(cust, left_on="o_custkey", right_on="c_custkey")
        .join(nation, left_on="c_nationkey", right_on="n_nationkey")
        .group_by(pl.col("o_custkey").alias("c_custkey"), "c_name", "c_acctbal", "n_name")
        .agg(
            (pl.col("l_extendedprice") * (1 - pl.col("l_discount")))
            .sum()
            .round(2)
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            pl.col("c_acctbal").round(2).alias("c_acctbal"),
            "n_name",
        )
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(20)
        .to_spark()
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount) END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem").filter(
        (pl.col("l_shipdate") >= _ts("1996-03-01 00:00:00"))
        & (pl.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    part = ltable(spark, sf_dir, "part")
    rev = pl.col("l_extendedprice") * (1 - pl.col("l_discount"))
    promo = pl.when(pl.col("p_type").str.starts_with("PROMO")).then(rev).otherwise(pl.lit(None))
    return (
        li.join(part, left_on="l_partkey", right_on="p_partkey")
        .select((100.0 * promo.sum() / rev.sum()).round(4).alias("promo_revenue"))
        .to_spark()
    )


@query(
    "q18_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice, qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume(spark, sf_dir):
    """TPC-H Q18 shape: pre-aggregate the fact table, then join dimensions —
    the aggregate runs BEFORE the join so only qualifying orders shuffle."""
    li = ltable(spark, sf_dir, "lineitem")
    big = (
        li.group_by("l_orderkey")
        .agg(pl.col("l_quantity").sum().alias("qty"))
        .filter(pl.col("qty") > 300)
    )
    orders = ltable(spark, sf_dir, "orders")
    cust = ltable(spark, sf_dir, "customer")
    return (
        big.join(orders, left_on="l_orderkey", right_on="o_orderkey")
        .join(cust, left_on="o_custkey", right_on="c_custkey")
        .select(
            pl.col("o_custkey").alias("c_custkey"),
            "c_name",
            pl.col("l_orderkey").alias("o_orderkey"),
            pl.col("o_totalprice").round(2).alias("o_totalprice"),
            pl.col("qty"),
        )
        .to_spark()
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 23:59:59'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: nation-pair trade volume by year (synthetic nation names).  The two nation lookups
    are broadcast (25 rows each); the OR-pair predicate prunes after the
    dimension joins."""
    li = ltable(spark, sf_dir, "lineitem").filter(
        (pl.col("l_shipdate") >= _ts("1995-01-01 00:00:00"))
        & (pl.col("l_shipdate") <= _ts("1996-12-31 23:59:59"))
    )
    supp = ltable(spark, sf_dir, "supplier")
    orders = ltable(spark, sf_dir, "orders")
    cust = ltable(spark, sf_dir, "customer")
    n1 = ltable(spark, sf_dir, "nation").select(
        pl.col("n_nationkey").alias("s_nkey"), pl.col("n_name").alias("supp_nation")
    )
    n2 = ltable(spark, sf_dir, "nation").select(
        pl.col("n_nationkey").alias("c_nkey"), pl.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(supp, left_on="l_suppkey", right_on="s_suppkey")
        .join(orders, left_on="l_orderkey", right_on="o_orderkey")
        .join(cust, left_on="o_custkey", right_on="c_custkey")
        .join(n1, left_on="s_nationkey", right_on="s_nkey")
        .join(n2, left_on="c_nationkey", right_on="c_nkey")
        .filter(
            ((pl.col("supp_nation") == "NATION_1") & (pl.col("cust_nation") == "NATION_2"))
            | ((pl.col("supp_nation") == "NATION_2") & (pl.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.with_columns(
            (pl.col("l_extendedprice") * (1 - pl.col("l_discount"))).alias("volume"),
            pl.col("l_shipdate").dt.year().alias("l_year"),
        )
        .group_by("supp_nation", "cust_nation", "l_year")
        .agg(pl.col("volume").sum().round(2).alias("revenue"))
        .to_spark()
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region   ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 23:59:59'
        AND p_type LIKE 'ECONOMY%'
    ) GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: supplier-nation market share inside one region/part-type
    segment — conditional aggregation over a 7-way join."""
    part = ltable(spark, sf_dir, "part").filter(pl.col("p_type").str.starts_with("ECONOMY"))
    li = ltable(spark, sf_dir, "lineitem")
    supp = ltable(spark, sf_dir, "supplier")
    orders = ltable(spark, sf_dir, "orders").filter(
        (pl.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
        & (pl.col("o_orderdate") <= _ts("1996-12-31 23:59:59"))
    )
    cust = ltable(spark, sf_dir, "customer")
    n1 = ltable(spark, sf_dir, "nation").select(
        pl.col("n_nationkey").alias("c_nkey"), pl.col("n_regionkey")
    )
    region = ltable(spark, sf_dir, "region").filter(pl.col("r_name") == "AMERICA")
    n2 = ltable(spark, sf_dir, "nation").select(
        pl.col("n_nationkey").alias("s_nkey"), pl.col("n_name").alias("nation")
    )
    joined = (
        li.join(part, left_on="l_partkey", right_on="p_partkey", how="semi")
        .join(orders, left_on="l_orderkey", right_on="o_orderkey")
        .join(cust, left_on="o_custkey", right_on="c_custkey")
        .join(n1, left_on="c_nationkey", right_on="c_nkey")
        .join(region, left_on="n_regionkey", right_on="r_regionkey", how="semi")
        .join(supp, left_on="l_suppkey", right_on="s_suppkey")
        .join(n2, left_on="s_nationkey", right_on="s_nkey")
    )
    vol = pl.col("l_extendedprice") * (1 - pl.col("l_discount"))
    brazil = pl.when(pl.col("nation") == "NATION_3").then(vol).otherwise(pl.lit(0.0))
    return (
        joined.with_columns(pl.col("o_orderdate").dt.year().alias("o_year"))
        .group_by("o_year")
        .agg((brazil.sum() / vol.sum()).round(6).alias("mkt_share"))
        .to_spark()
    )
