"""Scalar-function registry queries: the .str / .dt / .list namespaces and
the statistical aggregation family, through the polars_spark Expr API.

Reference registries: strings polars-plan/src/dsl/function_expr/strings.rs:9,
temporal datetime.rs:6, list list.rs:6, aggregations dsl/expr/mod.rs:22.
Every lowering stays in pyspark.sql.functions (whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_spark.queries import ltable, query

import polars_spark as pl


@query(
    "sf_str_ops",
    oracle=r"""
    SELECT doc_id,
           substr(lower(text), 1, 30)                       AS head30,
           length(text)                                     AS n_chars,
           contains(text, 'data')                           AS has_data,
           len(regexp_extract_all(text, 'data'))            AS n_data,
           starts_with(text, 'key')                         AS starts_key,
           replace(text, ' ', '_')                          AS underscored,
           regexp_extract(text, '^(\w+)', 1)                AS first_word,
           len(regexp_split_to_array(text, ' '))            AS n_words,
           upper(substr(text, -10))                         AS tail10,
           reverse(substr(text, 1, 5))                      AS rev5,
           regexp_replace(regexp_replace(text, ' ', '_'), ' ', '_') AS repl2,
           replace(text, ' ', ' |')                         AS incl
    FROM documents
    """,
)
def sf_str_ops(spark, sf_dir):
    docs = ltable(spark, sf_dir, "documents")
    t = pl.col("text")
    return docs.select(
        "doc_id",
        t.str.to_lowercase().str.slice(0, 30).alias("head30"),
        t.str.len_chars().alias("n_chars"),
        t.str.contains("data", literal=True).alias("has_data"),
        t.str.count_matches("data", literal=True).alias("n_data"),
        t.str.starts_with("key").alias("starts_key"),
        t.str.replace_all(" ", "_", literal=True).alias("underscored"),
        t.str.extract(r"^(\w+)", 1).alias("first_word"),
        t.str.split(" ").list.len().alias("n_words"),
        t.str.slice(-10).str.to_uppercase().alias("tail10"),
        t.str.slice(0, 5).str.reverse().alias("rev5"),
        t.str.replace(" ", "_", literal=True, n=2).alias("repl2"),
        t.str.split(" ", inclusive=True).list.join("|").alias("incl"),
    ).to_spark()


@query(
    "sf_enum_cast",
    # strict Enum cast over the full column: if membership validation ever
    # wrongly rejects a frozen category the query raises and the row goes red
    oracle="""
    SELECT l_returnflag AS flag, count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def sf_enum_cast(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    return (
        li.select(pl.col("l_returnflag").cast(pl.Enum(["A", "N", "R"])).alias("flag"))
        .group_by("flag")
        .agg(pl.len().alias("n"))
        .to_spark()
    )


@query(
    "sf_dt_ops",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                            AS y,
           quarter(o_orderdate)                         AS q,
           month(o_orderdate)                           AS mo,
           day(o_orderdate)                             AS d,
           isodow(o_orderdate)                          AS wd,
           dayofyear(o_orderdate)                       AS doy,
           weekofyear(o_orderdate)                      AS wk,
           date_trunc('month', o_orderdate)             AS mstart,
           epoch_us(o_orderdate)                        AS ep_us,
           strftime(o_orderdate, '%Y-%m-%d')            AS fmt
    FROM orders
    """,
)
def sf_dt_ops(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders")
    d = pl.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        d.dt.year().alias("y"),
        d.dt.quarter().alias("q"),
        d.dt.month().alias("mo"),
        d.dt.day().alias("d"),
        d.dt.weekday().alias("wd"),
        d.dt.ordinal_day().alias("doy"),
        d.dt.week().alias("wk"),
        d.dt.truncate("1mo").alias("mstart"),
        d.dt.epoch("us").alias("ep_us"),
        d.dt.strftime("%Y-%m-%d").alias("fmt"),
    ).to_spark()


@query(
    "sf_list_ops",
    oracle="""
    SELECT vec_id,
           len(embedding)                                        AS dim,
           round(embedding[1], 5)                                AS first_el,
           round(list_aggregate(embedding, 'max'), 5)            AS el_max,
           round(list_aggregate(embedding, 'min'), 5)            AS el_min,
           round(list_aggregate(embedding, 'sum'), 4)            AS el_sum,
           round(list_sort(embedding)[1], 5)                     AS sorted_first,
           len(list_filter(embedding, x -> x > 0))               AS n_pos
    FROM embeddings
    """,
)
def sf_list_ops(spark, sf_dir):
    emb = ltable(spark, sf_dir, "embeddings")
    e = pl.col("embedding")
    return emb.select(
        "vec_id",
        e.list.len().alias("dim"),
        e.list.get(0).round(5).alias("first_el"),
        e.list.max().round(5).alias("el_max"),
        e.list.min().round(5).alias("el_min"),
        e.list.sum().round(4).alias("el_sum"),
        e.list.sort().list.get(0).round(5).alias("sorted_first"),
        e.list.filter(pl.element() > 0).list.len().alias("n_pos"),
    ).to_spark()


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 4)                       AS med_qty,
           round(stddev_samp(l_extendedprice), 2)             AS std_price,
           round(var_samp(l_extendedprice), 0)                AS var_price,
           round(quantile_cont(l_quantity, 0.25), 4)          AS q25_qty,
           round(quantile_cont(l_quantity, 0.9), 4)           AS q90_qty,
           count(DISTINCT l_partkey)
             + CASE WHEN count(*) > count(l_partkey) THEN 1 ELSE 0 END
                                                              AS nu_parts,
           min(l_shipdate)                                    AS first_ship,
           max(l_shipdate)                                    AS last_ship
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    return (
        li.group_by("l_returnflag")
        .agg(
            pl.col("l_quantity").median().round(4).alias("med_qty"),
            pl.col("l_extendedprice").std().round(2).alias("std_price"),
            pl.col("l_extendedprice").var().round(0).alias("var_price"),
            pl.col("l_quantity").quantile(0.25, "linear").round(4).alias("q25_qty"),
            pl.col("l_quantity").quantile(0.9, "linear").round(4).alias("q90_qty"),
            pl.col("l_partkey").n_unique().alias("nu_parts"),
            pl.col("l_shipdate").min().alias("first_ship"),
            pl.col("l_shipdate").max().alias("last_ship"),
        )
        .to_spark()
    )


@query(
    "agg_moments",
    oracle="""
    SELECT l_linestatus,
           round((avg(l_quantity*l_quantity*l_quantity)
                  - 3*avg(l_quantity)*avg(l_quantity*l_quantity)
                  + 2*avg(l_quantity)*avg(l_quantity)*avg(l_quantity))
                 / pow(var_pop(l_quantity), 1.5), 6)            AS skew_qty,
           round((avg(l_quantity*l_quantity*l_quantity*l_quantity)
                  - 4*avg(l_quantity)*avg(l_quantity*l_quantity*l_quantity)
                  + 6*avg(l_quantity)*avg(l_quantity)*avg(l_quantity*l_quantity)
                  - 3*pow(avg(l_quantity), 4))
                 / pow(var_pop(l_quantity), 2) - 3, 6)          AS kurt_qty
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_moments(spark, sf_dir):
    """skew/kurtosis (biased population estimators, matching polars bias=True
    and Spark's skewness/kurtosis). Oracle computes the same central moments
    from raw power sums."""
    li = ltable(spark, sf_dir, "lineitem")
    return (
        li.group_by("l_linestatus")
        .agg(
            pl.col("l_quantity").skew().round(6).alias("skew_qty"),
            pl.col("l_quantity").kurtosis().round(6).alias("kurt_qty"),
        )
        .to_spark()
    )


@query(
    "agg_product_entropy",
    oracle="""
    SELECT l_orderkey,
           round(product(1 + l_discount), 6)                                 AS disc_prod,
           round(ln(sum(l_quantity)) - sum(l_quantity * ln(l_quantity))
                 / sum(l_quantity), 6)                                       AS qty_entropy,
           round(sum(l_quantity), 2)                                        AS qty_sum
    FROM lineitem
    WHERE l_orderkey < 1000 AND l_quantity > 0
    GROUP BY l_orderkey
    """,
)
def agg_product_entropy(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem").filter(
        (pl.col("l_orderkey") < 1000) & (pl.col("l_quantity") > 0)
    )
    return (
        li.group_by("l_orderkey")
        .agg(
            (1 + pl.col("l_discount")).product().round(6, mode="half_away_from_zero").alias("disc_prod"),
            pl.col("l_quantity").entropy(normalize=True).round(6, mode="half_away_from_zero").alias("qty_entropy"),
            pl.col("l_quantity").sum().round(2, mode="half_away_from_zero").alias("qty_sum"),
        )
        .to_spark()
    )


@query(
    "agg_any_all_mode",
    oracle="""
    SELECT o_orderpriority,
           coalesce(max(o_totalprice > 500000), false) AS any_big,
           coalesce(min(o_totalprice > 1000), true)     AS all_over_1k,
           mode(o_orderstatus)                      AS status_mode,
           first(o_orderkey ORDER BY o_orderkey)    AS first_key,
           last(o_orderkey ORDER BY o_orderkey)     AS last_key
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_any_all_mode(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders").sort("o_orderkey")
    return (
        orders.group_by("o_orderpriority")
        .agg(
            (pl.col("o_totalprice") > 500000).any().alias("any_big"),
            (pl.col("o_totalprice") > 1000).all().alias("all_over_1k"),
            pl.col("o_orderstatus").mode().alias("status_mode"),
            pl.col("o_orderkey").first().alias("first_key"),
            pl.col("o_orderkey").last().alias("last_key"),
        )
        .to_spark()
    )


@query(
    "agg_cut_bands",
    oracle="""
    SELECT CASE WHEN l_quantity IS NULL THEN NULL
                WHEN l_quantity <= 10 THEN 'small'
                WHEN l_quantity <= 30 THEN 'medium'
                ELSE 'large' END AS band,
           count(*) AS n, round(coalesce(sum(l_extendedprice), 0), 2) AS price_sum
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_cut_bands(spark, sf_dir):
    li = ltable(spark, sf_dir, "lineitem")
    band = pl.col("l_quantity").cut([10.0, 30.0], labels=["small", "medium", "large"]).alias("band")
    return (
        li.group_by(band)
        .agg(pl.len().alias("n"), pl.col("l_extendedprice").sum().round(2).alias("price_sum"))
        .to_spark()
    )


@query(
    "agg_non_null_first",
    oracle="""
    SELECT o_orderpriority,
           arg_min(hi_price, o_orderkey) FILTER (WHERE hi_price IS NOT NULL) AS fnn,
           arg_max(hi_price, o_orderkey) FILTER (WHERE hi_price IS NOT NULL) AS lnn
    FROM (SELECT o_orderkey, o_orderpriority,
                 CASE WHEN o_totalprice > 300000 THEN round(o_totalprice, 2) END AS hi_price
          FROM orders)
    GROUP BY o_orderpriority
    """,
)
def agg_non_null_first(spark, sf_dir):
    """first_non_null/last_non_null over a sparse column in key order."""
    orders = ltable(spark, sf_dir, "orders").sort("o_orderkey")
    sparse = (
        pl.when(pl.col("o_totalprice") > 300000)
        .then(pl.col("o_totalprice").round(2))
        .otherwise(pl.lit(None))
        .alias("hi_price")
    )
    return (
        orders.with_columns(sparse)
        .group_by("o_orderpriority")
        .agg(
            pl.col("hi_price").first_non_null().alias("fnn"),
            pl.col("hi_price").last_non_null().alias("lnn"),
        )
        .to_spark()
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(coalesce(sum(o_totalprice), 0), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE grouping sets — Spark-native bonus beyond polars (polars-sql
    rejects grouping sets, polars-sql/src/context.rs:1472)."""
    orders = ltable(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(pl.len().alias("n"), pl.col("o_totalprice").sum().round(2).alias("total"))
        .to_spark()
    )


@query(
    "sf_bitwise",
    oracle="""
    SELECT o_orderkey,
           bit_count(o_orderkey)              AS ones,
           o_orderkey & 255                   AS low_byte,
           xor(o_orderkey, 12345)             AS xored
    FROM orders WHERE o_orderkey < 2000
    """,
)
def sf_bitwise(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders").filter(pl.col("o_orderkey") < 2000)
    return orders.select(
        "o_orderkey",
        pl.col("o_orderkey").bitwise_count_ones().alias("ones"),
        pl.Expr(lambda ctx: pl.col("o_orderkey")._resolve(ctx).bitwiseAND(255), "low_byte").alias("low_byte"),
        (pl.col("o_orderkey") ^ 12345).alias("xored"),
    ).to_spark()


@query(
    "sf_ranges_business",
    oracle="""
    SELECT o_orderkey,
           len(generate_series(o_orderdate::DATE, (o_orderdate + INTERVAL '14 days')::DATE,
                               INTERVAL '1 day')) AS span_days,
           len(list_filter(generate_series(o_orderdate::DATE,
                                           (o_orderdate + INTERVAL '13 days')::DATE,
                                           INTERVAL '1 day'),
                           d -> isodow(d) <= 5)) AS biz_days
    FROM orders WHERE o_orderkey < 3000
    """,
)
def sf_ranges_business(spark, sf_dir):
    """date_ranges (per-row sequence) + business_day_count over [t, t+14d)."""
    from pyspark.sql import functions as F

    orders = ltable(spark, sf_dir, "orders").filter(pl.col("o_orderkey") < 3000)
    start = pl.col("o_orderdate")
    end = pl.Expr(lambda ctx: F.date_add(F.to_date(F.col("o_orderdate")), 14), "end")
    return orders.select(
        "o_orderkey",
        pl.date_ranges(pl.Expr(lambda ctx: F.to_date(F.col("o_orderdate")), "s"), end)
        .list.len()
        .alias("span_days"),
        pl.business_day_count(start, end).alias("biz_days"),
    ).to_spark()


@query(
    "agg_implode_counts",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_transform(list_sort(list(DISTINCT o_orderstatus)),
                                          x -> coalesce(x, 'null')), ',') AS statuses,
           count(DISTINCT o_custkey)
             + CASE WHEN count(*) > count(o_custkey) THEN 1 ELSE 0 END AS nu_cust
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_implode_counts(spark, sf_dir):
    """implode (group -> list, AggExpr::Implode) + n_unique; the list is
    sorted on both sides so the rendering is order-independent, and FINALLY
    joined to a CSV string — driver hash canon is scalar-only (r10 rule)."""
    orders = ltable(spark, sf_dir, "orders")
    out = orders.group_by("o_orderpriority").agg(
        pl.col("o_orderstatus").unique().list.sort().alias("statuses"),
        pl.col("o_custkey").n_unique().alias("nu_cust"),
    )
    return out.to_spark().withColumn(
        "statuses", F.array_join(F.col("statuses"), ",", "null")
    )


@query(
    "sf_value_counts",
    oracle="""
    SELECT c_mktsegment AS value, count(*) AS count
    FROM customer GROUP BY c_mktsegment
    """,
)
def sf_value_counts(spark, sf_dir):
    """value_counts via the frame API (polars value_counts lowering)."""
    cust = ltable(spark, sf_dir, "customer")
    return (
        cust.group_by(pl.col("c_mktsegment").alias("value"))
        .agg(pl.len().alias("count"))
        .to_spark()
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT o_orderpriority,
           bit_and(o_orderkey) AS k_and,
           bit_or(o_orderkey)  AS k_or,
           bit_xor(o_orderkey) AS k_xor
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bitwise(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders")
    return (
        orders.group_by("o_orderpriority")
        .agg(
            pl.col("o_orderkey").bitwise_and().alias("k_and"),
            pl.col("o_orderkey").bitwise_or().alias("k_or"),
            pl.col("o_orderkey").bitwise_xor().alias("k_xor"),
        )
        .to_spark()
    )


@query(
    "rel_match_schema",
    # the final DECIMAL column is rendered as VARCHAR on BOTH sides: the
    # driver's value hash is representation-sensitive and Spark toPandas
    # yields decimal.Decimal objects while DuckDB .df() widens DECIMAL to
    # float64 (round-9 driver red).  The cast-to-decimal semantics under
    # test are unchanged — only the final rendering is stabilized.
    oracle="""
    SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS c_acctbal,
           CAST(NULL AS VARCHAR) AS c_phone
    FROM customer
    """,
)
def rel_match_schema(spark, sf_dir):
    """match_to_schema: cast + insert-missing-as-null (DslPlan::MatchToSchema)."""
    cust = ltable(spark, sf_dir, "customer")
    out = cust.match_to_schema(
        {"c_custkey": "Int64", "c_acctbal": "decimal(12,2)", "c_phone": "String"},
        missing_columns="insert",
    )
    return out.with_columns(pl.col("c_acctbal").cast("String")).to_spark()


@query(
    "agg_spearman",
    oracle="""
    WITH ranked AS (
      SELECT user_id,
             rank() OVER (PARTITION BY user_id ORDER BY value)
               + (count(*) OVER (PARTITION BY user_id, value) - 1) / 2.0 AS rv,
             rank() OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
               + (count(*) OVER (PARTITION BY user_id, epoch_us(ts)) - 1) / 2.0 AS rt
      FROM events
    )
    SELECT user_id, round(corr(rv, rt), 6) AS spearman
    FROM ranked GROUP BY user_id
    """,
)
def agg_spearman(spark, sf_dir):
    """Spearman rank correlation per group: average-rank pre-pass (windows
    partitioned by the group) then Pearson of the ranks — the scale-safe
    two-phase pattern; no global ranking anywhere."""
    ev = ltable(spark, sf_dir, "events")
    ranked = ev.with_columns(
        pl.col("value").rank("average").over("user_id").alias("rv"),
        pl.col("ts").dt.epoch("us").rank("average").over("user_id").alias("rt"),
    )
    return (
        ranked.group_by("user_id")
        .agg(pl.corr(pl.col("rv"), pl.col("rt")).round(6).alias("spearman"))
        .to_spark()
    )


@query(
    "sf_bin_reinterpret",
    # 8 md5 bytes -> int64/uint64, little/big endian.  DuckDB replays the
    # byte order with substring re-concat and hex-literal casts; the signed
    # fold runs in HUGEINT then narrows.
    oracle="""
    WITH h AS (
      SELECT c_custkey, substring(md5(c_name), 1, 16) AS hx
      FROM customer
    ), r AS (
      SELECT c_custkey,
             substring(hx,15,2) || substring(hx,13,2) || substring(hx,11,2) ||
             substring(hx, 9,2) || substring(hx, 7,2) || substring(hx, 5,2) ||
             substring(hx, 3,2) || substring(hx, 1,2) AS hle, hx
      FROM h
    )
    SELECT c_custkey,
           CAST(CASE WHEN ('0x'||hle)::UBIGINT::HUGEINT >= 9223372036854775808::HUGEINT
                     THEN ('0x'||hle)::UBIGINT::HUGEINT - 18446744073709551616::HUGEINT
                     ELSE ('0x'||hle)::UBIGINT::HUGEINT END AS BIGINT) AS as_i64_le,
           ('0x'||hx)::UBIGINT::DOUBLE AS as_u64_be
    FROM r
    """,
)
def sf_bin_reinterpret(spark, sf_dir):
    """bin.reinterpret (reference binary namespace): md5-derived 8-byte
    blobs read as int64 (little-endian) and uint64 (big-endian).  All
    JVM-side: hex + substring byte-swap + conv + two's-complement fold."""
    cust = ltable(spark, sf_dir, "customer")
    blob = pl.sql_expr("substring(md5(c_name), 1, 16)").str.decode("hex")
    return cust.select(
        "c_custkey",
        blob.bin.reinterpret(dtype=pl.Int64, endianness="little").alias("as_i64_le"),
        blob.bin.reinterpret(dtype=pl.UInt64, endianness="big")
        .cast("double")
        .alias("as_u64_be"),
    ).to_spark()


@query(
    "sf_find_many",
    # 'the'/'table' can never overlap each other or themselves in
    # space-separated text, so the aho-corasick non-overlapping scan equals
    # the all-positions filter DuckDB can express with list lambdas.
    oracle="""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL ELSE coalesce(
             array_to_string(list_transform(
               list_transform(
                 list_filter(range(1, length(text)+1),
                             i -> substring(text, i, 3) = 'the'
                               OR substring(text, i, 5) = 'table'),
                 i -> i - 1),
               x -> CAST(x AS VARCHAR)), ','), '') END AS hits_csv,
           len(list_filter(range(1, length(text)+1),
                           i -> substring(text, i, 3) = 'the'
                             OR substring(text, i, 5) = 'table')) AS n_hits
    FROM documents
    """,
)
def sf_find_many(spark, sf_dir):
    """str.find_many (reference aho-corasick find): start offsets of every
    literal-pattern match, via a JVM-side aggregate fold (no UDF).  FINAL
    offsets render as a CSV string (driver hash canon is scalar-only)."""
    docs = ltable(spark, sf_dir, "documents")
    hits = docs.select(
        "doc_id",
        pl.col("text").str.find_many(["the", "table"]).alias("hits"),
    ).to_spark()
    return hits.select(
        "doc_id",
        F.array_join(F.transform("hits", lambda x: x.cast("string")), ",").alias(
            "hits_csv"
        ),
        F.size("hits").cast("long").alias("n_hits"),
    )


@query(
    "sf_decimal_exact",
    # DECIMAL(12,2)/(18,4) arithmetic is EXACT on both engines (SURVEY §1.2:
    # both 128-bit, max precision 38) — sums compare as exact decimals, no
    # float rounding discipline needed.
    # final DECIMAL columns render as VARCHAR on BOTH sides — exactness is
    # preserved (fixed scale -> fixed digit count) while the representation
    # survives the toPandas/duckdb-df boundary identically (round-9 driver
    # red: Decimal objects vs float64 hash-diverge even on equal values).
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 0) AS DECIMAL(22,2))
             AS VARCHAR) AS dec_sum,
           CAST(CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(12,2))
             AS VARCHAR) AS dec_min,
           CAST(CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(12,2))
             AS VARCHAR) AS dec_max,
           CAST(CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(18,4))), 0) AS DECIMAL(38,6))
             AS VARCHAR) AS dec_rev
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sf_decimal_exact(spark, sf_dir):
    """Exact decimal aggregation (polars Decimal dtype -> Spark DecimalType,
    both 128-bit): sums/products carry no float error, so the compare is
    exact decimal equality — the money-math path a pipeline would actually
    use at scale."""
    li = ltable(spark, sf_dir, "lineitem")
    price2 = pl.col("l_extendedprice").cast("decimal(12,2)")
    price4 = pl.col("l_extendedprice").cast("decimal(18,4)")
    disc4 = (1 - pl.col("l_discount")).cast("decimal(18,4)")
    return (
        li.group_by("l_returnflag")
        .agg(
            price2.sum().cast("decimal(22,2)").cast("String").alias("dec_sum"),
            price2.min().cast("decimal(12,2)").cast("String").alias("dec_min"),
            price2.max().cast("decimal(12,2)").cast("String").alias("dec_max"),
            (price4 * disc4).sum().cast("decimal(38,6)").cast("String").alias("dec_rev"),
        )
        .sort("l_returnflag")
        .to_spark()
    )


@query(
    "sf_hist",
    oracle="""
    WITH edges(i, lo, hi) AS (VALUES (0, 0.0, 2000.0), (1, 2000.0, 20000.0), (2, 20000.0, 80000.0)),
    c AS (
      SELECT hi AS breakpoint,
             count(CASE WHEN (CASE WHEN i = 0 THEN l.l_extendedprice >= lo
                                   ELSE l.l_extendedprice > lo END)
                         AND l.l_extendedprice <= hi THEN 1 END) AS count
      FROM edges LEFT JOIN lineitem l ON true
      GROUP BY hi
    )
    SELECT breakpoint, count FROM c
    """,
)
def sf_hist(spark, sf_dir):
    """Expr.hist(bins): right-closed (lo, hi] bins (first bin closed left),
    one {breakpoint, count} struct per bin — exploded so the oracle
    compares one row per bin."""
    li = ltable(spark, sf_dir, "lineitem")
    out = li.select(
        pl.col("l_extendedprice").hist(bins=[0.0, 2000.0, 20000.0, 80000.0], include_breakpoint=True).alias("h")
    )
    import pyspark.sql.functions as F

    sdf = out.to_spark().select(F.explode("h").alias("b")).select("b.*")
    return sdf.select("breakpoint", "count")


@query(
    "sf_list_agg",
    # list.agg lowering (reference expr/list.py list_agg): elementwise
    # prefix inside a JVM transform + array reduction — replayed in DuckDB
    # with list_transform/list_aggregate/list_filter
    oracle="""
    SELECT doc_id,
           CAST(list_aggregate(list_transform(regexp_split_to_array(text, ' '),
                x -> length(x)), 'sum') AS BIGINT)                        AS total_chars,
           CAST(len(list_distinct(regexp_split_to_array(text, ' '))) AS BIGINT) AS uniq_words,
           len(list_filter(regexp_split_to_array(text, ' '),
               x -> length(x) > 5)) > 0                                   AS has_long,
           CAST(list_aggregate(list_transform(regexp_split_to_array(text, ' '),
                x -> length(x)), 'max') AS BIGINT)                        AS longest
    FROM documents
    """,
)
def sf_list_agg(spark, sf_dir):
    docs = ltable(spark, sf_dir, "documents")
    words = pl.col("text").str.split(" ")
    el = pl.element()
    return docs.select(
        "doc_id",
        words.list.agg(el.str.len_chars().sum()).cast(pl.Int64).alias("total_chars"),
        words.list.agg(el.n_unique()).alias("uniq_words"),
        words.list.agg((el.str.len_chars() > 5).any()).alias("has_long"),
        words.list.agg(el.str.len_chars().max()).cast(pl.Int64).alias("longest"),
    ).to_spark()


@query(
    "sf_enum_order",
    # Enum ordering is CATEGORY INDEX, not lexical (reference polars-dtype
    # dtype.rs FrozenCategories): with categories ['R','N','A'] the min of a
    # group is the EARLIEST category present — the oracle replays the rank
    # mapping by hand
    oracle="""
    SELECT l_linestatus AS status,
           CASE min(CASE l_returnflag WHEN 'R' THEN 1 WHEN 'N' THEN 2 WHEN 'A' THEN 3 END)
                WHEN 1 THEN 'R' WHEN 2 THEN 'N' WHEN 3 THEN 'A' END AS first_flag,
           CASE max(CASE l_returnflag WHEN 'R' THEN 1 WHEN 'N' THEN 2 WHEN 'A' THEN 3 END)
                WHEN 1 THEN 'R' WHEN 2 THEN 'N' WHEN 3 THEN 'A' END AS last_flag,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def sf_enum_order(spark, sf_dir):
    """Enum min/max honor the frozen category ORDER (['R','N','A'] is the
    reverse of lexical, so a lexical regression flips every row red); the
    categories ride in Spark field metadata through the with_columns."""
    li = ltable(spark, sf_dir, "lineitem")
    return (
        li.with_columns(flag=pl.col("l_returnflag").cast(pl.Enum(["R", "N", "A"])))
        .group_by(pl.col("l_linestatus").alias("status"))
        .agg(
            pl.col("flag").min().alias("first_flag"),
            pl.col("flag").max().alias("last_flag"),
            pl.len().alias("n"),
        )
        .to_spark()
    )


@query(
    "sf_cat_lexical",
    # Categorical with lexical ordering: sort/rank/min/max behave exactly as
    # the underlying strings (the engine's documented categorical mapping —
    # strings stay strings, Tungsten/parquet dictionary-encode physically)
    oracle="""
    WITH m AS (SELECT p_brand, p_retailprice FROM part)
    SELECT p_brand AS container,
           count(*) AS n,
           min(p_brand) OVER () AS first_cat,
           floor(avg(p_retailprice) * 1e4 + 0.5) / 1e4 AS avg_price
    FROM m GROUP BY p_brand
    """,
)
def sf_cat_lexical(spark, sf_dir):
    """cat lexical-ordering corner: group stats over a Categorical column
    plus a global lexical min across the categories."""
    part = ltable(spark, sf_dir, "part")
    from polars_spark.queries import fround
    import pyspark.sql.functions as F

    out = (
        part.with_columns(cat=pl.col("p_brand").cast(pl.Categorical("lexical")))
        .group_by(pl.col("cat").alias("container"))
        .agg(
            pl.len().alias("n"),
            pl.col("p_retailprice").mean().alias("avg_price"),
        )
        .with_columns(first_cat=pl.col("container").min())
        .to_spark()
    )
    return out.select("container", "n", "first_cat", fround(F.col("avg_price"), 4).alias("avg_price"))


@query(
    "sf_cat_physical",
    # Enum.to_physical is the UInt32 index into the FROZEN categories
    # (reference dtype.rs:135 / function_expr/cat.rs) — with ['R','N','A']
    # the physical codes are 0/1/2, and a round-trip gather restores the
    # original strings.  The oracle replays the index table by hand.
    oracle="""
    SELECT l_linestatus AS status,
           CAST(sum(CASE l_returnflag WHEN 'R' THEN 0 WHEN 'N' THEN 1 WHEN 'A' THEN 2 END) AS BIGINT)
             AS phys_sum,
           CAST(min(CASE l_returnflag WHEN 'R' THEN 0 WHEN 'N' THEN 1 WHEN 'A' THEN 2 END) AS BIGINT)
             AS phys_min,
           CAST(max(CASE l_returnflag WHEN 'R' THEN 0 WHEN 'N' THEN 1 WHEN 'A' THEN 2 END) AS BIGINT)
             AS phys_max,
           CAST(sum(CASE WHEN l_returnflag IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_roundtrip_ok
    FROM lineitem GROUP BY 1
    """,
)
def sf_cat_physical(spark, sf_dir):
    """Enum physical codes + round-trip: to_physical yields the frozen
    category index; gathering the categories by that index must restore
    every original value (n_roundtrip_ok counts exact matches)."""
    li = ltable(spark, sf_dir, "lineitem")
    flag = pl.col("l_returnflag").cast(pl.Enum(["R", "N", "A"]))
    import pyspark.sql.functions as F

    base = li.with_columns(phys=flag.to_physical()).to_spark()
    cats_arr = F.array(F.lit("R"), F.lit("N"), F.lit("A"))
    base = base.withColumn("rt", F.get(cats_arr, F.col("phys").cast("int")))
    return (
        base.groupBy(F.col("l_linestatus").alias("status"))
        .agg(
            F.sum("phys").cast("bigint").alias("phys_sum"),
            F.min("phys").cast("bigint").alias("phys_min"),
            F.max("phys").cast("bigint").alias("phys_max"),
            F.sum(
                F.when(F.col("rt") == F.col("l_returnflag"), 1).otherwise(0)
            ).cast("bigint").alias("n_roundtrip_ok"),
        )
    )

