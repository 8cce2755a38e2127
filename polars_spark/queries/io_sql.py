"""IO round-trip + SQL registry queries (SURVEY §2.8/§2.9).

Round-trip pattern: sink the table in the target format to a scratch dir,
re-scan it through the polars_spark scan API, aggregate — the oracle runs
the same aggregate on the ORIGINAL parquet, so any loss in the sink/scan
path (types, nulls, partition columns) breaks the hash match.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from polars_spark.queries import ltable, query, table

import polars_spark as pl

# per-process scratch: concurrent sweeps running the same IO query must not
# clobber each other's sink commit (same race class as the r7
# dedup_incremental_index fix — FileFormatWriter aborts when a parallel
# overwrite removes _temporary mid-commit)
_SCRATCH = os.path.join(tempfile.gettempdir(), f"polars_spark_io_{os.getpid()}")


def _dir(name: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    return os.path.join(_SCRATCH, name)


@query(
    "io_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(coalesce(sum(c_acctbal), 0), 2) AS bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def io_csv_roundtrip(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer")
    path = _dir("cust_csv")
    cust.sink_csv(path)
    back = pl.scan_csv(
        path, schema="c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING"
    )
    return (
        back.group_by("c_mktsegment")
        .agg(pl.len().alias("n"), pl.col("c_acctbal").sum().round(2, mode="half_away_from_zero").alias("bal"))
        .to_spark()
    )


@query(
    "io_ndjson_roundtrip",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(coalesce(sum(o_totalprice), 0), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def io_ndjson_roundtrip(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = _dir("orders_json")
    orders.sink_ndjson(path)
    back = pl.scan_ndjson(path, schema="o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
    return (
        back.group_by("o_orderstatus")
        .agg(pl.len().alias("n"), pl.col("o_totalprice").sum().round(2, mode="half_away_from_zero").alias("total"))
        .to_spark()
    )


@query(
    "io_parquet_partitioned",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def io_parquet_partitioned(spark, sf_dir):
    """Hive-partitioned sink (PartitionStrategy::Keyed, dsl/options/sink.rs:281)
    then partition-pruned re-scan: the partition column round-trips through
    the directory layout."""
    orders = ltable(spark, sf_dir, "orders")
    path = _dir("orders_part")
    orders.sink_parquet(path, partition_by="o_orderstatus")
    back = pl.scan_parquet(path)
    return (
        back.group_by(pl.col("o_orderstatus").cast("String").alias("o_orderstatus"), "o_orderpriority")
        .agg(pl.len().alias("n"))
        .to_spark()
    )


@query(
    "sql_cte_window",
    oracle="""
    WITH totals AS (
      SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           count(*) AS n,
           round(sum(spend), 2) AS seg_spend
    FROM totals JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def sql_cte_window(spark, sf_dir):
    """SQLContext: CTE + join + aggregate executed by spark.sql over
    registered frames (polars-sql context.rs:245 -> Catalyst for free)."""
    ctx = pl.SQLContext(
        frames={
            "orders": ltable(spark, sf_dir, "orders"),
            "customer": ltable(spark, sf_dir, "customer"),
        }
    )
    return ctx.execute(
        """
        WITH totals AS (
          SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY o_custkey
        )
        SELECT c_mktsegment, count(*) AS n, round(sum(spend), 2) AS seg_spend
        FROM totals JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    ).to_spark()


@query(
    "sql_set_ops",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 3000
    """,
)
def sql_set_ops(spark, sf_dir):
    ctx = pl.SQLContext(
        frames={
            "customer": ltable(spark, sf_dir, "customer"),
            "supplier": ltable(spark, sf_dir, "supplier"),
        }
    )
    return ctx.execute(
        """
        SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
        INTERSECT
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 3000
        """
    ).to_spark()


@query(
    "sql_window_rank",
    oracle="""
    SELECT n_name, c_custkey, bal_rank FROM (
      SELECT n_name, c_custkey,
             rank() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS bal_rank
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE bal_rank <= 3
    """,
)
def sql_window_rank(spark, sf_dir):
    ctx = pl.SQLContext(
        frames={
            "customer": ltable(spark, sf_dir, "customer"),
            "nation": ltable(spark, sf_dir, "nation"),
        }
    )
    return ctx.execute(
        """
        SELECT n_name, c_custkey, bal_rank FROM (
          SELECT n_name, c_custkey,
                 rank() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS bal_rank
          FROM customer JOIN nation ON c_nationkey = n_nationkey
        ) WHERE bal_rank <= 3
        """
    ).to_spark()


@query(
    "udf_map_groups",
    oracle="""
    SELECT event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS value_rank
    FROM events
    """,
)
def udf_map_groups(spark, sf_dir):
    """GroupBy.map_groups (applyInPandas, §2.11) verified against window SQL.
    Integer output (a per-group rank) so the comparison is exact — float
    reductions differ between numpy (pairwise) and SQL (sequential) at 1 ulp."""
    import pandas as pd

    from polars_spark.queries import ltable

    ev = ltable(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def rank_in_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"], ignore_index=True)
        pdf["value_rank"] = range(1, len(pdf) + 1)
        return pdf[["event_id", "value_rank"]]

    return ev.group_by("user_id").map_groups(rank_in_group, "event_id long, value_rank long").to_spark()


@query(
    "udf_map_rows",
    oracle="""
    SELECT CAST(c_custkey * 2 AS BIGINT) AS column_0,
           CAST(c_custkey % 7 AS BIGINT) AS column_1
    FROM customer
    """,
)
def udf_map_rows(spark, sf_dir):
    """DataFrame.map_rows (row-tuple UDF -> mapInPandas, §2.11) vs pure SQL.
    Integer outputs keep the hash compare exact."""
    from polars_spark.queries import ltable

    cust = ltable(spark, sf_dir, "customer").select("c_custkey")
    return cust.map_rows(
        lambda t: (t[0] * 2, t[0] % 7), schema="column_0 bigint, column_1 bigint"
    ).to_spark()


@query(
    "udf_map_batches",
    oracle="""
    SELECT event_id, round(value * 2 + 1, 2) AS scaled
    FROM events
    """,
)
def udf_map_batches(spark, sf_dir):
    """Expr.map_batches (pandas_udf over Arrow batches) vs the pure-SQL
    expression — validates the vectorized Python path end to end."""
    from polars_spark.queries import ltable

    import polars_spark as pl

    ev = ltable(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        pl.col("value").map_batches(lambda s: (s * 2 + 1).round(2)).alias("scaled"),
    ).to_spark()


@query(
    "io_orc_roundtrip",
    oracle="""
    SELECT s_nationkey, count(*) AS n, round(coalesce(sum(s_acctbal), 0), 2) AS bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def io_orc_roundtrip(spark, sf_dir):
    """ORC sink -> rescan (native Spark columnar format, beyond the polars
    format list)."""
    from polars_spark.sources import scan_orc

    supp = ltable(spark, sf_dir, "supplier")
    path = _dir("supp_orc")
    supp.sink_orc(path)
    back = scan_orc(path, spark=spark)
    return (
        back.group_by("s_nationkey")
        .agg(pl.len().alias("n"), pl.col("s_acctbal").sum().round(2, mode="half_away_from_zero").alias("bal"))
        .to_spark()
    )


@query(
    "io_multifile_scan",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, round(coalesce(sum(o_totalprice), 0), 2) AS total
    FROM orders
    WHERE o_orderkey % 2 = 0 OR o_orderkey % 2 = 1
    GROUP BY o_orderpriority
    """,
)
def io_multifile_scan(spark, sf_dir):
    """Multi-path scan (UnifiedScanArgs glob/multi-file, dsl/plan.rs:47):
    the table split across two directories, scanned as one frame."""
    orders = ltable(spark, sf_dir, "orders")
    p1, p2 = _dir("orders_a"), _dir("orders_b")
    orders.filter(pl.col("o_orderkey") % 2 == 0).sink_parquet(p1)
    orders.filter(pl.col("o_orderkey") % 2 == 1).sink_parquet(p2)
    back = pl.scan_parquet([p1, p2])
    return (
        back.group_by("o_orderpriority")
        .agg(pl.len().alias("n"), pl.col("o_totalprice").sum().round(2, mode="half_away_from_zero").alias("total"))
        .to_spark()
    )


def _morton_sql(a: str, b: str, bits: int = 8) -> str:
    """Bit-interleave two bucket expressions in portable SQL (col a at even
    bit positions, b at odd — same layout as functions.morton_interleave)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "scale_zorder_events",
    # equal-width 256-bucket per dim from global min/max (scalar agg), then
    # Morton interleave — identical IEEE floor arithmetic on both engines.
    oracle=f"""
    WITH s AS (
      SELECT min(user_id::DOUBLE) AS lo_u, max(user_id::DOUBLE) AS hi_u,
             min(value::DOUBLE) AS lo_v, max(value::DOUBLE) AS hi_v
      FROM events
    ), b AS (
      SELECT event_id,
             least(floor((user_id::DOUBLE - lo_u) / (hi_u - lo_u) * 256), 255)::BIGINT AS bu,
             least(floor((value::DOUBLE - lo_v) / (hi_v - lo_v) * 256), 255)::BIGINT AS bv
      FROM events, s
    )
    SELECT event_id, bu, bv, ({_morton_sql('bu', 'bv')})::BIGINT AS zorder
    FROM b
    """,
)
def scale_zorder_events(spark, sf_dir):
    """Z-order (Morton) clustering key over (user_id, value) — the write-
    time layout tool behind sink_parquet_zorder; key computation is a tiny
    scalar agg broadcast + map-side bit interleave."""
    from polars_spark.functions import zorder_key

    ev = table(spark, sf_dir, "events")
    out = zorder_key(ev, ["user_id", "value"], bits=8, keep_buckets=True)
    return out.select(
        "event_id",
        F.col("__bucket_user_id").alias("bu"),
        F.col("__bucket_value").alias("bv"),
        F.col("__zorder").alias("zorder"),
    )


@query(
    "udf_map_multi",
    oracle="""
    SELECT l_orderkey,
           CAST(coalesce(sum(CAST(floor(l_quantity * l_extendedprice) AS BIGINT)), 0) AS BIGINT) AS qty_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_orderkey
    """,
)
def udf_map_multi(spark, sf_dir):
    """Top-level pl.map_batches (multi-expression elementwise Arrow UDF)
    and pl.map_groups (GROUPED_AGG Arrow UDF) in one pipeline, verified
    against pure SQL.  Integer products/sums keep the hash exact."""
    import polars_spark as pl
    from polars_spark.queries import ltable

    li = ltable(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    prod = pl.map_batches(
        ["l_quantity", "l_extendedprice"],
        lambda s: __import__("numpy").floor(s[0] * s[1]).astype("Int64"),
        "Int64",
    ).alias("qp")
    return (
        li.with_columns(prod)
        .group_by("l_orderkey")
        .agg(
            pl.map_groups(["qp"], lambda s: int(s[0].sum()), "Int64").alias("qty_price"),
            # NB: Spark forbids mixing GROUPED_AGG pandas UDFs with JVM
            # aggregates in one agg — so the count is a pandas UDF too
            pl.map_groups(["qp"], lambda s: len(s[0]), "Int64").alias("n"),
        )
        .to_spark()
    )


@query(
    "io_ipc_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(coalesce(sum(c_acctbal), 0), 2) AS bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def io_ipc_roundtrip(spark, sf_dir):
    """Distributed Arrow-IPC round trip: executor-side sharded sink
    (mapInArrow, one shard per partition) then the DataSource-based
    scan_ipc (one input partition per shard) — the oracle aggregates the
    ORIGINAL parquet, so any loss in the IPC path breaks the hash."""
    cust = ltable(spark, sf_dir, "customer")
    path = _dir("cust_ipc")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    cust.sink_ipc(path)
    back = pl.scan_ipc(path)
    return (
        back.group_by("c_mktsegment")
        .agg(pl.len().alias("n"), pl.col("c_acctbal").sum().round(2, mode="half_away_from_zero").alias("bal"))
        .to_spark()
    )


@query(
    "sql_table_functions",
    oracle="""
    SELECT n_name, count(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n_name
    """,
)
def sql_table_functions(spark, sf_dir):
    """polars SQL table functions (table_functions.rs): read_parquet(...)
    directly in FROM — rewritten to native-scan temp views (pushdown
    intact); DuckDB runs read_parquet natively, so the oracle is the SAME
    query text."""
    q = f"""
    SELECT n_name, count(*) AS n_cust
    FROM read_parquet('{sf_dir}/customer.parquet') c
    JOIN read_parquet('{sf_dir}/nation.parquet') n ON c.c_nationkey = n.n_nationkey
    GROUP BY n_name
    """
    return pl.sql(q).to_spark()


@query(
    "scale_key_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           max(n) AS max_per_key,
           floor(avg(n) * 1e6 + 0.5) / 1e6 AS mean_per_key,
           floor(max(n) / avg(n) * 1e6 + 0.5) / 1e6 AS skew_factor,
           floor(max(n) / CAST(sum(n) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS top_key_share,
           CAST(quantile_cont(n, 0.5) AS DOUBLE) AS p50_per_key,
           CAST(quantile_cont(n, 0.99) AS DOUBLE) AS p99_per_key
    FROM counts
    """,
)
def scale_key_skew_profile(spark, sf_dir):
    """pl.key_skew_profile: rows-per-key distribution for a prospective
    shuffle key — the pre-flight skew diagnostic (salting / AQE decision
    input).  Exact percentiles over per-key counts; fround-aligned."""
    import pyspark.sql.functions as F

    from polars_spark import key_skew_profile
    from polars_spark.queries import fround, ltable

    ev = ltable(spark, sf_dir, "events")
    prof = key_skew_profile(ev, "user_id", percentiles=(0.5, 0.99))
    return prof.to_spark().select(
        "n_keys", "n_rows", "max_per_key",
        fround(F.col("mean_per_key"), 6).alias("mean_per_key"),
        fround(F.col("skew_factor"), 6).alias("skew_factor"),
        fround(F.col("top_key_share"), 6).alias("top_key_share"),
        F.col("p50_per_key").cast("double").alias("p50_per_key"),
        F.col("p99_per_key").cast("double").alias("p99_per_key"),
    )


@query(
    "scale_salted_join",
    # salted equi-join must be RESULT-identical to the plain join: salting
    # only changes the shuffle layout (key, salt), never the row set
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def scale_salted_join(spark, sf_dir):
    """pl.salted_join (explicit hot-key salting — the control for EXTREME
    single-key skew beyond AQE's split): fact side salted by row hash, dim
    side replicated across the salt space, joined on (key, salt).  The
    oracle is the unsalted join, so any row loss/duplication from the salt
    plumbing goes red."""
    from polars_spark.functions import salted_join
    from polars_spark.queries import ltable

    li = ltable(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = ltable(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li,
        orders.rename({"o_orderkey": "l_orderkey"}),
        "l_orderkey",
        salt=8,
    )
    return (
        joined.group_by("o_orderpriority")
        .agg(
            pl.len().alias("n"),
            (pl.col("l_extendedprice") * 100)
            .round(0)
            .cast("bigint")
            .sum()
            .cast("bigint")
            .alias("rev_c"),
        )
        .to_spark()
    )


@query(
    "io_bucketed_join",
    oracle="""
    SELECT a.event_type, count(*) AS n,
           floor(sum(b.value) * 1e4 + 0.5) / 1e4 AS total_b
    FROM events a JOIN events b ON a.event_id = b.event_id
    GROUP BY a.event_type
    """,
)
def io_bucketed_join(spark, sf_dir):
    """Bucketed-table co-located join (sink_bucketed_table + scan_table):
    both sides are hash-bucketed AND sorted on the join key at write time,
    so the sort-merge join reads co-located, pre-sorted buckets — ZERO
    Exchange and ZERO Sort above the join (asserted in tests/test_io.py).
    THE strategy for a 100 TB fact table joined repeatedly on one key:
    pay the shuffle once at ingest, never again."""
    ev = ltable(spark, sf_dir, "events")
    ev.sink_bucketed_table("gate_ev_a", bucket_by="event_id", num_buckets=8, sort_by="event_id")
    ev.sink_bucketed_table("gate_ev_b", bucket_by="event_id", num_buckets=8, sort_by="event_id")
    a = pl.scan_table("gate_ev_a", spark=spark)
    b = pl.scan_table("gate_ev_b", spark=spark).select(
        "event_id", pl.col("value").alias("value_b")
    )
    from polars_spark.queries import fround
    from pyspark.sql import functions as F

    joined = a.join(b, on="event_id").to_spark()
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        fround(F.sum("value_b"), 4).alias("total_b"),
    )
