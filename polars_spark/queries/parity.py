"""Oracle queries for components that previously had pytest coverage only
(SURVEY §2 'tested' rows): HConcat, MergeSorted, ExtContext, Unnest, the
.struct and .bin namespaces, arg_min/arg_max, NaN-propagating min/max,
DataFrameScan, IPC scan, and Expr.map_elements.  Every output column is
either integer, string, or an exactly-representable double so the driver's
value hash is deterministic across engines."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from polars_spark.queries import ltable, query

import polars_spark as pl


@query(
    "rel_hconcat",
    # HConcat (dsl/plan.rs:157): two same-height frames side by side.  Both
    # halves are projections of one sorted frame, so row alignment is defined.
    oracle="""
    SELECT r_regionkey, r_name, upper(r_name) AS uname, r_regionkey * 10 AS k10
    FROM region
    """,
)
def rel_hconcat(spark, sf_dir):
    reg = ltable(spark, sf_dir, "region").sort("r_regionkey")
    left = reg.select("r_regionkey", "r_name")
    right = reg.select(
        pl.col("r_name").str.to_uppercase().alias("uname"),
        (pl.col("r_regionkey") * 10).alias("k10"),
    )
    return left.hstack(right).to_spark()


@query(
    "rel_merge_sorted",
    # MergeSorted (dsl/plan.rs MergeSorted): k-way merge of two key-sorted
    # frames == the multiset union ordered by key.
    oracle="""
    SELECT * FROM (
      SELECT c_custkey AS k, c_acctbal AS bal FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey AS k, c_acctbal AS bal FROM customer WHERE c_custkey % 2 = 1
    ) ORDER BY k
    """,
)
def rel_merge_sorted(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer")
    ev = cust.filter(pl.col("c_custkey") % 2 == 0).select(
        pl.col("c_custkey").alias("k"), pl.col("c_acctbal").alias("bal")
    ).sort("k")
    od = cust.filter(pl.col("c_custkey") % 2 == 1).select(
        pl.col("c_custkey").alias("k"), pl.col("c_acctbal").alias("bal")
    ).sort("k")
    return ev.merge_sorted(od, "k").to_spark()


@query(
    "rel_with_context",
    # ExtContext (dsl/plan.rs:162): expressions referencing a 1-row context
    # frame (a scalar aggregate computed elsewhere), broadcast-joined.
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice > (SELECT avg(o_totalprice) FROM orders) AS BOOLEAN) AS above_avg
    FROM orders
    """,
)
def rel_with_context(spark, sf_dir):
    orders = ltable(spark, sf_dir, "orders")
    ctxf = orders.select(pl.col("o_totalprice").mean().alias("avg_price"))
    return (
        orders.with_context(ctxf)
        .select("o_orderkey", (pl.col("o_totalprice") > pl.col("avg_price")).alias("above_avg"))
        .to_spark()
    )


@query(
    "rel_unnest",
    # MapFunction::Unnest: struct column flattened back to top-level columns.
    oracle="""
    SELECT n_nationkey, n_name AS nm, n_regionkey * 2 AS rk2 FROM nation
    """,
)
def rel_unnest(spark, sf_dir):
    nat = ltable(spark, sf_dir, "nation")
    packed = nat.select(
        "n_nationkey",
        pl.struct(
            nm=pl.col("n_name"), rk2=(pl.col("n_regionkey") * 2)
        ).alias("s"),
    )
    return packed.unnest("s").to_spark()


@query(
    "sf_struct_ops",
    # .struct namespace: field access, with_fields, rename_fields.
    oracle="""
    SELECT s_suppkey,
           s_nationkey              AS nk,
           s_nationkey + 100        AS shifted,
           upper(s_name)            AS uname
    FROM supplier
    """,
)
def sf_struct_ops(spark, sf_dir):
    sup = ltable(spark, sf_dir, "supplier")
    packed = sup.select(
        "s_suppkey",
        pl.struct(nk=pl.col("s_nationkey"), nm=pl.col("s_name")).alias("s"),
    )
    return packed.select(
        "s_suppkey",
        pl.col("s").struct.field("nk").alias("nk"),
        pl.col("s")
        .struct.with_fields(shifted=pl.col("s").struct.field("nk") + 100)
        .struct.field("shifted")
        .alias("shifted"),
        pl.col("s").struct.rename_fields(["k2", "nm2"]).struct.field("nm2").str.to_uppercase().alias("uname"),
    ).to_spark()


@query(
    "sf_bin_ops",
    # .bin namespace over real bytes (unhexed md5): size, hex/base64
    # round-trips, prefix test.  All outputs strings/ints/bools.
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))        AS nbytes,
           lower(hex(encode(text)))          AS rehex,
           to_base64(encode(text))           AS b64
    FROM documents
    """,
)
def sf_bin_ops(spark, sf_dir):
    docs = ltable(spark, sf_dir, "documents")
    raw = pl.col("text").cast("binary")
    return docs.select(
        "doc_id",
        raw.bin.size().alias("nbytes"),
        raw.bin.encode("hex").alias("rehex"),
        raw.bin.encode("base64").alias("b64"),
    ).to_spark()


@query(
    "agg_arg_minmax",
    # arg_min/arg_max: row POSITION of the extremum in a defined frame order.
    # The tie-breaking key is made unique (bal, custkey) so both engines pick
    # the same row.
    oracle="""
    WITH pos AS (
      SELECT c_nationkey, c_acctbal, c_custkey,
             row_number() OVER (ORDER BY c_custkey) - 1 AS rn
      FROM customer
    )
    SELECT c_nationkey,
           arg_min(rn, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey) AS imin,
           arg_max(rn, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey) AS imax
    FROM pos GROUP BY 1
    """,
)
def agg_arg_minmax(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer").sort("c_custkey").with_row_index("rn")
    key = (pl.col("c_acctbal") * 100).round(0).cast("bigint") * 10000000 + pl.col("c_custkey")
    return (
        cust.with_columns(k=key)
        .group_by("c_nationkey")
        .agg(
            pl.col("k").arg_min().alias("imin"),
            pl.col("k").arg_max().alias("imax"),
        )
        .to_spark()
    )


@query(
    "agg_nan_minmax",
    # propagate_nans=True min/max (polars nan_min/nan_max): NaN wins if
    # present; default min/max skip NaNs.  NaNs are injected via 0/0.
    oracle="""
    WITH d AS (
      SELECT c_nationkey,
             CASE WHEN c_custkey % 37 = 0 THEN CAST('NaN' AS DOUBLE) ELSE c_acctbal END AS v
      FROM customer
    )
    SELECT c_nationkey,
           CAST(max(CASE WHEN isnan(v) THEN 1 ELSE 0 END) AS BOOLEAN)        AS has_nan,
           min(CASE WHEN isnan(v) THEN NULL ELSE v END)                      AS mn_skip,
           CASE WHEN max(CASE WHEN isnan(v) THEN 1 ELSE 0 END) = 1
                THEN CAST('NaN' AS DOUBLE)
                ELSE max(CASE WHEN isnan(v) THEN NULL ELSE v END) END        AS mx_nan
    FROM d GROUP BY 1
    """,
)
def agg_nan_minmax(spark, sf_dir):
    cust = ltable(spark, sf_dir, "customer")
    v = (
        pl.when(pl.col("c_custkey") % 37 == 0)
        .then(pl.lit(float("nan")))
        .otherwise(pl.col("c_acctbal"))
    )
    return (
        cust.with_columns(v=v)
        .group_by("c_nationkey")
        .agg(
            pl.col("v").is_nan().any().alias("has_nan"),
            pl.col("v").min().alias("mn_skip"),
            pl.col("v").nan_max().alias("mx_nan"),
        )
        .to_spark()
    )


@query(
    "io_frame_scan",
    # DataFrameScan: an in-memory frame (pl.DataFrame / from_pandas) joined
    # against a parquet table.
    oracle="""
    SELECT r.r_regionkey, t.tag, r.r_name
    FROM region r
    JOIN (VALUES (0, 'zero'), (2, 'two'), (4, 'four')) AS t(r_regionkey, tag)
      USING (r_regionkey)
    """,
)
def io_frame_scan(spark, sf_dir):
    tags = pl.DataFrame({"r_regionkey": [0, 2, 4], "tag": ["zero", "two", "four"]}, spark=spark)
    reg = ltable(spark, sf_dir, "region")
    return (
        reg.join(tags.with_columns(pl.col("r_regionkey").cast("bigint")), on="r_regionkey", how="inner")
        .select("r_regionkey", "tag", "r_name")
        .to_spark()
    )


@query(
    "io_ipc_roundtrip",
    # IPC/Feather scan: the nation table written to Arrow IPC and scanned
    # back; oracle reads the parquet directly.
    oracle="""
    SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
    FROM nation GROUP BY 1
    """,
)
def io_ipc_roundtrip(spark, sf_dir):
    import tempfile

    import pyarrow.feather as feather

    from polars_spark.sources import scan_ipc

    nat = ltable(spark, sf_dir, "nation")
    path = tempfile.mkdtemp(prefix="pls_ipc_") + "/nation.arrow"
    feather.write_feather(nat.to_arrow(), path)
    back = scan_ipc(path, spark=spark)
    return (
        back.group_by("n_regionkey")
        .agg(pl.len().alias("n"), pl.col("n_name").min().alias("first_name"))
        .to_spark()
    )


@query(
    "udf_map_elements",
    # Expr.map_elements (scalar Python fn over an Arrow-batched pandas map)
    # vs pure SQL; integer output keeps the hash exact.
    oracle="""
    SELECT p_partkey, CAST(p_size * 3 + 1 AS BIGINT) AS scaled
    FROM part
    """,
)
def udf_map_elements(spark, sf_dir):
    prt = ltable(spark, sf_dir, "part")
    return prt.select(
        "p_partkey",
        pl.col("p_size").map_elements(lambda v: v * 3 + 1, return_dtype=int).alias("scaled"),
    ).to_spark()


@query(
    "agg_groups_positions",
    # AggExpr::AggGroups + search_sorted: per-group member row positions and
    # an insertion-point aggregate (count strictly below).
    oracle="""
    WITH pos AS (
      SELECT c_nationkey, c_acctbal,
             row_number() OVER (ORDER BY c_custkey) - 1 AS rn
      FROM customer
    )
    SELECT c_nationkey,
           array_to_string(list_transform(list(rn ORDER BY rn),
                                          x -> CAST(x AS VARCHAR)), ',') AS members_csv,
           CAST(sum(CASE WHEN c_acctbal < 5000.0 THEN 1 ELSE 0 END) AS BIGINT) AS ins_5k
    FROM pos GROUP BY 1
    """,
)
def agg_groups_positions(spark, sf_dir):
    """FINAL member-position list renders as a CSV string — the driver's
    hash canon is scalar-only (r10 rule); agg_groups itself still yields
    the real list."""
    cust = ltable(spark, sf_dir, "customer").sort("c_custkey").with_row_index("rn")
    out = (
        cust.group_by("c_nationkey")
        .agg(
            pl.col("c_acctbal").agg_groups().alias("members"),
            pl.col("c_acctbal").search_sorted(5000.0).alias("ins_5k"),
        )
        .to_spark()
    )
    return out.withColumn(
        "members_csv",
        F.array_join(F.transform("members", lambda x: x.cast("string")), ","),
    ).drop("members")


@query(
    "io_python_datasource",
    # PythonScan (register_io_source on the Spark 4 Python DataSource API):
    # a 4-partition generator source aggregated distributively; the oracle
    # regenerates the same deterministic rows in SQL.
    oracle="""
    SELECT CAST(i % 4 AS BIGINT) AS part, CAST(sum(i * i) AS BIGINT) AS ss,
           CAST(count(*) AS BIGINT) AS n
    FROM generate_series(0, 399) t(i)
    GROUP BY 1
    """,
)
def io_python_datasource(spark, sf_dir):
    from polars_spark.io_plugins import register_io_source, scan_io_source

    def gen(pidx):
        # partition p yields i in [0,400) with i % 4 == p
        for i in range(pidx, 400, 4):
            yield (i, i % 4)

    register_io_source(
        "pls_gen_parity", schema="i bigint, part bigint", generator=gen,
        num_partitions=4, spark=spark,
    )
    src = scan_io_source("pls_gen_parity", spark=spark)
    return (
        src.group_by("part")
        .agg(
            (pl.col("i") * pl.col("i")).sum().alias("ss"),
            pl.len().alias("n"),
        )
        .to_spark()
    )


@query(
    "io_pyarrow_dataset",
    # scan_pyarrow_dataset over a multi-fragment Arrow/Feather dataset: each
    # fragment is an input partition of a Python DataSource (executor-side
    # pyarrow read); oracle reads the source parquet directly.
    oracle="""
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(n_nationkey), 0) AS BIGINT) AS keysum
    FROM nation GROUP BY 1
    """,
)
def io_pyarrow_dataset(spark, sf_dir):
    import tempfile

    import pyarrow.dataset as pads
    import pyarrow.feather as feather

    from polars_spark.sources import scan_pyarrow_dataset

    nat = ltable(spark, sf_dir, "nation")
    tbl = nat.to_arrow()
    d = tempfile.mkdtemp(prefix="pls_pads_q_")
    # two fragments -> two input partitions
    feather.write_feather(tbl.slice(0, 12), f"{d}/a.arrow", compression="uncompressed")
    feather.write_feather(tbl.slice(12), f"{d}/b.arrow", compression="uncompressed")
    ds = pads.dataset(d, format="arrow")
    back = scan_pyarrow_dataset(ds, spark=spark)
    return (
        back.group_by("n_regionkey")
        .agg(pl.len().alias("n"), pl.col("n_nationkey").sum().alias("keysum"))
        .to_spark()
    )


@query(
    "agg_list_family",
    # The length-changing exprs (sort/top_k/slice/get) in agg context yield
    # lists; money goes through integer cents so list equality is exact.
    oracle="""
    WITH t AS (
      SELECT c_nationkey, c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS balc
      FROM customer
    )
    SELECT c_nationkey,
           array_to_string(list_transform(list_sort(list(balc)),
                           x -> coalesce(CAST(x AS VARCHAR), 'null')), ',') AS sorted_bals,
           array_to_string(list_transform(list_sort(list(balc), 'DESC')[1:2],
                           x -> coalesce(CAST(x AS VARCHAR), 'null')), ',') AS top2,
           array_to_string(list_transform(list_sort(list(balc))[1:2],
                           x -> coalesce(CAST(x AS VARCHAR), 'null')), ',') AS bottom2,
           (list(balc ORDER BY c_custkey))[1]                      AS first_bal,
           array_to_string(list_transform((list(balc ORDER BY c_custkey))[-2:],
                           x -> coalesce(CAST(x AS VARCHAR), 'null')), ',') AS last2_in_order
    FROM t GROUP BY c_nationkey
    """,
)
def agg_list_family(spark, sf_dir):
    """Agg-context list family (sort/top_k/bottom_k/get/slice over the
    order-preserving implode) — reference length-changing exprs inside
    group_by().agg().  FINAL lists render as CSV strings (driver hash
    canon is scalar-only, r10 rule); the Expr API still yields lists."""
    cust = (
        ltable(spark, sf_dir, "customer")
        .sort("c_custkey")
        .with_columns((pl.col("c_acctbal") * 100).round(0).cast("bigint").alias("balc"))
    )
    out = (
        cust.group_by("c_nationkey")
        .agg(
            pl.col("balc").sort().alias("sorted_bals"),
            pl.col("balc").top_k(2).alias("top2"),
            pl.col("balc").bottom_k(2).alias("bottom2"),
            pl.col("balc").get(0).alias("first_bal"),
            pl.col("balc").slice(-2, 2).alias("last2_in_order"),
        )
        .to_spark()
    )
    csv = lambda c: F.array_join(F.transform(c, lambda x: x.cast("string")), ",", "null")
    return out.select(
        "c_nationkey",
        csv("sorted_bals").alias("sorted_bals"),
        csv("top2").alias("top2"),
        csv("bottom2").alias("bottom2"),
        "first_bal",
        csv("last2_in_order").alias("last2_in_order"),
    )
