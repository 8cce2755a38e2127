"""IO round trips: csv / ndjson scans, parquet + partitioned sinks."""

import os

import pandas as pd

from tests.conftest import rows


def test_csv_round_trip(pl, lf, tmp_path):
    f = lf(a=[1, 2, 3], b=["x", "y", "z"])
    path = str(tmp_path / "out_csv")
    f.sink_csv(path)
    back = pl.scan_csv(path)
    assert rows(back, sort_by="a") == [(1, "x"), (2, "y"), (3, "z")]


def test_ndjson_round_trip(pl, lf, tmp_path):
    f = lf(a=[1, 2], s=["p", "q"])
    path = str(tmp_path / "out_json")
    f.sink_ndjson(path)
    back = pl.scan_ndjson(path)
    assert rows(back, sort_by="a") == [(1, "p"), (2, "q")]


def test_parquet_sink_partitioned(pl, lf, tmp_path):
    f = lf(g=["a", "a", "b"], v=[1, 2, 3])
    path = str(tmp_path / "out_parq")
    f.sink_parquet(path, partition_by="g")
    # hive layout on disk
    assert any(d.startswith("g=") for d in os.listdir(path))
    back = pl.scan_parquet(path)
    pdf = back.collect()
    assert sorted(pdf["v"].tolist()) == [1, 2, 3]
    assert sorted(pdf["g"].astype(str).tolist()) == ["a", "a", "b"]


def test_scan_csv_schema_inference(pl, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    f = pl.scan_csv(str(p))
    assert f.schema["a"] in ("int", "bigint")
    assert rows(f, sort_by="a") == [(1, "x"), (2, "y")]


def test_include_file_paths(pl, lf, tmp_path):
    f = lf(x=[1])
    path = str(tmp_path / "fp")
    f.sink_parquet(path)
    back = pl.scan_parquet(path, include_file_paths="src")
    pdf = back.collect()
    assert pdf["src"].str.contains("fp").all()


def test_io_plugin_datasource(spark, pl):
    from polars_spark.io_plugins import register_io_source, scan_io_source

    def gen(part_idx):
        for i in range(3):
            yield (part_idx, i, float(part_idx * 10 + i))

    register_io_source(
        "test_gen_src", schema="part int, i int, v double", generator=gen,
        num_partitions=2, spark=spark,
    )
    lf = scan_io_source("test_gen_src", spark=spark)
    pdf = lf.collect()
    assert len(pdf) == 6
    assert sorted(pdf["part"].unique().tolist()) == [0, 1]
    assert pdf["v"].sum() == (0 + 1 + 2) + (10 + 11 + 12)


def test_read_json_multiline(pl, tmp_path):
    p = tmp_path / "doc.json"
    p.write_text('[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]')
    f = pl.scan_parquet if False else None  # noqa
    from polars_spark.sources import read_json

    out = read_json(str(p))
    assert rows(out, sort_by="a") == [(1, "x"), (2, "y")]


def test_to_arrow(pl, lf_module_missing=None):
    import polars_spark as plm
    import pandas as pd

    f = plm.from_pandas(pd.DataFrame({"x": [1, 2]}))
    t = f.to_arrow()
    assert t.num_rows == 2 and t.column_names == ["x"]


def test_hive_partition_pruning(pl, lf, tmp_path, spark):
    """A filter on the partition column must prune at scan time
    (PartitionFilters in the plan), not post-filter."""
    f = lf(g=["a", "a", "b", "c"], v=[1, 2, 3, 4])
    path = str(tmp_path / "pruned")
    f.sink_parquet(path, partition_by="g")
    back = pl.scan_parquet(path).filter(pl.col("g") == "a")
    plan = back.explain("formatted")  # returns the plan string (polars API)
    assert "PartitionFilters" in plan and "g" in plan.split("PartitionFilters", 1)[1][:120]
    assert len(back.collect()) == 2


def test_multifile_scan_list(pl, lf, tmp_path):
    a, b = str(tmp_path / "m1"), str(tmp_path / "m2")
    lf(x=[1, 2]).sink_parquet(a)
    lf(x=[3]).sink_parquet(b)
    out = pl.scan_parquet([a, b]).collect()
    assert sorted(out["x"].tolist()) == [1, 2, 3]


def test_scan_pyarrow_dataset_and_from_arrow(pl, spark, tmp_path):
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.feather as feather

    from polars_spark.sources import from_arrow, scan_pyarrow_dataset

    t1 = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    t2 = pa.table({"a": [4, 5], "b": ["p", "q"]})
    feather.write_feather(t1, str(tmp_path / "f1.arrow"), compression="uncompressed")
    feather.write_feather(t2, str(tmp_path / "f2.arrow"), compression="uncompressed")
    ds = pads.dataset(str(tmp_path), format="arrow")
    out = scan_pyarrow_dataset(ds, spark=spark).collect()
    assert sorted(out["a"].tolist()) == [1, 2, 3, 4, 5]

    # from_arrow: pyarrow table and a C-stream-capable object
    assert sorted(from_arrow(t1, spark=spark).collect()["a"].tolist()) == [1, 2, 3]
    import duckdb

    res = duckdb.sql("SELECT 7 AS x UNION ALL SELECT 8").arrow()
    assert sorted(from_arrow(res, spark=spark).collect()["x"].tolist()) == [7, 8]


def test_from_repr_roundtrip(pl):
    txt = """
    shape: (3, 3)
    ┌─────┬──────┬───────┐
    │ a   ┆ b    ┆ s     │
    │ --- ┆ ---  ┆ ---   │
    │ i64 ┆ f64  ┆ str   │
    ╞═════╪══════╪═══════╡
    │ 1   ┆ 1.5  ┆ x     │
    │ 2   ┆ null ┆ y     │
    │ 3   ┆ 3.25 ┆ null  │
    └─────┴──────┴───────┘
    """
    f = pl.from_repr(txt).collect()
    assert f["a"].tolist() == [1, 2, 3]
    assert f["s"].tolist()[0:2] == ["x", "y"] and pd.isna(f["s"][2])
    import math
    assert f["b"][0] == 1.5 and math.isnan(f["b"][1]) and f["b"][2] == 3.25


def test_bucketed_table_join_eliminates_shuffle(pl, spark):
    """sink_bucketed_table + scan_table: a sort-merge join of two tables
    bucketed+sorted on the join key runs with ZERO Exchange and ZERO Sort
    nodes — write-time co-location replaces the per-query shuffle (the
    canonical repeated-join strategy at 100 TB)."""
    import contextlib
    import io

    pdf = pd.DataFrame({"k": list(range(500)), "v": [float(i) for i in range(500)]})
    f = pl.from_pandas(pdf)
    f.sink_bucketed_table("bt_test_a", bucket_by="k", num_buckets=4, sort_by="k")
    f.sink_bucketed_table("bt_test_b", bucket_by="k", num_buckets=4, sort_by="k")
    from polars_spark.sources import scan_table

    j = (
        scan_table("bt_test_a", spark=spark)
        .hint("merge")  # suppress the tiny-table broadcast so the plan shows the bucket payoff
        .join(scan_table("bt_test_b", spark=spark), on="k", suffix="_r")
    )
    df = j.to_spark()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 0
    assert df.count() == 500


def test_bucketed_table_overwrite_survives_stale_location(pl, spark):
    pdf = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    f = pl.from_pandas(pdf)
    f.sink_bucketed_table("bt_test_c", bucket_by="k", num_buckets=2)
    f.sink_bucketed_table("bt_test_c", bucket_by="k", num_buckets=2)  # re-create ok
    from polars_spark.sources import scan_table

    assert scan_table("bt_test_c", spark=spark).collect().shape[0] == 2


class TestZorderSink:
    def test_zorder_tightens_file_stats_on_both_dims(self, spark, tmp_path):
        """The 100 TB economics of sink_parquet_zorder: per-file min/max
        footers must be tight on BOTH clustered dims (single-column sort
        only tightens one), so selective readers prune files on either."""
        import pyarrow.parquet as pq

        from polars_spark.functions import sink_parquet_zorder

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        glob = ev.selectExpr(
            "min(user_id) lu", "max(user_id) hu", "min(value) lv", "max(value) hv"
        ).collect()[0]
        span_u = glob["hu"] - glob["lu"]
        span_v = glob["hv"] - glob["lv"]

        plain_dir = str(tmp_path / "plain")
        ev.repartition(8).write.parquet(plain_dir)
        z_dir = str(tmp_path / "zorder")
        sink_parquet_zorder(ev, z_dir, ["user_id", "value"], bits=8, num_files=8)

        def mean_widths(d):
            import glob as g

            wu, wv = [], []
            for f in g.glob(f"{d}/*.parquet"):
                md = pq.ParquetFile(f).metadata
                names = [md.schema.column(j).name for j in range(md.num_columns)]
                iu, iv = names.index("user_id"), names.index("value")
                lo_u = min(md.row_group(i).column(iu).statistics.min for i in range(md.num_row_groups))
                hi_u = max(md.row_group(i).column(iu).statistics.max for i in range(md.num_row_groups))
                lo_v = min(md.row_group(i).column(iv).statistics.min for i in range(md.num_row_groups))
                hi_v = max(md.row_group(i).column(iv).statistics.max for i in range(md.num_row_groups))
                wu.append((hi_u - lo_u) / span_u)
                wv.append((hi_v - lo_v) / span_v)
            return sum(wu) / wu.__len__(), sum(wv) / wv.__len__()

        pu, pv = mean_widths(plain_dir)
        zu, zv = mean_widths(z_dir)
        # round-robin files cover most of the range on both dims (value is
        # slightly under full width at 125 rows/file — sampling narrowing)
        assert pu > 0.9 and pv > 0.6, (pu, pv)
        # z-ordered files are materially tighter on BOTH dims at once
        assert zu < 0.5 and zv < 0.5, (zu, zv)
        assert zu < 0.6 * pu and zv < 0.7 * pv, (zu, zv, pu, pv)
        # and the data round-trips
        assert spark.read.parquet(z_dir).count() == ev.count()

    def test_morton_interleave_bit_layout(self, spark):
        from polars_spark.functions import morton_interleave
        from pyspark.sql import functions as F

        df = spark.range(1).select(
            morton_interleave([F.lit(0b101), F.lit(0b011)], bits=3).alias("z")
        )
        # a=101 at even bits (z0,z2,z4), b=011 at odd bits (z1,z3,z5):
        # z = a0 + 2*b0 + 4*a1 + 8*b1 + 16*a2 + 32*b2 = 1+2+0+8+16+0 = 27
        assert df.collect()[0]["z"] == 27


def test_scan_ipc_distributed_multishard(pl, tmp_path):
    # a directory of IPC shards must be read executor-side: one input
    # partition per file through the Python DataSource path (nothing
    # funnels through the driver), same as scan_pyarrow_dataset
    import pyarrow as pa
    import pyarrow.feather as feather

    paths = []
    for i in range(4):
        t = pa.table({"a": list(range(i * 5, i * 5 + 5)), "s": [f"v{j}" for j in range(5)]})
        p = str(tmp_path / f"shard{i}.arrow")
        feather.write_feather(t, p)
        paths.append(p)
    lf = pl.scan_ipc(paths)
    sdf = lf.to_spark()
    assert sdf.rdd.getNumPartitions() == 4  # one per shard
    pdf = lf.collect()
    assert sorted(pdf["a"].tolist()) == list(range(20))


def test_partition_by_config_sink(pl, lf, tmp_path):
    import os

    f = lf(year=[2026, 2026, 1970, 1970, 1970], v=[1, 2, 3, 4, 5])
    base = str(tmp_path / "pbk")
    f.sink_parquet(pl.PartitionBy(base, key="year"))
    assert sorted(d for d in os.listdir(base) if d.startswith("year=")) == [
        "year=1970", "year=2026",
    ]
    back = pl.scan_parquet(base).collect()
    assert sorted(back["v"].tolist()) == [1, 2, 3, 4, 5]

    # max_rows_per_file splits files
    base2 = str(tmp_path / "pmx")
    f.sink_parquet(pl.PartitionBy(base2, max_rows_per_file=2))
    n_files = sum(1 for n in os.listdir(base2) if n.endswith(".parquet"))
    assert n_files >= 2


def test_catalog_over_spark_catalog(pl, lf, spark):
    cat = pl.Catalog()
    assert "default" in cat.list_namespaces()
    f = lf(a=[1, 2, 3])
    cat.write_table(f, "cat_t1", mode="overwrite")
    assert "cat_t1" in cat.list_tables()
    back = cat.load_table("cat_t1").collect()
    assert sorted(back["a"].tolist()) == [1, 2, 3]
    cat.drop_table("cat_t1")
    assert "cat_t1" not in cat.list_tables()


def test_scan_compat_kwargs_and_merge_schema(pl, lf, tmp_path):
    # two files with different schemas: mergeSchema unions by name
    d = str(tmp_path / "ms")
    lf(a=[1, 2]).to_spark().write.parquet(d + "/f1")
    lf(a=[3], b=["x"]).to_spark().write.parquet(d + "/f2")
    out = pl.scan_parquet([d + "/f1", d + "/f2"], allow_missing_columns=True).collect()
    assert sorted(out.columns) == ["a", "b"]
    assert out["b"].isna().sum() == 2
    # n_rows limit + inert polars kwargs accepted
    top = pl.scan_parquet(d + "/f1", n_rows=1, rechunk=True, low_memory=True, cache=False)
    assert len(top.collect()) == 1


def test_csv_polars_options_round7(pl, tmp_path):
    p = str(tmp_path / "o.csv")
    with open(p, "w") as fh:
        fh.write("x,y\n1,a\n2,b\n3,c\n")
    assert len(pl.read_csv(p, skip_rows_after_header=1).collect()) == 2
    assert pl.read_csv(p, has_header=False).collect().columns.tolist() == [
        "column_1",
        "column_2",
    ]
    assert pl.read_csv(p, new_columns=["p", "q"]).collect().columns.tolist() == ["p", "q"]
    assert pl.read_csv(p, columns=["y"]).collect().columns.tolist() == ["y"]
    assert pl.read_csv(p, infer_schema_length=0).collect()["x"].tolist() == ["1", "2", "3"]
    assert pl.read_csv(p, schema_overrides={"x": pl.Float64}).collect()["x"].tolist() == [
        1.0,
        2.0,
        3.0,
    ]
    nd = str(tmp_path / "o.ndjson")
    with open(nd, "w") as fh:
        fh.write('{"a":1}\n{"a":2}\n')
    assert len(pl.read_ndjson(nd, n_rows=1).collect()) == 1


def test_sink_parquet_cluster_by_disjoint_file_ranges(pl, lf, tmp_path, spark):
    """cluster_by writes range-disjoint files: every output file's parquet
    footer (min, max) interval for the cluster key must not overlap any
    other file's — the property that lets min/max stats prune whole files
    at scan time."""
    import glob

    import pyarrow.parquet as pq

    df = pl.DataFrame({"k": list(range(1000)), "v": ["x"] * 1000})
    # shuffle the rows so clustering has to do real work
    df = df.sort(pl.col("k").hash(seed=1) if hasattr(pl.col("k"), "hash") else "k")
    path = str(tmp_path / "clustered")
    df.sink_parquet(path, cluster_by="k", cluster_files=4)
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1  # actually split into multiple files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"
    # read back intact
    assert pl.read_parquet(path).height == 1000
