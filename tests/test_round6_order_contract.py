"""Round 6: the deferred scan file-order contract (SURVEY §1.1, VERDICT r5 item 2).

polars semantics: row order on a plain scan IS the file order (reference
polars-plan/src/plans/functions/mod.rs:33 RowIndex numbers scan order).
The repo implements it as a DEFERRED contract: scans carry a thunk that
adds ONE hidden (file, block-offset, read-position) struct column only
when an order-sensitive operation actually consumes row order.  These
tests pin both halves: the semantics (cum/shift/first/with_row_index in
file order, across files and through filters) and the ELISION rule (plans
of order-free queries contain no input_file_name / no extra window).
"""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import polars_spark as pl

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def three_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("ordctr")
    pq.write_table(pa.table({"x": [1, 2, 3], "g": ["a", "a", "b"]}), d / "a.parquet")
    pq.write_table(pa.table({"x": [4, 5, 6], "g": ["b", "a", "b"]}), d / "b.parquet")
    pq.write_table(pa.table({"x": [7, 8, 9], "g": ["a", "b", "a"]}), d / "c.parquet")
    return str(d)


def test_cum_sum_on_plain_scan_follows_file_order(three_files):
    lf = pl.scan_parquet(f"{three_files}/*.parquet")
    got = lf.select(pl.col("x").cum_sum().alias("c")).collect()["c"].tolist()
    assert sorted(got) == [1, 3, 6, 10, 15, 21, 28, 36, 45]


def test_with_row_index_numbers_file_order(three_files):
    lf = pl.scan_parquet(f"{three_files}/*.parquet")
    out = lf.with_row_index("i").sort("i").collect()
    assert out["x"].tolist() == [1, 2, 3, 4, 5, 6, 7, 8, 9]


def test_explicit_path_list_order_not_lexicographic(three_files):
    # polars: given-list order wins over lexicographic
    lf = pl.scan_parquet(
        [f"{three_files}/c.parquet", f"{three_files}/a.parquet", f"{three_files}/b.parquet"]
    )
    out = lf.with_row_index("i").sort("i").collect()
    assert out["x"].tolist() == [7, 8, 9, 1, 2, 3, 4, 5, 6]


def test_order_survives_filter_and_with_columns(three_files):
    lf = (
        pl.scan_parquet(f"{three_files}/*.parquet")
        .filter(pl.col("x") != 5)
        .with_columns(y=pl.col("x") * 10)
    )
    got = lf.select(pl.col("y").cum_sum().alias("c")).collect()["c"].tolist()
    # file order minus the filtered row: 1,2,3,4,6,7,8,9 (x), *10 cumulative
    assert sorted(got) == [10, 30, 60, 100, 160, 230, 310, 400]


def test_shift_first_last_tail_reverse(three_files):
    lf = pl.scan_parquet(f"{three_files}/*.parquet")
    s = lf.select(pl.col("x").shift(1).alias("s")).collect()["s"]
    assert sorted(v for v in s.tolist() if v == v) == [1, 2, 3, 4, 5, 6, 7, 8]
    assert lf.select(pl.col("x").first()).collect().iloc[0, 0] == 1
    assert lf.select(pl.col("x").last()).collect().iloc[0, 0] == 9
    assert sorted(lf.tail(2).collect()["x"].tolist()) == [8, 9]
    assert lf.reverse().with_row_index("i").sort("i").collect()["x"].tolist() == list(
        range(9, 0, -1)
    )


def test_grouped_first_and_implode_follow_file_order(three_files):
    lf = pl.scan_parquet(f"{three_files}/*.parquet")
    out = (
        lf.group_by("g")
        .agg(
            pl.col("x").first().alias("f"),
            pl.col("x").implode().alias("xs"),
        )
        .sort("g")
        .collect()
    )
    # file order: a:[1,2,5,7,9] b:[3,4,6,8]
    assert out["f"].tolist() == [1, 3]
    assert [list(v) for v in out["xs"]] == [[1, 2, 5, 7, 9], [3, 4, 6, 8]]


def test_unique_keep_first_on_plain_scan(three_files):
    lf = pl.scan_parquet(f"{three_files}/*.parquet")
    out = lf.unique(subset=["g"], keep="first").sort("g").collect()
    assert out["x"].tolist() == [1, 3]  # first a-row and first b-row in file order


def test_over_partition_cum_follows_file_order(three_files):
    lf = pl.scan_parquet(f"{three_files}/*.parquet")
    out = (
        lf.with_columns(cs=pl.col("x").cum_sum().over("g"))
        .sort("g", "x")
        .collect()
    )
    # group a in file order 1,2,5,7,9 -> 1,3,8,15,24 ; b: 3,4,6,8 -> 3,7,13,21
    assert out["cs"].tolist() == [1, 3, 8, 15, 24, 3, 7, 13, 21]


def test_elision_order_free_plan_has_no_order_machinery():
    lf = pl.scan_parquet(f"{SF}/lineitem.parquet")
    plan = (
        lf.filter(pl.col("l_quantity") > 10)
        .group_by("l_returnflag")
        .agg(pl.col("l_extendedprice").sum().alias("s"))
        .to_spark()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "input_file_name" not in plan
    assert "__row_idx__" not in plan
    assert "monotonically_increasing_id" not in plan


def test_tpch_q1_plan_stays_order_free():
    from polars_spark.queries import QUERIES
    from polars_spark.session import get_spark

    spark = get_spark("order-elide")
    df = QUERIES["q1_pricing_summary"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "input_file_name" not in plan
    assert "__row_idx__" not in plan


def test_materialization_is_plan_only_no_shuffle(three_files):
    # paying the contract adds a scan-side struct column: the cum_sum plan
    # must contain the order column but NO exchange besides the final
    # single-partition window Spark needs for a global running fold
    lf = pl.scan_parquet(f"{three_files}/a.parquet")
    df = lf.select(pl.col("x").cum_sum().alias("c")).to_spark()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "input_file_name" in plan


def test_scan_csv_and_ndjson_carry_the_contract(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("x\n3\n1\n2\n")
    got = pl.scan_csv(str(p)).select(pl.col("x").cum_sum().alias("c")).collect()
    assert sorted(got["c"].tolist()) == [3, 4, 6]

    j = tmp_path / "t.ndjson"
    j.write_text('{"x": 5}\n{"x": 1}\n{"x": 2}\n')
    got = pl.scan_ndjson(str(j)).select(pl.col("x").cum_sum().alias("c")).collect()
    assert sorted(got["c"].tolist()) == [5, 6, 8]


def test_all_22_tpch_plans_stay_order_free():
    """The elision guarantee at full width: none of the 22 TPC-H plans pays
    for the scan-order contract (no order column, no input_file_name, no
    per-partition numbering anywhere in their executed plans)."""
    from polars_spark.queries import QUERIES
    from polars_spark.session import get_spark

    spark = get_spark("order-elide-22")
    names = [n for n in QUERIES if n.startswith("q") and n[1].isdigit()]
    assert len(names) >= 22
    for n in names:
        plan = (
            QUERIES[n](spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        assert "input_file_name" not in plan, n
        assert "__row_idx__" not in plan, n
        assert "monotonically_increasing_id" not in plan, n


def test_concat_of_scans_keeps_frame_sequence_order(tmp_path):
    # polars: concat order = frames in GIVEN sequence (zz before aa here,
    # beating lexicographic file order), file order within each
    pq.write_table(pa.table({"x": [1, 2, 3]}), tmp_path / "zz.parquet")
    pq.write_table(pa.table({"x": [4, 5, 6]}), tmp_path / "aa.parquet")
    a = pl.scan_parquet(str(tmp_path / "zz.parquet"))
    b = pl.scan_parquet(str(tmp_path / "aa.parquet"))
    cat = pl.concat([a, b])
    assert cat.with_row_index("i").sort("i").collect()["x"].tolist() == [1, 2, 3, 4, 5, 6]
    got = cat.select(pl.col("x").cum_sum().alias("c")).collect()["c"].tolist()
    assert sorted(got) == [1, 3, 6, 10, 15, 21]
    # pre-concat filters compose with the contract
    cat2 = pl.concat([a.filter(pl.col("x") != 2), b])
    assert cat2.with_row_index("i").sort("i").collect()["x"].tolist() == [1, 3, 4, 5, 6]
    # and the contract stays elided for order-free consumers
    plan = cat.filter(pl.col("x") > 1).to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "input_file_name" not in plan


def test_group_by_maintain_order_on_plain_scan():
    # polars: maintain_order=True emits groups in first-appearance order,
    # which on a plain scan is defined by FILE order (deferred contract)
    lf = pl.scan_parquet(f"{SF}/nation.parquet")
    out = lf.group_by("n_regionkey", maintain_order=True).agg(pl.len().alias("n"))
    import duckdb

    exp = (
        duckdb.sql(f"select n_regionkey from read_parquet('{SF}/nation.parquet')")
        .df()["n_regionkey"]
        .drop_duplicates()
        .tolist()
    )
    assert out.collect()["n_regionkey"].tolist() == exp


def test_explode_keeps_scan_order_contract(tmp_path):
    pq.write_table(
        pa.table({"k": [1, 2], "xs": [[10, 11, 12], [20, 21]]}), tmp_path / "a.parquet"
    )
    pq.write_table(pa.table({"k": [3], "xs": [[30, 31]]}), tmp_path / "b.parquet")
    lf = pl.scan_parquet(f"{tmp_path}/*.parquet").explode("xs")
    out = lf.with_row_index("i").sort("i").collect()
    # polars explode order: source rows in file order, list elements in order
    assert out["xs"].tolist() == [10, 11, 12, 20, 21, 30, 31]


def test_file_order_across_partition_splits(tmp_path):
    """One file split into MANY Spark partitions (maxPartitionBytes) still
    numbers by exact file position — the block-offset component of the
    hidden order key is what makes the contract survive split planning,
    which schedules splits by size, not by offset."""
    import numpy as np

    n = 200_000
    t = pa.table({"i": np.arange(n), "x": np.random.RandomState(0).rand(n)})
    pq.write_table(t, tmp_path / "big.parquet", row_group_size=20_000)
    from polars_spark.session import get_spark

    spark = get_spark()
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
    try:
        lf = pl.scan_parquet(str(tmp_path / "big.parquet"))
        assert lf.to_spark().rdd.getNumPartitions() > 4
        out = (
            lf.with_row_index("rn")
            .to_spark()
            .selectExpr("sum(cast(rn = i as bigint)) as m", "count(*) as n")
            .collect()[0]
        )
        assert out["m"] == out["n"] == n
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_join_preserves_side_order():
    left = pl.DataFrame({"k": [2, 1], "lv": ["b", "a"]})
    right = pl.DataFrame({"k": [3, 1, 2], "rv": ["z", "x", "y"]})
    # left/inner joins keep LEFT insertion order (polars in-memory engine)
    assert left.join(right, on="k", how="left").collect()["lv"].tolist() == ["b", "a"]
    assert left.join(right, on="k", how="inner").collect()["lv"].tolist() == ["b", "a"]
    # right joins keep RIGHT order
    assert left.join(right, on="k", how="right").collect()["rv"].tolist() == ["z", "x", "y"]
    # semi/anti are left filters: left order kept (k=2 not in {3,1})
    assert left.join(right.head(2), on="k", how="semi").collect()["lv"].tolist() == ["a"]
    assert left.join(right.head(2), on="k", how="anti").collect()["lv"].tolist() == ["b"]


def test_order_contract_randomized_against_pandas_simulation(tmp_path):
    """Seeded randomized property check: for random multi-file datasets and
    random filter prefixes, cum_sum/shift/with_row_index on the scan must
    equal a pandas simulation of polars file-order semantics."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(42)
    for case in range(6):
        d = tmp_path / f"case{case}"
        d.mkdir()
        n_files = rng.randint(1, 4)
        parts = []
        for i in range(n_files):
            n = rng.randint(1, 30)
            pdf = pd.DataFrame(
                {"x": rng.randint(0, 50, n).astype("int64"),
                 "y": rng.rand(n)}
            )
            pq.write_table(pa.Table.from_pandas(pdf), d / f"f{i:02d}.parquet")
            parts.append(pdf)
        sim = pd.concat(parts, ignore_index=True)  # lexicographic = written order

        lf = pl.scan_parquet(f"{d}/*.parquet")
        thresh = int(rng.randint(0, 50))
        lf2 = lf.filter(pl.col("x") >= thresh)
        sim2 = sim[sim["x"] >= thresh].reset_index(drop=True)

        got = (
            lf2.with_row_index("rn")
            .select("rn", pl.col("x").cum_sum().alias("cs"),
                    pl.col("x").shift(1).alias("sh"))
            .sort("rn")
            .collect()
        )
        exp_cs = sim2["x"].cumsum().tolist()
        exp_sh = sim2["x"].shift(1).tolist()
        assert got["cs"].tolist() == exp_cs, f"case {case} cum_sum"
        sh = got["sh"].tolist()
        assert all(
            (a != a and b != b) or a == b for a, b in zip(sh, exp_sh)
        ), f"case {case} shift"
