"""first/last_non_null, nan-propagating min/max, arg_min/arg_max, bitwise,
rolling quantile/median, cube/rollup, sample, collect_batches, UDF exprs,
date ranges, business days."""

import datetime as dt

import pandas as pd
import pytest

from tests.conftest import rows


def test_first_last_non_null(pl, lf):
    f = lf(g=["a", "a", "a", "b"], x=[None, 1.0, 2.0, None]).with_row_index("i")
    out = f.group_by("g").agg(
        pl.col("x").first_non_null().alias("fnn"),
        pl.col("x").last_non_null().alias("lnn"),
    )
    assert rows(out, sort_by="g") == [("a", 1.0, 2.0), ("b", None, None)]


def test_nan_min_max(pl, lf):
    f = lf(g=["a", "a", "b"], x=[1.0, 2.0, 3.0]).with_columns(
        pl.when(pl.col("x") == 2.0).then(pl.lit(float("nan"))).otherwise(pl.col("x")).alias("x")
    )
    out = f.group_by("g").agg(
        pl.col("x").nan_max().alias("nmax"),
        pl.col("x").max().alias("mx"),
    )
    pdf = out.collect().sort_values("g", ignore_index=True)
    import math

    assert math.isnan(pdf["nmax"][0])  # group a contains a NaN -> propagate
    assert pdf["nmax"][1] == 3.0


def test_arg_min_max(pl, lf):
    f = lf(x=[5.0, 1.0, 9.0, 1.0]).with_row_index("i")
    out = f.select(pl.col("x").arg_min().alias("amin"), pl.col("x").arg_max().alias("amax"))
    assert rows(out) == [(1, 2)]  # first minimum wins


def test_bitwise(pl, lf):
    f = lf(x=[0b1011, 0b0110, 0b0001])
    per_row = f.select(
        pl.col("x").bitwise_count_ones().alias("ones"),
        (pl.col("x") ^ 0b1111).alias("xor_lit"),
    ).collect()
    assert sorted(per_row["ones"].tolist()) == [1, 2, 3]
    aggs = f.select(
        pl.col("x").bitwise_and().alias("band"),
        pl.col("x").bitwise_or().alias("bor"),
        pl.col("x").bitwise_xor().alias("bxor"),
    ).collect()
    assert aggs["band"][0] == 0b0000 and aggs["bor"][0] == 0b1111 and aggs["bxor"][0] == 0b1100


def test_rolling_median_quantile(pl, lf):
    f = lf(x=[1.0, 9.0, 2.0, 8.0, 3.0]).with_row_index("i")
    out = f.with_columns(
        pl.col("x").rolling_median(3).alias("rm"),
        pl.col("x").rolling_quantile(0.5, window_size=3, min_samples=1).alias("rq"),
    ).sort("i")
    r = rows(out)
    assert [t[2] for t in r] == [None, None, 2.0, 8.0, 3.0]
    assert [t[3] for t in r] == [1.0, 5.0, 2.0, 8.0, 3.0]


def test_cube_rollup(pl, lf):
    f = lf(a=["x", "x", "y"], b=["p", "q", "p"], v=[1, 2, 4])
    cube = f.cube("a", "b").agg(pl.col("v").sum().alias("s")).collect()
    # 3 present combos + 2 a-margins + 2 b-margins + grand total = 8
    assert len(cube) == 8
    grand = cube[cube["a"].isna() & cube["b"].isna()]["s"].iloc[0]
    assert grand == 7
    roll = f.rollup("a", "b").agg(pl.col("v").sum().alias("s")).collect()
    assert len(roll) == 6


def test_sample_shuffle(pl, lf):
    f = lf(x=list(range(100)))
    s = f.sample(0.2, seed=1).collect()
    assert 5 <= len(s) <= 40
    n = f.sample(n=10, seed=1).collect()
    assert len(n) == 10
    sh = f.shuffle(seed=2).collect()
    assert sorted(sh["x"].tolist()) == list(range(100))


def test_collect_batches(pl, lf):
    f = lf(x=list(range(25))).sort("x")
    chunks = list(f.collect_batches(batch_size=10))
    assert [len(c) for c in chunks] == [10, 10, 5]
    assert chunks[0]["x"].tolist() == list(range(10))


def test_fast_count(pl, lf):
    f = lf(x=[1, 2, 3])
    assert f.height == 3
    # reference count(): 1-row frame of per-column non-null counts
    assert f.count().collect()["x"].tolist() == [3]


def test_expr_map_batches_elements(pl, lf):
    f = lf(x=[1.0, 2.0, 3.0])
    out = f.select(
        pl.col("x").map_batches(lambda s: s * 10).alias("mb"),
        pl.col("x").map_elements(lambda v: v + 0.5).alias("me"),
    )
    r = rows(out, sort_by="mb")
    assert [t[0] for t in r] == [10.0, 20.0, 30.0]
    assert [t[1] for t in r] == [1.5, 2.5, 3.5]


def test_date_ranges_business_days(pl, lf):
    f = lf(s=[dt.date(2024, 1, 1)], e=[dt.date(2024, 1, 8)])
    out = f.select(
        pl.date_ranges(pl.col("s"), pl.col("e")).alias("dr"),
        pl.business_day_count(pl.col("s"), pl.col("e")).alias("bd"),
    )
    pdf = out.collect()
    assert len(pdf["dr"][0]) == 8
    # 2024-01-01 Mon .. 2024-01-07 Sun -> 5 business days
    assert pdf["bd"][0] == 5


def test_source_stubs(pl):
    with pytest.raises(NotImplementedError):
        pl.scan_ipc  # attribute exists
        from polars_spark.sources import scan_delta

        scan_delta("s3://nope")


def test_to_dummies(pl, lf):
    f = lf(g=["a", "b", "a"], x=[1, 2, 3])
    out = f.to_dummies("g").collect()
    assert sorted(out.columns) == ["g_a", "g_b", "x"]
    assert out.sort_values("x")["g_a"].tolist() == [1, 0, 1]


def test_transpose(pl, lf):
    f = lf(a=[1, 2], b=[3, 4])
    out = f.transpose().collect()
    assert out["column"].tolist() == ["a", "b"]
    assert out["column_0"].tolist() == [1, 3]
    assert out["column_1"].tolist() == [2, 4]


def test_selectors(pl, lf):
    import polars_spark.selectors as cs

    f = lf(l_a=[1], l_b=[2.5], name=["x"], flag=[True])
    assert f.select(cs.numeric()).columns == ["l_a", "l_b"]
    assert f.select(cs.string()).columns == ["name"]
    assert f.select(cs.starts_with("l_")).columns == ["l_a", "l_b"]
    assert f.select(cs.starts_with("l_") - cs.float_()).columns == ["l_a"]
    assert f.select(~cs.boolean()).columns == ["l_a", "l_b", "name"]
    assert f.select(cs.matches("^l_")).columns == ["l_a", "l_b"]


def test_ewm_std_var_pandas_parity(pl, lf):
    data = [1.0, 3.0, 2.0, 8.0, 5.0]
    f = lf(x=data).with_row_index("i")
    out = f.with_columns(
        pl.col("x").ewm_std(alpha=0.4).alias("es"),
        pl.col("x").ewm_var(alpha=0.4).alias("ev"),
    ).sort("i")
    import pandas as pd
    import pytest as pt

    got_s = [t[2] for t in rows(out)]
    got_v = [t[3] for t in rows(out)]
    want_s = pd.Series(data).ewm(alpha=0.4, adjust=True).std().tolist()
    want_v = pd.Series(data).ewm(alpha=0.4, adjust=True).var().tolist()
    # pandas emits NaN for the first element (0/0); ours yields 0-variance -> compare rest
    assert got_s[1:] == pt.approx(want_s[1:], rel=1e-9)
    assert got_v[1:] == pt.approx(want_v[1:], rel=1e-9)


def test_rolling_skew_kurtosis(pl, lf):
    import pytest as pt

    data = [1.0, 2.0, 4.0, 8.0, 16.0]
    f = lf(x=data).with_row_index("i")
    out = f.with_columns(
        pl.col("x").rolling_skew(3).alias("sk"),
        pl.col("x").rolling_kurtosis(3).alias("ku"),
    ).sort("i")
    r = rows(out)

    def moments(win):
        n = len(win)
        m = sum(win) / n
        m2 = sum((v - m) ** 2 for v in win) / n
        m3 = sum((v - m) ** 3 for v in win) / n
        m4 = sum((v - m) ** 4 for v in win) / n
        return m3 / m2**1.5, m4 / m2**2 - 3

    for i in range(2, 5):
        sk, ku = moments(data[i - 2 : i + 1])
        assert r[i][2] == pt.approx(sk, rel=1e-9)
        assert r[i][3] == pt.approx(ku, rel=1e-9)
    assert r[0][2] is None and r[1][2] is None


def test_search_sorted_agg_groups(pl, lf):
    f = lf(x=[10.0, 20.0, 30.0, 20.0]).with_row_index("i")
    out = f.select(
        pl.col("x").search_sorted(25).alias("pos_left"),
        pl.col("x").search_sorted(20, side="right").alias("pos_right"),
    )
    assert rows(out) == [(3, 3)]
    g = lf(g=["a", "b", "a"], x=[1, 2, 3]).with_row_index("i")
    pdf = g.group_by("g").agg(pl.col("x").agg_groups().alias("idxs")).collect()
    got = {r["g"]: list(r["idxs"]) for _, r in pdf.iterrows()}
    assert got == {"a": [0, 2], "b": [1]}


def test_str_normalize(pl, lf):
    f = lf(s=["café", None])  # e + combining accent
    out = f.select(pl.col("s").str.normalize("NFC").alias("n")).collect()
    assert out["n"][0] == "café"  # precomposed é
    assert out["n"][1] is None


def test_ewm_mean_no_adjust(pl, lf):
    import pandas as pd
    import pytest as pt

    data = [1.0, 2.0, 3.0, 4.0]
    f = lf(x=data).with_row_index("i")
    out = f.with_columns(pl.col("x").ewm_mean(alpha=0.5, adjust=False).alias("e")).sort("i")
    got = [t[2] for t in rows(out)]
    want = pd.Series(data).ewm(alpha=0.5, adjust=False).mean().tolist()
    assert got == pt.approx(want, rel=1e-12)


def test_with_context(pl, lf):
    f = lf(x=[1.0, 2.0, 3.0])
    stats = f.select(pl.col("x").mean().alias("x_mean"))
    out = f.with_context(stats).with_columns((pl.col("x") - pl.col("x_mean")).alias("centered"))
    assert sorted(t[2] for t in rows(out)) == [-1.0, 0.0, 1.0]


def test_map_rows_scalar_and_inferred(pl, lf):
    f = lf(a=[1, 2, 3], b=[10.0, 20.0, 30.0])
    # scalar -> single 'map' column via return_dtype (lazy schema)
    r = sorted(t[0] for t in f.map_rows(lambda t: t[0] * 2, return_dtype=int).collect().itertuples(index=False, name=None))
    assert r == [2, 4, 6]
    # tuple -> column_0/column_1 via driver-side schema inference
    out = f.map_rows(lambda t: (t[0] + 1, t[1] / 2)).collect()
    assert sorted(out.columns) == ["column_0", "column_1"]
    assert sorted(out["column_0"]) == [2, 3, 4]


class TestTestingModule:
    def test_assert_frame_equal(self, pl):
        import pandas as pd

        from polars_spark import testing as plt

        a = pl.from_pandas(pd.DataFrame({"x": [1.0, 2.0], "y": ["a", "b"]}))
        b = pl.from_pandas(pd.DataFrame({"x": [1.0, 2.0000000001], "y": ["a", "b"]}))
        plt.assert_frame_equal(a, b)  # within tolerance
        import pytest

        with pytest.raises(AssertionError, match="value mismatch"):
            plt.assert_frame_equal(a, b, check_exact=True)
        # row order toggle
        c = pl.from_pandas(pd.DataFrame({"x": [2.0, 1.0], "y": ["b", "a"]}))
        with pytest.raises(AssertionError):
            plt.assert_frame_equal(a, c)
        plt.assert_frame_equal(a, c, check_row_order=False)
        # column order toggle
        d = pl.from_pandas(pd.DataFrame({"y": ["a", "b"], "x": [1.0, 2.0]}))
        with pytest.raises(AssertionError, match="columns differ"):
            plt.assert_frame_equal(a, d)
        plt.assert_frame_equal(a, d, check_column_order=False)
        plt.assert_frame_not_equal(a, b, check_exact=True)

    def test_assert_series_equal(self, pl):
        import pandas as pd
        import pytest

        from polars_spark import testing as plt

        plt.assert_series_equal(pd.Series([1.0, None], name="s"), pd.Series([1.0, None], name="s"))
        with pytest.raises(AssertionError, match="name mismatch"):
            plt.assert_series_equal(pd.Series([1], name="a"), pd.Series([1], name="b"))
        with pytest.raises(AssertionError, match="value mismatch"):
            plt.assert_series_equal(
                pd.Series([1.0], name="s"), pd.Series([2.0], name="s")
            )


class TestHeavyHitters:
    def test_matches_exact_topk_on_zipf(self, spark):
        """Zipf-ish stream with 500 distinct items but capacity 32: the
        sketch pass must still surface the true top-10 (exact recount)."""
        from pyspark.sql import functions as F

        from polars_spark.functions import heavy_hitters

        # item i appears floor(5000/(i+1)) times -> heavy head, long tail
        df = (
            spark.range(500)
            .select(F.col("id"), F.explode(F.sequence(F.lit(1), (F.lit(5000) / (F.col("id") + 1)).cast("int"))).alias("rep"))
            .select(F.concat(F.lit("item"), F.format_string("%03d", F.col("id"))).alias("item_str"))
            .repartition(8)
        )
        got = [(r["item"], r["item_count"]) for r in heavy_hitters(df, "item_str", k=10, capacity=32).collect()]
        exact = [
            (r["item_str"], r["n"])
            for r in df.groupBy("item_str").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("item_str")).limit(10).collect()
        ]
        assert got == exact

    def test_small_cardinality_exact(self, spark):
        from pyspark.sql import functions as F

        from polars_spark.functions import heavy_hitters

        df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3, "x string")
        got = [(r["item"], r["item_count"]) for r in heavy_hitters(df, "x", k=2).collect()]
        assert got == [("a", 5), ("b", 3)]  # tie b/c broken by item asc


def test_headline_plans_free_of_scale_hazards(spark):
    """In-suite twin of tools/audit_plans.py for a representative slice:
    no non-scalar SinglePartition exchange, no row-at-a-time Python UDF,
    no synthesized cartesian product; filtered parquet scans keep their
    pushed filters."""
    import sys

    sys.path.insert(0, ".")
    from tools.audit_plans import single_partition_hazards

    from polars_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in ["q1_pricing_summary", "q6_forecast_revenue", "win_shift_cum",
                 "web_domain_cap", "sim_int8_topk"]:
        plan = QUERIES[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert not single_partition_hazards(plan), name
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    # pushdown proof: q6's selective filter reaches the parquet scan
    plan6 = QUERIES["q6_forecast_revenue"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan6 and "PushedFilters: []" not in plan6.split("PushedFilters:")[1][:4]


def test_sql_statements_passthrough(pl, lf, spark):
    """polars SQLContext statement surface (context.rs: CREATE TABLE AS,
    SHOW TABLES, EXPLAIN, DROP) — inherited via spark.sql."""
    ctx = pl.SQLContext(frames={"t_stmt": lf(a=[1, 2, 3])})
    # CREATE TABLE AS (temp view flavor)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW t_stmt2 AS SELECT a * 2 AS b FROM t_stmt")
    out = ctx.execute("SELECT sum(b) AS s FROM t_stmt2").collect()
    assert out["s"][0] == 12
    # SHOW TABLES lists the views; EXPLAIN returns a plan row
    shows = {r[1] for r in spark.sql("SHOW VIEWS").collect()}
    assert {"t_stmt", "t_stmt2"} <= shows
    plan = ctx.execute("EXPLAIN SELECT * FROM t_stmt").collect()
    assert "Scan" in plan.iloc[0, 0] or "Relation" in plan.iloc[0, 0]
    spark.sql("DROP VIEW t_stmt2")
    assert "t_stmt2" not in {r[1] for r in spark.sql("SHOW VIEWS").collect()}


def test_series_expr_fallback(pl):
    s = pl.Series("x", ["Hello", "WORLD"])
    assert s.str.to_lowercase().to_list() == ["hello", "world"]
    n = pl.Series("n", [3.0, 1.0, 2.0])
    assert n.rank().to_list() == [3.0, 1.0, 2.0]
    assert n.clip(1.5, 2.5).to_list() == [2.5, 1.5, 2.0]
    # explicitly-defined methods still win over the fallback
    assert n.sum() == 6.0
    import pytest as _pt

    with _pt.raises(AttributeError):
        s.definitely_not_a_method


def test_profile_returns_operator_metrics(pl):
    f = pl.scan_parquet("/root/testdata/sf0.001/customer.parquet").group_by(
        "c_mktsegment"
    ).agg(pl.len().alias("n"))
    result, prof = f.profile()
    assert len(result) == 5
    nodes = prof["node"].tolist()
    assert any("HashAggregate" in n for n in nodes)
    assert any("Scan" in n for n in nodes)
    # scan row counts are real execution metrics
    scan = prof[prof["node"].str.contains("Scan")]
    assert scan["rows_out"].iloc[0] == 150


def test_arg_min_max_sorted_and_unordered(pl, lf):
    # positions follow frame order even when the order is a sort key
    f = lf(v=[7.0, 3.0, 7.0, 1.0])
    r = f.select(pl.col("v").arg_max().alias("am"), pl.col("v").arg_min().alias("ai"))
    assert rows(r) == [(0, 3)]  # first occurrence of max 7 is row 0
    s = f.sort("v")
    assert rows(s.select(pl.col("v").arg_max().alias("am"))) == [(2,)]
