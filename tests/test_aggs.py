"""Aggregation semantics (AggExpr, polars-plan/src/dsl/expr/mod.rs:22)."""

import math

import pytest

from tests.conftest import rows


def test_basic_aggs(pl, lf):
    f = lf(g=["a", "a", "b", "b", "b"], x=[1.0, 3.0, 2.0, 4.0, 6.0])
    out = f.group_by("g").agg(
        pl.col("x").sum().alias("s"),
        pl.col("x").mean().alias("m"),
        pl.col("x").min().alias("lo"),
        pl.col("x").max().alias("hi"),
        pl.col("x").median().alias("med"),
        pl.col("x").count().alias("n"),
        pl.len().alias("len"),
        pl.col("x").n_unique().alias("nu"),
    )
    r = rows(out, sort_by="g")
    assert r[0] == ("a", 4.0, 2.0, 1.0, 3.0, 2.0, 2, 2, 2)
    assert r[1] == ("b", 12.0, 4.0, 2.0, 6.0, 4.0, 3, 3, 3)


def test_std_var_ddof(pl, lf):
    f = lf(x=[1.0, 2.0, 3.0, 4.0])
    r = rows(
        f.select(
            pl.col("x").std().alias("s1"),
            pl.col("x").std(ddof=0).alias("s0"),
            pl.col("x").var().alias("v1"),
            pl.col("x").var(ddof=0).alias("v0"),
        )
    )[0]
    assert r[0] == pytest.approx(1.2909944487)
    assert r[1] == pytest.approx(1.1180339887)
    assert r[2] == pytest.approx(5.0 / 3.0)
    assert r[3] == pytest.approx(1.25)


def test_quantile_interpolations(pl, lf):
    f = lf(x=[1.0, 2.0, 3.0, 4.0])
    r = rows(
        f.select(
            pl.col("x").quantile(0.5, "linear").alias("lin"),
            pl.col("x").quantile(0.5, "lower").alias("lo"),
            pl.col("x").quantile(0.5, "higher").alias("hi"),
            pl.col("x").quantile(0.5, "midpoint").alias("mid"),
            pl.col("x").quantile(0.5, "nearest").alias("near"),
        )
    )[0]
    assert r == (2.5, 2.0, 3.0, 2.5, 3.0)


def test_product_with_zero_and_negatives(pl, lf):
    f = lf(g=["a", "a", "b", "b", "c"], x=[2.0, -3.0, 5.0, 0.0, 4.0])
    out = f.group_by("g").agg(pl.col("x").product().alias("p"))
    assert rows(out, sort_by="g") == [("a", -6.0), ("b", 0.0), ("c", 4.0)]


def test_any_all_mode(pl, lf):
    f = lf(g=["a", "a", "b"], b=[True, False, True], m=[1, 1, 2])
    out = f.group_by("g").agg(
        pl.col("b").any().alias("any"),
        pl.col("b").all().alias("all"),
    )
    assert rows(out, sort_by="g") == [("a", True, False), ("b", True, True)]
    r = rows(f.select(pl.col("m").mode().alias("mode")))
    assert r[0][0] == 1


def test_first_last_with_order(pl, lf):
    f = lf(g=["a", "a", "b", "b"], x=[10, 20, 30, 40]).with_row_index("i")
    out = f.group_by("g").agg(
        pl.col("x").first().alias("f"),
        pl.col("x").last().alias("l"),
    )
    assert rows(out, sort_by="g") == [("a", 10, 20), ("b", 30, 40)]


def test_implode_ordered(pl, lf):
    f = lf(g=["a", "a", "a"], x=[3, 1, 2]).with_row_index("i")
    pdf = f.group_by("g").agg(pl.col("x").implode().alias("xs")).collect()
    assert list(pdf["xs"][0]) == [3, 1, 2]


def test_entropy(pl, lf):
    f = lf(x=[0.25, 0.25, 0.25, 0.25])
    r = rows(f.select(pl.col("x").entropy(base=2).alias("e")))[0]
    assert r[0] == pytest.approx(2.0)


def test_skew_kurtosis(pl, lf):
    f = lf(x=[1.0, 2.0, 3.0, 4.0, 10.0])
    r = rows(
        f.select(
            pl.col("x").skew().alias("sk"),
            pl.col("x").kurtosis().alias("ku"),
        )
    )[0]
    # biased moments: m2=10, m3=36, m4=278.8
    # skew = m3/m2^1.5 = 1.138419957..., excess kurtosis = m4/m2^2 - 3 = -0.212
    assert r[0] == pytest.approx(36.0 / 10.0**1.5, rel=1e-9)
    assert r[1] == pytest.approx(278.8 / 100.0 - 3.0, rel=1e-9)


def test_approx_n_unique(pl, lf):
    f = lf(x=list(range(100)))
    r = rows(f.select(pl.col("x").approx_n_unique().alias("a")))[0]
    assert 90 <= r[0] <= 110


def test_corr_cov(pl, lf):
    f = lf(a=[1.0, 2.0, 3.0], b=[2.0, 4.0, 6.0])
    r = rows(f.select(pl.corr("a", "b").alias("c"), pl.cov("a", "b").alias("v")))[0]
    assert r[0] == pytest.approx(1.0)
    assert r[1] == pytest.approx(2.0)


def test_agg_arbitrary_expr(pl, lf):
    # polars: arbitrary exprs inside .agg() e.g. filtered/scaled aggregation
    f = lf(g=["a", "a", "b"], x=[1.0, 2.0, 3.0], keep=[True, False, True])
    out = f.group_by("g").agg(
        (pl.col("x") * 2).sum().alias("x2"),
        pl.when(pl.col("keep")).then(pl.col("x")).otherwise(pl.lit(None)).sum().alias("kept"),
    )
    assert rows(out, sort_by="g") == [("a", 6.0, 1.0), ("b", 6.0, 3.0)]


def test_head_tail_in_agg(pl, lf):
    f = lf(g=["a", "a", "a", "b"], x=[1, 2, 3, 9]).with_row_index("i")
    pdf = f.group_by("g").agg(
        pl.col("x").head(2).alias("h"),
        pl.col("x").tail(2).alias("t"),
    ).collect().sort_values("g", ignore_index=True)
    assert list(pdf["h"][0]) == [1, 2] and list(pdf["t"][0]) == [2, 3]
    assert list(pdf["h"][1]) == [9] and list(pdf["t"][1]) == [9]


def test_groupby_quantile_all_head_tail_having(pl, lf):
    f = lf(g=["a", "a", "a", "b", "b"], i=[1, 2, 3, 4, 5], x=[1.0, 2.0, 9.0, 4.0, 6.0]).set_sorted("i")
    q = f.group_by("g").quantile(0.5).sort("g").collect()
    # reference default interpolation is NEAREST (group_by.py:875): idx
    # round(0.5*(n-1)) half-away-from-zero -> [1,2,9] picks 2, [4,6] picks 6
    assert q["x"].tolist() == [2.0, 6.0]
    ql = f.group_by("g").quantile(0.5, "linear").sort("g").collect()
    assert ql["x"].tolist() == [2.0, 5.0]
    al = f.group_by("g").all().sort("g").collect()
    assert list(al["x"][0]) == [1.0, 2.0, 9.0]
    hd = f.group_by("g").head(2).sort("i").collect()
    assert hd["i"].tolist() == [1, 2, 4, 5]
    tl = f.group_by("g").tail(1).sort("i").collect()
    assert tl["i"].tolist() == [3, 5]
    hv = (
        f.group_by("g")
        .having(pl.col("n") >= 3)
        .agg(pl.len().alias("n"))
        .collect()
    )
    assert hv["g"].tolist() == ["a"]


class TestEmptyGroupIdentities:
    """polars missing-data rules: fold identities for empty/all-null groups
    (sum -> 0, product -> 1), and n_unique counts null as a value."""

    def test_sum_all_null_is_zero(self, pl, lf):
        f = lf(g=["a", "a", "b"], x=[None, None, 5.0])
        got = f.group_by("g").agg(pl.col("x").sum().alias("s")).collect()
        got = got.sort_values("g", ignore_index=True)
        assert got["s"].tolist() == [0.0, 5.0]

    def test_product_all_null_is_one(self, pl, lf):
        f = lf(g=["a", "a", "b"], x=[None, None, 5.0])
        got = f.group_by("g").agg(pl.col("x").product().alias("p")).collect()
        got = got.sort_values("g", ignore_index=True)
        assert got["p"].tolist() == [1.0, 5.0]

    def test_n_unique_counts_null(self, pl, lf):
        f = lf(g=["a", "a", "a", "b"], x=[1.0, None, None, 2.0])
        got = f.group_by("g").agg(pl.col("x").n_unique().alias("n")).collect()
        got = got.sort_values("g", ignore_index=True)
        assert got["n"].tolist() == [2, 1]  # a: {1.0, null}, b: {2.0}

    def test_n_unique_over_window(self, pl, lf):
        f = lf(g=["a", "a", "b"], x=[1.0, 1.0, 2.0])
        got = f.select("g", pl.col("x").n_unique().over("g").alias("n")).collect()
        assert got["n"].tolist() == [1, 1, 1]

    def test_filtered_len_counts_survivors(self, pl, lf):
        f = lf(g=["a", "a", "a"], x=[1.0, 2.0, 3.0])
        got = f.group_by("g").agg(
            pl.col("x").filter(pl.col("x") > 1.5).len().alias("n"),
            pl.len().alias("total"),
        ).collect()
        assert got["n"].tolist() == [2] and got["total"].tolist() == [3]

    def test_filtered_first_last_skip_masked(self, pl, lf):
        f = lf(g=["a"] * 4, x=[1.0, 2.0, 3.0, 4.0])
        f = f.with_row_index("i")
        got = f.group_by("g").agg(
            pl.col("x").filter(pl.col("x") > 1.5).first().alias("f"),
            pl.col("x").filter(pl.col("x") < 3.5).last().alias("l"),
        ).collect()
        assert got["f"].tolist() == [2.0] and got["l"].tolist() == [3.0]

    def test_approx_quantile_near_exact(self, pl, lf):
        vals = [float(i) for i in range(1000)]
        f = lf(g=["a"] * 1000, x=vals)
        got = f.group_by("g").agg(
            pl.col("x").approx_quantile(0.5).alias("aq"),
            pl.col("x").quantile(0.5, "lower").alias("eq"),
        ).collect()
        assert abs(got["aq"][0] - got["eq"][0]) <= 1.0


def test_corr_spearman_matches_scipy_model(pl, lf):
    # ties included: average ranks
    a = [1.0, 2.0, 2.0, 4.0, 7.0, 5.0]
    b = [3.0, 1.0, 4.0, 4.0, 9.0, 8.0]
    f = lf(g=["x"] * 6 + ["y"] * 6, a=a + [float(i) for i in range(6)],
           b=b + [float(i * i) for i in range(6)])
    out = f.group_by("g").agg(
        pl.corr(pl.col("a"), pl.col("b"), method="spearman").alias("rho")
    )
    got = {r[0]: r[1] for r in out.collect().itertuples(index=False)}

    import numpy as np

    def spearman(x, y):
        def avg_rank(v):
            v = np.asarray(v)
            return np.array(
                [(v < vi).sum() + ((v == vi).sum() + 1) / 2.0 for vi in v]
            )
        rx, ry = avg_rank(x), avg_rank(y)
        return np.corrcoef(rx, ry)[0, 1]

    assert abs(got["x"] - spearman(a, b)) < 1e-9
    assert abs(got["y"] - 1.0) < 1e-9  # monotone -> rho = 1


def test_boolean_sum_mean(pl, lf):
    f = lf(b=[True, False, True, None])
    out = f.select(pl.col("b").sum().alias("s"), pl.col("b").mean().alias("m"))
    r = rows(out)[0]
    assert r[0] == 2
    assert abs(r[1] - 2 / 3) < 1e-12  # nulls ignored


def test_groupby_convenience_numeric_only(pl, lf):
    """sum/mean/median/quantile null out non-numeric columns (polars rule)
    instead of raising a cast error; min/max keep strings."""
    f = lf(g=["a", "a", "b"], x=[1, 2, 3], t=["p", "q", "r"])
    assert f.group_by("g").quantile(0.5).sort("g").rows() == [("a", 2.0, None), ("b", 3.0, None)]
    assert f.group_by("g").quantile(0.5, "linear").sort("g").rows() == [("a", 1.5, None), ("b", 3.0, None)]
    assert f.group_by("g").mean().sort("g").rows() == [("a", 1.5, None), ("b", 3.0, None)]
    assert f.group_by("g").sum().sort("g").rows() == [("a", 3, None), ("b", 3, None)]
    assert f.group_by("g").min().sort("g").rows() == [("a", 1, "p"), ("b", 3, "r")]
