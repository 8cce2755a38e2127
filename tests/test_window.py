"""Window / order-dependent expressions (SURVEY §2.4): shift, diff, cum_*,
rank, rolling, fill strategies, over()."""

import pytest

from tests.conftest import rows


def _f(lf):
    return lf(g=["a", "a", "a", "b", "b"], x=[1.0, 3.0, 2.0, 10.0, 20.0]).with_row_index("i")


def test_shift_diff_pct(pl, lf):
    f = _f(lf)
    out = f.with_columns(
        pl.col("x").shift(1).over("g").alias("sh"),
        pl.col("x").diff().over("g").alias("df"),
        pl.col("x").pct_change().over("g").alias("pc"),
        pl.col("x").shift(-1).over("g").alias("lead"),
        pl.col("x").shift(1, fill_value=0).over("g").alias("shf"),
    ).sort("i")
    r = rows(out)
    # columns: g,x,i,sh,df,pc,lead,shf
    assert [t[3] for t in r] == [None, 1.0, 3.0, None, 10.0]
    assert [t[4] for t in r] == [None, 2.0, -1.0, None, 10.0]
    assert [t[6] for t in r] == [3.0, 2.0, None, 20.0, None]
    assert [t[7] for t in r] == [0.0, 1.0, 3.0, 0.0, 10.0]


def test_cum_family(pl, lf):
    f = _f(lf)
    out = f.with_columns(
        pl.col("x").cum_sum().over("g").alias("cs"),
        pl.col("x").cum_min().over("g").alias("cmin"),
        pl.col("x").cum_max().over("g").alias("cmax"),
        pl.col("x").cum_count().over("g").alias("cc"),
    ).sort("i")
    r = rows(out)
    assert [t[3] for t in r] == [1.0, 4.0, 6.0, 10.0, 30.0]
    assert [t[4] for t in r] == [1.0, 1.0, 1.0, 10.0, 10.0]
    assert [t[5] for t in r] == [1.0, 3.0, 3.0, 10.0, 20.0]
    assert [t[6] for t in r] == [1, 2, 3, 1, 2]


def test_cum_prod_zero_negative(pl, lf):
    f = lf(x=[2.0, -3.0, 0.0, 4.0]).with_row_index("i")
    out = f.with_columns(pl.col("x").cum_prod().alias("cp")).sort("i")
    assert [t[2] for t in rows(out)] == pytest.approx([2.0, -6.0, 0.0, 0.0])


def test_rank_methods(pl, lf):
    f = lf(x=[10.0, 20.0, 20.0, 30.0]).with_row_index("i")
    out = f.select(
        pl.col("x").rank("min").alias("mn"),
        pl.col("x").rank("max").alias("mx"),
        pl.col("x").rank("dense").alias("dn"),
        pl.col("x").rank("ordinal").alias("od"),
        pl.col("x").rank("average").alias("av"),
    )
    r = rows(out)
    assert [t[0] for t in r] == [1, 2, 2, 4]
    assert [t[1] for t in r] == [1, 3, 3, 4]
    assert [t[2] for t in r] == [1, 2, 2, 3]
    assert [t[3] for t in r] == [1, 2, 3, 4]
    assert [t[4] for t in r] == [1.0, 2.5, 2.5, 4.0]


def test_rank_over_partition(pl, lf):
    f = lf(g=["a", "a", "a", "b"], x=[10.0, 20.0, 20.0, 5.0]).with_row_index("i")
    out = f.with_columns(
        pl.col("x").rank("min").over("g").alias("r"),
        pl.col("x").rank("ordinal").over("g").alias("o"),
        pl.col("x").is_duplicated().over("g").alias("d"),
    ).sort("i")
    r = rows(out)
    assert [t[3] for t in r] == [1, 2, 2, 1]  # rank restarts per group
    assert [t[4] for t in r] == [1, 2, 3, 1]
    assert [t[5] for t in r] == [False, True, True, False]


def test_rolling(pl, lf):
    f = lf(x=[1.0, 2.0, 3.0, 4.0, 5.0]).with_row_index("i")
    out = f.with_columns(
        pl.col("x").rolling_sum(3).alias("rs"),
        pl.col("x").rolling_mean(2).alias("rm"),
        pl.col("x").rolling_min(3, min_samples=1).alias("rmin"),
        pl.col("x").rolling_max(2).alias("rmax"),
    ).sort("i")
    r = rows(out)
    assert [t[2] for t in r] == [None, None, 6.0, 9.0, 12.0]
    assert [t[3] for t in r] == [None, 1.5, 2.5, 3.5, 4.5]
    assert [t[4] for t in r] == [1.0, 1.0, 1.0, 2.0, 3.0]
    assert [t[5] for t in r] == [None, 2.0, 3.0, 4.0, 5.0]


def test_fill_strategies(pl, lf):
    f = lf(x=[None, 1.0, None, 3.0, None]).with_row_index("i")
    out = f.with_columns(
        pl.col("x").forward_fill().alias("ff"),
        pl.col("x").backward_fill().alias("bf"),
    ).sort("i")
    r = rows(out)
    assert [t[2] for t in r] == [None, 1.0, 1.0, 3.0, 3.0]
    assert [t[3] for t in r] == [1.0, 1.0, 3.0, 3.0, None]


def test_agg_over_partition(pl, lf):
    f = lf(g=["a", "a", "b"], x=[1.0, 3.0, 10.0])
    out = f.with_columns(
        pl.col("x").sum().over("g").alias("gs"),
        pl.col("x").mean().over("g").alias("gm"),
        (pl.col("x") / pl.col("x").sum().over("g")).alias("frac"),
    )
    r = rows(out, sort_by="x")
    assert [t[2] for t in r] == [4.0, 4.0, 10.0]
    assert [t[4] for t in r] == pytest.approx([0.25, 0.75, 1.0])


def test_is_distinct_flags(pl, lf):
    f = lf(x=[1, 2, 1, 3]).with_row_index("i")
    out = f.with_columns(
        pl.col("x").is_duplicated().alias("dup"),
        pl.col("x").is_unique().alias("uni"),
        pl.col("x").is_first_distinct().alias("fst"),
        pl.col("x").is_last_distinct().alias("lst"),
    ).sort("i")
    r = rows(out)
    assert [t[2] for t in r] == [True, False, True, False]
    assert [t[3] for t in r] == [False, True, False, True]
    assert [t[4] for t in r] == [True, True, False, True]
    assert [t[5] for t in r] == [False, True, True, True]


def test_order_required_error(pl, lf, spark):
    # constructed frames now carry insertion order (like eager polars);
    # only an order-less source (scan-shaped frame) still raises
    from polars_spark.plans.frame import wrap

    f = wrap(spark.createDataFrame([(1,), (2,), (3,)], "x int"))
    with pytest.raises(Exception, match="row order"):
        f.with_columns(pl.col("x").shift(1).alias("s")).collect()


def test_over_mapping_join(pl, lf):
    f = lf(g=["a", "a", "b"], x=[1, 2, 3])
    pdf = f.with_columns(pl.col("x").over("g", mapping_strategy="join").alias("xs")).collect()
    got = {r["g"]: sorted(r["xs"]) for _, r in pdf.drop_duplicates("g").iterrows()}
    assert got == {"a": [1, 2], "b": [3]}


def test_rolling_corr_cov(pl, lf):
    f = lf(a=[1.0, 2.0, 3.0, 4.0], b=[2.0, 4.0, 6.0, 7.0]).with_row_index("i")
    out = f.with_columns(
        pl.rolling_corr("a", "b", window_size=3).alias("rc"),
        pl.rolling_cov("a", "b", window_size=3).alias("cv"),
    ).sort("i")
    r = rows(out)
    assert r[0][3] is None and r[1][3] is None
    assert r[2][3] == pytest.approx(1.0)
    assert r[2][4] == pytest.approx(2.0)  # cov of [1,2,3],[2,4,6]


def test_exclude(pl, lf):
    f = lf(a=[1], b=[2], c=[3])
    assert f.select(pl.exclude("b")).columns == ["a", "c"]
