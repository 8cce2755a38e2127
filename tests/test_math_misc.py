"""Sweep over the math/misc expression tail: trigonometry, logs, fill_null
scalar strategies, repeat_by, is_in with expr, hash seeds, entropy variants,
clip one-sided."""

import math

import pytest

from tests.conftest import rows


def test_trig_family(pl, lf):
    f = lf(x=[0.5])
    r = rows(
        f.select(
            pl.col("x").sin().alias("sin"),
            pl.col("x").cos().alias("cos"),
            pl.col("x").tan().alias("tan"),
            pl.col("x").arcsin().alias("asin"),
            pl.col("x").arccos().alias("acos"),
            pl.col("x").arctan().alias("atan"),
            pl.col("x").sinh().alias("sinh"),
            pl.col("x").cosh().alias("cosh"),
            pl.col("x").tanh().alias("tanh"),
            pl.col("x").degrees().alias("deg"),
        )
    )[0]
    want = (
        math.sin(0.5), math.cos(0.5), math.tan(0.5), math.asin(0.5), math.acos(0.5),
        math.atan(0.5), math.sinh(0.5), math.cosh(0.5), math.tanh(0.5), math.degrees(0.5),
    )
    assert r == pytest.approx(want, rel=1e-12)


def test_log_exp_sign(pl, lf):
    f = lf(x=[4.0, -2.0])
    r = rows(
        f.select(
            pl.col("x").abs().log(2).alias("log2"),
            pl.col("x").abs().log10().alias("log10"),
            pl.col("x").abs().log1p().alias("log1p"),
            pl.col("x").exp().alias("exp"),
            pl.col("x").sign().alias("sign"),
            pl.col("x").sqrt().alias("sqrt"),
            pl.col("x").cbrt().alias("cbrt"),
        ),
        sort_by="sign",
    )
    neg, pos = r[0], r[1]
    assert pos[0] == pytest.approx(2.0) and pos[1] == pytest.approx(math.log10(4))
    assert pos[4] == 1.0 and neg[4] == -1.0
    assert pos[5] == 2.0


def test_fill_null_scalar_strategies(pl, lf):
    f = lf(x=[1.0, None, 5.0])
    r = rows(
        f.select(
            pl.col("x").fill_null(strategy="min").alias("mn"),
            pl.col("x").fill_null(strategy="max").alias("mx"),
            pl.col("x").fill_null(strategy="mean").alias("me"),
            pl.col("x").fill_null(strategy="zero").alias("z"),
            pl.col("x").fill_null(strategy="one").alias("o"),
        ),
        sort_by="z",
    )
    filled = [t for t in r if t[3] == 0.0][0]
    assert filled == (1.0, 5.0, 3.0, 0.0, 1.0)


def test_repeat_by_and_is_in_expr(pl, lf):
    f = lf(x=["a", "b"], n=[2, 3], arr=[["a", "z"], ["q"]])
    pdf = f.select(
        pl.col("x").repeat_by(pl.col("n")).alias("rep"),
        pl.col("x").is_in(pl.col("arr")).alias("isin"),
    ).collect()
    reps = sorted((len(v), v[0]) for v in pdf["rep"])
    assert reps == [(2, "a"), (3, "b")]
    assert sorted(pdf["isin"].tolist()) == [False, True]


def test_hash_seeds_and_entropy_raw(pl, lf):
    f = lf(x=["a", "b"])
    pdf = f.select(
        pl.col("x").hash(seed=1).alias("h1"),
        pl.col("x").hash(seed=2).alias("h2"),
    ).collect()
    assert (pdf["h1"] != pdf["h2"]).all()
    g = lf(p=[0.5, 0.5])
    r = rows(g.select(pl.col("p").entropy(base=2, normalize=False).alias("e")))[0]
    # -sum(x*log2(x)) = -(2 * 0.5*log2(0.5)) = 1
    assert r[0] == pytest.approx(1.0)


def test_clip_one_sided(pl, lf):
    f = lf(x=[1.0, 10.0])
    r = rows(f.select(pl.col("x").clip(lower=3).alias("lo"), pl.col("x").clip(upper=5).alias("hi")), sort_by="lo")
    assert r == [(3.0, 1.0), (10.0, 5.0)]


def test_floordiv_mod_negative(pl, lf):
    f = lf(a=[7.0, -7.0], b=[2.0, 2.0])
    r = rows(f.select((pl.col("a") // pl.col("b")).alias("fd"), (pl.col("a") % pl.col("b")).alias("md")), sort_by="fd")
    assert r[1] == (3.0, 1.0)
    assert r[0][0] == -4.0  # floor division rounds toward -inf (polars/python)


def test_shift_fill_only_boundary(pl, lf):
    """shift(n, fill_value) fills ONLY the n shifted-in slots — genuine data
    nulls stay null (polars shift_and_fill semantics)."""
    f = lf(x=[1.0, None, 3.0, None, 5.0]).with_row_index("i")
    out = f.with_columns(
        pl.col("x").shift(1, fill_value=-9.0).alias("sf"),
        pl.col("x").shift(-2, fill_value=-9.0).alias("sb"),
    ).sort("i")
    r = rows(out)
    assert [t[2] for t in r] == [-9.0, 1.0, None, 3.0, None]
    assert [t[3] for t in r] == [3.0, None, 5.0, -9.0, -9.0]


def test_clip_propagates_null(pl, lf):
    f = lf(x=[-5.0, None, 0.5, 7.0])
    r = rows(
        f.select(
            pl.col("x").clip(0.0, 1.0).alias("c"),
            pl.col("x").clip(0.0).alias("lo"),
            pl.col("x").clip(None, 1.0).alias("hi"),
        )
    )
    assert [t[0] for t in r] == [0.0, None, 0.5, 1.0]
    assert [t[1] for t in r] == [0.0, None, 0.5, 7.0]
    assert [t[2] for t in r] == [-5.0, None, 0.5, 1.0]


def test_str_replace_with_user_capture_group(pl, lf):
    """User capture groups keep their numbering and $1 refs work (the tail
    capture is a named group, not $1)."""
    f = lf(s=["xaby-ab-z", "nope"])
    r = rows(
        f.select(
            pl.col("s").str.replace(r"(a)b", "[$1]").alias("grp"),
            pl.col("s").str.replace("ab", "_").alias("plain"),
        )
    )
    assert r[0][0] == "x[a]y-ab-z"  # first match only, group ref substituted
    assert r[1][0] == "nope"
    assert r[0][1] == "x_y-ab-z"


def test_fill_null_strategy_over_groups(pl, lf):
    """fill_null(min/mean) under .over(keys) fills per group."""
    f = lf(g=["a", "a", "b", "b"], x=[1.0, None, 10.0, None])
    out = f.select(
        "g",
        pl.col("x").fill_null(strategy="min").over("g").alias("mn"),
        pl.col("x").fill_null(strategy="mean").over("g").alias("me"),
    )
    r = rows(out, sort_by="g")
    assert [t[1] for t in r] == [1.0, 1.0, 10.0, 10.0]
    assert [t[2] for t in r] == [1.0, 1.0, 10.0, 10.0]
