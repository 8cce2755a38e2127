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


def test_toplevel_shortcut_family(pl, lf):
    f = lf(g=["a", "a", "b"], x=[1.0, 3.0, 5.0])
    out = (
        f.group_by("g")
        .agg(
            pl.std("x").alias("sd"),
            pl.var("x").alias("vr"),
            pl.implode("x").alias("xs"),
            pl.quantile("x", 0.5).alias("q"),
            pl.approx_n_unique("x").alias("anu"),
        )
        .collect()
        .set_index("g")
    )
    assert out.loc["a", "vr"] == 2.0 and list(out.loc["a", "xs"]) == [1.0, 3.0]


def test_toplevel_generators(pl, spark):
    # eager int_range returns a Series (reference behavior)
    assert pl.int_range(4, spark=spark).to_list() == [0, 1, 2, 3]
    assert pl.int_range(2, 8, 2, spark=spark).to_list() == [2, 4, 6]
    # eager=True (the default) returns a Series (reference linear_space)
    ls = pl.linear_space(0.0, 1.0, 5, spark=spark).to_list()
    assert ls == [0.0, 0.25, 0.5, 0.75, 1.0]
    ls_left = pl.linear_space(0.0, 1.0, 4, closed="left", spark=spark).to_list()
    assert ls_left == [0.0, 0.25, 0.5, 0.75]
    lzs = pl.linear_space(0.0, 1.0, 3, eager=False, spark=spark)
    assert len(lzs.collect()) == 3
    # eager=True (the default) returns a Series, like the reference
    dr = pl.date_range("2024-01-01", "2024-01-03", "1d", closed="left", spark=spark)
    assert [str(d) for d in dr.to_list()] == ["2024-01-01", "2024-01-02"]
    tr = pl.datetime_range("2024-01-01 00:00", "2024-01-01 02:00", "1h", spark=spark)
    assert tr.len() == 3
    # eager=False keeps the lazy frame form
    lzf = pl.date_range("2024-01-01", "2024-01-02", "1d", eager=False, spark=spark)
    assert len(lzf.collect()) == 2
    assert pl.ones(3, spark=spark).collect()["ones"].tolist() == [1.0, 1.0, 1.0]


def test_toplevel_format_epoch_arctan2(pl, lf):
    import math

    f = lf(a=[1, 2])
    out = f.with_columns(
        pl.format("v={}", pl.col("a")).alias("s"),
        pl.from_epoch(pl.col("a"), "d").alias("d"),
        pl.arctan2(pl.col("a"), pl.lit(1.0)).alias("t"),
    ).collect()
    assert out["s"].tolist() == ["v=1", "v=2"]
    assert [str(v) for v in out["d"]] == ["1970-01-02", "1970-01-03"]
    assert abs(out["t"].tolist()[0] - math.atan2(1, 1)) < 1e-12


def test_constructors_and_select(pl, spark):
    assert pl.from_dicts([{"a": 1}, {"a": 2}], spark=spark).collect()["a"].tolist() == [1, 2]
    import numpy as np

    nf = pl.from_numpy(np.array([[1, 2], [3, 4]]), schema=["x", "y"], spark=spark).collect()
    assert nf["y"].tolist() == [2, 4]
    sel = pl.select(pl.lit(7).alias("x"), spark=spark).collect()
    assert sel["x"].tolist() == [7]
    frames = [pl.from_dict({"a": [i]}, spark=spark) for i in range(2)]
    assert [d["a"].tolist() for d in pl.collect_all(frames)] == [[0], [1]]


def test_set_random_seed(pl, spark):
    f = pl.from_dict({"x": list(range(50))}, spark=spark)
    pl.set_random_seed(11)
    a = f.sample(n=5).collect()["x"].tolist()
    pl.set_random_seed(11)
    b = f.sample(n=5).collect()["x"].tolist()
    assert a == b
    pl.set_random_seed(12)
    c = f.sample(n=5).collect()["x"].tolist()
    assert a != c
    with pl.StringCache():
        assert pl.using_string_cache()  # bool, reference semantics
    assert not pl.using_string_cache()


def test_struct_field_and_with_fields(pl, lf):
    f = lf(a=[1, 2]).with_columns(
        pl.struct(x=pl.col("a"), y=pl.col("a") * 10).alias("s")
    )
    out = f.with_columns(
        pl.col("s").struct.with_fields((pl.field("x") * 100).alias("z")).alias("s2")
    ).collect()
    assert out["s2"].tolist()[0] == {"x": 1, "y": 10, "z": 100}


def test_cum_fold_and_horizontal(pl, lf):
    f = lf(a=[1], b=[2], c=[3])
    out = f.select(
        pl.cum_sum_horizontal("a", "b", "c").alias("cs"),
        pl.cum_reduce(lambda x, y: x * y, [pl.col("a"), pl.col("b"), pl.col("c")]).alias("cp"),
    ).collect()
    assert out["cs"].tolist()[0] == {"a": 1, "b": 3, "c": 6}
    assert out["cp"].tolist()[0] == {"a": 1, "b": 2, "c": 6}


def test_temporal_constructors(pl, lf):
    f = lf(y=[2024], m=[2], d=[29])
    out = f.select(
        pl.date("y", "m", "d").alias("dt"),
        pl.datetime("y", "m", "d", 12, 30).alias("ts"),
        pl.datetime_ranges(pl.datetime("y", "m", "d"), pl.datetime("y", "m", pl.col("d") , 2), "1h").alias("r"),
        pl.linear_spaces(0.0, 2.0, 3).alias("ls"),
    ).collect()
    assert str(out["dt"][0]) == "2024-02-29"
    assert str(out["ts"][0]) == "2024-02-29 12:30:00"
    assert len(out["r"][0]) == 3
    assert list(out["ls"][0]) == [0.0, 1.0, 2.0]


def test_duration_add(pl, lf):
    f = lf(t=["2024-01-01 00:00:00"]).with_columns(pl.col("t").cast(pl.Datetime).alias("t"))
    out = f.select((pl.col("t") + pl.duration(days=1, hours=2)).alias("t2")).collect()
    assert str(out["t2"][0]) == "2024-01-02 02:00:00"


def test_arg_sort_by(pl, lf):
    f = lf(x=[30, 10, 20])
    # true argsort permutation (reference semantics): element i is the
    # SOURCE position of the i-th row in sort order -> [1, 2, 0]
    out = f.with_columns(pl.arg_sort_by("x").alias("r")).collect()
    assert out["r"].tolist() == [1, 2, 0]


def test_union_and_align_frames(pl, lf):
    a, b = lf(k=[1, 2], v=[10, 20]), lf(k=[2, 3], w=[200, 300])
    u = pl.union([a.select("k"), b.select("k")]).collect()
    assert sorted(u["k"].tolist()) == [1, 2, 2, 3]
    aa, bb = pl.align_frames(a, b, on="k")
    pa, pb = aa.collect(), bb.collect()
    assert pa["k"].tolist() == pb["k"].tolist() == [1, 2, 3]
    assert pb["w"].tolist()[0] is None or pb["w"].isna().tolist() == [True, False, False]


def test_scan_lines_and_parquet_schema(pl, spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("alpha\nbeta\n")
    out = pl.scan_lines(str(p), spark=spark).collect()
    assert sorted(out["line"].tolist()) == ["alpha", "beta"]
    pq_path = tmp_path / "t.parquet"
    pl.from_dict({"a": [1]}, spark=spark).sink_parquet(str(pq_path))
    import glob

    f = glob.glob(f"{pq_path}/*.parquet") or [str(pq_path)]
    sch = pl.read_parquet_schema(f[0])
    assert sch.get("a") == "int64"
    md = pl.read_parquet_metadata(f[0])
    assert md["num_rows"] == 1
    assert pl.thread_pool_size(spark=spark) >= 1
    assert pl.get_index_type() == "bigint"
    assert pl.build_info()["backend"] == "pyspark"
