"""Expr tail (truncate, rolling_rank(_by), Expr.rolling, inspect) and
drop-in compat objects (QueryOptFlags, GPUEngine, Categories,
scan_arrow_c_stream, ScanCastOptions)."""

import pandas as pd
import pytest

from tests.conftest import rows


def test_truncate(pl, lf):
    f = lf(x=[0.25, -0.25, 0.99, -0.99, 1.9999, -1.9999]).sort("x")
    out = f.select(
        t0=pl.col("x").truncate(),
        t1=pl.col("x").truncate(1),
    )
    got = {tuple(r) for r in rows(out)}
    assert (0.0, 0.2) in got        # 0.25 -> 0 / 0.2
    assert (0.0, -0.2) in got       # -0.25 -> 0 / -0.2 (toward zero)
    assert (1.0, 1.9) in got        # 1.9999 -> 1 / 1.9
    assert (-1.0, -1.9) in got      # -1.9999 -> -1 / -1.9


def test_rolling_rank_vs_pandas(pl, lf):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    f = lf(i=list(range(10)), x=vals).sort("i")
    for method in ("average", "min", "max"):
        out = f.select(r=pl.col("x").rolling_rank(4, method).alias("r"))
        got = [t[0] for t in rows(out)]
        exp = pd.Series(vals).rolling(4).rank(method=method).tolist()
        for g, e in zip(got, exp):
            if e != e:  # NaN -> min_samples not reached
                assert g is None
            else:
                assert g == pytest.approx(e)


def test_rolling_rank_dense_min_samples(pl, lf):
    f = lf(i=[0, 1, 2, 3], x=[2.0, 2.0, 1.0, 3.0]).sort("i")
    out = f.select(r=pl.col("x").rolling_rank(3, "dense", min_samples=2))
    got = [t[0] for t in rows(out)]
    assert got[0] is None           # only 1 sample
    assert got[1] == 1.0            # [2,2] -> dense rank of 2 is 1
    assert got[2] == 1.0            # [2,2,1] -> rank of 1 is 1
    assert got[3] == 3.0            # [2,1,3] -> dense rank of 3 is 3


def test_rolling_rank_random_deterministic(pl, lf):
    f = lf(i=[0, 1, 2], x=[1.0, 1.0, 1.0]).sort("i")
    a = [t[0] for t in rows(f.select(r=pl.col("x").rolling_rank(3, "random", seed=7, min_samples=1)))]
    b = [t[0] for t in rows(f.select(r=pl.col("x").rolling_rank(3, "random", seed=7, min_samples=1)))]
    assert a == b  # seeded draws replay
    assert all(1 <= v <= 3 for v in a)


def test_rolling_rank_by(pl, lf):
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:20", "2024-01-01 02:00"]
    )
    f = lf(t=list(ts), x=[1.0, 3.0, 2.0, 5.0]).sort("t")
    out = f.select(r=pl.col("x").rolling_rank_by("t", "30m", method="min"))
    got = [t[0] for t in rows(out)]
    # windows: [1]->1, [1,3]->2, [1,3,2]->2, [5] (2h gap) -> 1
    assert got == [1.0, 2.0, 2.0, 1.0]


def test_expr_rolling_context(pl, lf):
    f = lf(i=[1, 2, 3, 4, 5], x=[1.0, 1.0, 1.0, 1.0, 1.0]).sort("i")
    out = f.select(
        i=pl.col("i"),
        s=pl.col("x").sum().rolling("i", period="2i"),
    )
    got = {t[0]: t[1] for t in rows(out)}
    assert got[1] == 1.0 and got[2] == 2.0 and got[3] == 2.0


def test_inspect_passthrough(pl, lf):
    f = lf(foo=[1, 1, 2]).sort("foo")
    out = f.select(bar=pl.col("foo").cum_sum().inspect("value is: {}"))
    assert [t[0] for t in rows(out)] == [1, 2, 4]
    assert out.schema["bar"] == "bigint"  # self_dtype kept the input dtype


def test_collect_compat_kwargs(pl, lf):
    f = lf(x=[1, 2])
    flags = pl.QueryOptFlags(predicate_pushdown=True)
    assert len(f.collect(engine="streaming", optimizations=flags)) == 2
    assert len(f.collect(engine=pl.GPUEngine(device=0))) == 2
    none = pl.QueryOptFlags.none()
    assert none.predicate_pushdown is False
    none.update(predicate_pushdown=True)
    assert none.predicate_pushdown is True
    with pytest.raises(TypeError):
        pl.QueryOptFlags(bogus_flag=True)


def test_categories_registry(pl):
    fruit = pl.Categories("fruit_test_r6")
    s = pl.Series(["apple", "banana", "orange"], dtype=pl.Categorical(fruit))
    assert len(s) == 3
    assert fruit[0] == "apple"
    assert fruit["apple"] == 0
    fruit2 = pl.Categories("fruit_test_r6")
    assert fruit2["banana"] == 1
    assert list(fruit) == ["apple", "banana", "orange"]
    assert fruit == fruit2
    assert pl.Categories().is_global()
    with pytest.raises(ValueError):
        pl.Categories(None, namespace="x")


def test_scan_arrow_c_stream(pl):
    import pyarrow as pa

    tbl = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    f = pl.scan_arrow_c_stream(tbl)  # pa.Table exports __arrow_c_stream__
    assert sorted(r[0] for r in rows(f)) == [1, 2, 3]
    with pytest.raises(TypeError):
        pl.scan_arrow_c_stream(object())


def test_scan_cast_options_accepted(pl):
    opts = pl.ScanCastOptions(integer_cast="upcast")
    f = pl.scan_parquet("/root/testdata/sf0.001/region.parquet", cast_options=opts)
    assert len(rows(f)) == 5


def test_selector_chains(pl, lf):
    import polars_spark.selectors as cs

    f = lf(id=["r1", "r2"], a=[1.0, None], b=[None, 4.0])
    out = f.with_columns(cs.numeric().fill_null(0))
    got = rows(out, sort_by="id")
    assert got == [("r1", 1.0, 0.0), ("r2", 0.0, 4.0)]

    g = lf(s=["ab"], t=["cd"], n=[1.5])
    up = g.with_columns(cs.string().str.to_uppercase())
    assert rows(up) == [("AB", "CD", 1.5)]
    dbl = g.select((cs.numeric() * 2).round(1))
    assert rows(dbl) == [(3.0,)]
    sfx = g.select(cs.string().name.suffix("_u"))
    assert sfx.columns == ["s_u", "t_u"]
    # set algebra unaffected on plain selectors
    assert g.select(cs.all() - cs.numeric()).columns == ["s", "t"]


def test_case_sensitive_columns(pl, lf):
    # polars semantics: "name" and "NAME" are distinct columns
    f = lf(name=["alice"])
    out = f.with_columns(pl.col("name").str.to_uppercase().alias("NAME"))
    assert out.columns == ["name", "NAME"]
    assert rows(out) == [("alice", "ALICE")]


def test_value_counts_select_context(pl, lf):
    f = lf(x=["a", "b", "a", "c", "a"])
    out = f.select(pl.col("x").value_counts(sort=True)).collect()
    recs = [dict(v) for v in out["x"]]
    assert recs[0] == {"x": "a", "count": 3}
    assert sorted(r["x"] for r in recs) == ["a", "b", "c"]
    norm = f.select(pl.col("x").value_counts(normalize=True, name="frac")).collect()
    fracs = {d["x"]: d["frac"] for d in norm["x"]}
    assert fracs["a"] == pytest.approx(0.6)
    # agg context: per-group counts list
    g = lf(g=["p", "p", "q"], x=["a", "a", "b"])
    ag = g.group_by("g").agg(pl.col("x").value_counts().alias("vc")).collect()
    row = {r["g"]: list(r["vc"]) for _, r in ag.iterrows()}
    assert dict(row["p"][0]) == {"x": "a", "count": 2}


def test_fold_horizontal_wildcard(pl, lf):
    import polars_spark.selectors as cs

    f = lf(a=[1, 2], b=[3, 4], c=[5, 6])
    s1 = sorted(t[0] for t in rows(f.select(pl.fold(pl.lit(0), lambda a, x: a + x, pl.all()).alias("s"))))
    s2 = sorted(t[0] for t in rows(f.select(pl.sum_horizontal(pl.all()).alias("s"))))
    s3 = sorted(t[0] for t in rows(f.select(pl.reduce(lambda a, x: a + x, cs.numeric()).alias("s"))))
    assert s1 == s2 == s3 == [9, 12]


def test_rename_callable(pl, lf):
    f = lf(abc=[1], xyz=[2])
    assert f.rename(lambda c: c.upper()).columns == ["ABC", "XYZ"]


def test_polars_col_selection_forms(pl, lf):
    f = lf(g=["a", "a", "b"], x=[1, 2, 30], y=[1.5, 2.5, 3.5])
    # regex column selection
    assert f.select(pl.col("^[xy]$")).columns == ["x", "y"]
    # dtype-based selection
    assert f.select(pl.col(pl.Float64)).columns == ["y"]
    # wildcard exclude
    assert f.select(pl.all().exclude("g")).columns == ["x", "y"]


def test_agg_implicit_implode_and_wildcard(pl, lf):
    f = lf(g=["a", "a", "b"], x=[1, 2, 30], y=[1.5, 2.5, 3.5])
    bare = f.group_by("g").agg(pl.col("x")).collect()
    got = sorted((r["g"], sorted(r["x"])) for r in bare.to_dict("records"))
    assert got == [("a", [1, 2]), ("b", [30])]
    allsum = f.group_by("g").agg(pl.all().sum()).collect()
    rec = sorted(allsum.to_dict("records"), key=lambda r: r["g"])
    assert rec[0] == {"g": "a", "x": 3, "y": 4.0}
    # expr applied to the imploding column (non-agg chain) also implodes
    doubled = f.group_by("g").agg((pl.col("x") * 2).alias("d")).collect()
    got2 = sorted((r["g"], sorted(r["d"])) for r in doubled.to_dict("records"))
    assert got2 == [("a", [2, 4]), ("b", [60])]


def test_group_by_expr_key(pl, lf):
    f = lf(x=[1, 2, 30])
    out = f.group_by((pl.col("x") // 10).alias("dec")).agg(pl.len().alias("n"))
    assert rows(out, sort_by="dec") == [(0, 2), (3, 1)]


def test_explode_flatten_contexts(pl, lf):
    d = lf(l=[[1, 2], [3], None])
    got = sorted(
        (t[0] for t in rows(d.select(pl.col("l").flatten()))),
        key=lambda v: (v is None, v),
    )
    assert got == [1, 2, 3, None]
    g = lf(g=["a", "a"], l=[[1, 2], [3]])
    ag = g.group_by("g").agg(pl.col("l").explode().alias("f")).collect()
    assert sorted(ag["f"][0]) == [1, 2, 3]


def test_first_last_no_arg(pl, lf):
    f = lf(x=[1], y=[2])
    assert f.select(pl.first()).columns == ["x"]
    assert f.select(pl.last()).columns == ["y"]


def test_write_string_modes(pl, lf):
    f = lf(a=[1, 2], b=["x", "y"]).sort("a")
    assert f.write_csv() == "a,b\n1,x\n2,y\n"
    assert f.rows(named=True)[0] == {"a": 1, "b": "x"}
    assert '"a":1' in f.write_ndjson()


def test_top_k_select_context(pl, lf):
    d = lf(x=[5, 1, 9, 3])
    assert d.select(pl.col("x").top_k(2)).collect()["x"].tolist() == [9, 5]
    assert d.select(pl.col("x").bottom_k(2).alias("lo")).collect()["lo"].tolist() == [1, 3]
    g = lf(g=["a", "a", "b"], x=[1, 5, 9])
    ag = g.group_by("g").agg(pl.col("x").top_k(1).alias("t")).collect()
    assert sorted((r["g"], list(r["t"])) for r in ag.to_dict("records")) == [("a", [5]), ("b", [9])]


def test_offset_by_saturating(pl, lf):
    import datetime

    f = lf(d=[datetime.date(2024, 1, 31)])
    got = f.select(pl.col("d").dt.offset_by("1mo_saturating").alias("o")).collect().iloc[0, 0]
    assert str(got).startswith("2024-02-29")


def test_user_sim8_fixes(pl, lf):
    # cast(single dtype) casts everything
    assert lf(a=[1], b=[2]).cast(pl.Float64).schema == {"a": "double", "b": "double"}
    # shift_and_fill alias
    f = lf(i=[0, 1], x=[1, 2]).sort("i")
    assert f.select(pl.col("x").shift_and_fill(99, n=1)).collect()["x"].tolist() == [99, 1]
    # qcut with int bin count + labels
    q = lf(v=[1.0, 2.0, 3.0, 4.0]).select(pl.col("v").qcut(2, labels=["a", "b"]))
    assert sorted(q.collect()["v"].tolist()) == ["a", "a", "b", "b"]
    # rank inside list.eval (the canonical polars eval example)
    d = lf(l=[[3, 1, 2], [5, 5, 1]])
    got = [v.tolist() for v in d.select(pl.col("l").list.eval(pl.element().rank())).collect()["l"]]
    assert got == [[3.0, 1.0, 2.0], [2.5, 2.5, 1.0]]
    # concat of Series stays a Series
    s = pl.concat([pl.Series("s", [1]), pl.Series("s", [2])])
    assert s.to_list() == [1, 2]


def test_rank_null_handling(pl, lf):
    f = lf(v=[3.0, 1.0, None, 5.0])
    got = rows(f.select("v", pl.col("v").rank().alias("r")))
    import math

    def clean(x):
        return None if (x is None or (isinstance(x, float) and math.isnan(x))) else x

    by_val = {clean(v): clean(r) for v, r in got}
    assert by_val == {3.0: 2.0, 1.0: 1.0, None: None, 5.0: 3.0}
    s = pl.Series("v", [3.0, 1.0, None, 5.0])
    assert s.sort().to_list() == [None, 1.0, 3.0, 5.0]
    assert pl.Series([1.0, 2.0]).dot(pl.Series([3.0, 4.0])) == 11.0


def test_user_sim_consolidated(pl, lf):
    """One pass over the round-6 user-sim findings, as a living regression."""
    import datetime

    import polars_spark.selectors as cs

    # tz round-trip, json, asof nearest, decimal
    f = lf(t=[datetime.datetime(2024, 6, 1, 12)], j=['{"a": 5}'], d=["1.10"])
    out = f.select(
        h=pl.col("t").dt.replace_time_zone("UTC").dt.convert_time_zone("Europe/Paris").dt.hour(),
        a=pl.col("j").str.json_path_match("$.a").cast(pl.Int64),
        x=(pl.col("d").cast(pl.Decimal(10, 2)) * 3),
    )
    r = rows(out)[0]
    assert r[0] == 14 and r[1] == 5 and float(r[2]) == 3.30
    # chained selector + implicit implode + wildcard agg in one pipeline
    g = lf(g=["a", "a", "b"], x=[1, 2, 30], y=[1.5, 2.5, 3.5])
    res = (
        g.with_columns(cs.numeric().fill_null(0))
        .group_by("g")
        .agg(pl.all().sum())
        .sort("g")
    )
    assert rows(res) == [("a", 3, 4.0), ("b", 30, 3.5)]


def test_dataframe_constructor_schema_forms(pl, lf):
    assert pl.DataFrame({"a": [1, 2]}, schema_overrides={"a": pl.Float64}).schema == {"a": "double"}
    assert pl.DataFrame({"a": [1]}, schema={"a": pl.Int32}).schema == {"a": "int"}
    rowwise = pl.DataFrame([[1, "x"], [2, "y"]], schema=["n", "s"], orient="row")
    assert rows(rowwise, sort_by="n") == [(1, "x"), (2, "y")]
    assert pl.from_records([(1, "x"), (2, "y")], schema=["n", "s"]).columns == ["n", "s"]
