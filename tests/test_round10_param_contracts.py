"""Round-10: silently-ignored parameters, found by AST scan and fixed.

Each case pins a parameter that was previously accepted and dropped:
frame/group quantile interpolation (+ the reference 'nearest' default),
Expr/list sort nulls placement (reference: nulls FIRST both directions,
LAST under nulls_last), arg_sort nulls_last, hist include_* output
shapes, mean_horizontal/list.join ignore_nulls=False, and gather/get
null_on_oob=False raising on out-of-bounds.
"""

from __future__ import annotations

import pytest


def test_frame_quantile_interpolation(pl, spark):
    df = pl.from_records(
        [[float(v)] for v in [1, 2, 4, 10]], schema={"x": "Float64"}, orient="row"
    )
    # n=4, q=0.5: linear idx 1.5 -> 3.0; nearest rounds 1.5 away from zero -> idx 2 -> 4.0
    assert df.quantile(0.5, "linear").to_dicts() == [{"x": 3.0}]
    assert df.quantile(0.5).to_dicts() == [{"x": 4.0}]  # default = nearest
    assert df.quantile(0.5, "lower").to_dicts() == [{"x": 2.0}]
    assert df.quantile(0.5, "higher").to_dicts() == [{"x": 4.0}]
    assert df.quantile(0.5, "midpoint").to_dicts() == [{"x": 3.0}]


def test_expr_sort_null_placement(pl, spark):
    df = pl.from_records(
        [[1, None], [1, 3], [1, 1], [1, 2]], schema={"g": "Int64", "x": "Int64"},
        orient="row",
    )
    out = df.group_by("g").agg(
        pl.col("x").sort().alias("asc"),
        pl.col("x").sort(nulls_last=True).alias("asc_nl"),
        pl.col("x").sort(descending=True).alias("desc"),
        pl.col("x").sort(descending=True, nulls_last=True).alias("desc_nl"),
    ).to_dicts()[0]
    assert out["asc"] == [None, 1, 2, 3]       # reference: nulls FIRST
    assert out["asc_nl"] == [1, 2, 3, None]
    assert out["desc"] == [None, 3, 2, 1]      # nulls FIRST on desc too
    assert out["desc_nl"] == [3, 2, 1, None]
    lst = df.group_by("g").agg(pl.col("x").alias("xs")).with_columns(
        pl.col("xs").list.sort().alias("ls"),
        pl.col("xs").list.sort(nulls_last=True).alias("ls_nl"),
    ).to_dicts()[0]
    assert lst["ls"] == [None, 1, 2, 3] and lst["ls_nl"] == [1, 2, 3, None]


def test_arg_sort_nulls_last(pl, spark):
    df = pl.from_records(
        [[0, None], [1, 5], [2, 1]], schema={"i": "Int64", "x": "Int64"}, orient="row"
    ).sort("i", maintain_order=True)
    first = df.select(pl.col("x").arg_sort().alias("p")).to_dicts()
    last = df.select(pl.col("x").arg_sort(nulls_last=True).alias("p")).to_dicts()
    assert [r["p"] for r in first] == [0, 2, 1]  # null index first
    assert [r["p"] for r in last] == [2, 1, 0]   # null index last


def test_hist_output_shapes(pl, spark):
    df = pl.from_records(
        [[float(v)] for v in [1, 2, 3, 4, 5, 6]], schema={"x": "Float64"}, orient="row"
    )
    base = df.select(pl.col("x").hist(bins=[0, 2, 4, 6]).alias("h")).to_dicts()[0]["h"]
    assert base == [2, 2, 2]  # reference default: plain counts
    bp = df.select(
        pl.col("x").hist(bins=[0, 2, 4, 6], include_breakpoint=True).alias("h")
    ).to_dicts()[0]["h"]
    assert [(b["breakpoint"], b["count"]) for b in bp] == [(2.0, 2), (4.0, 2), (6.0, 2)]
    cat = df.select(
        pl.col("x").hist(bins=[0, 2, 4, 6], include_category=True).alias("h")
    ).to_dicts()[0]["h"]
    assert [b["category"] for b in cat] == ["(0.0, 2.0]", "(2.0, 4.0]", "(4.0, 6.0]"]
    # Series.hist keeps the reference Series defaults (both flags on)
    h = pl.Series("x", [1.0, 2, 3, 4]).hist(bins=[0.0, 2.0, 4.0])
    assert list(h.columns) == ["breakpoint", "category", "count"]


def test_mean_horizontal_ignore_nulls_false(pl, spark):
    df = pl.from_records(
        [[1.0, 3.0], [1.0, None]], schema={"a": "Float64", "b": "Float64"}, orient="row"
    )
    import polars_spark as pls

    out = df.select(
        pls.mean_horizontal("a", "b").alias("m"),
        pls.mean_horizontal("a", "b", ignore_nulls=False).alias("ms"),
    ).to_dicts()
    assert out[0] == {"m": 2.0, "ms": 2.0}
    assert out[1]["m"] == 1.0 and out[1]["ms"] is None


def test_list_join_ignore_nulls_false(pl, spark):
    df = pl.from_records(
        [[["a", "b"]], [["a", None]]], schema={"l": "array<string>"}, orient="row"
    )
    out = df.select(
        pl.col("l").list.join("-").alias("j"),
        pl.col("l").list.join("-", ignore_nulls=False).alias("js"),
    ).to_dicts()
    assert out[0] == {"j": "a-b", "js": "a-b"}
    assert out[1]["j"] == "a" and out[1]["js"] is None


def test_gather_oob_raises_by_default(pl, spark):
    df = pl.from_records(
        [[1, 10], [1, 20]], schema={"g": "Int64", "x": "Int64"}, orient="row"
    )
    ok = df.group_by("g").agg(pl.col("x").gather([0, 1]).alias("t")).to_dicts()
    assert ok[0]["t"] == [10, 20]
    padded = df.group_by("g").agg(
        pl.col("x").gather([0, 5], null_on_oob=True).alias("t")
    ).to_dicts()
    assert padded[0]["t"] == [10, None]
    with pytest.raises(Exception, match="out of bounds"):
        df.group_by("g").agg(pl.col("x").gather([0, 5]).alias("t")).collect()


def test_asof_coalesce_false_keeps_right_key(pl, spark):
    l = pl.from_records([[1, 10]], schema={"lid": "Int64", "k": "Int64"}, orient="row")
    r = pl.from_records([[100, 7]], schema={"rid": "Int64", "k": "Int64"}, orient="row")
    out = l.join_asof(r, on="k", strategy="backward", coalesce=False).to_dicts()
    assert out[0]["k"] == 10 and out[0]["k_right"] == 7 and out[0]["rid"] == 100
    # default (coalesce) keeps only the left key
    d = l.join_asof(r, on="k", strategy="backward").to_dicts()
    assert "k_right" not in d[0]


def test_drop_strict(pl, spark):
    df = pl.from_records([[1]], schema={"a": "Int64"}, orient="row")
    with pytest.raises(Exception, match="not found"):
        df.drop("nope")
    assert df.drop("nope", strict=False).columns == ["a"]


def test_param_audit_is_clean():
    """Ratchet: every accepted-but-unwired parameter must either be WIRED
    or classified in tools/param_audit.py KNOWN_NOOPS with a justification.
    A new row here means a parameter was added without being either."""
    import sys

    sys.path.insert(0, "tools")
    from param_audit import audit

    assert audit() == []
