"""Named pins for the three engine fixes the round-8 fuzz widening
(test_property_fuzz2.py) surfaced.  Each is a real semantic divergence a
reference user would hit; the fuzz seeds re-cover them, these tests state
the contract directly.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pytest


def test_from_arrow_carries_insertion_order(pl, spark):
    """from_arrow frames are CONSTRUCTED frames: they carry the insertion-
    order contract (hidden row index), so order-dependent ops work —
    unique(keep='first') used to raise 'needs a defined row order'."""
    tbl = pa.table({"g": ["a", "a", "b", "b"], "v": [1, 2, 3, 4]})
    lf = pl.from_arrow(tbl)
    out = lf.unique(subset=["g"], keep="first", maintain_order=True).collect()
    assert out.to_dict()["v"] == {0: 1, 1: 3}
    # cum_sum needs the same contract
    cs = lf.select(pl.col("v").cum_sum().alias("c")).collect()
    assert list(cs["c"]) == [1, 3, 6, 10]


def test_mean_horizontal_all_null_row(pl, spark):
    """polars mean_horizontal on an all-null row -> null; under Spark 4's
    default ANSI mode the naive sum/count lowering raised DIVIDE_BY_ZERO."""
    lf = pl.DataFrame({"a": [1.0, None], "b": [3.0, None]})
    out = lf.select(m=pl.mean_horizontal("a", "b")).collect()
    assert out["m"][0] == 2.0
    assert math.isnan(out["m"][1]) or out["m"][1] is None  # null, not error


@pytest.mark.parametrize(
    ("raw", "as_int", "as_float"),
    [
        ("12", 12, 12.0),
        ("+7", 7, 7.0),
        ("0012", 12, 12.0),
        (" 7", None, None),  # polars never trims (atoi_simd / fast_float2)
        ("7 ", None, None),
        ("1.5", None, 1.5),  # int grammar is digits-only; no rounding
        ("1e3", None, 1000.0),
        (".5", None, 0.5),
        ("inf", None, float("inf")),
        ("NaN", None, float("nan")),
        ("abc", None, None),
        ("", None, None),
        ("99999999999999999999", None, 1e20),  # int overflow -> null
    ],
)
def test_cast_str_numeric_polars_grammar(pl, spark, raw, as_int, as_float):
    """Non-strict str->numeric casts follow the reference parse grammar
    (polars-compute/src/cast/binary_to.rs): full-string match, no trim,
    optional sign; floats additionally accept exponent/inf/nan forms."""
    lf = pl.DataFrame({"s": [raw]})
    out = lf.select(
        i=pl.col("s").cast(pl.Int64, strict=False),
        f=pl.col("s").cast(pl.Float64, strict=False),
    ).collect()
    iv, fv = out["i"][0], out["f"][0]
    assert (iv is None or (isinstance(iv, float) and math.isnan(iv))) if as_int is None else iv == as_int
    if as_float is None:
        assert fv is None or (isinstance(fv, float) and math.isnan(fv) and raw != "NaN")
    elif isinstance(as_float, float) and math.isnan(as_float):
        assert math.isnan(fv)
    else:
        assert fv == as_float


def test_cast_str_numeric_strict_raises_on_untrimmed(pl, spark):
    """strict=True: a string polars cannot parse raises (Spark's trimming
    CAST would silently accept ' 7')."""
    from polars_spark.exceptions import PolarsError

    lf = pl.DataFrame({"s": [" 7"]})
    with pytest.raises((PolarsError, Exception)):
        lf.select(pl.col("s").cast(pl.Int64)).collect()


def test_cast_non_string_sources_unchanged(pl, spark):
    """The grammar gate must not change numeric-source casts: float->int
    still truncates, bool->int still 0/1."""
    lf = pl.DataFrame({"f": [1.9, -1.9], "b": [True, False]})
    out = lf.select(
        i=pl.col("f").cast(pl.Int64),
        bi=pl.col("b").cast(pl.Int64),
    ).collect()
    assert list(out["i"]) == [1, -1]
    assert list(out["bi"]) == [1, 0]


def test_agg_composition_series_shaped(pl, spark):
    """Composing on series-shaped aggregates (head/tail/sort/top_k/reverse/
    explode) follows polars' element-wise rules: first/last pick elements,
    implode is identity on a series list and nests scalar aggregates.
    Before round 8 these raised NESTED_AGGREGATE_FUNCTION or silently
    returned the whole list (fuzz family test_fuzz_grouped_order_aggs)."""
    lf = pl.DataFrame({"g": ["a", "a", "a", "b"], "i": [3, 1, 2, 9]})

    def norm(v):
        return [norm(x) for x in v] if hasattr(v, "__len__") else v

    def agg(e):
        out = lf.group_by("g").agg(o=e).sort("g").collect().to_dict()["o"]
        return [norm(v) for v in out.values()]

    assert agg(pl.col("i").head(2).implode()) == [[3, 1], [9]]
    assert agg(pl.col("i").sort().first()) == [1, 9]
    assert agg(pl.col("i").sort().last()) == [3, 9]
    assert agg(pl.col("i").reverse().first()) == [2, 9]
    assert agg(pl.col("i").sum().implode()) == [[6], [9]]
    assert agg(pl.col("i").top_k(2).first()) == [3, 9]
    assert agg(pl.col("i").sort().limit(2)) == [[1, 2], [9]]
    # implode().implode() nests one level
    assert agg(pl.col("i").implode().implode()) == [[[3, 1, 2]], [[9]]]
    # select context too
    assert list(lf.select(o=pl.col("i").sort().first()).collect()["o"]) == [1]
    assert list(lf.select(o=pl.col("i").reverse().first()).collect()["o"]) == [9]


def test_corr_zero_variance_and_pairwise(pl, spark):
    """corr on a zero-variance group is NaN (Spark's F.corr raises ANSI
    DIVIDE_BY_ZERO there — 96-seed soak find); null rows are deleted
    PAIRWISE, so one side's nulls don't shift the other side's stddev."""
    import math

    lf = pl.DataFrame({
        "g": ["a", "a", "b", "b", "b"],
        "x": [1.0, 1.0, 1.0, 2.0, 3.0],
        "y": [2.0, 3.0, 2.0, 4.0, None],
    })
    out = lf.group_by("g").agg(c=pl.corr("x", "y")).sort("g").collect()
    assert math.isnan(out["c"][0])  # zero variance in x -> NaN, not error
    assert abs(out["c"][1] - 1.0) < 1e-9  # pairwise: (1,2),(2,4) only
    # whole-frame select on a constant column
    one = pl.DataFrame({"x": [5.0, 5.0], "y": [1.0, 2.0]})
    v = one.select(c=pl.corr("x", "y")).collect()["c"][0]
    assert math.isnan(v)


def test_cast_unsigned_rejects_negative_strings(pl, spark):
    lf = pl.DataFrame({"s": ["-3", "3"]})
    out = lf.select(u=pl.col("s").cast(pl.UInt32, strict=False)).collect()
    v0 = out["u"][0]
    assert v0 is None or (isinstance(v0, float) and math.isnan(v0))
    assert out["u"][1] == 3
