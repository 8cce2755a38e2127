"""Peaks, rle_id, interpolate, ewm_mean, cut/qcut, match_to_schema,
maintain_order group-by."""

import pandas as pd
import pytest

from tests.conftest import rows


def test_peaks(pl, lf):
    f = lf(x=[1.0, 3.0, 2.0, 5.0, 4.0]).with_row_index("i")
    out = f.with_columns(
        pl.col("x").peak_max().alias("pmax"),
        pl.col("x").peak_min().alias("pmin"),
    ).sort("i")
    r = rows(out)
    assert [t[2] for t in r] == [False, True, False, True, False]
    assert [t[3] for t in r] == [True, False, True, False, True]


def test_rle_id(pl, lf):
    f = lf(x=["a", "a", "b", "b", "b", "a", None, None]).with_row_index("i")
    out = f.with_columns(pl.col("x").rle_id().alias("rid")).sort("i")
    assert [t[2] for t in rows(out)] == [0, 0, 1, 1, 1, 2, 3, 3]


def test_interpolate(pl, lf):
    f = lf(x=[None, 1.0, None, None, 4.0, None]).with_row_index("i")
    out = f.with_columns(pl.col("x").interpolate().alias("li")).sort("i")
    r = [t[2] for t in rows(out)]
    assert r == [None, 1.0, 2.0, 3.0, 4.0, None]


def test_ewm_mean_matches_pandas(pl, lf):
    data = [1.0, 2.0, 3.0, 4.0, 5.0, 1.0]
    f = lf(x=data).with_row_index("i")
    out = f.with_columns(pl.col("x").ewm_mean(alpha=0.3).alias("e")).sort("i")
    got = [t[2] for t in rows(out)]
    want = pd.Series(data).ewm(alpha=0.3, adjust=True).mean().tolist()
    assert got == pytest.approx(want, rel=1e-12)


def test_ewm_mean_span_over_group(pl, lf):
    f = lf(g=["a", "a", "a", "b", "b"], x=[1.0, 2.0, 3.0, 10.0, 20.0]).with_row_index("i")
    out = f.with_columns(pl.col("x").ewm_mean(span=3).over("g").alias("e")).sort("i")
    got = [t[3] for t in rows(out)]
    wa = pd.Series([1.0, 2.0, 3.0]).ewm(span=3, adjust=True).mean().tolist()
    wb = pd.Series([10.0, 20.0]).ewm(span=3, adjust=True).mean().tolist()
    assert got == pytest.approx(wa + wb, rel=1e-12)


def test_cut(pl, lf):
    f = lf(x=[0.5, 1.0, 2.5, 10.0, None])
    out = f.select(pl.col("x").cut([1.0, 3.0], labels=["lo", "mid", "hi"]).alias("b"))
    assert [t[0] for t in rows(out)] == ["lo", "lo", "mid", "hi", None]
    out2 = f.select(pl.col("x").cut([1.0], left_closed=True).alias("b"))
    assert [t[0] for t in rows(out2)] == ["[-inf, 1.0)", "[1.0, inf)", "[1.0, inf)", "[1.0, inf)", None]


def test_qcut(pl, lf):
    f = lf(x=[float(i) for i in range(1, 11)])
    out = f.select(pl.col("x").qcut([0.5], labels=["low", "high"]).alias("b"))
    vals = [t[0] for t in rows(out)]
    assert vals.count("low") == 5 and vals.count("high") == 5


def test_match_to_schema(pl, lf):
    f = lf(a=[1.5], b=["x"], junk=[True])
    out = f.match_to_schema({"a": "Int64", "b": "String", "c": "Float64"})
    assert out.columns == ["a", "b", "c"]
    assert rows(out) == [(1, "x", None)]
    from polars_spark.exceptions import SchemaError

    with pytest.raises(SchemaError, match="missing"):
        f.match_to_schema({"zzz": "Int64"}, missing_columns="raise")
    with pytest.raises((ValueError, SchemaError), match="extra"):
        f.match_to_schema({"a": "Int64"}, extra_columns="raise")


def test_group_by_maintain_order(pl, lf):
    f = lf(g=["b", "a", "c", "a"], x=[1, 2, 3, 4]).with_row_index("i")
    out = f.group_by("g", maintain_order=True).agg(pl.col("x").sum().alias("s"))
    pdf = out.collect()
    assert pdf["g"].tolist() == ["b", "a", "c"]
    assert pdf["s"].tolist() == [1, 6, 3]


def test_ewm_mean_by_halflife(pl, lf):
    import pandas as pd
    import pytest as pt

    # half-life 1h: after exactly 1h the old value's weight halves
    ts = [pd.Timestamp("2024-01-01 00:00"), pd.Timestamp("2024-01-01 01:00"), pd.Timestamp("2024-01-01 01:30")]
    f = lf(ts=ts, x=[10.0, 20.0, 30.0]).set_sorted("ts")
    out = f.with_columns(pl.col("x").ewm_mean_by("ts", half_life="1h").alias("e"))
    got = [t[2] for t in __import__("tests.conftest", fromlist=["rows"]).rows(out, sort_by="ts")]
    # y0 = 10; y1 = 0.5*10 + 0.5*20 = 15; y2: decay = 0.5^0.5
    d = 0.5 ** 0.5
    y2 = d * 15 + (1 - d) * 30
    assert got == pt.approx([10.0, 15.0, y2], rel=1e-12)


def test_interpolate_by(pl, lf):
    f = lf(x=[1.0, None, None, 10.0], t=[0.0, 1.0, 3.0, 4.0]).with_row_index("i")
    out = f.with_columns(pl.col("x").interpolate_by("t").alias("xi")).sort("i")
    got = [t[3] for t in rows(out)]
    # weights by coordinate: 1 + 9*(1/4), 1 + 9*(3/4)
    assert got == [1.0, 3.25, 7.75, 10.0]


def test_ewm_sum_by(pl, lf):
    import pandas as pd

    f = lf(
        t=pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 03:00"]),
        x=[4.0, 2.0, 1.0],
    ).set_sorted("t")
    out = f.select(pl.col("x").ewm_sum_by("t", half_life="1h").alias("es"), pl.col("t")).sort("t").collect()
    # y0=4; y1=0.5*4+2=4; y2=0.25*4+1=2
    assert out["es"].tolist() == [4.0, 4.0, 2.0]


def test_unbiased_skew_kurtosis_match_pandas(pl, lf):
    import pandas as pd

    vals = [1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0, 9.0, 2.5, 6.0]
    f = lf(v=vals)
    got = f.select(
        pl.col("v").skew(bias=False).alias("sk"),
        pl.col("v").kurtosis(fisher=True, bias=False).alias("ku"),
        pl.col("v").kurtosis(fisher=False, bias=False).alias("kup"),
    ).collect()
    s = pd.Series(vals)
    assert abs(got["sk"][0] - s.skew()) < 1e-9          # pandas skew = G1
    assert abs(got["ku"][0] - s.kurt()) < 1e-9          # pandas kurt = G2
    assert abs(got["kup"][0] - (s.kurt() + 3)) < 1e-9


def test_rolling_skew_kurt_unbiased_match_pandas(pl, lf):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(3)
    vals = rng.rand(40).tolist()
    f = lf(i=list(range(40)), v=vals).sort("i")
    got = (
        f.select(
            pl.col("v").rolling_skew(7, bias=False).alias("rs"),
            pl.col("v").rolling_kurtosis(7, fisher=True, bias=False).alias("rk"),
        )
        .collect()
    )
    s = pd.Series(vals)
    exp_s = s.rolling(7).skew()   # pandas rolling skew/kurt are the unbiased G1/G2
    exp_k = s.rolling(7).kurt()
    for i in range(7 - 1, 40):
        assert abs(got["rs"][i] - exp_s[i]) < 1e-8, i
        assert abs(got["rk"][i] - exp_k[i]) < 1e-8, i


def test_rolling_quantile_interpolations(pl, lf):
    import numpy as np

    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0]
    f = lf(i=list(range(8)), v=vals).sort("i")
    q = 0.3
    got = f.select(
        pl.col("v").rolling_quantile(q, "lower", window_size=4).alias("lo"),
        pl.col("v").rolling_quantile(q, "higher", window_size=4).alias("hi"),
        pl.col("v").rolling_quantile(q, "midpoint", window_size=4).alias("mid"),
        pl.col("v").rolling_quantile(q, "nearest", window_size=4).alias("near"),
    ).collect()
    for i in range(3, 8):
        win = sorted(vals[i - 3 : i + 1])
        pos = (len(win) - 1) * q
        lo, hi = win[int(np.floor(pos))], win[int(np.ceil(pos))]
        assert got["lo"][i] == lo
        assert got["hi"][i] == hi
        assert got["mid"][i] == (lo + hi) / 2
        assert got["near"][i] == win[int(np.floor(pos + 0.5))]
