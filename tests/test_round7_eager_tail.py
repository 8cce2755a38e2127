"""Round 7 (VERDICT r6 item 6): DataFrame.plot namespace + __dataframe__
interchange — the most user-visible of the missing eager methods.

altair isn't in this image, so the plot namespace is exercised down to the
env-gated raise (the namespace class, arg plumbing, and reference-doc
semantics are real; only the alt.Chart construction is gated).  The
interchange protocol has no extra deps and round-trips through
pandas.api.interchange.
"""

import pandas as pd
import pytest

import polars_spark as pl

HAS_ALTAIR = True
try:
    import altair  # noqa: F401
except ImportError:
    HAS_ALTAIR = False


@pytest.fixture()
def df(pl, spark):
    return pl.LazyFrame({"day": ["Mon", "Tue", "Wed"], "value": [3, 1, 2]})


# -- interchange protocol ----------------------------------------------------


def test_dataframe_interchange_roundtrip(df):
    dfi = df.__dataframe__()
    assert dfi.num_rows() == 3
    assert dfi.num_columns() == 2
    back = pd.api.interchange.from_dataframe(dfi)
    assert list(back.columns) == ["day", "value"]
    assert sorted(back["value"].tolist()) == [1, 2, 3]


def test_dataframe_interchange_nan_as_null_raises(df):
    with pytest.raises(NotImplementedError, match="nan_as_null"):
        df.__dataframe__(nan_as_null=True)


def test_interchange_consumable_by_pandas_from_dataframe_on_floats(pl, spark):
    lf = pl.LazyFrame({"x": [1.5, None, 2.5]})
    back = pd.api.interchange.from_dataframe(lf.__dataframe__())
    vals = back["x"].tolist()
    assert vals[0] == 1.5 and vals[2] == 2.5


# -- plot namespaces ---------------------------------------------------------


@pytest.mark.skipif(HAS_ALTAIR, reason="altair present: gated raise not applicable")
def test_frame_plot_env_gated(df):
    with pytest.raises(NotImplementedError, match="altair"):
        df.plot.bar(x="day", y="value")


@pytest.mark.skipif(HAS_ALTAIR, reason="altair present: gated raise not applicable")
def test_series_plot_env_gated(pl):
    s = pl.Series("price", [1, 3, 3, 5])
    with pytest.raises(NotImplementedError, match="altair"):
        s.plot.hist()


@pytest.mark.skipif(not HAS_ALTAIR, reason="altair absent")
def test_frame_plot_builds_chart(df):
    chart = df.plot.bar(x="day", y="value")
    spec = chart.to_dict()
    assert spec["mark"]["type"] == "bar"
    assert spec["encoding"]["x"]["field"] == "day"


@pytest.mark.skipif(not HAS_ALTAIR, reason="altair absent")
def test_series_plot_builds_hist(pl):
    s = pl.Series("price", [1, 3, 3, 5])
    spec = s.plot.hist().to_dict()
    assert spec["mark"]["type"] == "bar"
