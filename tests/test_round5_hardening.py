"""Regression tests for the round-5 review-fix batch."""

import pytest


def test_positional_arithmetic_shape_errors(pl):
    f = pl.DataFrame({"x": [1, 2], "y": [2.0, 3.0]})
    assert (f * f).collect()["x"].tolist() == [1, 4]
    with pytest.raises(ValueError, match="width mismatch"):
        f * pl.DataFrame({"x": [1, 2]})
    g = pl.DataFrame({"x": [1, 2, 9], "y": [2.0, 3.0, 1.0]})
    with pytest.raises(Exception, match="height mismatch|USER_RAISED"):
        (f * g).collect()


def test_read_json_payload_vs_path_routing(pl, tmp_path):
    # inline payloads start with { or [
    lf = pl.read_json('[{"a": 1}, {"a": 2}]')
    assert lf.collect()["a"].tolist() == [1, 2]
    # plain paths still route through spark.read.json
    p = tmp_path / "d.json"
    p.write_text('[{"a": 5}]')
    assert pl.read_json(str(p)).collect()["a"].tolist() == [5]


def test_sql_floordiv_rewrite_preserves_quotes(pl, lf):
    f = lf(a=[7, 9], url=["http://x", "http://y"])
    ctx = pl.SQLContext(frames={"t": f})
    out = ctx.execute("SELECT a // 2 AS d, url FROM t ORDER BY a").collect()
    assert out["d"].tolist() == [3, 4]
    assert out["url"].tolist() == ["http://x", "http://y"]
    # a backtick-quoted identifier containing // must survive
    g = lf(**{"a//b": [1]})
    ctx2 = pl.SQLContext(frames={"u": g})
    out2 = ctx2.execute('SELECT "a//b" AS v FROM u').collect()
    assert out2["v"].tolist() == [1]


def test_range_closed_with_expression_bounds(pl):
    from datetime import datetime

    df = pl.DataFrame({"k": [1, 1], "t": [datetime(2020, 1, 1), datetime(2020, 1, 1, 2)]})
    r = (
        df.lazy()
        .group_by("k")
        .agg(pl.datetime_range(pl.col("t").min(), pl.col("t").max(), "1h", closed="left").alias("r"))
        .collect()
    )
    assert len(r["r"][0]) == 2  # endpoint excluded

    out = df.lazy().select(ls=pl.linear_space(0, 1, pl.len())).collect()
    assert list(out["ls"][0]) == [0.0, 1.0]
    one = pl.DataFrame({"a": [1]}).lazy().select(ls=pl.linear_space(0, 1, pl.len())).collect()
    assert list(one["ls"][0]) == [0.0]
    with pytest.raises(ValueError, match="closed"):
        pl.linear_space(0, 1, pl.len(), closed="left")


def test_series_agg_unwrap_keeps_list_results(pl):
    s = pl.Series("s", [[1, 2], [3]])
    # explode through the namespace proxy must stay a Series, not collapse
    exploded = s.list.explode() if hasattr(s.list, "explode") else None
    if exploded is not None and hasattr(exploded, "to_list"):
        assert sorted(exploded.to_list()) == [1, 2, 3]
    from datetime import date

    d = pl.Series("d", [date(2021, 1, 3), date(2021, 1, 1)])
    assert d.dt.min() == date(2021, 1, 1)


def test_replace_strict_default_none_vs_absent(pl, lf):
    f = lf(x=["a", "zzz"])
    # explicit default=None: unmatched -> null
    out = f.select(pl.col("x").replace_strict({"a": 1}, default=None).alias("r")).collect()
    vals = out["r"].tolist()
    assert vals[0] == 1 and (vals[1] is None or vals[1] != vals[1])
    # absent default: unmatched raises
    with pytest.raises(Exception, match="replace_strict|USER_RAISED"):
        f.select(pl.col("x").replace_strict({"a": 1}).alias("r")).collect()


def test_strptime_midstring_weekday(pl):
    s = pl.Series("d", ["04 Sun Jan 2026"])
    out = s.to_frame().select(pl.col("d").str.strptime(pl.Date, "%d %c", strict=False)).collect()
    # the weekday token is stripped wherever it sits; parse succeeds or nulls,
    # never raises the Spark EEE pattern error
    assert len(out) == 1


def test_interpolate_by_leading_null_coordinate(pl):
    from datetime import date

    s = pl.Series("v", [1.0, None, 4.0])
    by = pl.Series("by", [date(2020, 1, 1), date(2020, 1, 2), date(2020, 1, 4)])
    assert s.interpolate_by(by).to_list() == [1.0, 2.0, 4.0]
