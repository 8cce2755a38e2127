"""Round 6: native Time dtype (VERDICT r5 item 7).

polars Time (reference polars-time/src/chunkedarray/time.rs, dtype.rs:123)
is now backed by Spark 4's NATIVE TIME(6) type (spark.sql.timeType.enabled,
set in session.py) instead of the previous ns-bigint tagging: literals,
comparisons, sorts, group-by keys, min/max, Datetime<->Time casts and the
.dt accessors are all JVM-native at µs precision (the same fixed-µs policy
as Datetime).  Oracle gate: tmp_time_of_day vs DuckDB TIME.
"""

import datetime as dt

import polars_spark as pl


def test_construct_and_roundtrip():
    df = pl.DataFrame({"t": [dt.time(1, 2, 3, 123456), dt.time(23, 0)]})
    assert df.schema["t"].startswith("time")
    assert df.rows() == [(dt.time(1, 2, 3, 123456),), (dt.time(23, 0),)]


def test_comparisons_and_sort():
    df = pl.DataFrame({"t": [dt.time(13), dt.time(6, 30), dt.time(23, 59)]})
    assert df.filter(pl.col("t") > dt.time(12)).sort("t").rows() == [
        (dt.time(13),),
        (dt.time(23, 59),),
    ]
    out = df.select(pl.col("t").min().alias("a"), pl.col("t").max().alias("b"))
    assert out.rows() == [(dt.time(6, 30), dt.time(23, 59))]


def test_dt_accessors_on_time():
    df = pl.DataFrame({"t": [dt.time(1, 2, 3, 123456)]})
    got = df.select(
        pl.col("t").dt.hour().alias("h"),
        pl.col("t").dt.minute().alias("m"),
        pl.col("t").dt.second().alias("s"),
        pl.col("t").dt.millisecond().alias("ms"),
        pl.col("t").dt.microsecond().alias("us"),
        pl.col("t").dt.nanosecond().alias("ns"),
    ).rows()[0]
    assert got == (1, 2, 3, 123, 123456, 123456000)


def test_casts():
    ts = pl.DataFrame({"ts": [dt.datetime(2024, 1, 2, 3, 4, 5, 678901)]})
    assert ts.select(pl.col("ts").cast(pl.Time).alias("t")).rows() == [
        (dt.time(3, 4, 5, 678901),)
    ]
    assert ts.select(pl.col("ts").dt.time().alias("t")).rows() == [
        (dt.time(3, 4, 5, 678901),)
    ]
    s = pl.DataFrame({"s": ["13:14:15.5"]})
    assert s.select(pl.col("s").cast(pl.Time).alias("t")).rows() == [
        (dt.time(13, 14, 15, 500000),)
    ]
    # physical cast: Time -> Int64 is ns since midnight (polars rule)
    t = pl.DataFrame({"t": [dt.time(1, 2, 3, 123456)]})
    assert t.select(pl.col("t").cast(pl.Int64).alias("n")).rows() == [
        (3723123456000,)
    ]
    # ns since midnight -> Time (the legacy physical mapping still casts in)
    n = pl.DataFrame({"n": [3723123456000]})
    assert n.select(pl.col("n").cast(pl.Time).alias("t")).rows() == [
        (dt.time(1, 2, 3, 123456),)
    ]


def test_group_by_time_key():
    g = pl.DataFrame({"t": [dt.time(1), dt.time(1), dt.time(2)], "v": [1, 2, 3]})
    out = sorted(g.group_by("t").agg(pl.col("v").sum().alias("s")).rows())
    assert out == [(dt.time(1), 3), (dt.time(2), 3)]


def test_time_range_and_literal():
    tr = pl.time_range(dt.time(0), dt.time(3), "1h")
    assert tr.to_list() == [dt.time(h) for h in range(4)]
    out = pl.DataFrame({"a": [1]}).select(pl.time(10, 30).alias("t")).rows()
    assert out == [(dt.time(10, 30),)]


def test_series_dtype_reports_time():
    assert pl.Series("t", [dt.time(5, 6, 7)]).dtype == pl.Time
