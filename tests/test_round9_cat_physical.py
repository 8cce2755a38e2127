"""Round-9 categorical physical tail (VERDICT r8 item 8).

Enum.to_physical -> frozen category index (reference dtype.rs:135,
function_expr/cat.rs); Date/Datetime/Time physical forms; StringCache /
enable_string_cache compat semantics (flag round-trip + categoricals
joinable under and outside the cache — the engine's string passthrough
makes the cache a semantic no-op, which is the documented §1.2 design).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd


def test_enum_to_physical_codes(pl, lf):
    f = lf(s=["R", "A", "N", None, "R"])
    out = f.select(
        pl.col("s").cast(pl.Enum(["R", "N", "A"])).to_physical().alias("p")
    ).collect()
    got = [None if pd.isna(v) else int(v) for v in out["p"]]
    assert got == [0, 2, 1, None, 0]


def test_enum_physical_roundtrip(pl, lf):
    cats = ["R", "N", "A"]
    f = lf(s=["A", "N", None, "R"])
    phys = pl.col("s").cast(pl.Enum(cats)).to_physical().alias("p")
    out = f.select(pl.col("s"), phys).collect()
    back = [None if pd.isna(p) else cats[int(p)] for p in out["p"]]
    assert back == [None if pd.isna(s) else s for s in out["s"]]


def test_date_datetime_physical(pl, lf):
    f = pl.from_pandas(
        pd.DataFrame(
            {
                "d": [dt.date(1970, 1, 2), dt.date(1969, 12, 31)],
                "ts": [dt.datetime(1970, 1, 1, 0, 0, 1), dt.datetime(1970, 1, 1)],
            }
        )
    )
    out = f.select(
        pl.col("d").cast(pl.Date).to_physical().alias("pd_"),
        pl.col("ts").to_physical().alias("pt"),
    ).collect()
    assert out["pd_"].tolist() == [1, -1]
    assert out["pt"].tolist() == [1_000_000, 0]


def test_time_physical_ns(pl, lf):
    f = lf(ns=[3_600_000_000_000, 0, 59_000_000_000])
    out = f.select(
        pl.col("ns").cast(pl.Time).to_physical().alias("p")
    ).collect()
    assert out["p"].tolist() == [3_600_000_000_000, 0, 59_000_000_000]


def test_string_cache_flag_roundtrip(pl):
    assert pl.using_string_cache() is False
    with pl.StringCache():
        assert pl.using_string_cache() is True
    assert pl.using_string_cache() is False
    pl.enable_string_cache()
    assert pl.using_string_cache() is True
    pl.disable_string_cache()
    assert pl.using_string_cache() is False


def test_categoricals_joinable_under_cache(pl, lf):
    # reference semantics: two frames built UNDER one StringCache join on
    # their categorical columns; the engine's passthrough makes this hold
    # unconditionally (also outside the cache — strictly more permissive,
    # never less)
    with pl.StringCache():
        a = lf(k=["x", "y", "z"], v=[1, 2, 3]).with_columns(
            pl.col("k").cast(pl.Categorical)
        )
        b = lf(k=["y", "z", "w"], w=[20, 30, 40]).with_columns(
            pl.col("k").cast(pl.Categorical)
        )
        out = a.join(b, on="k", how="inner").sort("v").collect()
    assert out["k"].tolist() == ["y", "z"]
    assert out["w"].tolist() == [20, 30]
