"""Round 7: the engine must not assume its consumer's SparkSession was
built by polars_spark.session.get_spark (VERDICT r6 item 1 — the driver
runs registry queries on a VANILLA session where spark.sql.timeType.enabled
is off, and tmp_time_of_day went red with [UNSUPPORTED_TIME_TYPE]).

The conf is runtime-settable, so every Time lowering site now calls
ensure_time_type() on the CONSUMING session.  These tests simulate the
driver: a newSession() with the flag explicitly off (newSession shares the
SparkContext but carries its own SQLConf), then run Time operations and
assert they flip the flag themselves and produce correct results.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture()
def vanilla(spark):
    """A session whose SQLConf looks like the driver's: TIME disabled."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.timeType.enabled", "false")
    assert (s2.conf.get("spark.sql.timeType.enabled") or "").lower() != "true"
    yield s2


def test_tmp_time_of_day_on_vanilla_session(vanilla):
    """The exact red driver row: run the registry query on a session with
    TIME off; the ltable()/lowering-site ensure_time_type must flip it."""
    from polars_spark.queries.order_contract import tmp_time_of_day

    out = tmp_time_of_day(vanilla, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    # conf was flipped on the consuming session, not merely on get_spark's
    assert vanilla.conf.get("spark.sql.timeType.enabled") == "true"
    # values sane: every time-of-day >= 06:30
    for r in rows[:50]:
        assert r["tod"] >= dt.time(6, 30)
        assert r["h"] == r["tod"].hour and r["m"] == r["tod"].minute


def test_dt_time_cast_on_vanilla_session(vanilla):
    import polars_spark as pl

    pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 06:45:01", "2024-01-01 23:59:59"])})
    lf = pl.from_pandas(pdf, spark=vanilla)
    got = lf.select(pl.col("ts").dt.time().alias("t")).collect().rows()
    assert [r[0] for r in got] == [dt.time(6, 45, 1), dt.time(23, 59, 59)]


def test_time_literal_filter_on_vanilla_session(vanilla):
    import polars_spark as pl

    pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 05:00:00", "2024-01-01 07:00:00"])})
    lf = pl.from_pandas(pdf, spark=vanilla)
    got = lf.filter(pl.col("ts").dt.time() >= dt.time(6, 30)).collect().rows()
    assert len(got) == 1


def test_pl_time_fn_on_vanilla_session(vanilla):
    import polars_spark as pl

    pdf = pd.DataFrame({"h": [1, 13], "m": [30, 5]})
    lf = pl.from_pandas(pdf, spark=vanilla)
    got = lf.select(pl.time("h", "m").alias("t")).collect().rows()
    assert [r[0] for r in got] == [dt.time(1, 30), dt.time(13, 5)]


def test_time_range_on_vanilla_session(vanilla):
    import polars_spark as pl

    s = pl.time_range(dt.time(0), dt.time(3), "1h", spark=vanilla, eager=True)
    assert s.to_list() == [dt.time(0), dt.time(1), dt.time(2), dt.time(3)]


def test_from_pandas_time_values_on_vanilla_session(vanilla):
    import polars_spark as pl

    pdf = pd.DataFrame({"t": [dt.time(1, 2, 3), dt.time(4, 5, 6)]})
    lf = pl.from_pandas(pdf, spark=vanilla)
    got = lf.select(pl.col("t").dt.hour().alias("h")).collect().rows()
    assert sorted(r[0] for r in got) == [1, 4]
