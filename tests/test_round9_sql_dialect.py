"""Pinned SQL-dialect divergence (documented in polars_spark/sql.py):
raw SQL division keeps Spark's ANSI semantics (zero divisor errors),
while the DataFrame API carries the polars IEEE rule (x/0 -> ±inf).
Both behaviors are asserted so an accidental change to either side of
the boundary goes red.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest


def test_sql_division_is_ansi(pl, lf):
    ctx = pl.SQLContext(frames={"t_dialect": lf(a=[1.0, 2.0], b=[1.0, 0.0])})
    try:
        with pytest.raises(Exception, match="(?i)divide|division"):
            ctx.execute("SELECT a / b AS q FROM t_dialect").collect()
        # the documented in-SQL escape hatches stay null-safe
        out = ctx.execute(
            "SELECT try_divide(a, b) AS q1, a / nullif(b, 0) AS q2 FROM t_dialect"
        ).collect()
        assert out["q1"].tolist()[0] == 1.0 and pd.isna(out["q1"].tolist()[1])
    finally:
        ctx.unregister("t_dialect")


def test_dataframe_division_is_polars_ieee(pl, lf):
    f = lf(a=[1.0, -3.0, 0.0, None], b=[0.0, 0.0, 0.0, 0.0])
    got = f.select((pl.col("a") / pl.col("b")).alias("q")).collect()["q"].tolist()
    assert got[0] == float("inf")
    assert got[1] == float("-inf")
    assert math.isnan(got[2])
    assert got[3] is None or (isinstance(got[3], float) and math.isnan(got[3]))
