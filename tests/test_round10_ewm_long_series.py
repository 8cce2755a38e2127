"""Round-10: win_ewm_long_series — the linear-scaling evidence entry.

The streaming mapInPandas kernel (plans/frame.py _hoist_ewm) is O(n) per
key; this gate pushes ONE maximal-length series (whole lineitem, 60k rows
at sf0.01) through it and digests to one row.  Pandas is the semantics
reference for ewm (polars-compute/src/ewm/ mirrors it), so the digest is
pinned against pandas.ewm exactly — the recursive-CTE oracles cover the
bit-exact small-series case; this covers the long-series path end-to-end.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"


def test_long_series_digest_matches_pandas(pl, spark):
    from polars_spark.queries import QUERIES

    row = QUERIES["win_ewm_long_series"](spark, SF_DIR).collect()[0]

    df = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).to_pandas()
    df = df.sort_values(["l_orderkey", "l_linenumber"], ignore_index=True)
    m = df["l_extendedprice"].ewm(span=10, adjust=True).mean()
    s = df["l_extendedprice"].ewm(span=10, adjust=True).std()

    import math

    def fr2(x):  # the gate's tie-stable digest: floor(x*100+0.5)/100
        return math.floor(x * 100.0 + 0.5) / 100.0

    assert row.n == len(df)
    assert row.ewm_m_last == fr2(m.iloc[-1])
    assert row.ewm_m_avg == fr2(m.mean())
    assert row.ewm_s_last == fr2(s.iloc[-1])


def test_long_series_takes_kernel_not_fold(pl, spark):
    """The plan must contain the mapInPandas kernel (FlatMapGroupsInPandas /
    MapInPandas node), not a per-row collect_list prefix fold — the fold at
    600k rows is ~3.6e11 steps."""
    from polars_spark.queries import QUERIES

    sdf = QUERIES["win_ewm_long_series"](spark, SF_DIR)
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:2000]
    assert "collect_list" not in plan, "fold path engaged on the long series"
