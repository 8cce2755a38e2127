"""Round-10: rolling_*_by temporal-window fuzz, all closed modes.

tmp_rolling_30m pins one period/closed combination on the events table;
this family randomizes timestamps (irregular gaps, duplicate stamps),
values (nulls), periods and all four closed modes against a pure-Python
oracle of the polars rule: the window for row t is (t - period, t] for
closed='right', [t - period, t] 'both', [t - period, t) 'left',
(t - period, t) 'none'; min_samples masks short windows.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

_BOUNDS = {
    "right": (False, True),
    "both": (True, True),
    "left": (True, False),
    "none": (False, False),
}


def _oracle(ts, vals, period_us, closed, min_samples, agg):
    inc_lo, inc_hi = _BOUNDS[closed]
    out = []
    for i, t in enumerate(ts):
        lo = t - period_us
        win = []
        for j, tj in enumerate(ts):
            ok_lo = tj >= lo if inc_lo else tj > lo
            ok_hi = tj <= t if inc_hi else tj < t
            if ok_lo and ok_hi and vals[j] is not None:
                win.append(vals[j])
        if len(win) < min_samples or not win:
            out.append(None)
        elif agg == "sum":
            out.append(sum(win))
        elif agg == "mean":
            out.append(sum(win) / len(win))
        elif agg == "min":
            out.append(min(win))
        else:
            out.append(max(win))
    return out


@pytest.mark.parametrize("closed", ["right", "both", "left", "none"])
@pytest.mark.parametrize("seed", [0, 1])
def test_rolling_by_fuzz(pl, spark, closed, seed):
    rng = random.Random(95000 + seed * 7 + {"right": 0, "both": 1, "left": 2, "none": 3}[closed])
    n = rng.choice([1, 25])
    base = dt.datetime(2021, 3, 1)
    t = 0
    ts, vals, rows = [], [], []
    for i in range(n):
        t += rng.choice([0, 1, 5, 29, 30, 31, 60]) * 60  # minutes -> seconds; dup stamps too
        stamp = base + dt.timedelta(seconds=t)
        v = None if rng.random() < 0.15 else rng.randrange(100)
        ts.append(t * 1_000_000)
        vals.append(v)
        rows.append([i, stamp, v])
    min_samples = rng.choice([1, 2])

    df = pl.from_records(
        rows, schema={"rid": "Int64", "ts": "Datetime", "v": "Int64"}, orient="row"
    ).sort("ts", maintain_order=True)
    out = df.with_columns(
        pl.col("v").rolling_sum_by("ts", "30m", min_samples=min_samples, closed=closed).alias("rs"),
        pl.col("v").rolling_mean_by("ts", "30m", min_samples=min_samples, closed=closed).alias("rm"),
        pl.col("v").rolling_min_by("ts", "30m", min_samples=min_samples, closed=closed).alias("rmin"),
        pl.col("v").rolling_max_by("ts", "30m", min_samples=min_samples, closed=closed).alias("rmax"),
    ).to_dicts()
    got = {r["rid"]: r for r in out}

    period_us = 30 * 60 * 1_000_000
    for col, agg in [("rs", "sum"), ("rm", "mean"), ("rmin", "min"), ("rmax", "max")]:
        want = _oracle(ts, vals, period_us, closed, min_samples, agg)
        for i in range(n):
            w, g = want[i], got[i][col]
            if isinstance(w, float):
                assert g == pytest.approx(w), (closed, seed, i, col, g, w)
            else:
                assert g == w, (closed, seed, i, col, vals[i], g, w)
