"""Round-10: window-family fuzz under randomized ties and nulls.

win_rank_family / win_shift_cum / win_distinct_flags are driver-green on
the events table, which samples the tie/null space pointwise.  This
family randomizes it: per-group series with heavy duplicate values and
nulls, checked against a pure-Python oracle implementing the polars
rules — rank (all five methods; nulls rank null and consume no ranks;
ordinal ties break by row order), cum_sum (nulls stay null, accumulator
skips them), shift/diff (positional, null-propagating), and
is_first_distinct / is_duplicated (null IS a distinct value).
"""

from __future__ import annotations

import random

import pytest


def _oracle_ranks(vals, method):
    nn = [(v, i) for i, v in enumerate(vals) if v is not None]
    nn_sorted = sorted(nn, key=lambda t: (t[0], t[1]))
    out = [None] * len(vals)
    # group by value
    groups: dict = {}
    for pos, (v, i) in enumerate(nn_sorted, 1):
        groups.setdefault(v, []).append((pos, i))
    dense = {v: d for d, v in enumerate(sorted(groups), 1)}
    for v, members in groups.items():
        positions = [p for p, _ in members]
        for p, i in members:
            if method == "ordinal":
                out[i] = p
            elif method == "min":
                out[i] = min(positions)
            elif method == "max":
                out[i] = max(positions)
            elif method == "dense":
                out[i] = dense[v]
            else:  # average
                out[i] = sum(positions) / len(positions)
    return out


def _oracle_cum_sum(vals):
    acc, out = 0, []
    for v in vals:
        if v is None:
            out.append(None)
        else:
            acc += v
            out.append(acc)
    return out


def _oracle_shift(vals, n=1):
    return [None] * n + list(vals[:-n]) if n else list(vals)


def _oracle_diff(vals):
    sh = _oracle_shift(vals, 1)
    return [None if a is None or b is None else a - b for a, b in zip(vals, sh)]


def _oracle_first_distinct(vals):
    seen, out = set(), []
    for v in vals:
        k = ("null",) if v is None else v
        out.append(k not in seen)
        seen.add(k)
    return out


def _oracle_duplicated(vals):
    from collections import Counter

    c = Counter(("null",) if v is None else v for v in vals)
    return [c[("null",) if v is None else v] > 1 for v in vals]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_window_family_fuzz(pl, spark, seed):
    rng = random.Random(81000 + seed)
    rows = []
    rid = 0
    series: dict = {}
    for g in ["a", "b", "c"]:
        n = rng.choice([0, 1, 30])
        vals = [
            None if rng.random() < 0.18 else rng.randrange(0, 6)  # heavy ties
            for _ in range(n)
        ]
        series[g] = vals
        for v in vals:
            rows.append([rid, g, v])
            rid += 1
    df = pl.from_records(rows, schema={"rid": "Int64", "g": "String", "v": "Int64"}, orient="row")

    out = df.with_columns(
        pl.col("v").rank("average").over("g").alias("r_avg"),
        pl.col("v").rank("min").over("g").alias("r_min"),
        pl.col("v").rank("max").over("g").alias("r_max"),
        pl.col("v").rank("dense").over("g").alias("r_dense"),
        pl.col("v").rank("ordinal").over("g").alias("r_ord"),
        pl.col("v").cum_sum().over("g").alias("csum"),
        pl.col("v").shift(1).over("g").alias("sh1"),
        pl.col("v").diff().over("g").alias("dif"),
        pl.col("v").is_first_distinct().over("g").alias("fd"),
        pl.col("v").is_duplicated().over("g").alias("dup"),
    ).to_dicts()
    got = {r["rid"]: r for r in out}

    rid = 0
    for g, vals in series.items():
        want = {
            "r_avg": _oracle_ranks(vals, "average"),
            "r_min": _oracle_ranks(vals, "min"),
            "r_max": _oracle_ranks(vals, "max"),
            "r_dense": _oracle_ranks(vals, "dense"),
            "r_ord": _oracle_ranks(vals, "ordinal"),
            "csum": _oracle_cum_sum(vals),
            "sh1": _oracle_shift(vals),
            "dif": _oracle_diff(vals),
            "fd": _oracle_first_distinct(vals),
            "dup": _oracle_duplicated(vals),
        }
        for i, v in enumerate(vals):
            r = got[rid]
            for col, series_want in want.items():
                w = series_want[i]
                g_v = r[col]
                if isinstance(w, float):
                    assert g_v == pytest.approx(w), (seed, g, i, col, g_v, w)
                else:
                    assert g_v == w, (seed, g, i, col, v, g_v, w)
            rid += 1
