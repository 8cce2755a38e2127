"""Round-10: fill_null strategies + interpolate fuzz under random null runs.

win_fill_strategies pins one shape; this family randomizes null-run
placement (leading, trailing, interior, all-null, no-null) against a
pure-Python oracle of the polars rules: forward/backward fill (with and
without limit), min/max/mean/zero/one strategies, and linear
interpolation (interior gaps only — leading/trailing nulls stay null;
values at fractional positions between the surrounding non-nulls).
"""

from __future__ import annotations

import random

import pytest


def _ffill(vals, limit=None):
    out, last, run = [], None, 0
    for v in vals:
        if v is None:
            run += 1
            out.append(last if (limit is None or run <= limit) else None)
        else:
            last, run = v, 0
            out.append(v)
    return out


def _bfill(vals, limit=None):
    return list(reversed(_ffill(list(reversed(vals)), limit)))


def _interp(vals):
    out = list(vals)
    known = [i for i, v in enumerate(vals) if v is not None]
    for a, b in zip(known, known[1:]):
        for i in range(a + 1, b):
            frac = (i - a) / (b - a)
            out[i] = vals[a] + (vals[b] - vals[a]) * frac
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fill_and_interpolate_fuzz(pl, spark, seed):
    rng = random.Random(99000 + seed)
    shape = rng.choice(["random", "leading", "trailing", "allnull", "nonull"])
    n = rng.choice([1, 20])
    vals = []
    for i in range(n):
        if shape == "allnull":
            vals.append(None)
        elif shape == "nonull":
            vals.append(rng.randrange(50))
        elif shape == "leading":
            vals.append(None if i < n // 2 else rng.randrange(50))
        elif shape == "trailing":
            vals.append(rng.randrange(50) if i < n // 2 else None)
        else:
            vals.append(None if rng.random() < 0.35 else rng.randrange(50))
    limit = rng.choice([None, 1, 2])

    rows = [[i, v] for i, v in enumerate(vals)]
    df = pl.from_records(rows, schema={"rid": "Int64", "v": "Int64"}, orient="row")
    out = df.with_columns(
        pl.col("v").fill_null(strategy="forward", limit=limit).alias("ff"),
        pl.col("v").fill_null(strategy="backward", limit=limit).alias("bf"),
        pl.col("v").fill_null(strategy="zero").alias("z"),
        pl.col("v").fill_null(strategy="min").alias("mn"),
        pl.col("v").fill_null(strategy="max").alias("mx"),
        pl.col("v").cast("Float64").interpolate().alias("itp"),
    ).to_dicts()
    got = {r["rid"]: r for r in out}

    nn = [v for v in vals if v is not None]
    want = {
        "ff": _ffill(vals, limit),
        "bf": _bfill(vals, limit),
        "z": [0 if v is None else v for v in vals],
        "mn": [min(nn) if v is None and nn else v for v in vals],
        "mx": [max(nn) if v is None and nn else v for v in vals],
        "itp": _interp(vals),
    }
    for i in range(n):
        for col in want:
            w, g = want[col][i], got[i][col]
            if isinstance(w, float):
                assert g == pytest.approx(w), (seed, shape, i, col, g, w)
            else:
                assert g == w, (seed, shape, i, col, vals[i], g, w, limit)
