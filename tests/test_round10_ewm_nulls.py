"""Round-10: ewm family under nulls — reference ignore_nulls/adjust rules.

The engine previously hardwired ignore_nulls=True (nulls skipped) while
the reference default is False (nulls decay the weights by absolute
position, polars-compute/src/ewm/).  pandas implements the identical
semantics via ignore_na, so it is the oracle here — with one polars
delta: polars emits NULL at null-input positions (mean.rs: opt_v must be
Some), where pandas carries the previous value.  Both the expression
fold and the hoisted mapInPandas kernel are exercised (with_columns
hoists; .over() inside a wider expression folds).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest


def _series(rng, n, null_p):
    return [None if rng.random() < null_p else round(rng.uniform(-50, 50), 3) for _ in range(n)]


def _check(got_vals, pd_vals, vals, min_ok=None):
    for i, v in enumerate(vals):
        g = got_vals[i]
        if v is None:
            assert g is None or (isinstance(g, float) and np.isnan(g)) is False and g is None, (
                f"row {i}: null input must give null output, got {g!r}"
            )
        else:
            w = pd_vals[i]
            if min_ok is not None and not min_ok[i]:
                assert g is None, (i, g)
            elif np.isnan(w):
                assert g is None or np.isnan(g), (i, g, w)
            else:
                assert g == pytest.approx(w, rel=1e-9, abs=1e-9), (i, g, w)


@pytest.mark.parametrize("adjust", [True, False])
@pytest.mark.parametrize("ignore_nulls", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_ewm_mean_matches_pandas(pl, spark, adjust, ignore_nulls, seed):
    rng = random.Random(87000 + seed)
    vals = _series(rng, 25, 0.25)
    df = pl.from_records(
        [[i, v] for i, v in enumerate(vals)],
        schema={"rid": "Int64", "v": "Float64"}, orient="row",
    )
    # top-level with_columns -> hoisted kernel path
    got = [
        r["e"]
        for r in df.with_columns(
            pl.col("v").ewm_mean(alpha=0.3, adjust=adjust, ignore_nulls=ignore_nulls).alias("e")
        ).to_dicts()
    ]
    want = (
        pd.Series(vals, dtype=float)
        .ewm(alpha=0.3, adjust=adjust, ignore_na=ignore_nulls)
        .mean()
        .tolist()
    )
    _check(got, want, vals)
    # nested composition -> expression fold path (same numbers expected)
    got_fold = [
        r["e"]
        for r in df.with_columns(
            (pl.col("v").ewm_mean(alpha=0.3, adjust=adjust, ignore_nulls=ignore_nulls) * 1.0)
            .alias("e")
        ).to_dicts()
    ]
    _check(got_fold, want, vals)


@pytest.mark.parametrize("adjust", [True, False])
@pytest.mark.parametrize("ignore_nulls", [False, True])
@pytest.mark.parametrize("bias", [False, True])
def test_ewm_var_matches_pandas(pl, spark, adjust, ignore_nulls, bias):
    rng = random.Random(88001)
    vals = _series(rng, 22, 0.2)
    df = pl.from_records(
        [[i, v] for i, v in enumerate(vals)],
        schema={"rid": "Int64", "v": "Float64"}, orient="row",
    )
    got = [
        r["e"]
        for r in df.with_columns(
            pl.col("v")
            .ewm_var(alpha=0.4, adjust=adjust, ignore_nulls=ignore_nulls, bias=bias, min_samples=2)
            .alias("e")
        ).to_dicts()
    ]
    want = (
        pd.Series(vals, dtype=float)
        .ewm(alpha=0.4, adjust=adjust, ignore_na=ignore_nulls, min_periods=2)
        .var(bias=bias)
        .tolist()
    )
    _check(got, want, vals)


@pytest.mark.parametrize("ignore_nulls", [False, True])
def test_ewm_sum_matches_pandas(pl, spark, ignore_nulls):
    rng = random.Random(88500)
    vals = _series(rng, 25, 0.25)
    df = pl.from_records(
        [[i, v] for i, v in enumerate(vals)],
        schema={"rid": "Int64", "v": "Float64"}, orient="row",
    )
    got = [
        r["e"]
        for r in df.with_columns(
            pl.col("v").ewm_sum(alpha=0.3, ignore_nulls=ignore_nulls).alias("e")
        ).to_dicts()
    ]
    # the reference recursion s = (1-a)s + x equals pandas ewm(adjust=True)
    # .sum() (weights: newest 1, older (1-a)^k; pandas refuses adjust=False)
    want = (
        pd.Series(vals, dtype=float)
        .ewm(alpha=0.3, adjust=True, ignore_na=ignore_nulls)
        .sum()
        .tolist()
    )
    _check(got, want, vals)


def test_ewm_sum_long_series_no_overflow(pl, spark):
    """The old closed-form lowering scaled by (1-a)^(-pos) and overflowed
    past ~1000 rows; the fold must stay finite on a 3000-row series."""
    n = 3000
    df = pl.from_records(
        [[i, float(i % 7)] for i in range(n)],
        schema={"rid": "Int64", "v": "Float64"}, orient="row",
    )
    out = df.with_columns(pl.col("v").ewm_sum(alpha=0.5).alias("e")).tail(1).to_dicts()
    v = out[0]["e"]
    assert v is not None and np.isfinite(v), v
    # closed form of the tail for the repeating 0..6 pattern converges; just
    # sanity-bound it
    assert 0.0 <= v <= 14.0, v
