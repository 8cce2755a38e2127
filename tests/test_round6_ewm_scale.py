"""Round 6: scale-safe ewm (VERDICT r5 item 4) and the with_row_index
range-sampling determinism fix.

ewm_mean/std/var as TOP-LEVEL exprs are hoisted into one applyInPandas
pass per key set (O(n) per key, Arrow-batched) that replays the exact
IEEE op sequence of the expression-level prefix fold — so the bit-exact
recursive-CTE oracles stay green while a 10⁶-row single-key series
finishes in seconds instead of the fold's O(n²) hours.  Nested ewm
compositions still take the fold path; these tests pin both paths equal.
"""

import time

import numpy as np
import pytest

import polars_spark as pl


@pytest.fixture(scope="module")
def keyed():
    rs = np.random.RandomState(1)
    return pl.LazyFrame(
        {"g": rs.randint(0, 10, 2000).astype(str), "x": rs.rand(2000)}
    )


@pytest.mark.parametrize(
    "mk",
    [
        lambda e: e.ewm_mean(span=10),
        lambda e: e.ewm_mean(span=10, adjust=False),
        lambda e: e.ewm_std(span=10, bias=False),
        lambda e: e.ewm_std(span=10, bias=True),
        lambda e: e.ewm_var(span=10, bias=False),
    ],
    ids=["mean", "mean-noadjust", "std", "std-bias", "var"],
)
def test_hoisted_path_bit_exact_vs_fold(keyed, mk):
    # top-level expr -> applyInPandas hoist; (expr * 1.0) -> prefix fold
    h = (
        keyed.with_columns(e=mk(pl.col("x")).over("g"))
        .collect()
        .sort_values("x")["e"]
        .to_numpy()
    )
    f = (
        keyed.with_columns(e=(mk(pl.col("x")) * 1.0).over("g"))
        .collect()
        .sort_values("x")["e"]
        .to_numpy()
    )
    assert ((h == f) | (np.isnan(h) & np.isnan(f))).all()


def test_million_row_single_key_finishes_in_seconds():
    big = pl.LazyFrame({"x": np.random.RandomState(0).rand(1_000_000)})
    t0 = time.time()
    r = big.select(pl.col("x").ewm_mean(span=100).alias("e")).collect()
    took = time.time() - t0
    assert len(r) == 1_000_000
    assert r["e"].notna().all()
    assert took < 120, f"ewm hoist too slow: {took:.0f}s"


def test_with_row_index_never_drops_rows_on_ordered_frames():
    # regression: rangepartitioning samples bounds nondeterministically; the
    # counts branch and numbering branch used to re-evaluate it differently,
    # silently dropping rows in the offsets join
    big = pl.LazyFrame({"x": np.random.RandomState(0).rand(400_000)})
    for _ in range(2):
        out = big.with_row_index("i").collect()
        assert len(out) == 400_000
        assert out["i"].nunique() == 400_000


def test_nulls_and_min_samples_match_fold(keyed):
    rs = np.random.RandomState(2)
    xs = rs.rand(300)
    xs[::7] = np.nan
    df = pl.LazyFrame({"x": [None if v != v else float(v) for v in xs]})
    h = df.with_columns(
        e=pl.col("x").ewm_mean(span=5, min_samples=3)
    ).collect()["e"].to_numpy()
    f = df.with_columns(
        e=(pl.col("x").ewm_mean(span=5, min_samples=3) * 1.0)
    ).collect()["e"].to_numpy()
    assert ((h == f) | (np.isnan(h) & np.isnan(f))).all()


def test_grouped_ewm_returns_running_list_per_group():
    # polars: a length-preserving expr inside .agg() implodes — here the
    # RUNNING ewm over the group in row order (reference implicit implode)
    df = pl.LazyFrame({"g": ["a", "a", "b"], "x": [1.0, 2.0, 3.0]})
    r = (
        df.group_by("g")
        .agg(
            pl.col("x").ewm_mean(span=2).alias("e"),
            pl.col("x").ewm_std(span=2, bias=False).alias("s"),
        )
        .sort("g")
        .collect()
    )
    assert [[round(v, 4) for v in vs] for vs in r["e"]] == [[1.0, 1.75], [3.0]]
    assert [round(v, 4) for v in r["s"].iloc[0]] == [0.0, 0.7071]
