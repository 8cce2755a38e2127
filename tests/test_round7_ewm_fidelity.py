"""Round 7 ewm fidelity (ADVICE r6):

1. NaN vs null: the fold path (collect_list) DROPS nulls but lets a real
   NaN poison the recurrence; the hoisted streaming kernel previously
   treated both as skip.  Kernel now receives JVM-side isnan flags and
   replays the poisoning bit-exactly.
2. Shared-pass signature: two ewm exprs whose .over() keys share a root
   column name but differ structurally (col('g') vs col('g').str.slice)
   previously collided into ONE shuffle pass keyed by the first spec's
   columns — silently wrong results for the second.
"""

import numpy as np
import pytest

import polars_spark as pl


@pytest.fixture(scope="module")
def messy():
    rs = np.random.RandomState(7)
    x = rs.rand(600)
    x[::17] = np.nan  # real NaNs (poison)
    vals = [None if i % 11 == 0 else float(v) for i, v in enumerate(x)]  # nulls (skip)
    g = [str(rs.randint(0, 5)) for _ in range(600)]
    return pl.LazyFrame({"g": g, "x": vals})


@pytest.mark.parametrize(
    "mk",
    [
        lambda e: e.ewm_mean(span=8),
        lambda e: e.ewm_mean(span=8, adjust=False),
        lambda e: e.ewm_std(span=8, bias=False),
        lambda e: e.ewm_var(span=8, bias=True),
    ],
    ids=["mean", "mean-noadjust", "std", "var-bias"],
)
def test_nan_poisoning_matches_fold(messy, mk):
    h = (
        messy.with_columns(e=mk(pl.col("x")).over("g"))
        .collect()
        .sort_values(["g", "x"])["e"]
        .to_numpy()
    )
    f = (
        messy.with_columns(e=(mk(pl.col("x")) * 1.0).over("g"))
        .collect()
        .sort_values(["g", "x"])["e"]
        .to_numpy()
    )
    assert ((h == f) | (np.isnan(h) & np.isnan(f))).all()
    # the poisoning must actually occur: NaNs present in the tail
    assert np.isnan(h[~np.isnan(h)]).sum() == 0 and np.isnan(h).any()


def test_distinct_over_keys_sharing_root_name_get_correct_partitions():
    rs = np.random.RandomState(3)
    lf = pl.LazyFrame(
        {
            "g": [f"{a}{b}" for a, b in zip(rs.choice(list("AB"), 400), rs.choice(list("xy"), 400))],
            "x": rs.rand(400),
        }
    )
    both = (
        lf.with_columns(
            fine=pl.col("x").ewm_mean(span=5).over(pl.col("g")),
            coarse=pl.col("x").ewm_mean(span=5).over(pl.col("g").str.slice(0, 1)),
        )
        .collect()
        .sort_values("x")
    )
    ref_fine = (
        lf.with_columns(fine=pl.col("x").ewm_mean(span=5).over(pl.col("g")))
        .collect()
        .sort_values("x")["fine"]
        .to_numpy()
    )
    ref_coarse = (
        lf.with_columns(coarse=pl.col("x").ewm_mean(span=5).over(pl.col("g").str.slice(0, 1)))
        .collect()
        .sort_values("x")["coarse"]
        .to_numpy()
    )
    assert np.array_equal(both["fine"].to_numpy(), ref_fine, equal_nan=True)
    assert np.array_equal(both["coarse"].to_numpy(), ref_coarse, equal_nan=True)
    # and the two references genuinely differ (the bug would have made
    # coarse equal fine's partitioning)
    assert not np.array_equal(ref_fine, ref_coarse, equal_nan=True)


def test_same_over_keys_still_share_one_pass():
    # structural identity: two exprs over the SAME key must not regress
    # into two shuffles — assert via plan: a single mapInPandas occurrence
    lf = pl.LazyFrame({"g": ["a", "b"] * 50, "x": np.random.RandomState(0).rand(100)})
    out = lf.with_columns(
        m=pl.col("x").ewm_mean(span=5).over("g"),
        s=pl.col("x").ewm_std(span=5).over("g"),
    )
    plan = out.to_spark()._sc is not None and out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
