"""Round-10: embedding-LSH plane-count auto-scaling (VERDICT r9 #4).

A fixed n_planes=4 pins expected bucket size at N/16, which makes the
within-bucket pair join quadratic again at 100 TB.  _auto_lsh_params
derives n_planes from the corpus size (expected bucket ==
target_bucket_size) and n_tables from the recall target; this family
pins the derivation math and the ACTUAL bucket-size distribution at two
corpus sizes.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_spark.llm import _auto_lsh_params, _rhp_planes, rhp_bucket


def test_auto_params_track_corpus_size():
    # expected bucket size is held at the target as N grows 64x
    p1, t1 = _auto_lsh_params(16_384, 0.9, target_bucket_size=1024)
    p2, t2 = _auto_lsh_params(1_048_576, 0.9, target_bucket_size=1024)
    assert p1 == 4 and p2 == 10
    assert 16_384 / 2**p1 == 1024 and 1_048_576 / 2**p2 == 1024
    # more planes -> lower per-table collision prob -> more tables
    assert t2 > t1
    # recall math: 1-(1-p^planes)^tables >= 0.95 at sim=threshold
    p_plane = 1.0 - math.acos(0.9) / math.pi
    for planes, tables in [(p1, t1), (p2, t2)]:
        recall = 1.0 - (1.0 - p_plane**planes) ** tables
        assert recall >= 0.95, (planes, tables, recall)


def test_auto_params_edges():
    # tiny corpus: FLOORED at the old fixed default (4 planes) — the pure
    # log rule picks 1 plane below N = 16*target, i.e. near-whole-corpus
    # buckets, which re-quadratized the sf0.1 bench (round-10 perf weak)
    assert _auto_lsh_params(10, 0.9, target_bucket_size=1024)[0] == 4
    assert _auto_lsh_params(500, 0.9, target_bucket_size=1024)[0] == 4
    # the floor is a no-op at/above N = 16*target
    assert _auto_lsh_params(16 * 1024, 0.9, target_bucket_size=1024)[0] == 4
    assert _auto_lsh_params(32 * 1024, 0.9, target_bucket_size=1024)[0] == 5
    assert _auto_lsh_params(2**40, 0.99, target_bucket_size=1)[0] == 30  # clamp
    assert 1 <= _auto_lsh_params(2**40, 0.5, target_bucket_size=1)[1] <= 64


@pytest.mark.parametrize("n_rows", [512, 8192])
def test_bucket_size_distribution_holds_at_target(spark, n_rows):
    """Actual per-table bucket sizes on gaussian vectors stay near the
    target as the corpus grows 16x (the property the fixed default lost)."""
    target = 64
    dim = 16
    planes_n, _ = _auto_lsh_params(n_rows, 0.9, target_bucket_size=target)
    # powers of two in this test; below the 4-plane floor (N < 16*target)
    # expected buckets come out SMALLER than the target — strictly cheaper
    expected_bucket = min(target, n_rows / 16)
    assert n_rows / 2**planes_n == expected_bucket
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((n_rows, dim))
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n_rows)],
        "vec_id long, embedding array<double>",
    )
    planes = _rhp_planes(dim, planes_n, seed=100)
    sizes = (
        df.select(rhp_bucket(F.col("embedding"), planes).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    mean = sum(r["count"] for r in sizes) / len(sizes)
    # gaussian components -> fair sign bits -> near-uniform buckets; the
    # mean over nonempty buckets sits at/above N/2^planes but must not
    # drift past 2x the target (that would mean the derivation is off)
    assert expected_bucket / 2 <= mean <= 2 * target, (n_rows, planes_n, mean)
    assert max(r["count"] for r in sizes) <= 6 * target, "skewed bucket"


def test_planted_pairs_found_in_auto_mode(spark):
    """Default (auto) mode still finds every planted near-dup pair."""
    from polars_spark.llm import embedding_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 64))
    rows = [(i, base[i].tolist()) for i in range(40)]
    for i in range(10):
        rows.append((100 + i, (base[i] + 0.05 * rng.standard_normal(64)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_near_dup_pairs(emb, threshold=0.9, seed=100, corpus_size=50).collect()
    pairs = {(r.d1, r.d2) for r in got}
    assert pairs == {(i, 100 + i) for i in range(10)}, pairs
