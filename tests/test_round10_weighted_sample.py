"""Round-10: weighted_sample (Efraimidis-Spirakis A-ES) — deterministic
selection pinned against a pure-Python replication of the race."""

from __future__ import annotations

import hashlib
import math

import pytest


def _py_key(doc_id: int, seed: int, w: float) -> float:
    h = int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 4294967296.0
    return -math.log(u) / w


@pytest.mark.parametrize("seed", [0, 13, 99])
def test_selection_matches_python_replication(spark, seed):
    from polars_spark.llm import weighted_sample

    rows = [(i, float(1 + (i * 7) % 40)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, key_col="doc_id", weight_col="w", k=10, seed=seed).collect()
    want = sorted(rows, key=lambda r: _py_key(r[0], seed, r[1]))[:10]
    assert [r.doc_id for r in got] == [i for i, _ in want]
    for r in got:
        assert r.sample_key == pytest.approx(_py_key(r.doc_id, seed, dict(rows)[r.doc_id]), rel=1e-12)


def test_nonpositive_and_null_weights_excluded(spark):
    from polars_spark.llm import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in weighted_sample(df, key_col="doc_id", weight_col="w", k=10).collect()}
    assert got == {1, 5}


def test_k_larger_than_population_returns_all(spark):
    from polars_spark.llm import weighted_sample

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "doc_id long, w double")
    assert len(weighted_sample(df, key_col="doc_id", weight_col="w", k=100).collect()) == 2


def test_higher_weight_wins_more_k1_races(spark):
    """Statistical sanity at tiny cost: doc B with 9x A's weight should win
    the k=1 race in a clear majority of 40 seeds (exact binomial p(B)=0.9
    per race; 40 races, >=27 wins has probability ~1-3e-6)."""
    from polars_spark.llm import weighted_sample

    wins_b = sum(
        1
        for s in range(40)
        if _py_key(1, s, 1.0) > _py_key(2, s, 9.0)
    )
    assert wins_b >= 27
    # and the Spark op agrees with the replication on one of those seeds
    df = spark.createDataFrame([(1, 1.0), (2, 9.0)], "doc_id long, w double")
    got = weighted_sample(df, key_col="doc_id", weight_col="w", k=1, seed=0).collect()
    want = 2 if _py_key(2, 0, 9.0) < _py_key(1, 0, 1.0) else 1
    assert got[0].doc_id == want
