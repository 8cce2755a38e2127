"""Round-10: as-of join fuzz vs a pure-Python polars-semantics oracle.

The union-window lowering (plans/frame.py join_asof) must reproduce the
reference's sorted-merge semantics (polars-ops/src/frame/join/asof/)
under every shape the merge can see: duplicate right keys (backward takes
the LAST occurrence in frame order, forward the FIRST), null left keys
(no match), null right keys (skipped), null VALUES inside matched rows
(carried, not skipped past), tolerance cutoffs, multi-group `by`, empty
groups on either side, and the nearest tie rule (<= prefers backward).
"""

from __future__ import annotations

import random

import pytest


def _oracle_match(lk, rights, strategy, tolerance):
    """rights: list of (key, ridx, value) sorted by (key, ridx), keys non-null."""
    if lk is None:
        return None
    back = None  # last occurrence with key <= lk
    fwd = None  # first occurrence with key >= lk
    for k, ridx, v in rights:
        if k <= lk:
            if back is None or (k, ridx) >= (back[0], back[1]):
                back = (k, ridx, v)
        if k >= lk and fwd is None:
            fwd = (k, ridx, v)
    if strategy == "backward":
        m = back
    elif strategy == "forward":
        m = fwd
    else:  # nearest: <= prefers backward
        if back is None:
            m = fwd
        elif fwd is None:
            m = back
        else:
            m = back if abs(lk - back[0]) <= abs(fwd[0] - lk) else fwd
    if m is not None and tolerance is not None and abs(lk - m[0]) > tolerance:
        m = None
    return m


@pytest.mark.parametrize("strategy", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_asof_fuzz_vs_python_oracle(pl, spark, strategy, seed):
    rng = random.Random(61000 + 17 * seed + {"backward": 0, "forward": 1, "nearest": 2}[strategy])
    tolerance = rng.choice([None, 2, 5])
    groups = ["a", "b", "c"]

    def mk_key():
        return None if rng.random() < 0.08 else rng.randrange(0, 25)

    left_rows = [
        (i, rng.choice(groups), mk_key()) for i in range(rng.choice([0, 1, 40]))
    ]
    right_rows = [
        (
            j,
            rng.choice(groups + ["zzz"]),  # zzz: right-only group
            mk_key(),
            None if rng.random() < 0.2 else rng.randrange(100),  # null VALUES
        )
        for j in range(rng.choice([0, 30]))
    ]

    ldf = pl.from_records(
        [list(r) for r in left_rows],
        schema={"lid": "Int64", "g": "String", "k": "Int64"},
        orient="row",
    )
    rdf = pl.from_records(
        [list(r) for r in right_rows],
        schema={"rid": "Int64", "g": "String", "k": "Int64", "val": "Int64"},
        orient="row",
    )
    # polars requires sorted asof keys; sort but keep frame order among ties
    # (stable sort preserves insertion order = the tie rule under test)
    lsorted = ldf.sort("k", maintain_order=True)
    rsorted = rdf.sort("k", maintain_order=True)
    got = {
        r["lid"]: (r["rid"], r["val"])
        for r in lsorted.join_asof(
            rsorted, on="k", by="g", strategy=strategy, tolerance=tolerance
        )
        .to_dicts()
    }

    # oracle: per group, rights sorted by (key, frame position)
    by_group: dict[str, list] = {}
    pos = {}
    for j, (rid, g, k, v) in enumerate(right_rows):
        if k is None:
            continue
        by_group.setdefault(g, []).append((k, j, (rid, v)))
    for g in by_group:
        by_group[g].sort(key=lambda t: (t[0], t[1]))

    assert set(got) == {lid for lid, _g, _k in left_rows}
    for lid, g, lk in left_rows:
        m = _oracle_match(lk, by_group.get(g, []), strategy, tolerance)
        want = m[2] if m is not None else (None, None)
        assert got[lid] == want, (
            f"strategy={strategy} seed={seed} lid={lid} g={g} k={lk} "
            f"tol={tolerance}: got {got[lid]}, want {want}"
        )


def test_asof_duplicate_right_keys_tie_rule(pl, spark):
    """backward -> LAST occurrence in frame order; forward -> FIRST."""
    l = pl.from_records([[1, 10]], schema={"lid": "Int64", "k": "Int64"}, orient="row")
    r = pl.from_records(
        [[100, 10], [101, 10], [102, 10]],
        schema={"rid": "Int64", "k": "Int64"},
        orient="row",
    )
    back = l.join_asof(r, on="k", strategy="backward").to_dicts()
    fwd = l.join_asof(r, on="k", strategy="forward").to_dicts()
    assert back[0]["rid"] == 102, back
    assert fwd[0]["rid"] == 100, fwd


def test_asof_null_right_keys_skipped(pl, spark):
    """A null-keyed right row must never be a match (it would otherwise
    sort first and leak its values to every early left row)."""
    l = pl.from_records([[1, 5]], schema={"lid": "Int64", "k": "Int64"}, orient="row")
    r = pl.from_records(
        [[900, None], [100, 7]],
        schema={"rid": "Int64", "k": "Int64"},
        orient="row",
    )
    back = l.join_asof(r, on="k", strategy="backward").to_dicts()
    assert back[0]["rid"] is None, back  # 7 > 5 and the null row is not a match
