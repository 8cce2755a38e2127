"""Round-10: equi-join fuzz vs a pure-Python multiset oracle.

The fixed join gates pin one data shape each; this family randomizes the
parts that make join semantics subtle — null keys (match only under
nulls_equal), duplicate keys on both sides (m:m multiplicity), empty
inputs, and the full-join coalesce rule — across inner/left/semi/anti/
full.  Row multisets must match exactly (polars-ops/src/frame/join/).
"""

from __future__ import annotations

import random
from collections import Counter

import pytest


def _mk(rng, n, null_p=0.15):
    return [
        (
            i,
            None if rng.random() < null_p else rng.randrange(0, 6),
            rng.randrange(100),
        )
        for i in range(n)
    ]


def _matches(lk, rk, nulls_equal):
    if lk is None or rk is None:
        return nulls_equal and lk is None and rk is None
    return lk == rk


def _oracle(left, right, how, nulls_equal):
    out = []
    if how in ("inner", "left", "full"):
        for _, lk, lv in left:
            ms = [rv for _, rk, rv in right if _matches(lk, rk, nulls_equal)]
            if ms:
                out += [(lk, lv, rv) for rv in ms]
            elif how in ("left", "full"):
                out.append((lk, lv, None))
        if how == "full":
            for _, rk, rv in right:
                if not any(_matches(lk, rk, nulls_equal) for _, lk, _v in left):
                    out.append((rk, None, rv))  # coalesced key from the right
    elif how == "semi":
        out = [
            (lk, lv, None)
            for _, lk, lv in left
            if any(_matches(lk, rk, nulls_equal) for _, rk, _v in right)
        ]
    elif how == "anti":
        out = [
            (lk, lv, None)
            for _, lk, lv in left
            if not any(_matches(lk, rk, nulls_equal) for _, rk, _v in right)
        ]
    return Counter(out)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti", "full"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_join_fuzz_multiset(pl, spark, how, seed):
    rng = random.Random(
        71000 + seed * 31 + {"inner": 0, "left": 1, "semi": 2, "anti": 3, "full": 4}[how]
    )
    nulls_equal = rng.random() < 0.5
    left = _mk(rng, rng.choice([0, 1, 25]))
    right = _mk(rng, rng.choice([0, 20]))

    ldf = pl.from_records(
        [list(r) for r in left], schema={"lid": "Int64", "k": "Int64", "vl": "Int64"},
        orient="row",
    )
    rdf = pl.from_records(
        [list(r) for r in right], schema={"rid": "Int64", "k": "Int64", "vr": "Int64"},
        orient="row",
    )
    joined = ldf.join(rdf, on="k", how=how, nulls_equal=nulls_equal, coalesce=True)
    cols = ["k", "vl"] + (["vr"] if how in ("inner", "left", "full") else [])
    rows = joined.select(*cols).to_dicts()
    got = Counter(
        (r["k"], r["vl"], r.get("vr") if how in ("inner", "left", "full") else None)
        for r in rows
    )
    want = _oracle(left, right, how, nulls_equal)
    assert got == want, (
        f"how={how} seed={seed} nulls_equal={nulls_equal}: "
        f"extra={[(k, got[k] - want[k]) for k in got if got[k] != want.get(k, 0)][:4]} "
        f"missing={[(k, want[k] - got[k]) for k in want if want[k] != got.get(k, 0)][:4]}"
    )


def test_full_join_no_coalesce_keeps_both_keys(pl, spark):
    l = pl.from_records([[1, 10]], schema={"k": "Int64", "vl": "Int64"}, orient="row")
    r = pl.from_records([[2, 20]], schema={"k": "Int64", "vr": "Int64"}, orient="row")
    out = l.join(r, on="k", how="full", coalesce=False).to_dicts()
    by = {(d["k"], d["k_right"]) for d in out}
    assert by == {(1, None), (None, 2)}, out
