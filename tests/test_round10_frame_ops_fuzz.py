"""Round-10: frame-ops fuzz — unique keep rules, stable sort, slicing.

Randomized insertion-ordered frames (heavy duplicate keys, nulls) vs a
pure-Python oracle of the polars rules: unique(keep=first/last/none) in
scan order, sort(maintain_order=True) stability (ties keep insertion
order, nulls_last both ways), and head/tail/slice including negative
offsets.  These exercise the order-contract machinery the hardest.
"""

from __future__ import annotations

import random

import pytest


def _frames(seed):
    rng = random.Random(91000 + seed)
    n = rng.choice([0, 1, 24])
    rows = [
        [
            i,
            None if rng.random() < 0.15 else rng.randrange(0, 4),
            rng.randrange(100),
        ]
        for i in range(n)
    ]
    return rng, rows


def _key(v):
    return ("null",) if v is None else v


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_unique_keep_rules(pl, spark, seed):
    _rng, rows = _frames(seed)
    df = pl.from_records(rows, schema={"rid": "Int64", "k": "Int64", "v": "Int64"}, orient="row")

    # keep='first': first row per key in insertion order
    first = {}
    for rid, k, v in rows:
        first.setdefault(_key(k), rid)
    got = {r["rid"] for r in df.unique(subset="k", keep="first").to_dicts()}
    assert got == set(first.values()), (seed, "first")

    # keep='last'
    last = {}
    for rid, k, v in rows:
        last[_key(k)] = rid
    got = {r["rid"] for r in df.unique(subset="k", keep="last").to_dicts()}
    assert got == set(last.values()), (seed, "last")

    # keep='none': only keys appearing exactly once survive
    from collections import Counter

    c = Counter(_key(k) for _rid, k, _v in rows)
    want_none = {rid for rid, k, _v in rows if c[_key(k)] == 1}
    got = {r["rid"] for r in df.unique(subset="k", keep="none").to_dicts()}
    assert got == want_none, (seed, "none")

    # keep='any': one row per key, whichever
    got_keys = [_key(r["k"]) for r in df.unique(subset="k", keep="any").to_dicts()]
    assert sorted(map(str, got_keys)) == sorted(map(str, set(c))), (seed, "any")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stable_sort_and_slices(pl, spark, seed):
    _rng, rows = _frames(seed)
    df = pl.from_records(rows, schema={"rid": "Int64", "k": "Int64", "v": "Int64"}, orient="row")

    # stable sort: ties keep insertion order; nulls last (polars default)
    want = [rid for rid, _k, _v in sorted(rows, key=lambda r: ((r[1] is None, r[1]), rows.index(r)))]
    got = [r["rid"] for r in df.sort("k", maintain_order=True).to_dicts()]
    assert got == want, (seed, "sort asc")

    want_d = [
        rid
        for rid, _k, _v in sorted(
            rows, key=lambda r: ((r[1] is None, -(r[1] if r[1] is not None else 0)), rows.index(r))
        )
    ]
    got_d = [
        r["rid"]
        for r in df.sort("k", descending=True, nulls_last=True, maintain_order=True).to_dicts()
    ]
    assert got_d == want_d, (seed, "sort desc nulls_last")

    # slicing in insertion order
    ordered = [rid for rid, _k, _v in rows]
    assert [r["rid"] for r in df.head(5).to_dicts()] == ordered[:5]
    assert [r["rid"] for r in df.tail(4).to_dicts()] == (ordered[-4:] if rows else [])
    assert [r["rid"] for r in df.slice(2, 3).to_dicts()] == ordered[2:5]
    # negative offset: from the end
    assert [r["rid"] for r in df.slice(-6, 3).to_dicts()] == ordered[-6:][:3]
