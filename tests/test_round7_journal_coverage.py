"""Round 7 (VERDICT r6 item 5): 100% journal coverage of the public
frame-returning LazyFrame surface.

serialize() ships the journaled op list; any frame-returning method NOT
in _JOURNALED_METHODS silently degrades serialize to the result-snapshot
payload (laziness lost).  Two guards here:

1. Reflection: every public method annotated to return LazyFrame must be
   journaled — a new method added without journaling fails the test.
2. Round-trip: one plan per newly-journaled method, deserialize must
   replay to the same rows (plan stays lazy; function args ride
   cloudpickle).
"""

from __future__ import annotations

import inspect
import io

import pytest

import polars_spark as pl
from polars_spark.plans.frame import _JOURNALED_METHODS, LazyFrame


def _frame_returning() -> set[str]:
    out = set()
    for n, m in inspect.getmembers(LazyFrame, predicate=callable):
        if n.startswith("_"):
            continue
        try:
            ra = inspect.signature(m).return_annotation
        except (ValueError, TypeError):
            continue
        if isinstance(ra, str) and "LazyFrame" in ra:
            out.add(n)
    return out


def test_every_frame_returning_method_is_journaled():
    missing = sorted(_frame_returning() - set(_JOURNALED_METHODS))
    assert not missing, (
        f"frame-returning methods without journaling: {missing} — add to "
        "_JOURNALED_METHODS (serialize silently degrades to snapshot otherwise)"
    )


# NB closures, not module-level defs: cloudpickle serializes closures BY
# VALUE — a module-level test function would pickle by reference and the
# executor can't import the tests package
_double = lambda pdf: pdf.assign(a=pdf["a"] * 2)  # noqa: E731
_rowfn = lambda t: (t[0] + 1, t[1])  # noqa: E731


def _pipe_fn(lf, schema):
    assert "a" in schema
    return lf.filter(pl.col("a") > 0)


# method -> callable(lf) applying it with representative args
CASES = {
    "approx_n_unique": lambda lf: lf.approx_n_unique(),
    "cache": lambda lf: lf.cache(),
    "clear": lambda lf: lf.clear(2),
    "clone": lambda lf: lf.clone(),
    "coalesce_partitions": lambda lf: lf.coalesce_partitions(1),
    "hint": lambda lf: lf.hint("broadcast"),
    "inspect": lambda lf: lf.inspect(),
    "lazy": lambda lf: lf.lazy(),
    "map_batches": lambda lf: lf.map_batches(_double),
    "map_columns": lambda lf: lf.map_columns(["a"], lambda e: e + 10),
    "map_rows": lambda lf: lf.map_rows(_rowfn, schema="c0 bigint, c1 string"),
    "persist": lambda lf: lf.persist(),
    "pipe_with_schema": lambda lf: lf.pipe_with_schema(_pipe_fn),
    "rechunk": lambda lf: lf.rechunk(),
    "repartition": lambda lf: lf.repartition(2),
    "sample": lambda lf: lf.sample(fraction=0.6, seed=11),
    "shrink_to_fit": lambda lf: lf.shrink_to_fit(),
    "shuffle": lambda lf: lf.shuffle(seed=3),
    "transpose": lambda lf: lf.transpose(include_header=False),
    "unpersist": lambda lf: lf.cache().unpersist(),
    "with_row_count": lambda lf: lf.with_row_count("rn"),
}


@pytest.fixture()
def base(pl, spark):
    return pl.LazyFrame({"a": [1, 2, 3, 4], "b": ["x", "y", "z", "w"]})


@pytest.mark.parametrize("method", sorted(CASES))
def test_roundtrip_replays_identically(base, method):
    q = CASES[method](base)
    assert q._journal is not None, f"{method} poisoned the journal"
    q2 = pl.LazyFrame.deserialize(io.BytesIO(q.serialize()))
    norm = lambda df: sorted(  # noqa: E731
        repr(tuple(t)) for t in df.itertuples(index=False)
    )  # repr: NaN == NaN for the clear() all-null frame
    assert norm(q.collect()) == norm(q2.collect()), f"{method}: replayed rows differ"


def test_replace_column_journal(base):
    q = base.replace_column(0, pl.Series("a2", [9, 8, 7, 6]))
    assert q._journal is not None
    q2 = pl.LazyFrame.deserialize(io.BytesIO(q.serialize()))
    assert sorted(q2.collect()["a2"].tolist()) == [6, 7, 8, 9]


def test_checkpoint_lazy_journal(base):
    q = base.checkpoint(eager=False)
    assert q._journal is not None
    q2 = pl.LazyFrame.deserialize(io.BytesIO(q.serialize()))
    assert len(q2.collect()) == 4
