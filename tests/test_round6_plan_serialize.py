"""Round 6: plan-level serialize/deserialize (VERDICT r5 item 3) and
Expr.sample in select context (item 5).

Reference semantics: LazyFrame.serialize ships the LOGICAL PLAN
(py-polars/src/polars/lazyframe/frame.py serialize; rust polars-plan
serde) — deserialize rebuilds it against a live session and NOTHING
executes until collect.  Here the plan payload is the journaled op list
(scan spec + DslPlan-surface steps), replayed on deserialize; the old
result-snapshot remains the documented fallback for unjournaled ops.
"""

import io
import re

import pytest

import polars_spark as pl

SF = "/root/testdata/sf0.001"


def _norm(plan: str) -> str:
    return re.sub(r"#\d+", "#", plan)


def test_constructor_sum_roundtrip_like_reference_doctest():
    lf = pl.LazyFrame({"a": [1, 2, 3], "b": [4.0, 5.0, 6.0]}).sum()
    out = pl.LazyFrame.deserialize(io.BytesIO(lf.serialize()))
    got = out.collect().to_dict("records")
    assert got == [{"a": 6, "b": 15.0}]


def test_scan_filter_groupby_sort_plan_identity():
    q = (
        pl.scan_parquet(f"{SF}/lineitem.parquet")
        .filter(pl.col("l_quantity") > 10)
        .group_by("l_returnflag")
        .agg(pl.col("l_extendedprice").sum().alias("s"))
        .sort("l_returnflag")
    )
    q2 = pl.LazyFrame.deserialize(q.serialize())
    p1 = q.to_spark()._jdf.queryExecution().optimizedPlan().toString()
    p2 = q2.to_spark()._jdf.queryExecution().optimizedPlan().toString()
    assert _norm(p1) == _norm(p2)  # identical Catalyst plan modulo expr ids
    assert q.collect().equals(q2.collect())


def test_deserialize_is_lazy_not_a_snapshot():
    q = pl.scan_parquet(f"{SF}/orders.parquet").filter(
        pl.col("o_orderkey") >= 0
    )
    payload = q.serialize()
    # a plan payload is tiny — a snapshot of orders would be orders-of-
    # magnitude bigger than this bound
    assert len(payload) < 50_000
    q2 = pl.LazyFrame.deserialize(payload)
    assert isinstance(q2, pl.LazyFrame)
    assert len(q2.collect()) == len(q.collect())


def test_join_roundtrip_nested_frame():
    n = pl.scan_parquet(f"{SF}/nation.parquet")
    r = pl.scan_parquet(f"{SF}/region.parquet")
    j = n.join(r, left_on="n_regionkey", right_on="r_regionkey").select(
        "n_name", "r_name"
    )
    j2 = pl.LazyFrame.deserialize(j.serialize())
    a = j.collect().sort_values("n_name", ignore_index=True)
    b = j2.collect().sort_values("n_name", ignore_index=True)
    assert a.equals(b)


def test_expr_args_survive_roundtrip():
    q = pl.LazyFrame({"x": [1, 2, 3, 4], "g": ["a", "a", "b", "b"]}).select(
        (pl.col("x") * 2 + 1).alias("y"),
        pl.when(pl.col("x") > 2).then(pl.lit("hi")).otherwise(pl.lit("lo")).alias("z"),
    )
    q2 = pl.LazyFrame.deserialize(q.serialize())
    assert q.collect().equals(q2.collect())


def test_unjournaled_op_falls_back_to_snapshot():
    base = pl.LazyFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]})
    piv = base.pivot("k", index=None, values="v", aggregate_function="sum") \
        if hasattr(base, "pivot") else base
    # whatever the history, serialize must round-trip VALUES
    out = pl.LazyFrame.deserialize(piv.serialize())
    assert sorted(out.collect().columns) == sorted(piv.collect().columns)


def test_file_roundtrip(tmp_path):
    p = tmp_path / "plan.bin"
    q = pl.scan_parquet(f"{SF}/nation.parquet").select("n_name").limit(3)
    q.serialize(str(p))
    q2 = pl.LazyFrame.deserialize(str(p))
    assert len(q2.collect()) == 3


def test_expr_sample_select_context():
    df = pl.DataFrame({"a": [1, 2, 3]})
    r = df.select(pl.col("a").sample(fraction=1.0, with_replacement=True, seed=1))
    assert r.collect().columns.tolist() == ["a"]
    big = pl.DataFrame({"a": list(range(100))})
    r5 = big.select(pl.col("a").sample(n=5, seed=7)).collect()
    assert len(r5) == 5
    # seeded determinism
    again = big.select(pl.col("a").sample(n=5, seed=7)).collect()
    assert r5["a"].tolist() == again["a"].tolist()
    with pytest.raises(ValueError):
        pl.DataFrame({"a": [1]}).select(pl.col("a").sample(n=1, fraction=0.5))


def test_concat_roundtrip():
    a = pl.scan_parquet(f"{SF}/nation.parquet").select("n_name", "n_regionkey")
    b = pl.scan_parquet(f"{SF}/nation.parquet").select("n_name", "n_regionkey")
    cat = (
        pl.concat([a, b])
        .group_by("n_regionkey")
        .agg(pl.len().alias("n"))
        .sort("n_regionkey")
    )
    cat2 = pl.LazyFrame.deserialize(cat.serialize())
    assert cat.collect().equals(cat2.collect())


def test_sample_keeps_scan_order_contract():
    lf = pl.scan_parquet(f"{SF}/nation.parquet").sample(fraction=0.5, seed=3)
    # survivors keep relative file order (polars shuffle=False) — the
    # cum_sum works and is deterministic for a fixed seed
    a = lf.select(pl.col("n_nationkey").cum_sum().alias("c")).collect()["c"].tolist()
    b = lf.select(pl.col("n_nationkey").cum_sum().alias("c")).collect()["c"].tolist()
    assert a == b and len(a) > 0


def test_sql_and_vstack_roundtrip():
    a = pl.scan_parquet(f"{SF}/nation.parquet").sql(
        "SELECT n_regionkey, count(*) AS n FROM self GROUP BY n_regionkey"
    )
    a2 = pl.LazyFrame.deserialize(a.serialize())
    assert a.collect().sort_values("n_regionkey", ignore_index=True).equals(
        a2.collect().sort_values("n_regionkey", ignore_index=True)
    )
    b = pl.scan_parquet(f"{SF}/region.parquet").vstack(
        pl.scan_parquet(f"{SF}/region.parquet")
    )
    assert len(pl.LazyFrame.deserialize(b.serialize()).collect()) == 10
