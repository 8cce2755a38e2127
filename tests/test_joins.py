"""Join semantics: equi (all hows, coalesce/suffix), semi/anti, cross,
join_where, as-of (edge cases from py-polars/tests/unit/operations/test_join_asof.py:
before-first, after-last, exact-tie, tolerance, forward, nearest, by-groups)."""

import pandas as pd
import pytest

from tests.conftest import rows


def _sides(lf):
    left = lf(k=[1, 2, 3], lv=["a", "b", "c"])
    right = lf(k=[2, 3, 4], rv=["x", "y", "z"])
    return left, right


def test_inner_left_right_full(pl, lf):
    left, right = _sides(lf)
    assert rows(left.join(right, on="k"), sort_by="k") == [(2, "b", "x"), (3, "c", "y")]
    l = rows(left.join(right, on="k", how="left"), sort_by="k")
    assert l == [(1, "a", None), (2, "b", "x"), (3, "c", "y")]
    rj = left.join(right, on="k", how="right")
    assert rj.columns == ["lv", "k", "rv"]  # key lands at the right frame's position
    r = rows(rj, sort_by="k")
    assert r == [("b", 2, "x"), ("c", 3, "y"), (None, 4, "z")]
    fl = left.join(right, on="k", how="full")
    assert sorted(fl.columns) == ["k", "k_right", "lv", "rv"]
    assert len(rows(fl)) == 4
    flc = left.join(right, on="k", how="full", coalesce=True)
    assert sorted(flc.columns) == ["k", "lv", "rv"]
    assert sorted(t[0] for t in rows(flc)) == [1, 2, 3, 4]


def test_semi_anti_cross(pl, lf):
    left, right = _sides(lf)
    assert [t[0] for t in rows(left.join(right, on="k", how="semi"), sort_by="k")] == [2, 3]
    assert [t[0] for t in rows(left.join(right, on="k", how="anti"), sort_by="k")] == [1]
    cx = left.join(right, how="cross")
    assert len(rows(cx)) == 9
    assert sorted(cx.columns) == ["k", "k_right", "lv", "rv"]


def test_join_suffix_and_different_keys(pl, lf):
    left = lf(k=[1, 2], v=["a", "b"])
    right = lf(rk=[1, 2], v=["x", "y"])
    out = left.join(right, left_on="k", right_on="rk")
    assert sorted(out.columns) == ["k", "v", "v_right"]
    out2 = left.join(right, left_on="k", right_on="rk", suffix="_r2")
    assert "v_r2" in out2.columns


def test_join_nulls_equal(pl, lf):
    left = lf(k=[1.0, None], v=["a", "b"])
    right = lf(k=[1.0, None], w=["x", "y"])
    plain = left.join(right, on="k")
    assert len(rows(plain)) == 1
    withnulls = left.join(right, on="k", nulls_equal=True)
    assert len(rows(withnulls)) == 2


def test_join_where(pl, lf):
    east = lf(id=[1, 2], dur=[10, 20])
    west = lf(t_id=[10, 20], time=[15, 25])
    out = east.join_where(west, pl.col("dur") < pl.col("time"))
    assert len(rows(out)) == 3  # (10,15),(10,25),(20,25)


def test_asof_backward_edges(pl, lf):
    left = lf(t=[1, 4, 7], g=["a", "a", "a"])
    right = lf(t=[2, 4, 6], v=[10.0, 20.0, 30.0], g=["a", "a", "a"])
    out = left.join_asof(right, on="t", by="g", strategy="backward")
    r = rows(out, sort_by="t")
    # before-first -> null; exact tie (4) matches; 7 -> last (6 -> 30)
    assert r == [(1, "a", None), (4, "a", 20.0), (7, "a", 30.0)]


def test_asof_forward_nearest(pl, lf):
    left = lf(t=[1, 5, 10], g=["a"] * 3)
    right = lf(t=[2, 4, 9], v=[10.0, 20.0, 30.0], g=["a"] * 3)
    fwd = rows(left.join_asof(right, on="t", by="g", strategy="forward"), sort_by="t")
    assert fwd == [(1, "a", 10.0), (5, "a", 30.0), (10, "a", None)]  # after-last -> null
    near = rows(left.join_asof(right, on="t", by="g", strategy="nearest"), sort_by="t")
    assert near == [(1, "a", 10.0), (5, "a", 20.0), (10, "a", 30.0)]


def test_asof_tolerance(pl, lf):
    left = lf(t=[10, 20], g=["a", "a"])
    right = lf(t=[1, 19], v=[1.0, 2.0], g=["a", "a"])
    out = rows(left.join_asof(right, on="t", by="g", tolerance=5), sort_by="t")
    assert out == [(10, "a", None), (20, "a", 2.0)]


def test_asof_by_groups(pl, lf):
    left = lf(t=[5, 5], g=["a", "b"])
    right = lf(t=[3, 4], v=[1.0, 2.0], g=["a", "b"])
    out = rows(left.join_asof(right, on="t", by="g"), sort_by="g")
    assert out == [(5, "a", 1.0), (5, "b", 2.0)]


def test_asof_timestamps_tolerance_str(pl, lf):
    left = lf(ts=[pd.Timestamp("2024-01-01 10:00"), pd.Timestamp("2024-01-01 12:00")], g=["a", "a"])
    right = lf(
        ts=[pd.Timestamp("2024-01-01 09:59"), pd.Timestamp("2024-01-01 10:30")],
        v=[1.0, 2.0],
        g=["a", "a"],
    )
    out = rows(left.join_asof(right, on="ts", by="g", tolerance="5m"), sort_by="ts")
    assert out[0][2] == 1.0  # within 5 minutes
    assert out[1][2] is None  # 12:00 vs 10:30 > 5m


def test_asof_suffix_collision(pl, lf):
    left = lf(t=[5], v=[0.0], g=["a"])
    right = lf(t=[3], v=[1.0], g=["a"])
    out = left.join_asof(right, on="t", by="g")
    assert "v_right" in out.columns


def test_asof_no_by_global(pl, lf):
    left = lf(t=[1, 6])
    right = lf(t=[2, 5], v=[10.0, 20.0])
    out = rows(left.join_asof(right, on="t"), sort_by="t")
    assert out == [(1, None), (6, 20.0)]


def test_asof_multi_by(pl, lf):
    left = lf(t=[5, 5], a=["x", "x"], b=[1, 2])
    right = lf(t=[3, 4], v=[1.0, 2.0], a=["x", "x"], b=[1, 2])
    out = rows(left.join_asof(right, on="t", by=["a", "b"]), sort_by="b")
    assert out == [(5, "x", 1, 1.0), (5, "x", 2, 2.0)]


class TestSaltedJoin:
    def test_matches_plain_join_on_skewed_data(self, pl, spark):
        import pandas as pd

        # 90% of left rows share one hot key
        left = pl.from_pandas(
            pd.DataFrame({"k": [1] * 900 + list(range(2, 102)), "v": list(range(1000))})
        )
        right = pl.from_pandas(
            pd.DataFrame({"k": list(range(1, 102)), "w": [f"r{i}" for i in range(1, 102)]})
        )
        plain = left.join(right, on="k").collect().sort_values(["k", "v"], ignore_index=True)
        salted = (
            pl.salted_join(left, right, "k", salt=8)
            .collect()
            .sort_values(["k", "v"], ignore_index=True)[plain.columns]
        )
        pd.testing.assert_frame_equal(plain, salted)

    def test_left_and_semi(self, pl, spark):
        import pandas as pd

        left = pl.from_pandas(pd.DataFrame({"k": [1, 1, 2, 3], "v": [10, 11, 20, 30]}))
        right = pl.from_pandas(pd.DataFrame({"k": [1, 2], "w": ["a", "b"]}))
        lj = pl.salted_join(left, right, "k", salt=4, how="left").collect()
        assert len(lj) == 4 and lj[lj["k"] == 3]["w"].isna().all()
        sj = pl.salted_join(left, right, "k", salt=4, how="semi").collect()
        assert sorted(sj["k"].tolist()) == [1, 1, 2]

    def test_rejects_full(self, pl):
        import pandas as pd

        f = pl.from_pandas(pd.DataFrame({"k": [1]}))
        import pytest

        with pytest.raises(ValueError, match="inner"):
            pl.salted_join(f, f, "k", how="full")


def test_band_join_matches_bruteforce(pl, lf):
    left = lf(lid=[1, 2, 3, 4], x=[1.0, 5.0, 9.4, 20.0])
    right = lf(rid=[10, 20, 30], y=[1.4, 9.0, 40.0])
    out = pl.band_join(left, right, "x", "y", band=0.5)
    pairs = sorted((r[0], r[2]) for r in rows(out.select("lid", "x", "rid", "y")))
    assert pairs == [(1, 10), (3, 20)]  # |1-1.4|<=.5, |9.4-9|<=.5
    # equi-bucketed: Catalyst must NOT fall back to nested-loop/cartesian
    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_band_join_boundary_inclusive(pl, lf):
    left = lf(x=[0.0])
    right = lf(y=[1.0, -1.0, 1.0001])
    out = pl.band_join(left, right, "x", "y", band=1.0)
    ys = sorted(r[1] for r in rows(out))
    assert ys == [-1.0, 1.0]


def test_interval_join_counts_each_pair_once(pl, lf):
    # long intervals spanning many buckets must not duplicate pairs
    left = lf(lid=[1, 2], lo=[0.0, 50.0], hi=[30.0, 55.0])
    right = lf(rid=[7, 8, 9], lo2=[29.0, 54.0, 100.0], hi2=[40.0, 60.0, 101.0])
    out = pl.interval_join(
        left, right, left_lo="lo", left_hi="hi",
        right_lo="lo2", right_hi="hi2", bucket_width=5.0,
    )
    pairs = sorted((r[0], r[3]) for r in rows(out.select("lid", "lo", "hi", "rid")))
    assert pairs == [(1, 7), (2, 8)]
    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_same_column_names(pl, lf):
    left = lf(lo=[0.0], hi=[10.0])
    right = lf(lo=[5.0, 20.0], hi=[6.0, 21.0])
    out = pl.interval_join(
        left, right, left_lo="lo", left_hi="hi",
        right_lo="lo", right_hi="hi", bucket_width=4.0,
    )
    assert len(rows(out)) == 1  # only [5,6] overlaps [0,10]


def test_join_validate(pl, lf):
    import pytest

    left = lf(k=[1, 2, 2], a=["x", "y", "z"])
    right = lf(k=[1, 2], b=["p", "q"])
    # m:1 ok (right unique); 1:m violated (left has dup keys)
    assert len(rows(left.join(right, on="k", validate="m:1"))) == 3
    with pytest.raises(pl.exceptions.ComputeError, match="1:m validation"):
        left.join(right, on="k", validate="1:m")
    with pytest.raises(pl.exceptions.ComputeError, match="1:1 validation"):
        left.join(right, on="k", validate="1:1")
    uniq = lf(k=[1, 2], a=["x", "y"])
    assert len(rows(uniq.join(right, on="k", validate="1:1"))) == 2


def test_join_maintain_order(pl, lf):
    left = lf(k=[3, 1, 2, 1], a=["c", "a1", "b", "a2"]).set_sorted("k") if hasattr(
        lf(k=[1]), "set_sorted"
    ) else None
    # build with explicit scan order via sort on a tag column
    l = lf(tag=[0, 1, 2, 3], k=[3, 1, 2, 1]).sort("tag")
    r = lf(k=[1, 2, 3], b=["x", "y", "z"])
    out = l.join(r, on="k", maintain_order="left")
    assert [t[1] for t in rows(out)] == [3, 1, 2, 1]  # left appearance order
    out2 = l.join(r, on="k", how="right", maintain_order="right")
    # right appearance order; k=1 matches two left rows -> 'x' twice
    assert [t[-1] for t in rows(out2.select("k", "b"))] == ["x", "x", "y", "z"]


def test_join_on_expressions(pl, lf):
    left = lf(a=[1, 2, 3])
    right = lf(b=[2, 4, 9])
    out = left.join(right, left_on=(pl.col("a") * 2), right_on="b")
    assert sorted(r[0] for r in rows(out)) == [1, 2]
    # expr on both sides
    out2 = left.join(right, left_on=(pl.col("a") + 1), right_on=(pl.col("b") / 2))
    assert sorted(r[0] for r in rows(out2.select("a"))) == [1]  # a+1=2 == b/2 (b=4)


def test_unpivot_explode_selectors(pl, lf):
    import polars_spark.selectors as cs

    f = lf(id=["r"], a=[1], b=[2])
    u = f.unpivot(on=cs.numeric(), index="id")
    assert sorted(u.collect()["variable"].tolist()) == ["a", "b"]
    e = lf(a=[[1, 2]], b=[[3, 4]]).explode(pl.col("a"), pl.col("b"))
    assert len(rows(e)) == 2
