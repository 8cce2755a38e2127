"""Eager DataFrame surface tail (reference dataframe/frame.py): corr,
hash_rows, is_duplicated/is_unique, horizontal aggs, mutating column ops,
rows_by_key, unstack, map_columns, iter_columns, flags."""

import math

import pytest

from tests.conftest import rows


def test_corr_matrix(pl, lf):
    f = lf(foo=[1, 2, 3], bar=[3, 2, 1], ham=[7, 8, 9], s=["x", "y", "z"])
    m = f.corr()  # returns a frame (reference), not pandas
    assert list(m.columns) == ["foo", "bar", "ham"]  # string col excluded
    r0 = m.rows()[0]
    assert r0[0] == pytest.approx(1.0)   # foo
    assert r0[1] == pytest.approx(-1.0)  # bar
    assert r0[2] == pytest.approx(1.0)   # ham
    lab = f.corr(label="cols")
    assert list(lab.columns) == ["cols", "foo", "bar", "ham"]
    assert lab["cols"].to_list() == ["foo", "bar", "ham"]


def test_hash_rows(pl, lf):
    f = lf(foo=[1, None, 3, 1], ham=["a", "b", None, "a"])
    h = f.hash_rows(seed=42)
    assert len(h) == 4
    vals = h.to_list()
    assert vals[0] == vals[3]  # identical rows hash equal
    assert len(set(vals)) == 3
    assert f.hash_rows(seed=1).to_list() != vals  # seed changes the hash


def test_is_duplicated_unique(pl, lf):
    f = lf(a=[1, 2, 3, 1], b=["x", "y", "z", "x"]).sort("a", "b")
    assert f.is_duplicated().to_list() == [True, True, False, False]
    assert f.is_unique().to_list() == [False, False, True, True]


def test_horizontal_aggs(pl, lf):
    f = lf(a=[1.0, 4.0], b=[3.0, None]).sort("a")
    assert f.max_horizontal().to_list() == [3.0, 4.0]
    assert f.min_horizontal().to_list() == [1.0, 4.0]
    assert f.sum_horizontal().to_list() == [4.0, 4.0]
    assert f.mean_horizontal().to_list() == [2.0, 4.0]


def test_drop_in_place_extend(pl, lf):
    f = lf(foo=[1, 2], bar=["a", "b"]).sort("foo")
    s = f.drop_in_place("bar")
    assert s.name == "bar" and sorted(s.to_list()) == ["a", "b"]
    assert f.columns == ["foo"]
    f2 = lf(foo=[1, 2]).extend(lf(foo=[10, 20]))
    assert sorted(r[0] for r in rows(f2)) == [1, 2, 10, 20]


def test_insert_replace_column(pl, lf):
    f = lf(foo=[1, 2, 3], bar=[4, 5, 6]).sort("foo")
    f.insert_column(1, pl.Series("baz", [97, 98, 99]))
    assert f.columns == ["foo", "baz", "bar"]
    assert rows(f, sort_by="foo") == [(1, 97, 4), (2, 98, 5), (3, 99, 6)]

    g = lf(a=[2, 4], b=[0.5, 4.0]).sort("a")
    g.insert_column(2, (pl.col("b") / pl.col("a")).alias("b_div_a"))
    assert g.columns == ["a", "b", "b_div_a"]
    assert rows(g, sort_by="a") == [(2, 0.5, 0.25), (4, 4.0, 1.0)]

    h = lf(foo=[1, 2], bar=["a", "b"]).sort("foo")
    h.replace_column(0, pl.Series("apple", [10, 20]))
    assert h.columns == ["apple", "bar"]
    assert rows(h, sort_by="apple") == [(10, "a"), (20, "b")]


def test_iter_columns_flags(pl, lf):
    f = lf(a=[1, 3], b=[2, 4]).sort("a")
    names = [s.name for s in f.iter_columns()]
    assert names == ["a", "b"]
    fl = f.flags
    assert fl["a"]["SORTED_ASC"] is True
    assert fl["b"]["SORTED_ASC"] is False


def test_map_columns(pl, lf):
    f = lf(a=[1, 2], b=["10", "20"])
    out = f.map_columns("b", lambda s: s.cast(pl.Int64))
    assert out.schema["b"] == "bigint"
    import polars_spark.selectors as cs

    out2 = f.map_columns(cs.string(), lambda s: s.str.to_uppercase())
    assert out2.schema["a"] == "bigint"
    with pytest.raises(TypeError, match="expression"):
        f.map_columns("a", lambda s: 42)


def test_rows_by_key(pl, lf):
    f = lf(g=["a", "b", "a"], v=[1, 2, 3])
    d = f.rows_by_key("g")
    assert sorted(d["a"]) == [(1,), (3,)]
    assert d["b"] == [(2,)]
    dn = f.rows_by_key("g", named=True, include_key=True)
    assert {"g": "b", "v": 2} in dn["b"]
    du = f.rows_by_key("g", unique=True)
    assert du["b"] == (2,)


def test_unstack_vertical(pl, lf):
    f = lf(x=list("ABCDEFGH"), y=[1, 2, 3, 4, 5, 6, 7, 8]).sort("y")
    out = f.unstack(step=4, how="vertical")
    assert out.columns == ["x_0", "x_1", "y_0", "y_1"]
    r = rows(out)
    assert [t[0] for t in r] == ["A", "B", "C", "D"]
    assert [t[1] for t in r] == ["E", "F", "G", "H"]
    assert [t[2] for t in r] == [1, 2, 3, 4]


def test_unstack_horizontal_and_fill(pl, lf):
    f = lf(y=[1, 2, 3, 4, 5]).sort("y")
    out = f.unstack(step=3, how="horizontal")
    r = rows(out)
    # row-major: [1,2], [3,4], [5,None]
    assert r == [(1, 2), (3, 4), (5, None)]
    filled = f.unstack(step=3, how="horizontal", fill_values=0)
    assert rows(filled)[-1] == (5, 0)


def test_unstack_column_subset(pl, lf):
    f = lf(x=list("AB"), y=[1, 2]).sort("y")
    out = f.unstack(step=1, columns="x")
    assert out.columns == ["x_0", "x_1"]
    assert rows(out) == [("A", "B")]


def test_getitem_forms(pl, lf):
    f = lf(a=[1, 2, 3], b=["x", "y", "z"]).sort("a")
    assert f["a"].to_list() == [1, 2, 3]
    assert f[["b", "a"]].columns == ["b", "a"]
    assert f[1] == (2, "y")
    assert [r[0] for r in rows(f[0:2])] == [1, 2]
    assert [r[0] for r in rows(f[::2])] == [1, 3]
    assert [r[0] for r in rows(f[-2:])] == [2, 3]
    assert [r[0] for r in rows(f[[0, 2]])] == [1, 3]
    assert f[1, "b"] == "y" and f[1, 1] == "y"
    assert f[:, "a"].to_list() == [1, 2, 3]
    import pytest

    with pytest.raises(TypeError):
        f[object()]
