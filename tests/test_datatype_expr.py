"""DataTypeExpr: pl.dtype_of / pl.self_dtype / pl.struct_with_fields and
DataType.to_dtype_expr (reference py-polars/src/polars/datatype_expr/ and
functions/datatype.py)."""

import pytest

from tests.conftest import rows


def test_dtype_of_cast(pl, lf):
    # cast one column to the dtype of another, resolved lazily
    f = lf(a=[1, 2], b=[1.5, 2.5])
    out = f.select(pl.col("a").cast(pl.dtype_of("b")).alias("a"))
    assert out.schema == {"a": "double"}
    assert sorted(r[0] for r in rows(out)) == [1.0, 2.0]


def test_dtype_of_expr(pl, lf):
    f = lf(a=[1, 2], b=[1.5, 2.5])
    dte = pl.dtype_of(pl.col("a") + pl.col("b"))
    assert dte.collect_dtype(f) is pl.Float64


def test_collect_dtype_mapping(pl):
    assert pl.dtype_of("a").collect_dtype({"a": pl.String}) is pl.String
    got = pl.dtype_of("a").collect_dtype({"a": pl.List(pl.Int32)})
    assert isinstance(got, pl.List)
    assert pl.Int32.to_dtype_expr().collect_dtype({}) is pl.Int32


def test_map_batches_self_dtype(pl, lf):
    # the reference's flagship dtype_of use: return_dtype=pl.dtype_of(col)
    f = lf(a=[1, 2, 3])
    out = f.select(
        pl.col("a").map_batches(lambda s: s * 2, return_dtype=pl.dtype_of("a")).alias("a2"),
        pl.col("a").map_elements(lambda v: v + 1, return_dtype=pl.self_dtype()).alias("a3"),
    )
    assert out.schema == {"a2": "bigint", "a3": "bigint"}
    r = rows(out, sort_by="a2")
    assert [t[0] for t in r] == [2, 4, 6]
    assert sorted(t[1] for t in r) == [2, 3, 4]


def test_self_dtype_outside_context_raises(pl, lf):
    with pytest.raises(pl.exceptions.InvalidOperationError):
        pl.self_dtype().collect_dtype({})


def test_display_and_eq(pl, lf):
    f = lf(a=[1], s=["x"], fl=[1.5])
    out = f.select(
        a=pl.dtype_of("a").display(),
        s=pl.dtype_of("s").display(),
        fl=pl.dtype_of("fl").display(),
        same=(pl.dtype_of("a") == pl.Int64),
        diff=(pl.dtype_of("a") != pl.dtype_of("s")),
    )
    assert rows(out) == [("i64", "str", "f64", True, True)]


def test_matches_selector(pl, lf):
    import polars_spark.selectors as cs

    f = lf(a=[1], s=["x"])
    out = f.select(
        a_num=pl.dtype_of("a").matches(cs.numeric()),
        s_num=pl.dtype_of("s").matches(cs.numeric()),
        s_str=pl.dtype_of("s").matches(cs.string()),
    )
    assert rows(out) == [(True, False, True)]


def test_wrap_and_inner(pl):
    wrapped = pl.Int32.to_dtype_expr().wrap_in_list().collect_dtype({})
    assert isinstance(wrapped, pl.List) and not isinstance(wrapped, pl.Array)
    arr = pl.Int32.to_dtype_expr().wrap_in_array(width=5).collect_dtype({})
    assert isinstance(arr, pl.Array) and arr.size == 5
    inner = pl.List(pl.Int32).to_dtype_expr().inner_dtype().collect_dtype({})
    assert inner is pl.Int32
    with pytest.raises(pl.exceptions.InvalidOperationError):
        pl.Int32.to_dtype_expr().inner_dtype().collect_dtype({})


def test_signed_unsigned(pl):
    assert pl.UInt32.to_dtype_expr().to_signed_integer().collect_dtype({}) is pl.Int32
    assert pl.Int32.to_dtype_expr().to_unsigned_integer().collect_dtype({}) is pl.UInt32
    with pytest.raises(pl.exceptions.InvalidOperationError):
        pl.String.to_dtype_expr().to_signed_integer().collect_dtype({})


def test_default_values(pl, lf):
    f = lf(x=[1])
    out = f.select(
        i=pl.Int32.to_dtype_expr().default_value(),
        one=pl.Int64.to_dtype_expr().default_value(numeric_to_one=True),
        s=pl.String.to_dtype_expr().default_value(),
        b=pl.Boolean.to_dtype_expr().default_value(),
        lst=pl.List(pl.Int32).to_dtype_expr().default_value(num_list_values=2),
        d=pl.Date.to_dtype_expr().default_value(),
    )
    r = rows(out)[0]
    assert r[0] == 0 and r[1] == 1 and r[2] == "" and r[3] is False
    assert list(r[4]) == [0, 0]
    assert str(r[5]) == "1970-01-01"


def test_default_value_n(pl, lf):
    f = lf(x=[1])
    out = f.select(v=pl.Int32.to_dtype_expr().default_value(3, numeric_to_one=True))
    assert [t[0] for t in rows(out)] == [1, 1, 1]


def test_enum_default_and_display(pl, lf):
    e = pl.Enum(["lo", "hi"])
    f = lf(x=[1])
    out = f.select(v=e.to_dtype_expr().default_value())
    assert rows(out) == [("lo",)]


def test_struct_with_fields(pl, lf):
    f = lf(a=[1], b=["x"])
    dte = pl.struct_with_fields({"x": pl.dtype_of("a"), "y": pl.String})
    got = dte.collect_dtype(f)
    assert isinstance(got, pl.Struct)
    assert [fld.name for fld in got.fields] == ["x", "y"]
    # usable as a cast target
    out = f.select(
        s=pl.struct(pl.col("a").alias("x"), pl.col("b").alias("y")).cast(dte)
    )
    assert out.schema["s"].startswith("struct<")


def test_struct_namespace(pl, lf):
    dt = pl.Struct({"x": pl.Int64, "y": pl.String}).to_dtype_expr()
    assert dt.struct[1].collect_dtype({}) is pl.String
    assert dt.struct.field_dtype("x").collect_dtype({}) is pl.Int64
    f = lf(q=[1])
    out = f.select(n=dt.struct.field_names())
    assert [t[0] for t in rows(out)] == ["x", "y"]


def test_arr_namespace(pl, lf):
    dt = pl.Array(pl.Int8, 4).to_dtype_expr()
    f = lf(q=[1])
    out = f.select(w=dt.arr.width())
    assert rows(out) == [(4,)]
    assert dt.arr.inner_dtype().collect_dtype({}) is pl.Int8
    assert dt.list.inner_dtype().collect_dtype({}) is pl.Int8


def test_unsigned_storage_equality(pl, lf):
    # engine contract: UInt32 is stored as bigint, so dtype_of round-trips
    # to the storage type and == compares storage types (documented §1.2)
    f = lf(a=[1]).with_columns(pl.col("a").cast(pl.UInt32))
    assert f.schema == {"a": "bigint"}
    out = f.select(eq=(pl.dtype_of("a") == pl.UInt32))
    assert rows(out) == [(True,)]
