"""Round-5 continuation surface: Schema methods, converter schema= forms,
generator expression arguments, Config save/load, assert_schema_equal."""

import numpy as np
import pyarrow as pa
import pytest


def test_schema_methods(pl):
    s = pl.Schema({"x": pl.Int64(), "y": pl.List(pl.Float64)})
    assert s.contains_dtype(pl.Int64, recursive=False)
    assert not s.contains_dtype(pl.Float64, recursive=False)
    assert s.contains_dtype(pl.Float64, recursive=True)
    assert pl.Schema({"x": pl.Int8(), "y": pl.String()}).to_python() == {"x": int, "y": str}
    arrow = pl.Schema({"x": pl.String, "l": pl.List(pl.Int64)}).to_arrow()
    assert arrow.field("x").type == pa.large_string()
    # arrow-schema input
    assert list(pl.Schema(pa.schema([pa.field("x", pa.int32())]))) == ["x"]


def test_schema_to_frame(pl, spark):
    f = pl.Schema({"x": pl.Int32(), "y": pl.String()}).to_frame()
    assert list(f.columns) == ["x", "y"]
    assert dict(f.schema) == {"x": "int", "y": "string"}
    assert f.height == 0


def test_converters_schema_forms(pl, spark):
    data = [{"a": 1, "b": 2}, {"a": 3, "b": 4}]
    assert dict(pl.from_dicts(data, schema={"a": pl.Int32}).schema) == {"a": "int"}
    lf = pl.from_dicts(data, schema=["a", "b", "c"])
    assert list(lf.columns) == ["a", "b", "c"]
    assert lf.collect()["c"].isna().all()
    # schema length matching the outer list length means column orientation
    out = pl.from_records([[1, 2, 1], [3, 4, 5]], schema=["a", "b"]).collect()
    assert out["a"].tolist() == [1, 2, 1] and out["b"].tolist() == [3, 4, 5]
    out = pl.from_numpy(
        np.array([(1, 2), (3, 4)], dtype=np.int64), schema=["a", "b"], orient="col"
    ).collect()
    assert out["a"].tolist() == [1, 2]
    assert dict(pl.from_arrow(pa.table({"s": [1, 2]}), schema={"s": pl.Int32}).schema) == {"s": "int"}
    # bare arrow array -> Series
    s = pl.from_arrow(pa.array([1, 2, 3]))
    assert s.to_list() == [1, 2, 3]


def test_from_pandas_series_and_repr(pl):
    import pandas as pd

    s = pl.from_pandas(pd.Series([1, 2], name="x"))
    assert s.to_list() == [1, 2] and s.name == "x"
    s = pl.from_repr("shape: (2,)\nSeries: 's' [i64]\n[\n   1\n   2\n]\n")
    assert s.to_list() == [1, 2]


def test_generator_expr_args(pl, lf):
    f = lf(a=[1, 2], b=[3, 4])
    out = f.select(pl.col(c) * 10 for c in ("a", "b")).collect()
    assert out["a"].tolist() == [10, 20]
    out = f.with_columns(pl.col(c).cast(pl.Int8) for c in ("a",))
    assert dict(out.schema)["a"] == "tinyint"


def test_dtype_col_selection_from_schema_values(pl, lf):
    f = lf(a=[1, 2], b=[1.5, 2.5])
    dts = list(dict.fromkeys(f.collect_schema().dtypes()))
    outs = [f.select(pl.col(tp)) for tp in dts]
    assert sorted(c for o in outs for c in o.columns) == ["a", "b"]


def test_config_save_load_state(pl):
    pl.Config.restore_defaults()
    js = pl.Config.save()
    pl.Config.set_tbl_rows(99)
    assert pl.Config.state(if_set=True).get("tbl_rows") == 99
    pl.Config.load(js)
    assert pl.Config.state()["tbl_rows"] == 10
    with pl.Config() as cfg:
        cfg.set_verbose(True)
        assert pl.Config.state()["verbose"] is True
    assert pl.Config.state()["verbose"] is False


def test_assert_schema_equal(pl):
    from polars_spark.testing import assert_schema_equal

    assert_schema_equal({"a": "bigint"}, {"a": "bigint"})
    with pytest.raises(AssertionError, match="column order"):
        assert_schema_equal({"a": "bigint", "b": "int"}, {"b": "int", "a": "bigint"})
    assert_schema_equal(
        {"a": "bigint", "b": "int"}, {"b": "int", "a": "bigint"}, check_column_order=False
    )
    with pytest.raises(AssertionError, match="different dtypes"):
        assert_schema_equal({"a": "bigint"}, {"a": "int"})
