"""IO round trips: csv / ndjson scans, parquet + partitioned sinks."""

import os

import pandas as pd

from tests.conftest import rows


def test_csv_round_trip(pl, lf, tmp_path):
    f = lf(a=[1, 2, 3], b=["x", "y", "z"])
    path = str(tmp_path / "out_csv")
    f.sink_csv(path)
    back = pl.scan_csv(path)
    assert rows(back, sort_by="a") == [(1, "x"), (2, "y"), (3, "z")]


def test_ndjson_round_trip(pl, lf, tmp_path):
    f = lf(a=[1, 2], s=["p", "q"])
    path = str(tmp_path / "out_json")
    f.sink_ndjson(path)
    back = pl.scan_ndjson(path)
    assert rows(back, sort_by="a") == [(1, "p"), (2, "q")]


def test_parquet_sink_partitioned(pl, lf, tmp_path):
    f = lf(g=["a", "a", "b"], v=[1, 2, 3])
    path = str(tmp_path / "out_parq")
    f.sink_parquet(path, partition_by="g")
    # hive layout on disk
    assert any(d.startswith("g=") for d in os.listdir(path))
    back = pl.scan_parquet(path)
    pdf = back.collect()
    assert sorted(pdf["v"].tolist()) == [1, 2, 3]
    assert sorted(pdf["g"].astype(str).tolist()) == ["a", "a", "b"]


def test_scan_csv_schema_inference(pl, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    f = pl.scan_csv(str(p))
    assert f.schema["a"] in ("int", "bigint")
    assert rows(f, sort_by="a") == [(1, "x"), (2, "y")]


def test_include_file_paths(pl, lf, tmp_path):
    f = lf(x=[1])
    path = str(tmp_path / "fp")
    f.sink_parquet(path)
    back = pl.scan_parquet(path, include_file_paths="src")
    pdf = back.collect()
    assert pdf["src"].str.contains("fp").all()
