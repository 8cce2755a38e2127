"""Round 7 (ADVICE r6 low): the scan-order contract ranked files by raw
substring containment of the scan path — a path that is a string prefix of
a sibling (/data/a vs /data/ab) matched the earlier when() branch and rows
were silently assigned the wrong file rank.  Matching is now on URI
boundaries (exact file, or directory + '/')."""

import os

import pandas as pd
import pytest

import polars_spark as pl


@pytest.fixture(scope="module")
def prefix_dirs(tmp_path_factory, spark):
    root = tmp_path_factory.mktemp("pfx")
    # "a" is a string prefix of "ab" — the old contains() match collided
    da, dab = root / "a", root / "ab"
    da.mkdir(), dab.mkdir()
    pd.DataFrame({"v": [1, 2, 3], "src": ["a"] * 3}).to_parquet(da / "part.parquet")
    pd.DataFrame({"v": [10, 20, 30], "src": ["ab"] * 3}).to_parquet(dab / "part.parquet")
    return str(da), str(dab)


def test_scan_list_order_with_prefix_sibling_dirs(prefix_dirs):
    da, dab = prefix_dirs
    # scan [ab, a]: rows of ab must come FIRST (given-list order), even
    # though every ab file-URI contains the string of path a
    got = (
        pl.scan_parquet([dab, da])
        .with_row_index("i")
        .sort("i")
        .select("src", "v")
        .rows()
    )
    assert got == [("ab", 10), ("ab", 20), ("ab", 30), ("a", 1), ("a", 2), ("a", 3)]


def test_scan_list_order_other_direction(prefix_dirs):
    da, dab = prefix_dirs
    got = (
        pl.scan_parquet([da, dab])
        .with_row_index("i")
        .sort("i")
        .select("src", "v")
        .rows()
    )
    assert got == [("a", 1), ("a", 2), ("a", 3), ("ab", 10), ("ab", 20), ("ab", 30)]


def test_concat_order_with_prefix_sibling_dirs(prefix_dirs):
    da, dab = prefix_dirs
    lf = pl.concat([pl.scan_parquet(dab), pl.scan_parquet(da)])
    got = lf.with_row_index("i").sort("i").select("src", "v").rows()
    assert got == [("ab", 10), ("ab", 20), ("ab", 30), ("a", 1), ("a", 2), ("a", 3)]
