"""Round-12: distributed scan_csv(skip_rows=N) lowering (VERDICT r11 #5).

The round-11 implementation streamed each file through the DRIVER into a
trimmed temp copy — local files only, unbounded /tmp growth, and a
second full read of multi-GB files.  The lowering is now engine-side:
read as ``text``, drop the first N lines per file via the captured
(file, block, position) scan order, parse with ``from_csv``.  No driver
I/O, ``file://`` URIs work, and the order contract (row_index) holds.
"""

from __future__ import annotations

import os

import pytest


def _write(tmp_path, name, text):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_preamble_dropped_and_types_inferred(pl, tmp_path):
    p = _write(tmp_path, "s.csv", "garbage\nmore garbage\na,b\n1,2\n3,4\n")
    out = pl.scan_csv(p, skip_rows=2).collect()
    assert list(out.columns) == ["a", "b"]
    assert list(out["a"]) == [1, 3]


def test_file_uri_no_driver_copy(pl, tmp_path):
    """The r11 path raised on any non-local-looking source and copied the
    rest driver-side; the distributed path reads URIs through Spark and
    never creates a trimmed copy."""
    from polars_spark.sources import _SKIPROWS_TMPDIRS

    before = len(_SKIPROWS_TMPDIRS)
    p = _write(tmp_path, "u.csv", "junk\na,b\n1,2\n")
    out = pl.scan_csv("file://" + p, skip_rows=1).collect()
    assert out.to_dicts() == [{"a": 1, "b": 2}]
    assert len(_SKIPROWS_TMPDIRS) == before, "driver-side trim copy was made"


def test_multi_path_same_basename(pl, tmp_path):
    """ADVICE r11: two files sharing a basename across patterns must not
    collide (the old trim path overwrote one temp copy with the other)."""
    d1 = tmp_path / "d1"
    d2 = tmp_path / "d2"
    d1.mkdir()
    d2.mkdir()
    pa = _write(d1, "data.csv", "junk\na,b\n1,2\n")
    pb = _write(d2, "data.csv", "junk\na,b\n3,4\n")
    out = pl.scan_csv([pa, pb], skip_rows=1).collect()
    assert sorted(out.to_dicts(), key=lambda r: r["a"]) == [
        {"a": 1, "b": 2},
        {"a": 3, "b": 4},
    ]


def test_comment_lines_before_header(pl, tmp_path):
    """After the preamble, comment/empty lines are skipped BEFORE header
    detection (reference + Spark native semantics: the header is the
    first surviving line, not a fixed line number)."""
    p = _write(tmp_path, "c.csv", "junk\n# note\na,b\n#mid\n1,NA\n2,z\n")
    out = pl.scan_csv(
        p, skip_rows=1, comment_prefix="#", null_values="NA"
    ).collect()
    assert out.to_dicts() == [{"a": 1, "b": None}, {"a": 2, "b": "z"}]


def test_no_header_and_new_columns(pl, tmp_path):
    p = _write(tmp_path, "nh.csv", "x\ny\n10,20\n30,40\n")
    out = pl.scan_csv(p, skip_rows=2, has_header=False).collect()
    assert list(out.columns) == ["column_1", "column_2"]
    out2 = pl.scan_csv(
        p, skip_rows=2, has_header=False, new_columns=["u", "v"]
    ).collect()
    assert out2.to_dicts() == [{"u": 10, "v": 20}, {"u": 30, "v": 40}]


def test_dict_schema(pl, tmp_path):
    """polars dict schema: names AND dtypes from the dict, header line
    consumed but ignored (works on both the skip and non-skip paths)."""
    p = _write(tmp_path, "ds.csv", "junk\na,b\n1,2\n3,4\n")
    lf = pl.scan_csv(p, skip_rows=1, schema={"a": pl.Int64, "b": pl.Utf8})
    out = lf.collect()
    assert out.to_dicts() == [{"a": 1, "b": "2"}, {"a": 3, "b": "4"}]
    p2 = _write(tmp_path, "ds2.csv", "a,b\n5,x\n")
    out2 = pl.scan_csv(p2, schema={"a": pl.Int32, "b": pl.Utf8}).collect()
    assert out2.to_dicts() == [{"a": 5, "b": "x"}]


def test_row_index_order_contract(pl, tmp_path):
    """The skip path carries the scan-order struct through its join (the
    deferred input_file_name() re-derivation is multi-source there)."""
    p = _write(tmp_path, "m.csv", "x\na,b\n1,1\n2,2\n3,3\n4,4\n")
    out = pl.scan_csv(p, skip_rows=1, row_index_name="ri").collect()
    assert [r["ri"] for r in out.to_dicts()] == [0, 1, 2, 3]
    assert [r["a"] for r in out.to_dicts()] == [1, 2, 3, 4]


def test_ragged_rows_still_raise(pl, tmp_path):
    p = _write(tmp_path, "r.csv", "junk\na,b\n1,2\n3,4,5\n")
    with pytest.raises(Exception):
        pl.scan_csv(p, skip_rows=1).collect()
    out = pl.scan_csv(p, skip_rows=1, truncate_ragged_lines=True).collect()
    assert len(out) == 2


def test_skip_rows_combines_with_after_header_and_n_rows(pl, tmp_path):
    p = _write(tmp_path, "k.csv", "x\na,b\n1,1\n2,2\n3,3\n4,4\n")
    out = pl.scan_csv(
        p, skip_rows=1, skip_rows_after_header=1, n_rows=2
    ).collect()
    assert out.to_dicts() == [{"a": 2, "b": 2}, {"a": 3, "b": 3}]


def test_quoted_newline_raises_loudly_both_modes(pl, tmp_path):
    """Round-12 review: the per-line lowering can't reassemble quoted
    embedded newlines — the quote-parity assert raises with remediation
    in FAILFAST AND PERMISSIVE (no silent fragment rows)."""
    import pytest as _pytest

    p = _write(tmp_path, "q.csv", 'junk\nh1,h2\n"line1\nline2",b\n')
    for kw in ({}, {"ignore_errors": True}):
        with _pytest.raises(Exception, match="unterminated quote"):
            pl.scan_csv(p, skip_rows=1, **kw).collect()


def test_stray_quote_unquoted_mode_ok(pl, tmp_path):
    """quote_char=None disables quoting AND the parity check — the escape
    hatch for files with stray literal quotes in unquoted fields."""
    p = _write(tmp_path, "st.csv", 'junk\nsize,desc\n5,5" nail\n')
    out = pl.scan_csv(p, skip_rows=1, quote_char=None).collect()
    assert out.to_dicts() == [{"size": 5, "desc": '5" nail'}]


def test_concat_skip_scan_with_normal_scan(pl, tmp_path):
    """Round-12 review: concat's deferred-scan order composition re-derives
    input_file_name() over the union — impossible above the skip plan's
    joins (multi-source AnalysisException before the fix).  The attached
    marker routes concat down its generic union path."""
    p1 = _write(tmp_path, "c1.csv", "junk\na,b\n1,2\n")
    p2 = _write(tmp_path, "c2.csv", "a,b\n3,4\n")
    out = pl.concat(
        [pl.scan_csv(p1, skip_rows=1), pl.scan_csv(p2)]
    ).with_row_index("i").collect()
    assert sorted((r["a"], r["b"]) for r in out.to_dicts()) == [(1, 2), (3, 4)]


def test_header_only_file_empty_typed_frame(pl, tmp_path):
    p = _write(tmp_path, "h.csv", "junk\na,b\n")
    out = pl.scan_csv(p, skip_rows=1).collect()
    assert list(out.columns) == ["a", "b"] and len(out) == 0


def test_dict_schema_with_columns_projection(pl, tmp_path):
    p = _write(tmp_path, "s2.csv", "junk\na,b\n1,x\n")
    out = pl.scan_csv(
        p, skip_rows=1, schema={"a": pl.Int64, "b": pl.Utf8}, columns=["a"]
    ).collect()
    assert out.to_dicts() == [{"a": 1}]


def test_dict_schema_bad_value_raises(pl, tmp_path):
    """The dict-schema lowering goes through the engine's STRICT cast —
    unparseable values raise (polars ComputeError parity), never silent
    NULLs."""
    import pytest as _pytest

    p = _write(tmp_path, "bad.csv", "a\nxyz\n")
    with _pytest.raises(Exception, match="cannot be cast|CAST_INVALID"):
        pl.scan_csv(p, schema={"a": pl.Int64}).collect()
