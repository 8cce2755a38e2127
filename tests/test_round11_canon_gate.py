"""Round-11: the driver-canon representability ratchet.

Round 10's three driver reds (mm_extract_features, mm_resize,
txt_tokenize_wordpiece) were not wrong answers — they were ArrayType
FINAL columns crashing the driver's pandas canon (``sort_values`` over
ndarray cells raises ``TypeError: unhashable type``) before any value
comparison.  Round 9's Decimal reds were the same protocol class.  The
durable rule (VERDICT r10 next-round #1/#4): the LOCAL gate must be a
conservative model of the DRIVER gate — anything the driver's 56-line
sort+hash canon cannot represent must fail ``check.py --strict``
locally, via ``tools/driver_canon.canon_problems``.

This family pins:
  1. the r10 formulations (array finals) FAIL the canon check locally;
  2. the r9 formulation (Decimal finals) FAILS it too;
  3. scalar-only frames (incl. dates, strings, bytes, NaN) PASS;
  4. the seven re-rendered gates now emit scalar-only final schemas;
  5. the driver's exact sort_values replay is what's being modelled.
"""

from __future__ import annotations

import decimal
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from driver_canon import (  # noqa: E402
    canon_problems,
    pandas_cell_problems,
    sort_replay_problems,
    spark_schema_problems,
)

REFIXED_GATES = [
    # the 3 round-10 driver reds
    "mm_extract_features",
    "mm_resize",
    "txt_tokenize_wordpiece",
    # the 4 backlog array-final gates fixed BEFORE their driver debut
    "agg_implode_counts",
    "sf_find_many",
    "agg_groups_positions",
    "agg_list_family",
]


def test_r10_array_final_fails_canon():
    """An ndarray-cell column (exactly what toPandas yields for an
    ArrayType final) must be flagged AND must reproduce the driver's
    sort_values crash."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "features": [np.array([0.1, 0.2], dtype=np.float32),
                         np.array([0.3, 0.4], dtype=np.float32)],
        }
    )
    assert pandas_cell_problems(pdf, "spark")
    # the replay reproduces the driver's exact failure mode
    assert sort_replay_problems(pdf, "spark")
    with pytest.raises(TypeError, match="unhashable"):
        pdf.reindex(sorted(pdf.columns), axis=1).sort_values(sorted(pdf.columns))


def test_r9_decimal_final_fails_canon():
    pdf = pd.DataFrame({"k": ["A"], "v": [decimal.Decimal("1.50")]})
    probs = pandas_cell_problems(pdf, "spark")
    assert probs and "Decimal" in probs[0]


def test_list_cells_fail_canon():
    """DuckDB .df() list columns arrive as object-of-list — same verdict."""
    pdf = pd.DataFrame({"k": [1], "v": [[1, 2, 3]]})
    assert pandas_cell_problems(pdf, "oracle")


def test_scalar_frames_pass_canon():
    import datetime

    pdf = pd.DataFrame(
        {
            "s": ["a", None],
            "i": [1, 2],
            "f": [1.5, float("nan")],
            "b": [True, False],
            "d": [datetime.date(2024, 1, 1), None],
            "by": [b"xx", b"yy"],
        }
    )
    assert pandas_cell_problems(pdf, "spark") == []
    assert sort_replay_problems(pdf, "spark") == []


def test_spark_schema_rule(spark):
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id"),
        F.array(F.lit(1), F.lit(2)).alias("arr"),
        F.col("id").cast("decimal(12,2)").alias("dec"),
        F.struct(F.lit(1).alias("x")).alias("st"),
        F.create_map(F.lit("k"), F.lit(1)).alias("mp"),
    )
    probs = spark_schema_problems(df.schema)
    flagged = {p.split("col=")[1].split(" ")[0] for p in probs}
    assert flagged == {"arr", "dec", "st", "mp"}
    # and the scalar projection passes
    assert spark_schema_problems(df.select("id").schema) == []


def test_refixed_gates_are_scalar_only(spark):
    """The seven re-rendered gates must emit driver-canon-representable
    FINAL schemas at the smallest SF (schema check only — values are the
    strict sweep's job)."""
    from polars_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    for name in REFIXED_GATES:
        df = QUERIES[name](spark, sf_dir)
        assert spark_schema_problems(df.schema) == [], name
        pdf = df.limit(50).toPandas()
        assert canon_problems(df.schema, pdf, None) == [], name


def test_scan_ndjson_preserves_first_row_key_order(spark, pl):
    """polars scan_ndjson column order = first object's key order; Spark's
    JSON inference sorts alphabetically — the scan reorders (round 11),
    including names with dots/backticks/unicode."""
    import json
    import os
    import tempfile

    d = tempfile.mkdtemp()
    p = os.path.join(d, "hand.ndjson")
    with open(p, "w") as f:
        f.write(json.dumps({"zeta": 1, "alpha": 2, "a.b`c": 3, "日本語": 4}) + "\n")
        f.write(json.dumps({"alpha": 5, "zeta": 6, "a.b`c": 7, "日本語": 8}) + "\n")
    out = pl.scan_ndjson(p).collect()
    assert list(out.columns) == ["zeta", "alpha", "a.b`c", "日本語"]


def test_scan_csv_parses_quoted_newlines(spark, pl):
    """RFC-4180 quoted newlines: polars parses them unconditionally;
    Spark's line-split default silently corrupted them into extra rows.
    scan_csv now defaults multiline=True (round 11)."""
    import os
    import tempfile

    d = tempfile.mkdtemp()
    p = os.path.join(d, "quoted.csv")
    with open(p, "w") as f:
        f.write('a,b\n"x,y","line1\nline2"\n7,z\n')
    out = pl.scan_csv(p).collect()
    assert len(out) == 2
    assert out["a"].iloc[0] == "x,y"
    assert out["b"].iloc[0] == "line1\nline2"


def test_scan_csv_ragged_lines_raise_by_default(spark, pl):
    """polars raises on ragged rows (truncate_ragged_lines=False default);
    Spark's permissive default silently truncated/padded.  FAILFAST now
    maps the contract; truncate_ragged_lines=True restores permissive."""
    import os
    import tempfile

    import pytest as _pytest

    d = tempfile.mkdtemp()
    p = os.path.join(d, "ragged.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,2\n3,4,5\n6\n")
    with _pytest.raises(Exception):
        pl.scan_csv(p).collect()
    out = pl.scan_csv(p, truncate_ragged_lines=True).collect()
    assert len(out) == 3


def test_scan_csv_skip_rows_drops_preamble(spark, pl):
    """skip_rows drops the first N lines BEFORE the header (polars
    semantics).  The old skipRows reader option is a Databricks extension
    OSS Spark silently ignores (round-11 probe)."""
    import os
    import tempfile

    d = tempfile.mkdtemp()
    p = os.path.join(d, "s.csv")
    with open(p, "w") as f:
        f.write("garbage line\nanother garbage\na,b\n1,2\n3,4\n")
    out = pl.scan_csv(p, skip_rows=2).collect()
    assert list(out.columns) == ["a", "b"]
    assert list(out["a"]) == [1, 3]
