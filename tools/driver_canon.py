"""Conservative replay of the DRIVER's result canonicalization.

The driver's correctness checker (its traceback appears verbatim in
CORRECTNESS_r10.json: ``_canon`` at line 16 of a 56-line inline script)
canonicalizes each result as::

    pdf.reindex(sorted(pdf.columns), axis=1)
       .sort_values(list(pdf.columns))      # <- crashes on ndarray cells
    ... then hashes the sorted cell values   # <- diverges on Decimal objects

That canon only represents SCALAR cells hash-stably:

* round-9 reds (sf_decimal_exact, rel_match_schema): Spark toPandas keeps
  DecimalType as ``decimal.Decimal`` objects while DuckDB ``.df()`` widens
  DECIMAL to float64 — equal values, different hashes.
* round-10 reds (mm_extract_features, mm_resize, txt_tokenize_wordpiece):
  ArrayType finals become ndarray cells; ``pandas.sort_values`` raises
  ``TypeError: unhashable type: 'numpy.ndarray'`` before any comparison.

Both rounds the LOCAL gate had been patched to be MORE capable than the
driver's (Arrow re-sourcing, Decimal-aware compares) — so local green did
not predict driver green.  This module is the ratchet that ends the
per-dtype whack-a-mole: ``canon_problems`` replays the driver's canon and
applies a conservative representability rule.  Any query whose FINAL
result the driver cannot sort + hash stably FAILS ``check.py --strict``
locally, before it ever ships.

Rule of thumb for gate authors: final schemas must be scalar-only
(int/float/bool/string/date/timestamp).  Render arrays via
``array_join``/``to_json`` (ints/strings) or scaled-int CSV (floats), and
decimals via CAST(... AS VARCHAR), identically on BOTH sides.
"""

from __future__ import annotations

import datetime
import decimal

import numpy as np
import pandas as pd

# pandas cell types the driver's sort+hash canon handles, and whose
# DuckDB-side rendering is hash-identical (strings, ints, floats, bools,
# bytes, dates/timestamps).  Everything else is flagged.
_SCALAR_OK = (
    str,
    bytes,
    bool,
    int,
    float,
    np.integer,
    np.floating,
    np.bool_,
    datetime.date,
    datetime.datetime,
    datetime.time,
    datetime.timedelta,
    pd.Timestamp,
    pd.Timedelta,
)


def spark_schema_problems(schema) -> list[str]:
    """Flag FINAL-schema dtypes the driver's pandas canon cannot represent.

    ArrayType/MapType/StructType -> ndarray/dict cells (unsortable,
    unhashable); DecimalType -> Decimal objects (hash-diverges from the
    oracle's float64).
    """
    from pyspark.sql import types as T

    out = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            out.append(
                f"CANON col={f.name} final Spark dtype {dt.simpleString()} — "
                "driver sort_values crashes on non-scalar cells; render as a "
                "scalar string on BOTH sides (array_join / to_json / md5+len)"
            )
        elif isinstance(dt, T.DecimalType):
            out.append(
                f"CANON col={f.name} final Spark dtype {dt.simpleString()} — "
                "toPandas yields Decimal objects, oracle .df() yields float64; "
                "CAST the final column to VARCHAR on BOTH sides"
            )
    return out


def _bad_cell(v) -> str | None:
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, decimal.Decimal):
        return "Decimal object"
    if isinstance(v, (np.ndarray, list, tuple, set, dict)):
        return type(v).__name__
    if not isinstance(v, _SCALAR_OK):
        return type(v).__name__
    return None


def pandas_cell_problems(pdf: pd.DataFrame, side: str) -> list[str]:
    """Flag object-dtype cells the driver canon cannot sort/hash stably."""
    out = []
    for c in pdf.columns:
        if pdf[c].dtype != object:
            continue
        for v in pdf[c]:
            if isinstance(v, float) and np.isnan(v):
                continue
            bad = _bad_cell(v)
            if bad is not None:
                out.append(
                    f"CANON col={c} ({side}) contains {bad} cells — not "
                    "representable in the driver's sort+hash canon"
                )
                break
    return out


def sort_replay_problems(pdf: pd.DataFrame, side: str) -> list[str]:
    """Replay the driver's exact canon step: sort_values over all columns."""
    if len(pdf.columns) == 0:
        return []
    try:
        pdf.reindex(sorted(pdf.columns), axis=1).sort_values(
            sorted(pdf.columns), ignore_index=True
        )
    except Exception as exc:  # noqa: BLE001 — any crash here IS the finding
        return [f"CANON ({side}) driver sort_values replay raised: {type(exc).__name__}: {exc}"]
    return []


def canon_problems(
    spark_schema,
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame | None,
) -> list[str]:
    """Full conservative driver-canon check for one query result pair."""
    out = spark_schema_problems(spark_schema)
    out += pandas_cell_problems(spark_pdf, "spark")
    out += sort_replay_problems(spark_pdf, "spark")
    if oracle_pdf is not None:
        out += pandas_cell_problems(oracle_pdf, "oracle")
        out += sort_replay_problems(oracle_pdf, "oracle")
    return out
