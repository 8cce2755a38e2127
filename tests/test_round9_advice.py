"""Round-9 ADVICE regression tests (all four round-8 findings).

1. Unsigned cast range: UInt8 rides smallint, so the value range must be
   gated explicitly — cast('300', UInt8) is null (strict: raises), and
   numeric out-of-range / negative sources null out too.
2. UInt64/UInt128 (decimal carriers) go through the same parse-grammar
   gate: Spark's trimming CAST must not accept ' 7' for UInt64.
3. dtype passed as a STRING name ('UInt32') resolves to the unsigned
   grammar exactly like the class pl.UInt32.
4. frame.corr diagonal entries are exactly 1.0 (never 1.0±1ulp).
5. Signed NaN strings ('-nan'/'+nan') parse to NaN for float targets
   (fast_float2 semantics), not null/CAST_INVALID_INPUT.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest


def _one(lf, pl, expr):
    return lf.select(expr.alias("v")).collect()["v"].tolist()


def test_uint8_range_nonstrict_null(pl, lf):
    f = lf(s=["300", "255", "0", "-1", "7"])
    got = _one(f, pl, pl.col("s").cast(pl.UInt8, strict=False))
    assert got[0] is None or (isinstance(got[0], float) and math.isnan(got[0]))
    assert got[1] == 255
    assert got[2] == 0
    assert got[3] is None or (isinstance(got[3], float) and math.isnan(got[3]))
    assert got[4] == 7


def test_uint8_range_strict_raises(pl, lf):
    f = lf(s=["300"])
    with pytest.raises(Exception, match="(?i)conversion|failed"):
        f.select(pl.col("s").cast(pl.UInt8).alias("v")).collect()


def test_uint_numeric_source_range(pl, lf):
    # numeric (non-string) sources out of the unsigned range null out too
    def norm(vals):
        return [
            None if v is None or (isinstance(v, float) and math.isnan(v)) else int(v)
            for v in vals
        ]

    f = lf(x=[300, 255, -5, 0])
    got = norm(_one(f, pl, pl.col("x").cast(pl.UInt8, strict=False)))
    assert got == [None, 255, None, 0]
    got16 = norm(_one(f, pl, pl.col("x").cast(pl.UInt16, strict=False)))
    assert got16 == [300, 255, None, 0]


def test_uint64_grammar_no_trim(pl, lf):
    # UInt64 rides decimal(20,0); Spark's trimming CAST must be gated out
    f = lf(s=[" 7", "7", "-1", "18446744073709551615", "18446744073709551616"])
    got = _one(f, pl, pl.col("s").cast(pl.UInt64, strict=False))
    assert got[0] is None
    assert int(got[1]) == 7
    assert got[2] is None
    assert int(got[3]) == 18446744073709551615
    assert got[4] is None  # > u64::MAX


def test_uint32_as_string_dtype_name(pl, lf):
    # dtype given as the string name must hit the unsigned grammar too
    f = lf(s=["-5", "5"])
    got = _one(f, pl, pl.col("s").cast("UInt32", strict=False))
    assert got[0] is None or (isinstance(got[0], float) and math.isnan(got[0]))
    assert got[1] == 5


def test_frame_corr_diagonal_exact_one(pl):
    # values chosen so sqrt(var)^2 != var in binary floating point
    df = pl.from_pandas(
        pd.DataFrame(
            {
                "a": [0.1, 0.7, 0.30000000000000004, 11.3, 5.55, 1e-9, 3.14159],
                "b": [2.0, 1.1, 9.81, 0.333, 7.77, 123.456, 0.001],
            }
        )
    )
    out = df.corr().collect()
    assert out["a"].tolist()[0] == 1.0
    assert out["b"].tolist()[1] == 1.0


def test_frame_corr_diagonal_degenerate(pl):
    # constant column -> NaN on the diagonal; single row -> null (n<2)
    const = pl.from_pandas(pd.DataFrame({"a": [3.0, 3.0, 3.0]})).corr().collect()
    assert math.isnan(const["a"].tolist()[0])
    single = pl.from_pandas(pd.DataFrame({"a": [3.0]})).corr().collect()
    assert single["a"].tolist()[0] is None


def test_signed_nan_parses_to_nan(pl, lf):
    f = lf(s=["-nan", "+nan", "nan", "-inf", "inf"])
    got = _one(f, pl, pl.col("s").cast(pl.Float64, strict=False))
    assert math.isnan(got[0]) and math.isnan(got[1]) and math.isnan(got[2])
    assert got[3] == float("-inf") and got[4] == float("inf")
    # strict must succeed as well (previously raised CAST_INVALID_INPUT)
    got_strict = _one(f, pl, pl.col("s").cast(pl.Float64))
    assert math.isnan(got_strict[0])
