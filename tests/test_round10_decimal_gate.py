"""Round-10: decimal values through the GATE BOUNDARY rendering.

Round 9's two driver reds (sf_decimal_exact / rel_match_schema) were not
wrong answers — they were DecimalType finals hash-diverging through the
toPandas (decimal.Decimal objects) vs duckdb .df() (float64) boundary.
The round-10 protocol renders final decimals as VARCHAR on both sides.
That only works if Spark's decimal->string cast and DuckDB's
DECIMAL->VARCHAR cast produce IDENTICAL text for every value the decimal
rule (polars-core/src/datatypes/dtype.rs:109 Decimal: scale=max(s1,s2),
half-even, prec 38) can emit.  This family fuzzes decimal arithmetic and
asserts string-identical rendering on both engines, including the edge
shapes that break naive renderings: zero at scale ("0.00"), negatives,
values < 1 ("0.05" not ".05"), trailing zeros, and scale-0 integers.
"""

from __future__ import annotations

import decimal as _dec
import random

import duckdb
import pyarrow as pa
import pytest

_D = _dec.Decimal

N_SEEDS = 24


def _mk(rng: random.Random, scale: int):
    if rng.random() < 0.10:
        return None
    shape = rng.random()
    if shape < 0.15:
        v = _D(0).scaleb(-scale)  # zero at scale -> "0.00"
    elif shape < 0.35:
        v = _D(rng.randrange(1, 100)).scaleb(-scale)  # |v| < 1 for scale>=2
    else:
        v = _D(rng.randrange(0, 10 ** rng.randrange(1, 9))).scaleb(-scale)
    if rng.random() < 0.5:
        v = -v
    return v


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_decimal_varchar_rendering_matches_duckdb(pl, spark, seed):
    rng = random.Random(41000 + seed)
    s1, s2 = rng.randrange(0, 5), rng.randrange(0, 7)
    s = max(s1, s2)
    n = rng.choice([1, 3, 17])
    d1 = [_mk(rng, s1) for _ in range(n)]
    d2 = [v if v not in (None, 0) else _D(3).scaleb(-s2) for v in (_mk(rng, s2) for _ in range(n))]

    tbl = pa.table(
        {
            "d1": pa.array(d1, pa.decimal128(18, s1)),
            "d2": pa.array(d2, pa.decimal128(18, s2)),
        }
    )
    lf = pl.from_arrow(tbl)
    got = lf.select(
        pl.col("d1").cast("String").alias("r1"),
        (pl.col("d1") + pl.col("d2")).cast("String").alias("radd"),
        (pl.col("d1") * pl.col("d2")).cast(f"decimal(38,{s})").cast("String").alias("rmul"),
        (pl.col("d1") / pl.col("d2")).cast(f"decimal(38,{s})").cast("String").alias("rdiv"),
    ).collect()

    con = duckdb.connect()
    con.register("t", tbl)
    # DuckDB is only the RENDERING oracle here: its own +-*/ scale rules
    # diverge from polars', so feed it the engine's already-quantized
    # decimal values and compare the VARCHAR text.
    ctx = _dec.Context(prec=60, rounding=_dec.ROUND_HALF_EVEN)
    q = _D(1).scaleb(-s)

    def polars_result(op, a, b):
        if a is None or b is None:
            return None
        with _dec.localcontext(ctx):
            r = {"+": a + b, "*": a * b, "/": _D(a) / _D(b)}[op]
            return r.quantize(q, rounding=_dec.ROUND_HALF_EVEN)

    for row in range(n):
        for col, op in [("radd", "+"), ("rmul", "*"), ("rdiv", "/")]:
            want_dec = polars_result(op, d1[row], d2[row])
            got_s = got[col].iloc[row]
            if want_dec is None:
                assert got_s is None, f"seed={seed} row={row} {col}: want null got {got_s!r}"
                continue
            duck_s = con.execute(
                f"SELECT CAST(CAST('{want_dec}' AS DECIMAL(38,{s})) AS VARCHAR)"
            ).fetchone()[0]
            assert got_s == duck_s, (
                f"seed={seed} row={row} {col}: spark renders {got_s!r}, "
                f"duckdb renders {duck_s!r} (value {want_dec})"
            )
        # plain cast-to-string of the source column (rel_match_schema shape)
        want1 = d1[row]
        got1 = got["r1"].iloc[row]
        if want1 is None:
            assert got1 is None
        else:
            duck1 = con.execute(
                f"SELECT CAST(CAST('{want1}' AS DECIMAL(18,{s1})) AS VARCHAR)"
            ).fetchone()[0]
            assert got1 == duck1, f"seed={seed} row={row} r1: {got1!r} vs {duck1!r}"
    con.close()


def test_strict_mode_flags_decimal_final(pl, spark):
    """check.py --strict must fail the round-9 formulation (DecimalType in
    the final schema on the Spark side, float64 on the oracle side)."""
    import sys

    sys.path.insert(0, "tools")
    import decimal
    import pandas as pd
    from check import dtype_problems

    s = pd.DataFrame({"x": [decimal.Decimal("1.23")]})
    o = pd.DataFrame({"x": [1.23]})
    assert dtype_problems(s, o), "Decimal-vs-float final must be flagged"
    o2 = pd.DataFrame({"x": [decimal.Decimal("1.23")]})
    assert not dtype_problems(s, o2), "both-Decimal is hash-stable, no flag"
    # all-null object columns must not crash or flag
    s3 = pd.DataFrame({"x": [None]})
    assert not dtype_problems(s3, o)


def test_decimal_fallback_warns_without_schema_context(pl, spark):
    """ADVICE r9: a decimal multiplication that misses the scale bridge
    (no schema context) must be detectable, not silently Spark-scaled."""
    import warnings

    from pyspark.sql import functions as F

    from polars_spark.plans.expr import DecimalScaleFallbackWarning, _decimal_scales

    class _NoDfCtx:
        df = None

    a = F.col("x").cast("decimal(10,2)")
    b = F.col("y").cast("decimal(10,4)")
    with pytest.warns(DecimalScaleFallbackWarning):
        assert _decimal_scales(a, b, _NoDfCtx()) is None
    # non-decimal operands with no context stay silent (hot path)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _decimal_scales(F.col("x"), F.col("y"), _NoDfCtx()) is None
