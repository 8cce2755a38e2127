"""Round-9 fuzz widening: the SQL FRONT-END surface (SURVEY §2.9).

The reference's polars-sql supports ~130 functions plus subqueries
(polars-sql/src/context.rs:245, subquery.rs); until round 9 only 4
static gates exercised our SQLContext.  These families render the SAME
statement through ``pl.SQLContext.execute`` (Spark SQL + the polars
dialect shim) and DuckDB, over the shared fuzz frames:

* select/where compositions — scalar exprs, dialect-shim forms (trailing
  comma, double-quoted identifiers, ``::int8`` casts), ORDER BY+LIMIT
* group-by/HAVING with aggregate lists, optionally set-opped
  (UNION / UNION ALL / INTERSECT / EXCEPT) against a second branch
* CTE + window functions + IN / EXISTS / NOT EXISTS / scalar subqueries

Statements stay inside the ANSI subset where polars-sql, Spark SQL and
DuckDB agree semantically; engine-specific corners (zero divisors under
ANSI, bigint overflow, NaN ordering) are avoided by construction the
same way the reference's own parametric SQL tests constrain inputs.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from tests.test_property_fuzz import N_FRAMES, assert_frames_match, mk_frame


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


# ------------------------------------------------------------ expr pool
# (sql_fragment, needs_cols) — fragments valid in Spark SQL AND DuckDB
# with identical semantics on the fuzz-frame domain.

_SCALARS = [
    "coalesce(i, 0) + coalesce(k, 0)",
    "abs(coalesce(i, 0))",
    "coalesce(i, 0) % 7",
    "coalesce(i, 0) * 3 - coalesce(k, 0)",
    "CAST(length(s) AS BIGINT)",
    "upper(s)",
    "lower(s)",
    "substr(s, 1, 2)",
    "concat(coalesce(s, ''), '_', coalesce(g, 'z'))",
    "CASE WHEN b THEN i ELSE k END",
    "CASE WHEN coalesce(i, 0) > 0 THEN 'pos' WHEN coalesce(i, 0) < 0 THEN 'neg' ELSE 'zero' END",
    "coalesce(ff, 0.0) / 7.0",
    "round(coalesce(ff, 0.0) * 1.5, 3)",
    "greatest(coalesce(i, 0), coalesce(k, 0))",
    "least(coalesce(i, 0), coalesce(k, 0))",
    "nullif(g, 'a')",
    "coalesce(ff, 0.0) + CAST(coalesce(i, 0) AS DOUBLE)",
]

# dialect-shim forms: polars-sql accepts these; our shim rewrites them
# for Spark, DuckDB parses them natively.  `//` is the polars integer
# division — the shim maps it to Spark DIV, which agrees with DuckDB's
# floor `//` on NON-NEGATIVE operands (the documented dialect contract),
# so the fuzz keeps the dividend non-negative.
_DIALECT = [
    ('"i" + 1', "coalesce_free"),  # double-quoted identifier -> backtick
    ("k::int8", "pg_cast"),  # Postgres type alias after ::
    ("abs(coalesce(i, 0)) // 7", "int_div"),  # polars `//` -> Spark DIV
    ("abs(coalesce(k, 1)) // 3 + 1", "int_div2"),
]

_PREDS = [
    "coalesce(i, 0) > 0",
    "s IS NOT NULL",
    "g IN ('a', 'b')",
    "coalesce(b, FALSE)",
    "length(coalesce(s, '')) BETWEEN 1 AND 8",
    "coalesce(ff, 0.0) <= 1.0",
    "coalesce(i, 0) % 2 = 0",
    "g IS NULL OR g >= 'b'",
]

_AGGS = [
    "CAST(count(*) AS BIGINT) AS n_rows",
    "CAST(count(i) AS BIGINT) AS n_i",
    "CAST(count(DISTINCT s) AS BIGINT) AS nd_s",
    "CAST(sum(i) AS BIGINT) AS sum_i",
    "CAST(min(i) AS BIGINT) AS min_i",
    "CAST(max(k) AS BIGINT) AS max_k",
    "min(s) AS min_s",
    "max(s) AS max_s",
    "CAST(avg(ff) AS DOUBLE) AS avg_ff",
    "CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_true",
    "round(CAST(sum(ff) AS DOUBLE), 4) AS sum_ff",
]

_WINDOWS = [
    "ROW_NUMBER() OVER (PARTITION BY g ORDER BY rid) AS rn",
    "CAST(SUM(coalesce(i, 0)) OVER (PARTITION BY g ORDER BY rid "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_i",
    "CAST(SUM(coalesce(k, 0)) OVER (ORDER BY rid "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_k",
    "LAG(i) OVER (ORDER BY rid) AS lag_i",
    "LEAD(i, 2) OVER (ORDER BY rid) AS lead_i",
    "CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS grp_n",
    "FIRST_VALUE(rid) OVER (PARTITION BY g ORDER BY rid) AS first_rid",
    "RANK() OVER (ORDER BY rid) AS rk",
]

_SUB_PREDS = [
    "i IN (SELECT k FROM base WHERE k IS NOT NULL)",
    "EXISTS (SELECT 1 FROM base b2 WHERE b2.g = b1.g AND coalesce(b2.i, 0) > 0)",
    "NOT EXISTS (SELECT 1 FROM base b2 WHERE b2.g = b1.g AND coalesce(b2.i, 0) > 100)",
    "rid <= (SELECT CAST(count(*) AS BIGINT) FROM base)",
]


def _run_both(pl, ddb, tbl, stmt, label):
    lf = pl.from_arrow(tbl)
    ctx = pl.SQLContext(frames={"t_sqlfz": lf})
    try:
        got = ctx.execute(stmt).collect()
    finally:
        ctx.unregister("t_sqlfz")
    ddb.register("t_sqlfz", tbl)
    want = ddb.execute(stmt).df()
    assert_frames_match(got, want, label)


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_sql_select_where(pl, spark, ddb, seed):
    rng = random.Random(11000 + seed)
    tbl = mk_frame(rng)
    picks = rng.sample(_SCALARS, rng.randrange(3, 6))
    sel = ["rid"] + [f"{frag} AS c{i}" for i, frag in enumerate(picks)]
    if rng.random() < 0.5:
        # dialect-shim forms the polars SQL front-end must rewrite
        frag, _ = rng.choice(_DIALECT)
        sel.append(f"{frag} AS c_dialect")
    stmt = f"SELECT {', '.join(sel)} FROM t_sqlfz"
    pred = None
    if rng.random() < 0.7:
        pred = rng.choice(_PREDS)
        stmt += f" WHERE {pred}"
    if rng.random() < 0.4:
        stmt += f" ORDER BY rid LIMIT {rng.randrange(1, 20)}"
    _run_both(pl, ddb, tbl, stmt, f"seed={seed} sql_select [{stmt}]")


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_sql_group_having_setop(pl, spark, ddb, seed):
    rng = random.Random(12000 + seed)
    tbl = mk_frame(rng)
    aggs = rng.sample(_AGGS, rng.randrange(2, 5))

    def branch(pred):
        q = f"SELECT g, {', '.join(aggs)} FROM t_sqlfz"
        if pred:
            q += f" WHERE {pred}"
        q += " GROUP BY g"
        return q

    stmt = branch(rng.choice(_PREDS) if rng.random() < 0.6 else None)
    if rng.random() < 0.4:
        stmt += f" HAVING count(*) >= {rng.randrange(1, 3)}"
    elif rng.random() < 0.5:
        op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        stmt = f"{stmt} {op} {branch(rng.choice(_PREDS))}"
    _run_both(pl, ddb, tbl, stmt, f"seed={seed} sql_group [{stmt}]")


# ------------------------------------------------- decimal arithmetic
# polars decimal rule (polars-core/src/chunked_array/arithmetic/decimal.rs
# + polars-compute/src/decimal.rs): result scale = max(s1, s2) for all of
# + - * /, precision DEC128_MAX_PREC, dropped digits rounded HALF-TO-EVEN
# (dec128_mul / dec128_div), integers fold in at scale 0, zero-divisor
# ERRORS.  The oracle here is exact Python decimal arithmetic quantized
# with ROUND_HALF_EVEN — stronger than any SQL engine's own (divergent)
# decimal rules, which is exactly why DuckDB isn't the oracle for this
# family.

import decimal as _dec

_D = _dec.Decimal


def _mk_dec(rng, scale, allow_zero=True):
    if rng.random() < 0.12:
        return None
    # bias toward round-tie-prone trailing digits
    digits = rng.randrange(1, 7)
    mag = rng.randrange(0, 10**digits)
    if rng.random() < 0.4:
        mag = mag - mag % 10 + rng.choice([5, 25 % 10, 75 % 10])
    v = _D(mag).scaleb(-scale)
    if rng.random() < 0.5:
        v = -v
    if not allow_zero and v == 0:
        v = _D(1).scaleb(-scale)
    return v


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_decimal_arith(pl, spark, seed):
    import pyarrow as pa

    rng = random.Random(14000 + seed)
    s1, s2 = rng.randrange(0, 4), rng.randrange(0, 5)
    n = rng.choice([0, 1, 3, 17])
    d1 = [_mk_dec(rng, s1) for _ in range(n)]
    d2 = [_mk_dec(rng, s2, allow_zero=False) for _ in range(n)]
    d2 = [v if v is not None else _D(3).scaleb(-s2) for v in d2]
    iv = [rng.choice([1, -2, 3, 7, 50]) for _ in range(n)]
    tbl = pa.table(
        {
            "d1": pa.array(d1, pa.decimal128(14, s1)),
            "d2": pa.array(d2, pa.decimal128(14, s2)),
            "i": pa.array(iv, pa.int64()),
        }
    )
    lf = pl.from_arrow(tbl)
    got = lf.select(
        (pl.col("d1") + pl.col("d2")).alias("add"),
        (pl.col("d1") - pl.col("d2")).alias("sub"),
        (pl.col("d1") * pl.col("d2")).alias("mul"),
        (pl.col("d1") / pl.col("d2")).alias("div"),
        (pl.col("d1") * pl.col("i")).alias("muli"),
        (pl.col("d1") / pl.col("i")).alias("divi"),
    ).collect()

    s = max(s1, s2)
    q = _D(1).scaleb(-s)
    q1 = _D(1).scaleb(-s1)
    ctx = _dec.Context(prec=60, rounding=_dec.ROUND_HALF_EVEN)

    def exp(op, a, b, qq):
        if a is None or b is None:
            return None
        with _dec.localcontext(ctx):
            if op == "+":
                r = a + b
            elif op == "-":
                r = a - b
            elif op == "*":
                r = a * b
            else:
                r = _D(a) / _D(b)
            return r.quantize(qq, rounding=_dec.ROUND_HALF_EVEN)

    for row, (a, b, i) in enumerate(zip(d1, d2, iv)):
        for colname, op, bb, qq in [
            ("add", "+", b, q),
            ("sub", "-", b, q),
            ("mul", "*", b, q),
            ("div", "/", b, q),
            ("muli", "*", _D(i), q1),
            ("divi", "/", _D(i), q1),
        ]:
            want = exp(op, a, bb, qq)
            got_v = got[colname].iloc[row]
            label = f"seed={seed} row={row} {colname}: {a} {op} {bb}"
            if want is None:
                assert got_v is None or (isinstance(got_v, float) and pd.isna(got_v)), label
            else:
                assert got_v is not None and _D(str(got_v)) == want, (
                    f"{label} -> spark={got_v} oracle={want}"
                )


# ---------------------------------------- quantile interpolation modes
# reference quantile_idx (polars-core/.../aggregate/quantile.rs): 6 modes;
# the oracle is DuckDB list-indexing over the sorted non-null values — an
# independent formulation of the same index rules.

_Q_MODES = ["linear", "lower", "higher", "midpoint", "nearest", "equiprobable"]


def _q_oracle_sql(mode, q, col="ff"):
    h = f"(n - 1) * {q}"
    lo = f"arr[1 + CAST(floor({h}) AS INT)]"
    hi = f"arr[1 + CAST(ceil({h}) AS INT)]"
    if mode == "lower":
        e = lo
    elif mode == "higher":
        e = hi
    elif mode == "midpoint":
        e = f"CASE WHEN {h} = floor({h}) THEN {lo} ELSE ({lo} + {hi}) / 2.0 END"
    elif mode == "nearest":
        e = f"arr[1 + CAST(round({h}) AS INT)]"
    elif mode == "equiprobable":
        e = f"arr[1 + GREATEST(CAST(ceil(n * {q}) AS INT) - 1, 0)]"
    else:  # linear
        e = (
            f"CASE WHEN {h} = floor({h}) THEN {lo} "
            f"ELSE {lo} + ({h} - floor({h})) * ({hi} - {lo}) END"
        )
    return f"CASE WHEN n = 0 THEN NULL ELSE {e} END"


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_quantile_modes(pl, spark, ddb, seed):
    rng = random.Random(15000 + seed)
    tbl = mk_frame(rng)
    combos = [
        (rng.choice(_Q_MODES), rng.choice([0.0, 0.25, 0.5, 0.77, 0.9, 1.0]))
        for _ in range(3)
    ]
    got = (
        pl.from_arrow(tbl)
        .group_by("g")
        .agg(
            *[
                pl.col("ff").quantile(q, m).alias(f"q{i}_{m}")
                for i, (m, q) in enumerate(combos)
            ]
        )
        .collect()
    )
    ddb.register("t_qm", tbl)
    inner = (
        "SELECT g, list_sort(list(ff) FILTER (WHERE ff IS NOT NULL)) AS arr, "
        "CAST(count(ff) AS BIGINT) AS n FROM t_qm GROUP BY g"
    )
    sels = ", ".join(
        f"{_q_oracle_sql(m, q)} AS q{i}_{m}" for i, (m, q) in enumerate(combos)
    )
    want = ddb.execute(f"SELECT g, {sels} FROM ({inner})").df()
    assert_frames_match(got, want, f"seed={seed} quantile {combos}")


# ------------------------------------------------------ enum category order
# Frozen Enum categories order by CATEGORY INDEX (dtype.rs FrozenCategories):
# min/max/to_physical follow the randomized category order, never lexical.
# The oracle replays the index table with CASE chains.


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_enum_order(pl, spark, ddb, seed):
    import pyarrow as pa

    rng = random.Random(16000 + seed)
    pool = ["zz", "mid", "aa", "q1", "B", "näh"]
    cats = rng.sample(pool, rng.randrange(3, 6))
    n = rng.choice([0, 1, 3, 17, 40])
    vals = [rng.choice(cats + [None]) for _ in range(n)]
    keys = [rng.choice(["g1", "g2", None]) for _ in range(n)]
    tbl = pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "g": pa.array(keys, pa.string()),
            "v": pa.array(vals, pa.string()),
        }
    )
    ddb.register("t_enum", tbl)
    e = pl.col("v").cast(pl.Enum(cats), strict=False)
    got = (
        pl.from_arrow(tbl)
        .with_columns(ev=e)
        .group_by("g")
        .agg(
            pl.col("ev").min().alias("emin"),
            pl.col("ev").max().alias("emax"),
            pl.col("ev").to_physical().sum().alias("psum"),
            pl.len().alias("n"),
        )
        .collect()
    )
    idx = " ".join(f"WHEN '{c}' THEN {i}" for i, c in enumerate(cats))
    back = " ".join(f"WHEN {i} THEN '{c}'" for i, c in enumerate(cats))
    want = ddb.execute(
        f"""
        SELECT g,
               CASE min(CASE v {idx} END) {back} END AS emin,
               CASE max(CASE v {idx} END) {back} END AS emax,
               CAST(coalesce(sum(CASE v {idx} END), 0) AS BIGINT) AS psum,
               count(*) AS n
        FROM t_enum GROUP BY g
        """
    ).df()
    assert_frames_match(got, want, f"seed={seed} enum cats={cats}")


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_sql_cte_window_subquery(pl, spark, ddb, seed):
    rng = random.Random(13000 + seed)
    tbl = mk_frame(rng)
    base_pred = rng.choice(_PREDS)
    wins = rng.sample(_WINDOWS, rng.randrange(2, 4))
    sel = ["b1.rid", "b1.g"] + wins
    if rng.random() < 0.6:
        sel.append("(SELECT CAST(max(k) AS BIGINT) FROM base) AS glob_max_k")
    stmt = (
        f"WITH base AS (SELECT rid, g, i, k, ff, s, b FROM t_sqlfz WHERE {base_pred}) "
        f"SELECT {', '.join(sel)} FROM base b1"
    )
    if rng.random() < 0.6:
        stmt += f" WHERE {rng.choice(_SUB_PREDS)}"
    stmt += " ORDER BY b1.rid"
    _run_both(pl, ddb, tbl, stmt, f"seed={seed} sql_cte [{stmt}]")
