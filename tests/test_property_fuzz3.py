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
# for Spark, DuckDB parses them natively
_DIALECT = [
    ('"i" + 1', "coalesce_free"),  # double-quoted identifier -> backtick
    ("k::int8", "pg_cast"),  # Postgres type alias after ::
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
