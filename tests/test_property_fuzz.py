"""Property-based fuzz of the Expr lowering vs DuckDB.

Port of the reference's parametric test strategy (py-polars
``polars/testing/parametric/strategies`` — random frames through random
expression pipelines) as a DETERMINISTIC seeded sweep: every case is
reproducible from its seed, so a red case is a regression test, not a
flake.  Each case is rendered BOTH as a polars_spark expression and as
DuckDB SQL carrying polars semantics (sum -> 0 on empty/all-null,
n_unique counts null as a distinct value, clip propagates null), then
value-compared with rtol=1e-9.

Batching: per random frame, all elementwise cases evaluate in ONE select
(each case an aliased output column) and all grouped cases in ONE
group_by — 600+ cases cost ~90 Spark jobs, not 600.

Frames deliberately include the shapes where engines diverge: empty
frames, single rows, all-null columns, int64 extremes, NaN/±inf floats,
unicode/empty strings, null group keys.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import os as _os

# soak-overridable: SPARK_GRAFT_FUZZ_FRAMES=96 for a deep sweep
# default trimmed 32 -> 12 (r13, VERDICT #2): the driver's pytest budget
# timed out at ~84% of the suite and these two files were 35% of its wall
# time.  Seeds are deterministic, so the first 12 are the same regression
# net every run; the deep 32/96-seed sweep stays one env var away
# (SPARK_GRAFT_FUZZ_FRAMES=32) and is run at every round close.
N_FRAMES = int(_os.environ.get("SPARK_GRAFT_FUZZ_FRAMES", "12"))

# ---------------------------------------------------------------- frames

INT_EDGE = [0, 1, -1, 7, -13, 2**31, -(2**31), None]
BIG_EDGE = [0, 2**62, -(2**62), 2**63 - 1, -(2**63), 1, None]
FLT_EDGE = [0.0, -0.0, 1.5, -2.25, float("nan"), float("inf"), float("-inf"), 1e308, -1e-308, None]
STR_EDGE = ["", "a", "Ab", "ÄÖü", "😀x", "null", " spaced ", "longer string value", None]
KEY_EDGE = ["a", "b", "c", None]


def mk_frame(rng: random.Random):
    n = rng.choice([0, 1, 2, 3, 17, 40])
    cols = {
        "rid": pa.array(range(n), pa.int64()),
        "g": pa.array([rng.choice(KEY_EDGE) for _ in range(n)], pa.string()),
        "i": pa.array([rng.choice(INT_EDGE) for _ in range(n)], pa.int64()),
        "k": pa.array([rng.choice(INT_EDGE) for _ in range(n)], pa.int64()),
        "j": pa.array([rng.choice(BIG_EDGE) for _ in range(n)], pa.int64()),
        "f": pa.array([rng.choice(FLT_EDGE) for _ in range(n)], pa.float64()),
        "h": pa.array([rng.choice(FLT_EDGE) for _ in range(n)], pa.float64()),
        # finite floats (nulls allowed): DuckDB's VARSAMP/STDDEV error on
        # ±inf inputs, so the moment templates use this column
        "ff": pa.array(
            [rng.choice([0.0, 1.5, -2.25, 1e6, -13.5, None]) for _ in range(n)],
            pa.float64(),
        ),
        "s": pa.array([rng.choice(STR_EDGE) for _ in range(n)], pa.string()),
        "b": pa.array([rng.choice([True, False, None]) for _ in range(n)], pa.bool_()),
        "f2": pa.array(
            [rng.choice([0.5, 2.0, -1.0, 7.25, 100.0, None]) for _ in range(n)],
            pa.float64(),
        ),
    }
    # occasionally make a column ALL null (the fold-identity shape)
    if n and rng.random() < 0.3:
        victim = rng.choice(["i", "f", "s", "b"])
        cols[victim] = pa.array([None] * n, cols[victim].type)
    return pa.table(cols)


# ------------------------------------------------- elementwise templates
# each: name, builder(pl, rng) -> (expr, sql) — SQL carries polars semantics


def t_int_add(pl, rng):
    return pl.col("i") + pl.col("k"), "(i + k)"


def t_int_sub(pl, rng):
    return pl.col("i") - pl.col("k"), "(i - k)"


def t_int_mul_small(pl, rng):
    m = rng.choice([-3, -1, 0, 2, 3])
    return pl.col("i") * m, f"(i * {m})"


def t_neg_float(pl, rng):
    return -pl.col("f"), "(-f)"


def t_float_add(pl, rng):
    return pl.col("f") + pl.col("h"), "(f + h)"


def t_float_mul(pl, rng):
    return pl.col("f") * 2.5, "(f * 2.5)"


def t_float_div_safe(pl, rng):
    return pl.col("f") / (pl.col("h").abs() + 1.0), "(f / (abs(h) + 1.0))"


def t_abs(pl, rng):
    c = rng.choice(["i", "f"])
    return pl.col(c).abs(), f"abs({c})"


def t_sqrt(pl, rng):
    return pl.col("f").abs().sqrt(), "sqrt(abs(f))"


def t_ln1p(pl, rng):
    return (pl.col("f").abs() + 1.0).log(), "ln(abs(f) + 1.0)"


def t_cmp_int(pl, rng):
    k = rng.choice([0, 1, -13, 2**31])
    op = rng.choice([(">", "gt"), ("<=", "le"), ("==", "eq")])
    e = {"gt": pl.col("i") > k, "le": pl.col("i") <= k, "eq": pl.col("i") == k}[op[1]]
    return e, f"(i {'=' if op[0] == '==' else op[0]} {k})"


def t_str_eq(pl, rng):
    v = rng.choice(["a", "", "null", "😀x"])
    return pl.col("s") == v, f"(s = '{v}')"


def t_bool_and(pl, rng):
    return pl.col("b") & (pl.col("i") > 0), "(b AND (i > 0))"


def t_bool_or(pl, rng):
    return pl.col("b") | (pl.col("f") > 0.0), "(b OR (f > 0.0))"


def t_len_chars(pl, rng):
    return pl.col("s").str.len_chars().cast(pl.Int64), "CAST(length(s) AS BIGINT)"


def t_upper(pl, rng):
    return pl.col("s").str.to_uppercase(), "upper(s)"


def t_lower(pl, rng):
    return pl.col("s").str.to_lowercase(), "lower(s)"


def t_starts_with(pl, rng):
    v = rng.choice(["a", "A", "", "😀"])
    return pl.col("s").str.starts_with(v), f"starts_with(s, '{v}')"


def t_contains_lit(pl, rng):
    v = rng.choice(["a", " ", "ng"])
    return pl.col("s").str.contains(v, literal=True), f"contains(s, '{v}')"


def t_slice(pl, rng):
    off, ln = rng.choice([(0, 2), (1, 3), (2, 1)])
    return pl.col("s").str.slice(off, ln), f"substr(s, {off + 1}, {ln})"


def t_fill_null_int(pl, rng):
    v = rng.choice([0, -1, 99])
    return pl.col("i").fill_null(v), f"coalesce(i, {v})"


def t_is_null(pl, rng):
    c = rng.choice(["i", "f", "s", "b", "g"])
    return pl.col(c).is_null(), f"({c} IS NULL)"


def t_when_then(pl, rng):
    cond_sql = "coalesce(i, 0) > 0"
    cond = pl.col("i").fill_null(0) > 0
    return (
        pl.when(cond).then(pl.col("f")).otherwise(-pl.col("f")),
        f"CASE WHEN {cond_sql} THEN f ELSE (-f) END",
    )


def t_cast_int_float(pl, rng):
    c = rng.choice(["i", "j"])
    return pl.col(c).cast(pl.Float64), f"CAST({c} AS DOUBLE)"


def t_cast_bool_int(pl, rng):
    return pl.col("b").cast(pl.Int64), "CAST(b AS BIGINT)"


def t_clip(pl, rng):
    lo, hi = sorted(rng.sample([-10, -1, 0, 5, 100], 2))
    # polars clip propagates null; DuckDB least/greatest SKIP nulls
    return (
        pl.col("i").clip(lo, hi),
        f"CASE WHEN i IS NULL THEN NULL ELSE least(greatest(i, {lo}), {hi}) END",
    )


ELEMENTWISE = [
    t_int_add, t_int_sub, t_int_mul_small, t_neg_float, t_float_add,
    t_float_mul, t_float_div_safe, t_abs, t_sqrt, t_ln1p, t_cmp_int,
    t_str_eq, t_bool_and, t_bool_or, t_len_chars, t_upper, t_lower,
    t_starts_with, t_contains_lit, t_slice, t_fill_null_int, t_is_null,
    t_when_then, t_cast_int_float, t_cast_bool_int, t_clip,
]


# --------------------------------------------------- aggregate templates
# polars fold identities and null rules encoded on the SQL side


def a_sum_int(pl, rng):
    return pl.col("i").sum(), "coalesce(sum(i), 0)"


def a_sum_float(pl, rng):
    return pl.col("f").sum(), "coalesce(sum(f), 0.0)"


def a_min(pl, rng):
    c = rng.choice(["i", "j", "f", "s"])
    return pl.col(c).min(), f"min({c})"


def a_max(pl, rng):
    c = rng.choice(["i", "j", "f", "s"])
    return pl.col(c).max(), f"max({c})"


def a_mean(pl, rng):
    return pl.col("f").mean(), "avg(f)"


def a_count(pl, rng):
    c = rng.choice(["i", "f", "s"])
    return pl.col(c).count().cast(pl.Int64), f"count({c})"


def a_len(pl, rng):
    return pl.len().cast(pl.Int64), "count(*)"


def a_n_unique(pl, rng):
    c = rng.choice(["i", "s", "g"])
    # polars n_unique counts null as one distinct value
    return (
        pl.col(c).n_unique().cast(pl.Int64),
        f"count(DISTINCT {c}) + CASE WHEN count(*) > count({c}) THEN 1 ELSE 0 END",
    )


def a_std(pl, rng):
    return pl.col("ff").std(ddof=1), "stddev_samp(ff)"


def a_var(pl, rng):
    return pl.col("ff").var(ddof=1), "var_samp(ff)"


def a_any(pl, rng):
    # polars any(ignore_nulls=True): empty/all-null -> false
    return pl.col("b").any(), "coalesce(bool_or(b), false)"


def a_all(pl, rng):
    return pl.col("b").all(), "coalesce(bool_and(b), true)"


def a_median(pl, rng):
    # polars median = linear interpolation at 0.5 == DuckDB median()
    return pl.col("ff").median(), "median(ff)"


def a_quantile_linear(pl, rng):
    q = rng.choice([0.25, 0.5, 0.9])
    return (
        pl.col("ff").quantile(q, interpolation="linear"),
        f"quantile_cont(ff, {q})",
    )


def a_corr(pl, rng):
    # constant/short groups: Spark NaN vs DuckDB NULL — both land as NaN in
    # the float comparison, so the divergence class is absorbed by design
    return pl.corr("ff", "f2"), "corr(ff, f2)"


def a_cov(pl, rng):
    return pl.cov("ff", "f2", ddof=1), "covar_samp(ff, f2)"


AGGS = [
    a_sum_int, a_sum_float, a_min, a_max, a_mean, a_count, a_len,
    a_n_unique, a_std, a_var, a_any, a_all, a_median, a_quantile_linear,
    a_corr, a_cov,
]


# ---------------------------------------------------------------- compare


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns), ignore_index=True, na_position="last")


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, label: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{label}: rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{label}: columns {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    s, o = _norm(spark_pdf), _norm(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv2 = pd.to_numeric(sv, errors="coerce").to_numpy(dtype=float)
            ov2 = pd.to_numeric(ov, errors="coerce").to_numpy(dtype=float)
            ok = np.isclose(sv2, ov2, rtol=1e-9, atol=1e-12) | (
                np.isnan(sv2) & np.isnan(ov2)
            )
            assert ok.all(), (
                f"{label} col={c}: first diffs "
                f"{[(sv2[i], ov2[i]) for i in np.nonzero(~ok)[0][:3]]}"
            )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            assert eq.all(), (
                f"{label} col={c} row{int(np.nonzero(~eq.to_numpy())[0][0])}: "
                f"spark={sv[~eq].iloc[0]!r} oracle={ov[~eq].iloc[0]!r}"
            )


# ------------------------------------------------------------------ sweep


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_elementwise(pl, spark, ddb, seed):
    rng = random.Random(1000 + seed)
    tbl = mk_frame(rng)
    lf = pl.from_arrow(tbl)
    ddb.register("t_fz", tbl)
    picks = [rng.choice(ELEMENTWISE) for _ in range(12)]
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(picks):
        e, q = tmpl(pl, rng)
        exprs[f"c{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS c{idx}_{tmpl.__name__}")
    got = lf.select(rid=pl.col("rid"), **exprs).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_fz").df()
    assert_frames_match(got, want, f"seed={seed} elementwise {[t.__name__ for t in picks]}")


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_grouped_agg(pl, spark, ddb, seed):
    rng = random.Random(2000 + seed)
    tbl = mk_frame(rng)
    lf = pl.from_arrow(tbl)
    ddb.register("t_fzg", tbl)
    picks = [rng.choice(AGGS) for _ in range(6)]
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(picks):
        e, q = tmpl(pl, rng)
        exprs[f"a{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS a{idx}_{tmpl.__name__}")
    got = lf.group_by("g").agg(**exprs).collect()
    want = ddb.execute(f"SELECT g, {', '.join(sqls)} FROM t_fzg GROUP BY g").df()
    assert_frames_match(got, want, f"seed={seed} grouped {[t.__name__ for t in picks]}")


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_whole_frame_agg(pl, spark, ddb, seed):
    """The fold-identity shape: select(aggs) on possibly-EMPTY frames —
    polars yields exactly one row (sum->0, mean->null, any->false)."""
    rng = random.Random(3000 + seed)
    tbl = mk_frame(rng)
    lf = pl.from_arrow(tbl)
    ddb.register("t_fzw", tbl)
    picks = [rng.choice(AGGS) for _ in range(2)]
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(picks):
        e, q = tmpl(pl, rng)
        exprs[f"w{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS w{idx}_{tmpl.__name__}")
    got = lf.select(**exprs).collect()
    want = ddb.execute(f"SELECT {', '.join(sqls)} FROM t_fzw").df()
    assert_frames_match(got, want, f"seed={seed} whole-frame {[t.__name__ for t in picks]}")


# ------------------------------------------------ round-8b: wider families
# temporal columns, string extras, list ops, sort/limit, filter+agg, joins

import datetime as _dt

DATE_EDGE = [
    _dt.date(1970, 1, 1),
    _dt.date(1969, 12, 31),
    _dt.date(2024, 6, 15),
    _dt.date(1111, 11, 11),
    _dt.date(2262, 4, 11),
    None,
]
TS_EDGE = [
    _dt.datetime(1970, 1, 1, 0, 0, 0),
    _dt.datetime(2024, 6, 15, 12, 34, 56, 789000),
    _dt.datetime(1969, 12, 31, 23, 59, 59),
    _dt.datetime(1999, 12, 31, 23, 0, 0),
    _dt.datetime(2100, 2, 28, 6, 7, 8),
    None,
]


def mk_frame_temporal(rng: random.Random):
    n = rng.choice([0, 1, 3, 17, 40])
    return pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "g": pa.array([rng.choice(KEY_EDGE) for _ in range(n)], pa.string()),
            "d": pa.array([rng.choice(DATE_EDGE) for _ in range(n)], pa.date32()),
            "t": pa.array([rng.choice(TS_EDGE) for _ in range(n)], pa.timestamp("us")),
            "s": pa.array([rng.choice(STR_EDGE) for _ in range(n)], pa.string()),
            "ff": pa.array(
                [rng.choice([0.0, 1.5, -2.25, 1e6, -13.5, None]) for _ in range(n)],
                pa.float64(),
            ),
        }
    )


def t_dt_part(pl, rng):
    part = rng.choice(["year", "month", "day", "hour", "minute", "second"])
    e = getattr(pl.col("t").dt, part)().cast(pl.Int64)
    return e, f"CAST({part}(t) AS BIGINT)"


def t_date_part(pl, rng):
    part = rng.choice(["year", "month", "day"])
    e = getattr(pl.col("d").dt, part)().cast(pl.Int64)
    return e, f"CAST({part}(d) AS BIGINT)"


def t_dt_truncate(pl, rng):
    unit, sql_u = rng.choice([("1h", "hour"), ("1d", "day"), ("1mo", "month")])
    return pl.col("t").dt.truncate(unit), f"date_trunc('{sql_u}', t)"


def t_dt_date(pl, rng):
    return pl.col("t").dt.date(), "CAST(t AS DATE)"


def t_dt_cmp(pl, rng):
    return (
        pl.col("t") >= pl.lit(_dt.datetime(2000, 1, 1)),
        "(t >= TIMESTAMP '2000-01-01 00:00:00')",
    )


def t_epoch_s(pl, rng):
    # polars epoch('s') TRUNCATES the fractional second (Rust integer
    # division); DuckDB CAST(double AS BIGINT) rounds -> trunc() first
    return pl.col("t").dt.epoch("s").cast(pl.Int64), "CAST(trunc(epoch(t)) AS BIGINT)"


def t_str_replace_all(pl, rng):
    return (
        pl.col("s").str.replace_all("a", "_", literal=True),
        "replace(s, 'a', '_')",
    )


def t_str_strip(pl, rng):
    return pl.col("s").str.strip_chars(), "trim(s)"


def t_str_reverse(pl, rng):
    return pl.col("s").str.reverse(), "reverse(s)"


def t_str_pad(pl, rng):
    return pl.col("s").str.zfill(6), "CASE WHEN s IS NULL THEN NULL ELSE lpad(s, CAST(greatest(6, length(s)) AS INT), '0') END"


def t_split_len(pl, rng):
    return (
        pl.col("s").str.split(" ").list.len().cast(pl.Int64),
        "CAST(len(string_split(s, ' ')) AS BIGINT)",
    )


def t_list_get(pl, rng):
    return (
        pl.col("s").str.split(" ").list.get(0, null_on_oob=True),
        "string_split(s, ' ')[1]",
    )


def t_list_contains(pl, rng):
    return (
        pl.col("s").str.split(" ").list.contains(pl.lit("a")),
        "list_contains(string_split(s, ' '), 'a')",
    )


def t_max_horizontal(pl, rng):
    # polars and DuckDB greatest both SKIP nulls
    return pl.max_horizontal("ff", pl.lit(0.0)), "greatest(ff, 0.0)"


def t_cast_float_int_trunc(pl, rng):
    # polars float->int cast TRUNCATES; DuckDB CAST rounds -> trunc() first
    return pl.col("ff").cast(pl.Int64), "CAST(trunc(ff) AS BIGINT)"


TEMPORAL_EW = [
    t_dt_part, t_date_part, t_dt_truncate, t_dt_date, t_dt_cmp, t_epoch_s,
    t_str_replace_all, t_str_strip, t_str_reverse, t_str_pad, t_split_len,
    t_list_get, t_list_contains, t_max_horizontal, t_cast_float_int_trunc,
]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_temporal_string_list(pl, spark, ddb, seed):
    rng = random.Random(4000 + seed)
    tbl = mk_frame_temporal(rng)
    lf = pl.from_arrow(tbl)
    ddb.register("t_fzt", tbl)
    picks = [rng.choice(TEMPORAL_EW) for _ in range(10)]
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(picks):
        e, q = tmpl(pl, rng)
        exprs[f"c{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS c{idx}_{tmpl.__name__}")
    got = lf.select(rid=pl.col("rid"), **exprs).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_fzt").df()
    assert_frames_match(got, want, f"seed={seed} temporal {[t.__name__ for t in picks]}")


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_sort_limit_filter(pl, spark, ddb, seed):
    """Frame-level ops: filter -> sort (rid tiebreak = deterministic) -> head."""
    rng = random.Random(5000 + seed)
    tbl = mk_frame(rng)
    lf = pl.from_arrow(tbl)
    ddb.register("t_fzs", tbl)
    k = rng.choice([0, 1, 5, 100])
    key = rng.choice(["i", "f", "s"])
    desc = rng.choice([True, False])
    nl = rng.choice([True, False])
    cond_e = pl.col("i").fill_null(0) >= 0
    cond_q = "coalesce(i, 0) >= 0"
    got = (
        lf.filter(cond_e)
        .sort([key, "rid"], descending=[desc, False], nulls_last=[nl, False])
        .head(k)
        .select("rid", "i", "f", "s")
        .collect()
    )
    # polars null rule: null is the SMALLEST value (asc -> first,
    # desc -> last); nulls_last=True forces last either way
    sql_nulls = "LAST" if (nl or desc) else "FIRST"
    want = ddb.execute(
        f"SELECT rid, i, f, s FROM t_fzs WHERE {cond_q} "
        f"ORDER BY {key} {'DESC' if desc else 'ASC'} NULLS {sql_nulls}, rid "
        f"LIMIT {k}"
    ).df()
    # ORDER is part of the contract here: compare row-by-row, not sorted
    assert len(got) == len(want), f"seed={seed}: {len(got)} vs {len(want)}"
    for c in ["rid", "i", "f", "s"]:
        sv = got[c].reset_index(drop=True)
        ov = want[c].reset_index(drop=True)
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            svn = pd.to_numeric(sv, errors="coerce").to_numpy(dtype=float)
            ovn = pd.to_numeric(ov, errors="coerce").to_numpy(dtype=float)
            ok = np.isclose(svn, ovn, rtol=1e-9, equal_nan=True) | (
                np.isnan(svn) & np.isnan(ovn)
            )
            assert ok.all(), f"seed={seed} col={c} order mismatch"
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            assert eq.all(), f"seed={seed} col={c} order mismatch: {sv.tolist()[:5]} vs {ov.tolist()[:5]}"


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_join_agg(pl, spark, ddb, seed):
    """Join fuzz: two random frames joined on the group key, aggregated
    (order-free compare), polars coalesced-key join semantics."""
    rng = random.Random(6000 + seed)
    t1, t2 = mk_frame(rng), mk_frame(rng)
    ddb.register("t_fja", t1)
    ddb.register("t_fjb", t2)
    lfa = pl.from_arrow(t1).select("g", "i", "f")
    lfb = pl.from_arrow(t2).select("g", k2=pl.col("k"))
    how = rng.choice(["inner", "left", "semi", "anti"])
    j = lfa.join(lfb, on="g", how=how)
    got = j.group_by("g").agg(
        n=pl.len().cast(pl.Int64),
        si=pl.col("i").sum(),
    ).collect()
    # polars joins on null keys match nothing (join_nulls=False default)
    if how in ("inner", "left"):
        sql = f"""
        SELECT a.g, CAST(count(*) AS BIGINT) AS n, coalesce(sum(a.i), 0) AS si
        FROM t_fja a {'LEFT ' if how == 'left' else ''}JOIN t_fjb b
          ON a.g = b.g
        GROUP BY a.g"""
        if how == "left":
            # DuckDB LEFT JOIN keeps null-key left rows too (ON null = null
            # is false -> unmatched -> kept): matches polars left join
            pass
    elif how == "semi":
        sql = """
        SELECT g, CAST(count(*) AS BIGINT) AS n, coalesce(sum(i), 0) AS si
        FROM t_fja a WHERE EXISTS (SELECT 1 FROM t_fjb b WHERE b.g = a.g)
        GROUP BY g"""
    else:
        sql = """
        SELECT g, CAST(count(*) AS BIGINT) AS n, coalesce(sum(i), 0) AS si
        FROM t_fja a WHERE NOT EXISTS (SELECT 1 FROM t_fjb b WHERE b.g = a.g)
        GROUP BY g"""
    want = ddb.execute(sql).df()
    assert_frames_match(got, want, f"seed={seed} join how={how}")


# ---------------------------------------------- round-8c: division corners


def t_div_ieee_float(pl, rng):
    """UNGUARDED float division: engine must produce IEEE (±inf/NaN) where
    DuckDB raw `/` gives NULL — the oracle replays IEEE explicitly,
    including the -0.0 divisor sign (signbit)."""
    return (
        pl.col("f") / pl.col("h"),
        "CASE WHEN h = 0 THEN"
        " CASE WHEN f IS NULL THEN NULL"
        "      WHEN isnan(f) OR f = 0 THEN 'NaN'::DOUBLE"
        "      ELSE sign(f) * (CASE WHEN signbit(h) THEN -1 ELSE 1 END) * 'inf'::DOUBLE END"
        " ELSE f / h END",
    )


def t_div_ieee_int(pl, rng):
    return (
        pl.col("i") / pl.col("k"),
        "CASE WHEN k = 0 THEN"
        " CASE WHEN i IS NULL THEN NULL"
        "      WHEN i = 0 THEN 'NaN'::DOUBLE"
        "      ELSE sign(i) * 'inf'::DOUBLE END"
        " ELSE CAST(i AS DOUBLE) / k END",
    )


def t_floordiv_zero(pl, rng):
    # polars FLOOR division (-7 // 2 = -4, python-style); zero divisor -> null
    return (
        (pl.col("i") // pl.col("k")).cast(pl.Int64),
        "CAST(floor(CAST(i AS DOUBLE) / k) AS BIGINT)",
    )


def t_mod_zero(pl, rng):
    # dividend-sign remainder in all three engines; x % 0 -> null
    return pl.col("i") % pl.col("k"), "(i % k)"


ELEMENTWISE.extend([t_div_ieee_float, t_div_ieee_int, t_floordiv_zero, t_mod_zero])


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_division_corners(pl, spark, ddb, seed):
    rng = random.Random(7000 + seed)
    tbl = mk_frame(rng)
    lf = pl.from_arrow(tbl)
    ddb.register("t_fzd", tbl)
    picks = [t_div_ieee_float, t_div_ieee_int, t_floordiv_zero, t_mod_zero]
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(picks):
        e, q = tmpl(pl, rng)
        exprs[f"c{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS c{idx}_{tmpl.__name__}")
    got = lf.select(rid=pl.col("rid"), **exprs).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_fzd").df()
    assert_frames_match(got, want, f"seed={seed} division corners")


# -------------------------------------------- round-8d: window fuzz family
# order-dependent exprs .over(g) on a rid-sorted frame vs SQL windows


def w_cum_sum(pl, rng):
    # polars cum_sum PRESERVES null positions (running total skips them)
    return (
        pl.col("ff").cum_sum().over("g"),
        "CASE WHEN ff IS NULL THEN NULL ELSE"
        " sum(ff) OVER (PARTITION BY g ORDER BY rid ROWS UNBOUNDED PRECEDING) END",
    )


def w_cum_max(pl, rng):
    return (
        pl.col("i").cum_max().over("g"),
        "CASE WHEN i IS NULL THEN NULL ELSE"
        " max(i) OVER (PARTITION BY g ORDER BY rid ROWS UNBOUNDED PRECEDING) END",
    )


def w_shift(pl, rng):
    k = rng.choice([1, 2, -1])
    return (
        pl.col("i").shift(k).over("g"),
        f"{'lag' if k > 0 else 'lead'}(i, {abs(k)}) OVER (PARTITION BY g ORDER BY rid)",
    )


def w_diff(pl, rng):
    return (
        pl.col("ff").diff().over("g"),
        "ff - lag(ff, 1) OVER (PARTITION BY g ORDER BY rid)",
    )


def w_rank_min(pl, rng):
    # null-free variant (the polars null-rank rule has its own oracle gate)
    return (
        pl.col("i").fill_null(0).rank("min").over("g").cast(pl.Int64),
        "CAST(rank() OVER (PARTITION BY g ORDER BY coalesce(i, 0)) AS BIGINT)",
    )


def w_row_number(pl, rng):
    return (
        pl.col("rid").cum_count().over("g").cast(pl.Int64),
        "CAST(row_number() OVER (PARTITION BY g ORDER BY rid) AS BIGINT)",
    )


def w_group_sum_over(pl, rng):
    return (
        pl.col("ff").sum().over("g"),
        "coalesce(sum(ff) OVER (PARTITION BY g), 0.0)",
    )


def w_first_over(pl, rng):
    return (
        pl.col("s").first().over("g"),
        "first_value(s) OVER (PARTITION BY g ORDER BY rid "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
    )


def w_cum_min(pl, rng):
    return (
        pl.col("i").cum_min().over("g"),
        "CASE WHEN i IS NULL THEN NULL ELSE"
        " min(i) OVER (PARTITION BY g ORDER BY rid ROWS UNBOUNDED PRECEDING) END",
    )


def w_cum_count(pl, rng):
    # running count of NON-NULL values seen so far (nulls keep prior count)
    return (
        pl.col("ff").cum_count().over("g").cast(pl.Int64),
        "CAST(count(ff) OVER (PARTITION BY g ORDER BY rid"
        " ROWS UNBOUNDED PRECEDING) AS BIGINT)",
    )


def w_filtered_sum_over(pl, rng):
    # conditional aggregate broadcast over the group (polars
    # col.filter(cond).sum().over(g) == SQL sum(CASE WHEN ...) OVER)
    return (
        pl.col("ff").filter(pl.col("b")).sum().over("g"),
        "coalesce(sum(CASE WHEN b THEN ff END) OVER (PARTITION BY g), 0.0)",
    )


def w_pct_change(pl, rng):
    # polars pct_change = diff/shift under IEEE division: zero previous
    # -> ±inf (sign of the diff), 0/0 -> NaN, null -> null
    w = "OVER (PARTITION BY g ORDER BY rid)"
    return (
        pl.col("ff").pct_change().over("g"),
        f"CASE WHEN ff IS NULL OR lag(ff) {w} IS NULL THEN NULL"
        f" WHEN lag(ff) {w} = 0 THEN"
        f"  CASE WHEN ff = 0 THEN 'NaN'::DOUBLE"
        f"       ELSE sign(ff) * 'inf'::DOUBLE END"
        f" ELSE ff / lag(ff) {w} - 1 END",
    )


WINDOWS = [
    w_cum_sum, w_cum_max, w_shift, w_diff, w_rank_min, w_row_number,
    w_group_sum_over, w_first_over, w_cum_min, w_cum_count,
    w_filtered_sum_over, w_pct_change,
]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_window_over(pl, spark, ddb, seed):
    rng = random.Random(8000 + seed)
    tbl = mk_frame(rng)
    lf = pl.from_arrow(tbl).sort("rid")
    ddb.register("t_fzw2", tbl)
    picks = [rng.choice(WINDOWS) for _ in range(6)]
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(picks):
        e, q = tmpl(pl, rng)
        exprs[f"w{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS w{idx}_{tmpl.__name__}")
    got = lf.with_columns(**exprs).select("rid", *exprs.keys()).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_fzw2").df()
    assert_frames_match(got, want, f"seed={seed} window {[t.__name__ for t in picks]}")
