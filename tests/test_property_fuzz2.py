"""Round-8 fuzz widening: PIPELINE CHAINS and the families the first
harness didn't reach (rolling windows, cast/parse corners, explode,
vertical/diagonal concat, full joins, horizontal folds).

Same protocol as test_property_fuzz.py (reference test-strategy port,
py-polars ``polars/testing/parametric``): deterministic seeds, each
case dual-rendered as a polars_spark pipeline AND DuckDB SQL carrying
the reference's semantics, value-compared.

The pipeline-chain family is the step up from single-op templates: a
random sequence of filter / with_columns / select / sort+limit /
unique(keep=first) / group_by composes through the plan builder, so
projection pruning, predicate placement and the order contract are
fuzzed *in composition*, where single-op templates can't see breakage.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.test_property_fuzz import (
    KEY_EDGE,
    STR_EDGE,
    assert_frames_match,
    mk_frame,
)

import os as _os

# default trimmed 32 -> 12 (r13, VERDICT #2): the driver's pytest budget
# timed out at ~84% of the suite and these two files were 35% of its wall
# time.  Seeds are deterministic, so the first 12 are the same regression
# net every run; the deep 32/96-seed sweep stays one env var away
# (SPARK_GRAFT_FUZZ_FRAMES=32) and is run at every round close.
N_FRAMES = int(_os.environ.get("SPARK_GRAFT_FUZZ_FRAMES", "12"))


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


# ------------------------------------------------------- pipeline chains
# Each step mutates (lf, sql, order_sql).  order_sql is the SQL ORDER BY
# fragment describing the frame's CURRENT row order — polars frames keep
# a deterministic order through filter/with_columns/select, and sort
# replaces it; limit and unique(keep='first') consume it.


def _step_filter(state, pl, rng):
    cond_e, cond_q = rng.choice(
        [
            (pl.col("i").fill_null(0) > 0, "coalesce(i, 0) > 0"),
            (pl.col("s").is_not_null(), "s IS NOT NULL"),
            (pl.col("ff").fill_null(0.0) <= 1.0, "coalesce(ff, 0.0) <= 1.0"),
            (pl.col("g").fill_null("z") != "b", "coalesce(g, 'z') != 'b'"),
        ]
    )
    state["lf"] = state["lf"].filter(cond_e)
    state["sql"] = f"SELECT * FROM ({state['sql']}) WHERE {cond_q}"
    return "filter"


def _step_with_columns(state, pl, rng):
    which = rng.randrange(4)
    if which == 0:
        e = (pl.col("i").fill_null(0) * 2).alias("d_dbl")
        q = "coalesce(i, 0) * 2 AS d_dbl"
    elif which == 1:
        e = pl.col("s").str.len_chars().cast(pl.Int64).alias("d_len")
        q = "CAST(length(s) AS BIGINT) AS d_len"
    elif which == 2:
        # polars when(null cond) takes the otherwise branch == SQL CASE
        e = pl.when(pl.col("b")).then(pl.col("i")).otherwise(pl.col("k")).alias("d_whn")
        q = "CASE WHEN b THEN i ELSE k END AS d_whn"
    else:
        # sum_horizontal ignore_nulls: null counts as 0, all-null row -> 0
        e = pl.sum_horizontal("i", "k").alias("d_sh")
        q = "coalesce(i, 0) + coalesce(k, 0) AS d_sh"
    state["lf"] = state["lf"].with_columns(e)
    state["sql"] = f"SELECT *, {q} FROM ({state['sql']})"
    state["derived"].append(q.rsplit(" AS ", 1)[1])
    return f"wc{which}"


CORE = ["rid", "g", "i", "k", "ff", "s", "b"]


def _step_select(state, pl, rng):
    keep = CORE + state["derived"]
    state["lf"] = state["lf"].select(keep)
    state["sql"] = f"SELECT {', '.join(keep)} FROM ({state['sql']})"
    return "select"


def _step_sort(state, pl, rng):
    key = rng.choice(["i", "ff", "s"])
    desc = rng.choice([True, False])
    nl = rng.choice([True, False])
    state["lf"] = state["lf"].sort(
        [key, "rid"], descending=[desc, False], nulls_last=[nl, False]
    )
    # polars null rule: null is SMALLEST (asc -> first, desc -> last);
    # nulls_last=True forces last either way
    sql_nulls = "LAST" if (nl or desc) else "FIRST"
    state["order"] = (
        f"{key} {'DESC' if desc else 'ASC'} NULLS {sql_nulls}, rid ASC"
    )
    return f"sort:{key}"


def _step_head(state, pl, rng):
    k = rng.choice([0, 1, 5, 25])
    state["lf"] = state["lf"].head(k)
    state["sql"] = (
        f"SELECT * FROM ({state['sql']}) ORDER BY {state['order']} LIMIT {k}"
    )
    return f"head:{k}"


def _step_unique_first(state, pl, rng):
    # keep='first' means first row in CURRENT frame order for each key;
    # polars counts a null key as a key value, as does PARTITION BY
    state["lf"] = state["lf"].unique(subset=["g"], keep="first", maintain_order=True)
    state["sql"] = (
        f"SELECT * FROM ({state['sql']}) "
        f"QUALIFY row_number() OVER (PARTITION BY g ORDER BY {state['order']}) = 1"
    )
    return "uniq_first"


def _step_unique_last(state, pl, rng):
    state["lf"] = state["lf"].unique(subset=["g"], keep="last", maintain_order=True)
    rev = state["order"].replace(" ASC", " __A").replace(" DESC", " ASC").replace(" __A", " DESC")
    rev = rev.replace("NULLS FIRST", "__NF").replace("NULLS LAST", "NULLS FIRST").replace("__NF", "NULLS LAST")
    state["sql"] = (
        f"SELECT * FROM ({state['sql']}) "
        f"QUALIFY row_number() OVER (PARTITION BY g ORDER BY {rev}) = 1"
    )
    return "uniq_last"


DIM = pa.table({"gk": pa.array(["a", "b"]), "w": pa.array([10, 20], pa.int64())})


def _step_join_dim(state, pl, rng):
    """Left-row-preserving joins against a unique-key dim mid-pipeline:
    row order and multiplicity are unchanged, so the order contract the
    later head/unique steps rely on must survive the join."""
    if state.get("joined"):
        return "join:skip"
    state["joined"] = True
    how = rng.choice(["left", "semi", "anti"])
    dim = state["pl_mod"].from_arrow(DIM).rename({"gk": "g"})
    state["lf"] = state["lf"].join(dim, on="g", how=how)
    if how == "left":
        state["sql"] = (
            f"SELECT p.*, d.w FROM ({state['sql']}) p "
            f"LEFT JOIN t_dim d ON p.g = d.gk"
        )
        state["derived"].append("w")
    elif how == "semi":
        state["sql"] = (
            f"SELECT * FROM ({state['sql']}) p WHERE EXISTS"
            f" (SELECT 1 FROM t_dim d WHERE d.gk = p.g)"
        )
    else:
        state["sql"] = (
            f"SELECT * FROM ({state['sql']}) p WHERE NOT EXISTS"
            f" (SELECT 1 FROM t_dim d WHERE d.gk = p.g)"
        )
    return f"join:{how}"


STEPS = [
    _step_filter,
    _step_with_columns,
    _step_select,
    _step_sort,
    _step_head,
    _step_unique_first,
    _step_unique_last,
    _step_join_dim,
]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_pipeline_chain(pl, spark, ddb, seed):
    rng = random.Random(9000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_pc", tbl)
    ddb.register("t_dim", DIM)
    state = {
        "lf": pl.from_arrow(tbl),
        "sql": "SELECT * FROM t_pc",
        "order": "rid ASC",
        "derived": [],
        "pl_mod": pl,
    }
    trace = []
    for _ in range(rng.randrange(2, 5)):
        trace.append(rng.choice(STEPS)(state, pl, rng))
    if rng.random() < 0.5:
        got = (
            state["lf"]
            .group_by("g")
            .agg(
                n=pl.len().cast(pl.Int64),
                si=pl.col("i").sum(),
                mf=pl.col("ff").mean(),
            )
            .collect()
        )
        want = ddb.execute(
            f"SELECT g, CAST(count(*) AS BIGINT) AS n, coalesce(sum(i), 0) AS si,"
            f" avg(ff) AS mf FROM ({state['sql']}) GROUP BY g"
        ).df()
        trace.append("group_agg")
    else:
        got = state["lf"].collect()
        want = ddb.execute(state["sql"]).df()
    assert_frames_match(got, want, f"seed={seed} pipeline {trace}")


# ------------------------------------------------------- rolling windows


def mk_frame_rolling(rng: random.Random):
    n = rng.choice([0, 1, 2, 7, 30])
    return pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "g": pa.array([rng.choice(["a", "b", None]) for _ in range(n)], pa.string()),
            # null-free values: the null-skip rule has its own oracle gates,
            # here we fuzz the WINDOW MECHANICS (bounds, center, min_samples)
            "x": pa.array(
                [rng.choice([0.0, 1.5, -2.25, 10.0, 7.5]) for _ in range(n)],
                pa.float64(),
            ),
        }
    )


def _rolling_case(pl, rng):
    agg = rng.choice(["mean", "sum", "min", "max"])
    k = rng.choice([1, 2, 3, 5])
    center = rng.choice([True, False])
    # min_samples None -> window_size (reference expr.py rolling_* default)
    ms = rng.choice([None, 1])
    e = getattr(pl.col("x"), f"rolling_{agg}")(k, min_samples=ms, center=center)
    eff_ms = k if ms is None else ms
    if center:
        prec, foll = k // 2, k - 1 - k // 2
        frame = f"ROWS BETWEEN {prec} PRECEDING AND {foll} FOLLOWING"
    else:
        frame = f"ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW"
    sql_agg = {"mean": "avg", "sum": "sum", "min": "min", "max": "max"}[agg]
    w = f"(PARTITION BY g ORDER BY rid {frame})"
    q = (
        f"CASE WHEN count(x) OVER {w} >= {eff_ms} "
        f"THEN {sql_agg}(x) OVER {w} END"
    )
    return e, q, f"rolling_{agg}(k={k},c={center},ms={ms})"


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_rolling(pl, spark, ddb, seed):
    rng = random.Random(10000 + seed)
    tbl = mk_frame_rolling(rng)
    ddb.register("t_roll", tbl)
    lf = pl.from_arrow(tbl).sort("rid")
    exprs, sqls, names = {}, [], []
    for idx in range(5):
        e, q, nm = _rolling_case(pl, rng)
        exprs[f"r{idx}"] = e.over("g")
        sqls.append(f"{q} AS r{idx}")
        names.append(nm)
    got = lf.with_columns(**exprs).select("rid", *exprs.keys()).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_roll").df()
    assert_frames_match(got, want, f"seed={seed} rolling {names}")


# ------------------------------------------------------ cast/parse corners


NUMSTR_EDGE = [
    "12", "-3", "+7", "0012", "1.5", "", " 7", "7 ", "abc", "1e3",
    "9223372036854775807", "99999999999999999999", "-9223372036854775808",
    None,
]


def mk_frame_cast(rng: random.Random):
    n = rng.choice([0, 1, 3, 20])
    return pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "sn": pa.array([rng.choice(NUMSTR_EDGE) for _ in range(n)], pa.string()),
            "i": pa.array(
                [rng.choice([0, 1, -1, 2**31, -(2**31) - 1, 2**62, None]) for _ in range(n)],
                pa.int64(),
            ),
            "b": pa.array([rng.choice([True, False, None]) for _ in range(n)], pa.bool_()),
            "s": pa.array([rng.choice(STR_EDGE) for _ in range(n)], pa.string()),
        }
    )


def c_str_to_int(pl, rng):
    # polars non-strict str->int: exact integer grammar only (no trim, no
    # float strings, overflow -> null); DuckDB TRY_CAST trims and rounds,
    # so the oracle gates on the grammar first
    return (
        pl.col("sn").cast(pl.Int64, strict=False),
        "CASE WHEN regexp_matches(sn, '^[+-]?[0-9]+$')"
        " THEN TRY_CAST(sn AS BIGINT) END",
    )


def c_str_to_float(pl, rng):
    return (
        pl.col("sn").cast(pl.Float64, strict=False),
        "CASE WHEN regexp_matches(sn, '^[+-]?([0-9]*\\.)?[0-9]+([eE][+-]?[0-9]+)?$')"
        " THEN TRY_CAST(sn AS DOUBLE) END",
    )


def c_int_to_str(pl, rng):
    return pl.col("i").cast(pl.String), "CAST(i AS VARCHAR)"


def c_int_downcast(pl, rng):
    # polars non-strict overflowing downcast -> null (never wraps)
    return (
        pl.col("i").cast(pl.Int32, strict=False).cast(pl.Int64),
        "CASE WHEN i BETWEEN -2147483648 AND 2147483647"
        " THEN CAST(i AS BIGINT) END",
    )


def c_bool_to_str(pl, rng):
    return pl.col("b").cast(pl.String), "CAST(b AS VARCHAR)"


def c_bool_roundtrip(pl, rng):
    return (
        pl.col("b").cast(pl.Int64).cast(pl.Boolean),
        "CAST(CAST(b AS BIGINT) AS BOOLEAN)",
    )


def c_str_to_uint(pl, rng):
    # round-9: unsigned targets ride wider SIGNED Spark types, so the value
    # range is gated explicitly — '300' -> UInt8 is null, '-1' rejected by
    # the grammar ('+' allowed), u8/u16/u32 umax enforced
    name, umax = rng.choice([("UInt8", 255), ("UInt16", 65535), ("UInt32", 4294967295)])
    return (
        pl.col("sn").cast(getattr(pl, name), strict=False).cast(pl.Int64),
        f"CASE WHEN regexp_matches(sn, '^\\+?[0-9]+$')"
        f" AND TRY_CAST(sn AS HUGEINT) BETWEEN 0 AND {umax}"
        f" THEN TRY_CAST(sn AS BIGINT) END",
    )


def c_int_to_uint(pl, rng):
    # numeric sources out of the unsigned range null out too
    name, umax = rng.choice([("UInt8", 255), ("UInt16", 65535), ("UInt32", 4294967295)])
    return (
        pl.col("i").cast(getattr(pl, name), strict=False).cast(pl.Int64),
        f"CASE WHEN i BETWEEN 0 AND {umax} THEN CAST(i AS BIGINT) END",
    )


CASTS = [c_str_to_int, c_str_to_float, c_int_to_str, c_int_downcast,
         c_bool_to_str, c_bool_roundtrip, c_str_to_uint, c_int_to_uint]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_cast_parse(pl, spark, ddb, seed):
    rng = random.Random(11000 + seed)
    tbl = mk_frame_cast(rng)
    ddb.register("t_cst", tbl)
    lf = pl.from_arrow(tbl)
    picks = [rng.choice(CASTS) for _ in range(6)]
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(picks):
        e, q = tmpl(pl, rng)
        exprs[f"c{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS c{idx}_{tmpl.__name__}")
    got = lf.select(rid=pl.col("rid"), **exprs).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_cst").df()
    assert_frames_match(got, want, f"seed={seed} cast {[t.__name__ for t in picks]}")


# ------------------------------------------------------------- explode


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_explode(pl, spark, ddb, seed):
    """polars explode: empty list AND null list both yield ONE null row
    (DuckDB unnest drops them — the oracle re-adds the placeholder)."""
    rng = random.Random(12000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_xpl", tbl)
    got = (
        pl.from_arrow(tbl)
        .select("rid", tok=pl.col("s").str.split(" "))
        .explode("tok")
        .collect()
    )
    want = ddb.execute(
        """
        SELECT rid, unnest(
            CASE WHEN l IS NULL OR len(l) = 0 THEN [NULL] ELSE l END) AS tok
        FROM (SELECT rid, string_split(s, ' ') AS l FROM t_xpl)
        """
    ).df()
    assert_frames_match(got, want, f"seed={seed} explode")


# ------------------------------------------------------ concat families


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_concat(pl, spark, ddb, seed):
    rng = random.Random(13000 + seed)
    t1, t2 = mk_frame(rng), mk_frame(rng)
    ddb.register("t_cca", t1)
    ddb.register("t_ccb", t2)
    how = rng.choice(["vertical", "diagonal"])
    if how == "vertical":
        lf = pl.concat(
            [pl.from_arrow(t1).select("g", "i", "ff"),
             pl.from_arrow(t2).select("g", "i", "ff")]
        )
        sql = (
            "SELECT g, i, ff FROM t_cca UNION ALL SELECT g, i, ff FROM t_ccb"
        )
    else:
        # diagonal: union of columns, missing filled with null
        lf = pl.concat(
            [pl.from_arrow(t1).select("g", "i"),
             pl.from_arrow(t2).select("g", "ff")],
            how="diagonal",
        )
        sql = (
            "SELECT g, i, NULL::DOUBLE AS ff FROM t_cca "
            "UNION ALL SELECT g, NULL::BIGINT AS i, ff FROM t_ccb"
        )
    got = lf.group_by("g").agg(
        n=pl.len().cast(pl.Int64),
        si=pl.col("i").sum(),
        mf=pl.col("ff").mean(),
    ).collect()
    want = ddb.execute(
        f"SELECT g, CAST(count(*) AS BIGINT) AS n, coalesce(sum(i), 0) AS si,"
        f" avg(ff) AS mf FROM ({sql}) GROUP BY g"
    ).df()
    assert_frames_match(got, want, f"seed={seed} concat {how}")


# ------------------------------------------------------------ full joins


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_full_join(pl, spark, ddb, seed):
    """Full join with coalesced key; polars null keys match NOTHING
    (join_nulls=False default) == SQL ON-equality semantics."""
    rng = random.Random(14000 + seed)
    t1, t2 = mk_frame(rng), mk_frame(rng)
    ddb.register("t_fja2", t1)
    ddb.register("t_fjb2", t2)
    lfa = pl.from_arrow(t1).select("g", "i")
    lfb = pl.from_arrow(t2).select("g", x2=pl.col("ff"))
    got = (
        lfa.join(lfb, on="g", how="full", coalesce=True)
        .group_by("g")
        .agg(
            n=pl.len().cast(pl.Int64),
            si=pl.col("i").sum(),
            sx=pl.col("x2").sum(),
        )
        .collect()
    )
    want = ddb.execute(
        """
        SELECT coalesce(a.g, b.g) AS g, CAST(count(*) AS BIGINT) AS n,
               coalesce(sum(a.i), 0) AS si, coalesce(sum(b.ff), 0.0) AS sx
        FROM t_fja2 a FULL OUTER JOIN (SELECT g, ff FROM t_fjb2) b
          ON a.g = b.g
        GROUP BY coalesce(a.g, b.g)
        """
    ).df()
    assert_frames_match(got, want, f"seed={seed} full join")


# ----------------------------------------------------- horizontal folds


def h_sum(pl, rng):
    return pl.sum_horizontal("i", "k"), "coalesce(i, 0) + coalesce(k, 0)"


def h_mean(pl, rng):
    # ignore_nulls mean: sum of non-null / count of non-null; all-null -> null
    return (
        pl.mean_horizontal("f", "ff"),
        "CASE WHEN f IS NOT NULL OR ff IS NOT NULL THEN"
        " (coalesce(f, 0) + coalesce(ff, 0))"
        " / (CASE WHEN f IS NULL THEN 0 ELSE 1 END"
        "    + CASE WHEN ff IS NULL THEN 0 ELSE 1 END) END",
    )


def h_min(pl, rng):
    return pl.min_horizontal("i", "k"), "least(i, k)"


def h_max(pl, rng):
    return pl.max_horizontal("i", "k"), "greatest(i, k)"


def h_any(pl, rng):
    # null-free inputs: Kleene corners have their own pinned tests
    return (
        pl.any_horizontal(pl.col("b").fill_null(False), pl.col("i").fill_null(0) > 0),
        "coalesce(b, false) OR coalesce(i, 0) > 0",
    )


def h_all(pl, rng):
    return (
        pl.all_horizontal(pl.col("b").fill_null(True), pl.col("i").fill_null(1) != 0),
        "coalesce(b, true) AND coalesce(i, 1) != 0",
    )


HORIZ = [h_sum, h_mean, h_min, h_max, h_any, h_all]


# -------------------------------------------------------- binary encode


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_bin_encode(pl, spark, ddb, seed):
    """bin.encode/decode hex+base64 round-trips vs DuckDB (hex lowercase
    in both polars and DuckDB's lower(hex()))."""
    rng = random.Random(28000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_bin", tbl)
    lf = pl.from_arrow(tbl)
    got = lf.select(
        rid=pl.col("rid"),
        h=pl.col("s").cast(pl.Binary).bin.encode("hex"),
        b64=pl.col("s").cast(pl.Binary).bin.encode("base64"),
        rt=pl.col("s").cast(pl.Binary).bin.encode("hex").cast(pl.Binary)
        .bin.decode("hex").cast(pl.String),
        sz=pl.col("s").cast(pl.Binary).bin.size().cast(pl.Int64),
    ).collect()
    want = ddb.execute(
        """
        SELECT rid, lower(hex(encode(s))) AS h, to_base64(encode(s)) AS b64,
               s AS rt, CAST(octet_length(encode(s)) AS BIGINT) AS sz
        FROM t_bin
        """
    ).df()
    assert_frames_match(got, want, f"seed={seed} bin encode")


# ------------------------------------------------------------ math unary


def m_round_even(pl, rng):
    d = rng.choice([0, 1, 2])
    # polars default round mode is banker's (half_to_even)
    return pl.col("ff").round(d), f"round_even(ff, {d})"


def m_round_away(pl, rng):
    d = rng.choice([0, 1])
    return (
        pl.col("ff").round(d, mode="half_away_from_zero"),
        f"round(ff, {d})",
    )


def m_floor(pl, rng):
    return pl.col("ff").floor(), "floor(ff)"


def m_ceil(pl, rng):
    return pl.col("ff").ceil(), "ceil(ff)"


def m_sign(pl, rng):
    return pl.col("ff").sign(), "CAST(sign(ff) AS DOUBLE)"


def m_exp(pl, rng):
    return (pl.col("ff") / 1e5).exp(), "exp(ff / 1e5)"


def m_ln_pos(pl, rng):
    return (pl.col("ff").abs() + 0.25).log(), "ln(abs(ff) + 0.25)"


def m_log10_pos(pl, rng):
    return (pl.col("ff").abs() + 0.25).log10(), "log10(abs(ff) + 0.25)"


def m_pow(pl, rng):
    k = rng.choice([2, 3])
    return (pl.col("ff") / 100.0) ** k, f"pow(ff / 100.0, {k})"


def m_cbrt(pl, rng):
    return pl.col("ff").cbrt(), "cbrt(ff)"


def m_degrees(pl, rng):
    return pl.col("ff").degrees(), "degrees(ff)"


MATH_OPS = [m_round_even, m_round_away, m_floor, m_ceil, m_sign, m_exp,
            m_ln_pos, m_log10_pos, m_pow, m_cbrt, m_degrees]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_math_unary(pl, spark, ddb, seed):
    """Unary math incl. the two round modes (polars default = banker's,
    DuckDB round = half away from zero — round_even is the oracle)."""
    rng = random.Random(27000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_mth", tbl)
    lf = pl.from_arrow(tbl)
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(MATH_OPS):
        e, q = tmpl(pl, rng)
        exprs[f"m{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS m{idx}_{tmpl.__name__}")
    exprs["m_at2"] = pl.arctan2(pl.col("ff"), pl.col("f2"))
    sqls.append("atan2(ff, f2) AS m_at2")
    got = lf.select(rid=pl.col("rid"), **exprs).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_mth").df()
    assert_frames_match(got, want, f"seed={seed} math")


# ------------------------------------------------------------- reshape


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_unpivot(pl, spark, ddb, seed):
    """unpivot keeps one (variable, value) row per on-column; the oracle
    is the UNION ALL expansion."""
    rng = random.Random(25000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_up", tbl)
    got = (
        pl.from_arrow(tbl)
        .unpivot(on=["i", "k"], index=["rid", "g"])
        .collect()
    )
    want = ddb.execute(
        """
        SELECT rid, g, 'i' AS variable, i AS value FROM t_up
        UNION ALL SELECT rid, g, 'k', k FROM t_up
        """
    ).df()
    assert_frames_match(got, want, f"seed={seed} unpivot")


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_row_index_gather_every(pl, spark, ddb, seed):
    """with_row_index follows frame order; gather_every(n, offset) keeps
    rows whose position ≡ offset (mod n)."""
    rng = random.Random(26000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_ge", tbl)
    n = rng.choice([1, 2, 3])
    off = rng.choice([0, 1])
    got = (
        pl.from_arrow(tbl)
        .with_row_index("pos")
        .gather_every(n, off)
        .select(pos=pl.col("pos").cast(pl.Int64), rid=pl.col("rid"))
        .collect()
    )
    want = ddb.execute(
        f"""
        SELECT pos, rid FROM (
            SELECT rid, CAST(row_number() OVER (ORDER BY rid) - 1 AS BIGINT) AS pos
            FROM t_ge)
        WHERE pos >= {off} AND (pos - {off}) % {n} = 0
        """
    ).df()
    assert_frames_match(got, want, f"seed={seed} row_index/gather_every n={n} off={off}")


# ----------------------------------------------------- group_by_dynamic


def mk_frame_gbd(rng: random.Random):
    n = rng.choice([0, 1, 7, 40])
    base = _dt.datetime(2021, 6, 1)
    return pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "g": pa.array([rng.choice(["a", "b"]) for _ in range(n)], pa.string()),
            "t": pa.array(
                sorted(
                    base + _dt.timedelta(minutes=rng.randrange(0, 3000))
                    for _ in range(n)
                ),
                pa.timestamp("us"),
            ),
            "v": pa.array([rng.choice([1.0, 2.5, -3.0]) for _ in range(n)], pa.float64()),
        }
    )


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_group_by_dynamic(pl, spark, ddb, seed):
    """Dynamic windows on the epoch-aligned grid: every x closed x label
    x optional group key, vs integer bucket math in DuckDB (window
    [s, s+every) for closed=left, (s, s+every] for closed=right; label
    left=s, right=s+every; empty windows skipped by construction)."""
    rng = random.Random(24000 + seed)
    tbl = mk_frame_gbd(rng)
    ddb.register("t_gbd", tbl)
    every_s = rng.choice([900, 3600, 86400])
    closed = rng.choice(["left", "right"])
    label = rng.choice(["left", "right"])
    use_by = rng.choice([True, False])
    lf = pl.from_arrow(tbl)
    kwargs = dict(every=f"{every_s}s", closed=closed, label=label)
    if use_by:
        kwargs["group_by"] = "g"
    got = (
        lf.sort("t")
        .group_by_dynamic("t", **kwargs)
        .agg(sv=pl.col("v").sum(), n=pl.len().cast(pl.Int64))
        .collect()
    )
    eu = every_s * 1_000_000
    if closed == "left":
        ws = f"CAST(floor(epoch_ms(t) * 1000.0 / {eu}) AS BIGINT) * {eu}"
    else:
        ws = f"CAST(floor((epoch_ms(t) * 1000.0 - 1) / {eu}) AS BIGINT) * {eu}"
    lab = ws if label == "left" else f"({ws} + {eu})"
    gcols = "g, " if use_by else ""
    want = ddb.execute(
        f"""
        SELECT {gcols}make_timestamp({lab}) AS t,
               coalesce(sum(v), 0.0) AS sv, CAST(count(*) AS BIGINT) AS n
        FROM t_gbd GROUP BY {gcols}{ws}
        """
    ).df()
    assert_frames_match(got, want, f"seed={seed} gbd every={every_s}s {closed}/{label} by={use_by}")


# ---------------------------------------- fill strategies / is_in / when


def fl_forward(pl, rng):
    return (
        pl.col("ff").fill_null(strategy="forward").over("g"),
        "last_value(ff IGNORE NULLS) OVER"
        " (PARTITION BY g ORDER BY rid ROWS UNBOUNDED PRECEDING)",
    )


def fl_backward(pl, rng):
    return (
        pl.col("ff").fill_null(strategy="backward").over("g"),
        "first_value(ff IGNORE NULLS) OVER (PARTITION BY g ORDER BY rid"
        " ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)",
    )


def fl_min(pl, rng):
    return (
        pl.col("ff").fill_null(strategy="min").over("g"),
        "coalesce(ff, min(ff) OVER (PARTITION BY g))",
    )


def fl_max(pl, rng):
    return (
        pl.col("ff").fill_null(strategy="max").over("g"),
        "coalesce(ff, max(ff) OVER (PARTITION BY g))",
    )


def fl_mean(pl, rng):
    return (
        pl.col("ff").fill_null(strategy="mean").over("g"),
        "coalesce(ff, avg(ff) OVER (PARTITION BY g))",
    )


def fl_zero(pl, rng):
    return pl.col("ff").fill_null(strategy="zero"), "coalesce(ff, 0.0)"


def ii_str(pl, rng):
    # polars is_in: null input -> null
    return (
        pl.col("s").is_in(["a", "Ab", ""]),
        "s IN ('a', 'Ab', '')",
    )


def ii_int(pl, rng):
    return pl.col("i").is_in([0, 1, -13]), "i IN (0, 1, -13)"


def wc_chain(pl, rng):
    # multi-branch when-chain == SQL CASE (first match wins, null conds
    # fall through)
    return (
        pl.when(pl.col("i") > 0)
        .then(pl.lit("pos"))
        .when(pl.col("i") < 0)
        .then(pl.lit("neg"))
        .when(pl.col("i") == 0)
        .then(pl.lit("zero"))
        .otherwise(pl.lit("null")),
        "CASE WHEN i > 0 THEN 'pos' WHEN i < 0 THEN 'neg'"
        " WHEN i = 0 THEN 'zero' ELSE 'null' END",
    )


FILLS = [fl_forward, fl_backward, fl_min, fl_max, fl_mean, fl_zero,
         ii_str, ii_int, wc_chain]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_fill_isin_when(pl, spark, ddb, seed):
    rng = random.Random(23000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_fil", tbl)
    lf = pl.from_arrow(tbl).sort("rid")
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(FILLS):
        e, q = tmpl(pl, rng)
        exprs[f"f{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS f{idx}_{tmpl.__name__}")
    got = lf.with_columns(**exprs).select("rid", *exprs.keys()).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_fil").df()
    assert_frames_match(got, want, f"seed={seed} fill/is_in/when")


# --------------------------------------------------------- as-of joins


def mk_asof_frames(rng: random.Random):
    """Left keys are ≡1/3 (mod 10), right keys are multiples of 10 and
    UNIQUE per group: no equidistant-nearest ties, no duplicate-key
    ambiguity — the oracle stays deterministic."""
    nl = rng.choice([0, 1, 5, 30])
    nr = rng.choice([0, 1, 4, 15])
    left = pa.table(
        {
            "rid": pa.array(range(nl), pa.int64()),
            "g": pa.array([rng.choice(["a", "b"]) for _ in range(nl)], pa.string()),
            "t": pa.array(
                sorted(rng.randrange(0, 40) * 10 + rng.choice([1, 3]) for _ in range(nl)),
                pa.int64(),
            ),
            "lv": pa.array([rng.choice([1.5, -2.0, None]) for _ in range(nl)], pa.float64()),
        }
    )
    rts = {}
    for _ in range(nr):
        grp = rng.choice(["a", "b"])
        rts.setdefault(grp, set()).add(rng.randrange(0, 44) * 10)
    rows = sorted((t, grp) for grp, ts in rts.items() for t in ts)
    right = pa.table(
        {
            "g": pa.array([grp for _t, grp in rows], pa.string()),
            "t": pa.array([t for t, _grp in rows], pa.int64()),
            "rv": pa.array([float(t % 7) for t, _grp in rows], pa.float64()),
        }
    )
    return left, right


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_join_asof(pl, spark, ddb, seed):
    """join_asof backward/forward/nearest (± tolerance, ± by-group) vs a
    correlated-subquery oracle carrying the polars match rules."""
    rng = random.Random(22000 + seed)
    left, right = mk_asof_frames(rng)
    ddb.register("t_asl", left)
    ddb.register("t_asr", right)
    strategy = rng.choice(["backward", "forward", "nearest"])
    use_by = rng.choice([True, False])
    tol = rng.choice([None, 35])
    lf = pl.from_arrow(left)
    rf = pl.from_arrow(right)
    if not use_by:
        rf = rf.unique(subset=["t"], keep="first", maintain_order=True)
    kwargs = dict(on="t", strategy=strategy)
    if use_by:
        kwargs["by"] = "g"
    if tol is not None:
        kwargs["tolerance"] = tol
    got = (
        lf.join_asof(rf.select("g", "t", "rv") if use_by else rf.select("t", "rv"), **kwargs)
        .select("rid", "lv", "rv")
        .collect()
    )
    by_cond = "r.g = l.g AND " if use_by else ""
    # no-by path dedupes right keys; rv is functional on t (t % 7), so
    # DISTINCT matches unique(keep='first') exactly
    src = "t_asr" if use_by else "(SELECT DISTINCT t, rv FROM t_asr)"
    if strategy == "backward":
        cond = "r.t <= l.t" + (f" AND r.t >= l.t - {tol}" if tol else "")
        order = "r.t DESC"
    elif strategy == "forward":
        cond = "r.t >= l.t" + (f" AND r.t <= l.t + {tol}" if tol else "")
        order = "r.t ASC"
    else:
        cond = f"abs(r.t - l.t) <= {tol}" if tol else "TRUE"
        order = "abs(r.t - l.t) ASC"
    want = ddb.execute(
        f"""
        SELECT l.rid, l.lv,
               (SELECT r.rv FROM {src} r WHERE {by_cond}{cond}
                ORDER BY {order} LIMIT 1) AS rv
        FROM t_asl l
        """
    ).df()
    assert_frames_match(got, want, f"seed={seed} asof {strategy} by={use_by} tol={tol}")


# -------------------------------------------------------- rank variants


def rk_min(pl, rng):
    return (
        pl.col("i").rank("min").over("g").cast(pl.Int64),
        "CASE WHEN i IS NULL THEN NULL ELSE CAST(rank() OVER"
        " (PARTITION BY g, (i IS NULL) ORDER BY i) AS BIGINT) END",
    )


def rk_dense(pl, rng):
    return (
        pl.col("i").rank("dense").over("g").cast(pl.Int64),
        "CASE WHEN i IS NULL THEN NULL ELSE CAST(dense_rank() OVER"
        " (PARTITION BY g, (i IS NULL) ORDER BY i) AS BIGINT) END",
    )


def rk_average(pl, rng):
    # average of min..max rank among ties = rank() + (n_ties - 1)/2
    return (
        pl.col("i").rank("average").over("g"),
        "CASE WHEN i IS NULL THEN NULL ELSE rank() OVER"
        " (PARTITION BY g, (i IS NULL) ORDER BY i)"
        " + (count(*) OVER (PARTITION BY g, i) - 1) / 2.0 END",
    )


def rk_ordinal(pl, rng):
    # ties broken by order of appearance (frame order)
    return (
        pl.col("i").rank("ordinal").over("g").cast(pl.Int64),
        "CASE WHEN i IS NULL THEN NULL ELSE CAST(row_number() OVER"
        " (PARTITION BY g, (i IS NULL) ORDER BY i, rid) AS BIGINT) END",
    )


def rk_max(pl, rng):
    return (
        pl.col("i").rank("max").over("g").cast(pl.Int64),
        "CASE WHEN i IS NULL THEN NULL ELSE CAST(rank() OVER"
        " (PARTITION BY g, (i IS NULL) ORDER BY i)"
        " + count(*) OVER (PARTITION BY g, i) - 1 AS BIGINT) END",
    )


RANKS = [rk_min, rk_dense, rk_average, rk_ordinal, rk_max]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_rank_variants(pl, spark, ddb, seed):
    """All five rank methods under the polars null rule (nulls rank as
    null and do not consume ranks), grouped via .over."""
    rng = random.Random(19000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_rnk", tbl)
    lf = pl.from_arrow(tbl).sort("rid")
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(RANKS):
        e, q = tmpl(pl, rng)
        exprs[f"r{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS r{idx}_{tmpl.__name__}")
    got = lf.with_columns(**exprs).select("rid", *exprs.keys()).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_rnk").df()
    assert_frames_match(got, want, f"seed={seed} rank")


# ---------------------------------------------------------- string regex


def sr_contains(pl, rng):
    pat = rng.choice(["[0-9]+", "^a", "b$", "a.c", "\\s"])
    return (
        pl.col("s").str.contains(pat),
        f"regexp_matches(s, '{pat}')",
    )


def sr_count_matches(pl, rng):
    pat = rng.choice(["a", "[aeiou]", "\\d"])
    return (
        pl.col("s").str.count_matches(pat).cast(pl.Int64),
        f"CAST(len(regexp_extract_all(s, '{pat}')) AS BIGINT)",
    )


def sr_replace_first(pl, rng):
    return (
        pl.col("s").str.replace("[aeiou]", "_"),
        "regexp_replace(s, '[aeiou]', '_')",
    )


def sr_replace_all_re(pl, rng):
    return (
        pl.col("s").str.replace_all("[aeiou]", "_"),
        "regexp_replace(s, '[aeiou]', '_', 'g')",
    )


def sr_extract(pl, rng):
    # group 1 extraction; polars returns null when no match
    return (
        pl.col("s").str.extract("([a-z]+)", 1),
        "CASE WHEN regexp_matches(s, '([a-z]+)')"
        " THEN regexp_extract(s, '([a-z]+)', 1) END",
    )


def sr_strip_prefix(pl, rng):
    return (
        pl.col("s").str.strip_prefix("a"),
        "CASE WHEN s LIKE 'a%' THEN substr(s, 2) ELSE s END",
    )


STR_RE = [sr_contains, sr_count_matches, sr_replace_first,
          sr_replace_all_re, sr_extract, sr_strip_prefix]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_str_regex(pl, spark, ddb, seed):
    rng = random.Random(20000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_sre", tbl)
    lf = pl.from_arrow(tbl)
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(STR_RE):
        e, q = tmpl(pl, rng)
        exprs[f"s{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS s{idx}_{tmpl.__name__}")
    got = lf.select(rid=pl.col("rid"), **exprs).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_sre").df()
    assert_frames_match(got, want, f"seed={seed} str-regex")


# ------------------------------------------------------------ list ops


def lo_sort(pl, rng):
    return (
        pl.col("s").str.split(" ").list.sort(),
        "list_sort(string_split(s, ' '))",
    )


def lo_reverse(pl, rng):
    return (
        pl.col("s").str.split(" ").list.reverse(),
        "list_reverse(string_split(s, ' '))",
    )


def lo_len(pl, rng):
    return (
        pl.col("s").str.split(" ").list.len().cast(pl.Int64),
        "CAST(len(string_split(s, ' ')) AS BIGINT)",
    )


def lo_slice(pl, rng):
    return (
        pl.col("s").str.split(" ").list.slice(1, 2),
        "string_split(s, ' ')[2:3]",
    )


def lo_join(pl, rng):
    return (
        pl.col("s").str.split(" ").list.join("-"),
        "array_to_string(string_split(s, ' '), '-')",
    )


def lo_contains(pl, rng):
    return (
        pl.col("s").str.split(" ").list.contains(pl.lit("a")),
        "list_contains(string_split(s, ' '), 'a')",
    )


def lo_first_last(pl, rng):
    return (
        pl.col("s").str.split(" ").list.last(),
        "string_split(s, ' ')[-1]",
    )


LIST_OPS = [lo_sort, lo_reverse, lo_len, lo_slice, lo_join, lo_contains,
            lo_first_last]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_list_ops(pl, spark, ddb, seed):
    rng = random.Random(21000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_lop", tbl)
    lf = pl.from_arrow(tbl)
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(LIST_OPS):
        e, q = tmpl(pl, rng)
        exprs[f"l{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS l{idx}_{tmpl.__name__}")
    got = lf.select(rid=pl.col("rid"), **exprs).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_lop").df()
    label = f"seed={seed} list-ops"
    assert len(got) == len(want), label
    gs = got[sorted(got.columns)]
    ws = want[sorted(want.columns)]
    g_rows = sorted((tuple(_cell(v) for v in r) for r in gs.itertuples(index=False)), key=repr)
    w_rows = sorted((tuple(_cell(v) for v in r) for r in ws.itertuples(index=False)), key=repr)
    assert g_rows == w_rows, f"{label}\n{g_rows[:3]}\nvs\n{w_rows[:3]}"


# ------------------------------------------- temporal arithmetic + struct

import datetime as _dt

TS_POOL = [
    _dt.datetime(1970, 1, 1, 0, 0, 0),
    _dt.datetime(2024, 2, 29, 12, 34, 56, 789000),  # leap day
    _dt.datetime(1999, 12, 31, 23, 59, 59),
    _dt.datetime(2001, 3, 31, 6, 7, 8),  # month-end offset corner
    _dt.datetime(1969, 7, 20, 20, 17, 0),
    None,
]


def mk_frame_ts(rng: random.Random):
    n = rng.choice([0, 1, 3, 20])
    return pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "t": pa.array([rng.choice(TS_POOL) for _ in range(n)], pa.timestamp("us")),
            "u": pa.array([rng.choice(TS_POOL) for _ in range(n)], pa.timestamp("us")),
            "i": pa.array([rng.choice([0, 1, -3, 25, None]) for _ in range(n)], pa.int64()),
            "s": pa.array([rng.choice(STR_EDGE) for _ in range(n)], pa.string()),
            "f": pa.array([rng.choice([0.0, 1.5, -2.25, None]) for _ in range(n)], pa.float64()),
        }
    )


def ts_offset_days(pl, rng):
    # day pool must not hit a value whose INTERVAL compares equal to a
    # month-pool value (DuckDB folds duplicate constants by interval
    # EQUALITY, and 30 DAYS == 1 MONTH there — to_months(1) in the same
    # query would silently reuse the to_days(30) constant)
    k = rng.choice([1, -7, 29])
    return (
        pl.col("t").dt.offset_by(f"{k}d"),
        f"t + to_days({k})",
    )


def ts_offset_hours(pl, rng):
    k = rng.choice([1, -25, 6])
    return pl.col("t").dt.offset_by(f"{k}h"), f"t + to_hours({k})"


def ts_offset_months(pl, rng):
    # calendar months saturate at month end (Mar 31 + 1mo -> Apr 30) in
    # both polars offset_by and SQL month intervals
    k = rng.choice([1, -2, 14])
    return pl.col("t").dt.offset_by(f"{k}mo"), f"t + to_months({k})"


def ts_diff_seconds(pl, rng):
    return (
        (pl.col("t") - pl.col("u")).dt.total_seconds().cast(pl.Int64),
        "CAST(trunc(date_diff('millisecond', u, t) / 1000.0) AS BIGINT)",
    )


def ts_add_duration(pl, rng):
    k = rng.choice([1, -3, 11])
    return (
        pl.col("t") + pl.duration(minutes=k),
        f"t + to_minutes({k})",
    )


def ts_weekday(pl, rng):
    # polars weekday: Monday=1..Sunday=7 == DuckDB isodow
    return pl.col("t").dt.weekday().cast(pl.Int64), "CAST(isodow(t) AS BIGINT)"


def ts_ordinal_day(pl, rng):
    return pl.col("t").dt.ordinal_day().cast(pl.Int64), "CAST(dayofyear(t) AS BIGINT)"


def ts_month_start(pl, rng):
    # polars month_start PRESERVES the time-of-day component
    return (
        pl.col("t").dt.month_start(),
        "date_trunc('month', t) + (t - date_trunc('day', t))",
    )


def ts_strftime(pl, rng):
    return (
        pl.col("t").dt.strftime("%Y-%m-%d %H:%M:%S"),
        "strftime(t, '%Y-%m-%d %H:%M:%S')",
    )


def ts_parse(pl, rng):
    # round-trip: format then strptime back
    return (
        pl.col("t").dt.strftime("%Y-%m-%dT%H:%M:%S").str.strptime(
            pl.Datetime, "%Y-%m-%dT%H:%M:%S", strict=False
        ),
        "strptime(strftime(t, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S')",
    )


TS_OPS = [
    ts_offset_days, ts_offset_hours, ts_offset_months, ts_diff_seconds,
    ts_add_duration, ts_weekday, ts_ordinal_day, ts_month_start,
    ts_strftime, ts_parse,
]


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_temporal_arithmetic(pl, spark, ddb, seed):
    rng = random.Random(17000 + seed)
    tbl = mk_frame_ts(rng)
    ddb.register("t_tsa", tbl)
    lf = pl.from_arrow(tbl)
    picks = [rng.choice(TS_OPS) for _ in range(8)]
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(picks):
        e, q = tmpl(pl, rng)
        exprs[f"t{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS t{idx}_{tmpl.__name__}")
    got = lf.select(rid=pl.col("rid"), **exprs).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_tsa").df()
    assert_frames_match(got, want, f"seed={seed} ts {[t.__name__ for t in picks]}")


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_struct_roundtrip(pl, spark, ddb, seed):
    """struct pack -> field access / rename / unnest vs DuckDB."""
    rng = random.Random(18000 + seed)
    tbl = mk_frame_ts(rng)
    ddb.register("t_str", tbl)
    lf = pl.from_arrow(tbl)
    got = (
        lf.select(
            rid=pl.col("rid"),
            st=pl.struct(a=pl.col("i"), b=pl.col("s")),
        )
        .select(
            rid=pl.col("rid"),
            a2=pl.col("st").struct.field("a"),
            b2=pl.col("st").struct.field("b"),
            renamed=pl.col("st").struct.rename_fields(["x", "y"]).struct.field("x"),
        )
        .collect()
    )
    want = ddb.execute(
        """
        SELECT rid, st.a AS a2, st.b AS b2, st.a AS renamed
        FROM (SELECT rid, {'a': i, 'b': s} AS st FROM t_str)
        """
    ).df()
    assert_frames_match(got, want, f"seed={seed} struct")


# ------------------------------------- grouped order-dependent aggregates


def ga_first(pl, rng):
    c = rng.choice(["i", "s", "ff"])
    return (
        pl.col(c).first(),
        f"first({c} ORDER BY rid)",
    )


def ga_last(pl, rng):
    c = rng.choice(["i", "s", "ff"])
    return pl.col(c).last(), f"last({c} ORDER BY rid)"


def ga_implode(pl, rng):
    # group rows in frame order; polars implode keeps nulls in place
    return pl.col("i").implode(), "list(i ORDER BY rid)"


def ga_head_list(pl, rng):
    return (
        pl.col("i").head(2).implode(),
        "(list(i ORDER BY rid))[1:2]",
    )


GROUP_ORDER = [ga_first, ga_last, ga_implode, ga_head_list]


def _cell(v):
    """Normalize a result cell for comparison: list-ish -> tuple with
    masked/NaN elements as None (Spark hands back numpy masked constants
    inside nullable int lists; DuckDB hands back NaN)."""
    if v is np.ma.masked or v is None:
        return None  # np.ma.masked IS a 0-d ndarray: check before list-ish
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_cell(x) for x in v)
    if isinstance(v, float) and np.isnan(v):
        return None
    return v


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_grouped_order_aggs(pl, spark, ddb, seed):
    """first/last/implode inside group_by follow FRAME ORDER within each
    group (the scan-order contract reaching the agg path)."""
    rng = random.Random(16000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_goa", tbl)
    lf = pl.from_arrow(tbl)
    picks = [rng.choice(GROUP_ORDER) for _ in range(4)]
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(picks):
        e, q = tmpl(pl, rng)
        exprs[f"o{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS o{idx}_{tmpl.__name__}")
    got = lf.group_by("g").agg(**exprs).collect()
    want = ddb.execute(f"SELECT g, {', '.join(sqls)} FROM t_goa GROUP BY g").df()
    label = f"seed={seed} grouped-order {[t.__name__ for t in picks]}"
    assert len(got) == len(want), label
    key = lambda rows: sorted(rows, key=lambda r: repr(r))  # noqa: E731
    g_rows = key([tuple(_cell(v) for v in r) for r in got[sorted(got.columns)].itertuples(index=False)])
    w_rows = key([tuple(_cell(v) for v in r) for r in want[sorted(want.columns)].itertuples(index=False)])
    assert g_rows == w_rows, f"{label}\n{g_rows[:3]}\nvs\n{w_rows[:3]}"


@pytest.mark.parametrize("seed", range(N_FRAMES))
def test_fuzz_horizontal(pl, spark, ddb, seed):
    rng = random.Random(15000 + seed)
    tbl = mk_frame(rng)
    ddb.register("t_hz", tbl)
    lf = pl.from_arrow(tbl)
    exprs, sqls = {}, []
    for idx, tmpl in enumerate(HORIZ):
        e, q = tmpl(pl, rng)
        exprs[f"h{idx}_{tmpl.__name__}"] = e
        sqls.append(f"{q} AS h{idx}_{tmpl.__name__}")
    got = lf.select(rid=pl.col("rid"), **exprs).collect()
    want = ddb.execute(f"SELECT rid, {', '.join(sqls)} FROM t_hz").df()
    assert_frames_match(got, want, f"seed={seed} horizontal")
