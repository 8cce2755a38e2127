"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB (same parquet tables registered as views), then compares:
row count, column-name set, and order-insensitive values (rows sorted by
all columns, columns sorted by name).  Floats compare exactly AND with
rtol=1e-9 so we can see whether a mismatch is real or float noise.

Usage: python tools/check.py [--strict] [--empty|--single|--allnull]
       [--sample N] [sf_dir] [query ...]

``--empty`` runs every query against ZERO-ROW copies of the tables
(schemas taken from sf_dir) — the aggregate-identity divergence sweep.
``--single`` uses ONE-ROW copies (first row of each table): targets the
ddof / single-point-interpolation / size-1-window identity class.
``--allnull`` uses 3-row ALL-NULL copies of every column: targets the
null-propagation identity class (null-only aggregates, null keys).
``--dupes`` uses every table TRIPLED (3 identical copies of each row):
targets distinct/keep-first/keep-last tie rules and join fan-out.
EXPLORATORY ONLY (not part of preflight): tripling violates the primary-
key invariants many gate pairs assume, so a FAIL here usually means the
polars formulation and its SQL oracle legitimately diverge under
duplicate keys (e.g. a .unique() step vs a correlated-min subquery), not
an engine bug.  The aggregate/window families still verify exactly.

``--strict`` additionally flags int-vs-float dtype mismatches between the
Spark and DuckDB results even when the VALUES are identical — the driver's
value hash is representation-sensitive (DuckDB sum(int) -> HUGEINT ->
pandas float64 vs Spark int64 tripped q12 in round 5), so a strict pass
is the only local signal that predicts a green driver row.

``--sample N`` replicates the driver's pick: the first N entries of
``queries()`` in declaration order (verified against CORRECTNESS_r05.json:
the driver's 50 sampled rows are exactly ``list(queries())[:50]``).
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# --empty mode: documented engine-vs-oracle divergences that only exist at
# zero rows, where the ORACLE cannot express the engine/polars semantics.
EMPTY_PINNED = {
    # polars pivot discovers value columns FROM THE DATA (none on an empty
    # frame); the static oracle SQL must hardcode them
    "rel_pivot": "pivot value columns are data-driven; zero rows -> index col only (matches polars)",
    "rel_unstack": "unstack value columns are data-driven; zero rows -> first col only (matches polars)",
    # Spark GROUP BY CUBE emits NO grand-total row over empty input;
    # DuckDB (SQL standard) emits one — engine is Spark-native here
    "agg_cube": "Spark cube yields 0 rows on empty input; DuckDB emits the grand-total grouping set",
    # a hive-partitioned write of zero rows produces no data files, so the
    # round-trip scan has no schema to read (polars' hive write ditto)
    "io_parquet_partitioned": "partitioned write of 0 rows leaves no files; schema cannot round-trip",
}

# --single mode pins (1-row tables) — discovered by the round-9 sweep
SINGLE_PINNED: dict[str, str] = {
    "rel_pivot": "pivot value columns are data-driven; 1 row exposes only its own status (oracle hardcodes F/O/P)",
    "rel_unstack": "unstack column count is data-driven; 1 source row -> 1 column (oracle hardcodes 5)",
    "scale_zorder_events": "z-order bucket normalization is degenerate at min==max (0/0 range); engine maps the single point to bucket 0, the oracle's closed-form to 255 — both are arbitrary placements of one point",
}

# --dupes mode pins (every row tripled) — round-9 sweep.  All are
# formulation-equivalence breaks under duplicated PRIMARY KEYS (see the
# --dupes docstring), grouped by class; 227 gates verify exactly.
_DUPES_ID_REASSOC = (
    "oracle re-associates rows by a now-triplicated id; the polars pipeline "
    "and the SQL formulation legitimately count different multiplicities"
)
_DUPES_DEDUP = (
    "duplicate doc/vec ids change dedup/similarity semantics by construction "
    "(three copies of every document ARE near-duplicates)"
)
DUPES_PINNED: dict[str, str] = {
    "q2_min_cost_supplier": "correlated-min subquery multiplies over duplicated supplier keys; the pipeline's semi-join collapses them",
    "q17_small_quantity_revenue": "avg-per-part subquery multiplicity changes under duplicated part keys",
    "rel_unstack": "unstack column count is data-length-driven (3x rows -> 3x columns)",
    "win_ewm_dual_keys": _DUPES_ID_REASSOC,
    "win_ewm_nan_poison": _DUPES_ID_REASSOC,
    "tmp_rolling_30m": _DUPES_ID_REASSOC,
    "txt_contamination": _DUPES_DEDUP,
    "txt_token_df_idf": "document frequency is per-doc-id; triplicated ids triple df on one side only",
    "txt_gopher_quality": _DUPES_ID_REASSOC,
    "txt_eval_em_f1": _DUPES_ID_REASSOC,
    "dedup_ngram_jaccard": _DUPES_DEDUP,
    "dedup_minhash_lsh": _DUPES_DEDUP,
    "dedup_incremental_index": _DUPES_DEDUP,
    "sim_ivf_topk": _DUPES_DEDUP,
    "mm_resize": _DUPES_ID_REASSOC,
    "mm_audio_features": _DUPES_ID_REASSOC,
    "dedup_semdedup": _DUPES_DEDUP,
    "mm_image_ahash_pairs": _DUPES_DEDUP,
    "dedup_fuzzy_names": "engine pairs DISTINCT string values (vocabulary dedup); the row-level oracle multiplies every pair 9x under tripled rows",
    # round-10 sweep additions — all reproduce identically at the round-9
    # commit (verified via git worktree), i.e. pre-existing formulation
    # divergences surfaced by the full re-run, not engine regressions:
    "q21_suppliers_kept_waiting": "EXISTS/NOT-EXISTS subqueries re-associate by triplicated l_orderkey (oracle 9x per original pair); the pipeline's semi/anti joins collapse them",
    "q11_important_stock": "correlated total-value scalar multiplies 9x under triplicated partsupp keys on the oracle side",
    "q20_potential_promotion": "IN/EXISTS subquery multiplicity under triplicated supplier keys",
    "join_asof_nearest": "oracle joins backward+forward candidate tables USING(event_id); a triplicated event_id cross-multiplies 3x3x3=27 per original row — pure oracle-formulation artifact",
    "stream_minhash_suppress": _DUPES_DEDUP,
}

# --allnull mode pins (3 rows, every column null) — round-9 sweep
ALLNULL_PINNED: dict[str, str] = {
    "rel_pivot": "pivot value columns are data-driven; all-null status yields a 'null' column the static oracle cannot name",
    "rel_unstack": "unstack column count is data-driven on distinct values; all-null input yields 1 column vs the oracle's 5",
    "win_ewm_dual_keys": "the recursive-CTE oracle re-associates rows by event_id; all-null ids make the join degenerate (null never equals null) — the engine's null-key group is not SQL-addressable",
    "win_ewm_std": "same event_id re-association limit as win_ewm_dual_keys",
    "win_ewm_mean": "same event_id re-association limit as win_ewm_dual_keys",
    "win_ewm_null_decay": "recursive-CTE chain joins on user_id; all-null keys break the rn chain after row 1 (same re-association limit as win_ewm_dual_keys)",
}


_NAN = "__nan__"  # sentinel: a REAL NaN inside a list (distinct from null)


def _fix_el(x):
    # inside lists: null -> None, real NaN -> the _NAN sentinel.  The two
    # must NOT collapse (ADVICE r9): an engine regression producing null
    # where polars yields NaN has to fail the sweep.  Fidelity sources:
    # DuckDB .df() masks nulls (np.ma.masked) and keeps NaN as nan; the
    # Spark side swaps in toArrow()-sourced values for float-list columns
    # (toPandas renders BOTH as nan — see main loop).
    if x is None or x is np.ma.masked:
        return None
    if isinstance(x, (float, np.floating)) and np.isnan(x):
        return _NAN
    return x


def _fix_obj(v):
    # DuckDB .df() renders nulls inside/as arrays with numpy masked values
    if v is np.ma.masked:
        return None
    if isinstance(v, np.ma.MaskedArray):
        return tuple(_fix_el(x) for x in v.tolist())  # masked entries -> None
    if isinstance(v, (list, np.ndarray)):
        return tuple(_fix_el(x) for x in v)  # lists/arrays -> tuples
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_fix_obj)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


def _has_decimal_objects(col: pd.Series) -> bool:
    import decimal

    if col.dtype != object:
        return False
    nn = col.dropna()
    return len(nn) > 0 and isinstance(nn.iloc[0], decimal.Decimal)


def dtype_problems(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Representation mismatches that trip the driver's value hash even when
    values compare equal: int-vs-float (q12, round 5) and Decimal-object-vs-
    float64 (sf_decimal_exact / rel_match_schema, round 9 — Spark toPandas
    keeps DecimalType as decimal.Decimal objects, DuckDB .df() widens
    DECIMAL to float64).  A gate must not emit DecimalType in its FINAL
    schema; render as VARCHAR on both sides instead."""
    out = []
    for c in sorted(set(spark_pdf.columns) & set(oracle_pdf.columns)):
        sk = spark_pdf[c].dtype.kind
        ok = oracle_pdf[c].dtype.kind
        # pandas renders an all-null int column as object/float too; only flag
        # the unambiguous numeric-representation split.
        if {sk, ok} == {"i", "f"} or {sk, ok} == {"u", "f"}:
            out.append(f"DTYPE col={c} spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}")
        sd, od = _has_decimal_objects(spark_pdf[c]), _has_decimal_objects(oracle_pdf[c])
        if sd != od:
            out.append(
                f"DTYPE col={c} Decimal objects on "
                f"{'spark' if sd else 'oracle'} side only (driver hash-diverges; "
                "render final decimals as VARCHAR on both sides)"
            )
    return out


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
    if problems:
        return problems
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv2 = pd.to_numeric(sv, errors="coerce").to_numpy(dtype=float)
            ov2 = pd.to_numeric(ov, errors="coerce").to_numpy(dtype=float)
            exact = np.array_equal(sv2, ov2, equal_nan=True)
            close = np.allclose(sv2, ov2, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not exact:
                tag = "FLOAT-NOISE" if close else "VALUE"
                bad = np.nonzero(~(np.isclose(sv2, ov2, rtol=0, atol=0) | (np.isnan(sv2) & np.isnan(ov2))))[0][:3]
                problems.append(f"{tag} col={c} first_diffs={[(sv2[i], ov2[i]) for i in bad]}")
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                i = int(np.nonzero(~eq.to_numpy())[0][0])
                problems.append(f"VALUE col={c} row{i}: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}")
    return problems


def main() -> int:
    argv = sys.argv[1:]
    strict = "--strict" in argv
    if strict:
        argv.remove("--strict")
    empty = "--empty" in argv
    if empty:
        argv.remove("--empty")
    single = "--single" in argv
    if single:
        argv.remove("--single")
    allnull = "--allnull" in argv
    if allnull:
        argv.remove("--allnull")
    dupes = "--dupes" in argv
    if dupes:
        argv.remove("--dupes")
    sample_n = None
    if "--sample" in argv:
        i = argv.index("--sample")
        sample_n = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    mode = (
        "empty" if empty else "single" if single else "allnull" if allnull
        else "dupes" if dupes else None
    )
    pinned = {
        "empty": EMPTY_PINNED,
        "single": SINGLE_PINNED,
        "allnull": ALLNULL_PINNED,
        "dupes": DUPES_PINNED,
    }.get(mode, {})
    if mode:
        # degenerate-table sweeps: zero-row (aggregate fold identities),
        # one-row (ddof / single-point interpolation / size-1 windows),
        # all-null (null-propagation identities).  SQL engines and dataframe
        # engines habitually diverge exactly on these shapes.
        import os
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        # mkdtemp, not a pid-derived name: a recycled pid (or any stale /tmp
        # state) must never let one mode's staged tables serve another run
        edir = tempfile.mkdtemp(prefix=f"sparkgraft_{mode}_")
        for t in TABLES:
            if empty:
                out = pq.read_schema(f"{sf_dir}/{t}.parquet").empty_table()
            elif single:
                out = pq.read_table(f"{sf_dir}/{t}.parquet").slice(0, 1)
            elif dupes:
                src_t = pq.read_table(f"{sf_dir}/{t}.parquet")
                out = pa.concat_tables([src_t, src_t, src_t])
            else:
                sch = pq.read_schema(f"{sf_dir}/{t}.parquet")
                out = pa.table(
                    {f.name: pa.nulls(3, type=f.type) for f in sch}, schema=sch
                )
            pq.write_table(out, f"{edir}/{t}.parquet")
        print(f"{mode}-table sweep: schemas from {sf_dir}, tables in {edir}")
        sf_dir = edir
    only = set(argv[1:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from polars_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if sample_n is not None:
        qs = dict(list(qs.items())[:sample_n])
    n_ok = n_bad = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in pinned:
            print(f"pin   {name}: {pinned[name]}")
            n_weak += 1
            continue
        t0 = time.time()
        try:
            sdf_raw = fn(spark, sf_dir)
            sdf = sdf_raw.toPandas()
            # toPandas flattens null elements inside lists to nan (and, for
            # float lists, conflates them with real NaN); re-source EVERY
            # array column from Arrow (None vs nan preserved, ints stay
            # ints) so _fix_el can keep null and NaN distinct in the compare
            from pyspark.sql import types as _T

            flc = [
                f.name
                for f in sdf_raw.schema.fields
                if isinstance(f.dataType, _T.ArrayType)
            ]
            if flc:
                at = sdf_raw.toArrow()
                for c in flc:
                    sdf[c] = pd.Series(at.column(c).to_pylist(), dtype=object)
        except Exception:
            print(f"FAIL  {name}: spark query raised\n{traceback.format_exc()}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: oracle raised {exc}")
            n_bad += 1
            continue
        problems = compare(name, sdf, opdf)
        if strict:
            problems += dtype_problems(sdf, opdf)
            # round-11 ratchet: replay the DRIVER's canon (sort+hash over
            # scalar cells).  The local gate must never be more permissive
            # than the driver's — Decimal (r9) and ndarray (r10) finals
            # both shipped green locally and red at the driver.
            from driver_canon import canon_problems

            problems += canon_problems(sdf_raw.schema, sdf, opdf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"ok    {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_weak} weak (rows-only), {n_bad} FAIL")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
