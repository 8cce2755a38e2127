"""Vanilla-session conformance sweep (VERDICT r6 item 2).

The driver runs registry queries on ITS OWN SparkSession — a bare
``SparkSession.builder.getOrCreate()`` with none of get_spark's configs
(no UTC timeZone, no caseSensitive, no timeType, no Arrow).  Round 6's
tmp_time_of_day went red exactly because the engine assumed builder-time
config.  This sweep reproduces that environment deliberately hostile:

- a BARE builder (only master + a non-UTC JVM default timezone via
  ``user.timezone=America/New_York``) so any conf dependence the engine
  fails to runtime-set shows up as a FAIL or a silent value shift
- every ``queries()`` entry compared against its DuckDB oracle, exactly
  like tools/check.py

Run:  python tools/vanilla_session.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

# MUST be set before the JVM starts: a hostile non-UTC default so that a
# query relying on builder-time session.timeZone=UTC produces a visibly
# shifted timestamp instead of silently passing on a UTC box
os.environ.setdefault(
    "SPARK_SUBMIT_OPTS", "-Duser.timezone=America/New_York"
)
os.environ["TZ"] = "America/New_York"
try:
    time.tzset()
except AttributeError:
    pass

import duckdb  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")

from tools.check import TABLES, compare, dtype_problems  # noqa: E402


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from pyspark.sql import SparkSession

    # the driver's environment: nothing but a master. NOT get_spark().
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("vanilla")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    print("session.timeZone at build:", spark.conf.get("spark.sql.session.timeZone"))

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_ok = n_bad = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
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
        problems = compare(name, sdf, opdf) + dtype_problems(sdf, opdf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"ok    {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            n_ok += 1
    print(f"\nVANILLA SWEEP: {n_ok} ok, {n_weak} weak (rows-only), {n_bad} FAIL")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
