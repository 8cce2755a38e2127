"""Query registry: every operator claimed in SURVEY.md §2 gets one entry.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` registered under a
stable name, plus (where SQL-expressible) a DuckDB oracle SQL string over the
same parquet tables.  The driver hash-compares both sides at sf=0.01; column
names must match exactly (alias everything on both sides).

Float discipline: aggregates over doubles are rounded to a fixed number of
decimals on BOTH sides so that summation-order differences between engines
(Spark partial aggregation vs DuckDB) cannot flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = " ".join(oracle.split())
        return fn

    return deco


def fround(col, n: int = 4):
    """Tie-stable rounding for cross-engine float compares.

    ``round()`` disagrees between engines on exact .5 ties (Spark HALF_UPs
    the shortest decimal repr, DuckDB rounds the binary value).  floor(x*10^n
    + 0.5)/10^n is pure IEEE arithmetic — identical inputs give identical
    outputs on both engines.  Oracle-side equivalent:
    ``floor(x * 10^n + 0.5) / 10^n``.
    """
    from pyspark.sql import functions as F

    p = float(10**n)
    return F.floor(col * p + 0.5) / p


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from polars_spark.sources import scan_parquet
    from polars_spark.session import ensure_time_type

    ensure_time_type(spark)  # registry queries run on the CALLER's session
    return scan_parquet(f"{sf_dir}/{name}.parquet", spark=spark).to_spark()


def ltable(spark: SparkSession, sf_dir: str, name: str):
    """Same as ``table`` but returns the LazyFrame (polars-style API)."""
    from polars_spark.sources import scan_parquet
    from polars_spark.session import ensure_time_type

    ensure_time_type(spark)  # registry queries run on the CALLER's session
    return scan_parquet(f"{sf_dir}/{name}.parquet", spark=spark)


# Import side-effect: populate the registry.  Keep this list at the bottom.
from polars_spark.queries import (  # noqa: E402,F401
    tpch,
    tpch_full,
    order_contract,
    relational,
    joins,
    window,
    temporal,
    scalar_funcs,
    text,
    dedup,
    similarity,
    io_sql,
    parity,
    h2oai,
    web,
    streaming_gate,
)
