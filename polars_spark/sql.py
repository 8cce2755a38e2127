"""SQLContext: the polars SQL front-end re-expressed as Spark SQL.

Reference: polars-sql/src/context.rs:245 (execute), python
py-polars/src/polars/sql/context.py:91.  polars parses SQL into the same
logical plan its DataFrame API builds — exactly what ``spark.sql`` does over
Catalyst, so the entire §2.9 surface (SELECT/joins/CTEs/UNION/INTERSECT/
EXCEPT/subqueries/window fns) is inherited; this class only provides the
frame-registration API.

Documented dialect divergence (pinned in tests/test_round9_sql_dialect.py):
polars-sql lowers ``/`` to true_div (sql_expr.rs:660 — IEEE Float64, x/0 ->
±inf), while raw SQL here keeps Spark's ANSI division (zero divisor ERRORS).
Bridging would require re-parsing every statement's expression tree; the
engine's DataFrame API (`pl.col(...) / ...`) carries the polars IEEE rule,
so polars-faithful division is one `.select()` away — in SQL text, write
``try_divide`` / ``nullif`` explicitly.  The fuzz families (§ test_property
_fuzz3) stay inside the agreeing ANSI subset.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from polars_spark.plans.frame import LazyFrame

__all__ = ["SQLContext", "sql"]

# polars SQL table functions (polars-sql/src/table_functions.rs): scan a
# file directly in a FROM clause.  Spark SQL has no read_csv()-style table
# functions, so each call site is rewritten to a registered temp view
# backed by the matching polars_spark scan (pushdown intact — the view IS
# the native scan).
_TABLE_FN = re.compile(
    r"\b(read_csv|read_parquet|read_ndjson|read_json|read_ipc)\s*\(\s*'([^']+)'\s*\)",
    re.IGNORECASE,
)


_PG_TYPES = {
    "float4": "float", "float8": "double", "int2": "smallint",
    "int4": "int", "int8": "bigint",
}


def _polars_dialect(query: str) -> str:
    """polars-sql dialect forms Spark SQL rejects (polars-sql/src/sql_expr.rs):
    trailing commas in SELECT lists, Postgres type aliases after ``::``,
    and double-quoted identifiers (Spark defaults "..." to string literals)."""
    query = re.sub(r",\s*(FROM\b)", r" \1", query, flags=re.IGNORECASE)
    query = re.sub(
        r"::\s*(float4|float8|int2|int4|int8)\b",
        lambda m: "::" + _PG_TYPES[m.group(1).lower()],
        query,
        flags=re.IGNORECASE,
    )
    # polars-sql is ANSI: "..." is ALWAYS an identifier (strings are
    # single-quoted), so every double-quoted segment maps to backticks
    query = re.sub(r'"([^"]+)"', r"`\1`", query)
    # polars-SQL integer division `//` -> Spark DIV, outside string
    # literals AND backtick-quoted identifiers ('http://...' and a column
    # named `a//b` must both survive).  Spark DIV truncates toward zero
    # where polars floors — they agree on non-negative operands (the
    # SQL-dialect contract here); mixed-sign floor division needs
    # FLOOR(a / b) written explicitly.
    out, i, in_sq, in_bt = [], 0, False, False
    while i < len(query):
        ch = query[i]
        if ch == "'" and not in_bt:
            in_sq = not in_sq
        elif ch == "`" and not in_sq:
            in_bt = not in_bt
        if not in_sq and not in_bt and query.startswith("//", i):
            out.append(" DIV ")
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _rewrite_table_functions(spark: SparkSession, query: str) -> str:
    query = _polars_dialect(query)
    from polars_spark import sources

    scans = {
        "read_csv": sources.scan_csv,
        "read_parquet": sources.scan_parquet,
        "read_ndjson": sources.scan_ndjson,
        "read_json": sources.read_json,
        "read_ipc": sources.scan_ipc,
    }

    def repl(m: re.Match) -> str:
        fn, path = m.group(1).lower(), m.group(2)
        view = "tf_" + re.sub(r"[^A-Za-z0-9]", "_", f"{fn}_{path}")
        scans[fn](path, spark=spark).to_spark().createOrReplaceTempView(view)
        return view

    return _TABLE_FN.sub(repl, query)


class SQLContext:
    def __init__(self, frames: dict[str, LazyFrame] | None = None, *, eager: bool = False, register_globals: bool = False, **named):
        self._spark = SparkSession.getActiveSession()
        if self._spark is not None:
            from polars_spark.session import ensure_engine_confs

            ensure_engine_confs(self._spark)
        if self._spark is None:
            from polars_spark.session import get_spark

            self._spark = get_spark()
        self._tables: list[str] = []
        if register_globals:
            # reference SQLContext(register_globals=True): every frame-like
            # object in the CALLER's scope becomes a view
            import inspect

            caller = inspect.currentframe().f_back
            if caller is not None:
                for scope in (caller.f_locals, caller.f_globals):
                    for nm, obj in scope.items():
                        if nm.startswith("_") or nm in self._tables:
                            continue
                        lf = _as_frame(obj)
                        if lf is not None:
                            self.register(nm, lf)
        for name, lf in {**(frames or {}), **named}.items():
            self.register(name, lf)

    def __enter__(self) -> "SQLContext":
        return self

    def __exit__(self, *exc) -> None:
        self.unregister(list(self._tables))

    def register(self, name: str, frame: LazyFrame) -> "SQLContext":
        df = frame.to_spark() if isinstance(frame, LazyFrame) else frame
        df.createOrReplaceTempView(name)
        if name not in self._tables:
            self._tables.append(name)
        return self

    def register_many(self, frames: dict[str, LazyFrame] | None = None, **named) -> "SQLContext":
        for name, lf in {**(frames or {}), **named}.items():
            self.register(name, lf)
        return self

    def unregister(self, names: str | list[str]) -> "SQLContext":
        for n in [names] if isinstance(names, str) else names:
            self._spark.catalog.dropTempView(n)
            if n in self._tables:
                self._tables.remove(n)
        return self

    def tables(self) -> list[str]:
        return sorted(self._tables)

    _DELETE = re.compile(
        r"^\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _TRUNCATE = re.compile(
        r"^\s*TRUNCATE\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$",
        re.IGNORECASE,
    )

    def execute(self, query: str, *, eager: bool = False) -> LazyFrame:
        # polars-sql statements Spark SQL lacks on temp views: DELETE
        # (context.rs:785) and TRUNCATE (context.rs:842) — both are
        # re-registrations of a filtered plan (polars' own semantics: the
        # registered frame is replaced, nothing is written anywhere)
        m = self._DELETE.match(query)
        if m:
            name, cond = m.group(1), m.group(2)
            df = self._spark.table(name)
            from pyspark.sql import functions as F

            new = df.filter(~F.expr(cond)) if cond else df.limit(0)
            self.register(name, LazyFrame(new))
            return LazyFrame(new)
        m = self._TRUNCATE.match(query)
        if m:
            name = m.group(1)
            new = self._spark.table(name).limit(0)
            self.register(name, LazyFrame(new))
            return LazyFrame(new)
        return LazyFrame(self._spark.sql(_rewrite_table_functions(self._spark, query)))


def sql(query: str, *, eager: bool = False) -> LazyFrame:
    """pl.sql(...) — run SQL against frames in the CALLER'S scope (reference
    sql/functions.py:21 execute_global): any LazyFrame / Series / pandas /
    pyarrow object whose variable name appears in the query is registered as
    a view, so ``pl.sql("SELECT * FROM my_frame")`` just works.  Explicitly
    registered temp views keep working too (scope wins on collision)."""
    import inspect
    import re

    spark = SparkSession.getActiveSession()
    if spark is None:
        from polars_spark.session import get_spark

        spark = get_spark()

    idents = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", query))
    caller = inspect.currentframe().f_back
    seen: dict = {}
    if caller is not None:
        for scope in (caller.f_locals, caller.f_globals):
            for name, obj in scope.items():
                if name in idents and name not in seen:
                    lf = _as_frame(obj)
                    if lf is not None:
                        seen[name] = lf
    for name, lf in seen.items():
        lf.to_spark().createOrReplaceTempView(name)
    return LazyFrame(spark.sql(_rewrite_table_functions(spark, query)))


def _as_frame(obj):
    """Convert a scope object to a LazyFrame if it is frame-like (our
    LazyFrame/Series, pandas DataFrame/Series, pyarrow Table); else None."""
    if isinstance(obj, LazyFrame):
        return obj
    try:
        from polars_spark.series import Series

        if isinstance(obj, Series):
            return obj.to_frame()
    except ImportError:
        pass
    try:
        import pandas as pd

        if isinstance(obj, pd.DataFrame):
            from polars_spark.sources import from_pandas

            return from_pandas(obj)
        if isinstance(obj, pd.Series):
            from polars_spark.sources import from_pandas

            return from_pandas(obj.to_frame())
    except ImportError:
        pass
    try:
        import pyarrow as pa

        if isinstance(obj, (pa.Table, pa.RecordBatch)):
            from polars_spark.sources import from_arrow

            return from_arrow(obj)
    except ImportError:
        pass
    return None
