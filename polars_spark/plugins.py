"""Expression-plugin surface (reference py-polars/src/polars/plugins.py).

polars expr plugins are NATIVE shared libraries (Rust cdylibs loaded into
the polars runtime).  A Spark driver cannot dlopen a polars plugin into
Catalyst; the Spark-native equivalents are

* a PYTHON function over Arrow batches -> ``Expr.map_batches`` /
  ``LazyFrame.map_batches`` (Arrow-vectorized, executor-side), or
* a JVM catalyst expression packaged as a Spark extension jar
  (``spark.sql.extensions``), or
* ``spark.udf.registerJavaFunction`` for a JVM scalar UDF.

``register_plugin_function`` therefore raises with this mapping unless the
caller provides ``_python_function``, in which case it builds the
map_batches-backed expression directly (the useful escape hatch for code
that wrapped its plugin in a pure-Python fallback).
"""

from __future__ import annotations


def register_plugin_function(
    *,
    plugin_path=None,
    function_name: str = "",
    args=None,
    kwargs=None,
    is_elementwise: bool = False,
    changes_length: bool = False,
    returns_scalar: bool = False,
    cast_to_supertype: bool = False,
    input_wildcard_expansion: bool = False,
    pass_name_to_apply: bool = False,
    use_abs_path: bool = False,
    _python_function=None,
):
    """Register a plugin function (see module docstring for the mapping)."""
    if _python_function is not None:
        from polars_spark.plans.expr import _to_expr

        first = args[0] if isinstance(args, (list, tuple)) else args
        return _to_expr(first).map_batches(_python_function)
    msg = (
        f"register_plugin_function({function_name!r}): polars expr plugins are "
        "native Rust cdylibs and cannot load into Catalyst.  Port the kernel to "
        "(a) Expr.map_batches (Arrow-vectorized Python), (b) a Catalyst "
        "expression jar via spark.sql.extensions, or (c) "
        "spark.udf.registerJavaFunction."
    )
    raise NotImplementedError(msg)
