"""Silent-parameter audit: find function parameters that are accepted but
never referenced in the function body (round-10 find: this class hid real
semantic bugs — fill_null(limit), quantile(interpolation), sort nulls
placement, ewm ignore_nulls/adjust, gather null_on_oob...).

Usage: python tools/param_audit.py [--all]

Without --all, parameters documented as deliberate Spark no-ops are
suppressed (KNOWN_NOOPS below); the default output should be EMPTY — a new
row means a new parameter was added without being wired or classified.
"""

from __future__ import annotations

import ast
import pathlib
import re
import sys

IGNORE = {"self", "cls", "spark", "sf_dir", "args", "kwargs", "_compat", "kw"}

# Deliberate compat no-ops: parameters polars exposes that have no meaning
# on Spark (Catalyst always optimizes; no chunking/threading knobs; µs-only
# timestamps are documented in COVERAGE.md).  Each entry is
# (filename-suffix, function, parameter).
KNOWN_NOOPS = {
    # threading / chunking / engine knobs — Catalyst decides
    ("series.py", "value_counts", "parallel"),
    ("expr.py", "value_counts", "parallel"),
    ("series.py", "sample", "shuffle"),
    ("frame.py", "sort", "multithreaded"),
    ("frame.py", "_concat_impl", "rechunk"),
    ("frame.py", "n_chunks", "strategy"),
    ("frame.py", "map_batches", "streamable"),
    ("frame.py", "hstack", "in_place"),
    ("frame.py", "execute", "optimizations"),
    ("frame.py", "execute", "engine"),
    ("frame.py", "glimpse", "max_colname_length"),
    ("sql.py", "sql", "eager"),
    ("sql.py", "__init__", "eager"),
    ("sql.py", "execute", "eager"),
    ("expr.py", "map_batches", "agg_list"),
    ("expr.py", "map_batches", "is_elementwise"),
    ("expr.py", "to_frame", "eager"),
    ("expr.py", "to_arrow", "compat_level"),
    ("expr.py", "set_sorted", "descending"),
    ("frame.py", "sink_parquet", "maintain_order"),
    ("frame.py", "sink_parquet", "mkdir"),
    # µs-only engine (documented sub-µs truncation)
    ("namespaces.py", "to_datetime", "time_unit"),
    ("namespaces.py", "combine", "time_unit"),
    ("namespaces.py", "cast_time_unit", "time_unit"),
    ("namespaces.py", "with_time_unit", "time_unit"),
    ("functions/__init__.py", "datetime", "time_unit"),
    ("selectors.py", "duration", "time_unit"),
    # plugin FFI stub (documented compat raise)
    ("plugins.py", "register_plugin_function", None),
    # corr ddof: scale-invariant, deprecated no-op in the reference too
    ("functions/__init__.py", "corr", "ddof"),
    # ---- satisfied-by-construction: the one implementation meets BOTH
    # parameter values (array_distinct preserves first-occurrence order;
    # polars Array/List share Spark ArrayType storage per SURVEY §1.2)
    ("expr.py", "unique", "maintain_order"),
    ("namespaces.py", "unique", "maintain_order"),
    ("namespaces.py", "head", "as_array"),
    ("namespaces.py", "tail", "as_array"),
    ("namespaces.py", "slice", "as_array"),
    ("namespaces.py", "to_array", "width"),
    ("functions/__init__.py", "linear_spaces", "as_array"),
    ("namespaces.py", "to_struct", "n_field_strategy"),
    ("frame.py", "equals", "null_equal"),
    ("frame.py", "upsample", "maintain_order"),
    ("frame.py", "update", "maintain_order"),
    ("llm/text.py", "dedup_lines", "keep_order"),
    # ---- internal/structural callback signatures (Spark API or shared
    # step-function shape requires the parameter)
    ("streaming/__init__.py", "keep_first", "key_tuple"),
    ("streaming/__init__.py", "update", "key_tuple"),
    ("streaming/__init__.py", "upsert", "batch_id"),
    ("streaming/__init__.py", "handleInputRows", "timerValues"),
    ("frame.py", "_ewm_step_mean_adjust", "alpha"),
    ("frame.py", "_ewm_step_sum", "alpha"),
    ("frame.py", "_apply_having", "ctx"),
    ("api.py", "__get__", "owner"),
    ("expr.py", "fn", "ctx"),
    ("functions/__init__.py", "fn", "ctx"),
    ("functions/__init__.py", "fn_multi", "ctx"),
    ("datatype_expr.py", "res", "sd"),
    ("datatype_expr.py", "res", "ctx"),
    ("selectors.py", "pred", "t"),
    # ---- documented permissive/unsupported contracts (COVERAGE.md
    # round-10 "param audit" table): error-strictness toggles where the
    # engine is permissive, DST edge policies Spark decides itself,
    # schema-inference knobs Spark's readers own, metadata-only flags
    ("namespaces.py", "contains", "strict"),
    ("namespaces.py", "find", "strict"),
    ("namespaces.py", "decode", "strict"),
    ("namespaces.py", "get", "null_on_oob"),  # bin.get: null-pad only
    ("namespaces.py", "set_ordering", "ordering"),
    ("namespaces.py", "replace_time_zone", "ambiguous"),
    ("namespaces.py", "replace_time_zone", "non_existent"),
    ("namespaces.py", "to_datetime", "time_zone"),
    ("functions/__init__.py", "datetime", "ambiguous"),
    ("frame.py", "match_to_schema", "missing_struct_fields"),
    ("frame.py", "match_to_schema", "extra_struct_fields"),
    ("frame.py", "match_to_schema", "integer_cast"),
    ("frame.py", "match_to_schema", "float_cast"),
    ("frame.py", "pivot", "sort_columns"),
    ("frame.py", "pivot", "maintain_order"),
    ("frame.py", "pivot", "separator"),
    ("frame.py", "pivot", "column_naming"),
    ("frame.py", "remote", "context"),
    ("expr.py", "item", "allow_empty"),
    ("expr.py", "bottom_k_by", "reverse"),
    ("expr.py", "qcut", "allow_duplicates"),
    ("expr.py", "replace", "return_dtype"),
    ("expr.py", "replace_strict", "return_dtype"),
    ("expr.py", "output_name", "raise_if_undetermined"),
    ("expr.py", "pop", "schema"),
    ("expr.py", "show_graph", "schema"),
    ("expr.py", "__init__", "check_dtypes"),
    ("series.py", "to_dummies", "drop_nulls"),
    ("selectors.py", "string", "include_categorical"),
    ("selectors.py", "list", "inner"),
    ("selectors.py", "array", "inner"),
    ("sources/__init__.py", "scan_parquet", "hive_partitioning"),
    ("sources/__init__.py", "scan_parquet", "glob"),
    ("sources/__init__.py", "scan_ndjson", "infer_schema_length"),
    ("sources/__init__.py", "json_normalize", "strict"),
    ("sources/__init__.py", "json_normalize", "infer_schema_length"),
    ("sources/__init__.py", "json_normalize", "encoder"),
    ("sources/__init__.py", "union", "strict"),
    ("sources/__init__.py", "__init__", None),
    ("io_plugins.py", "__init__", "options"),
    ("testing.py", "assert_frame_equal", "categorical_as_str"),
    ("testing.py", "assert_series_equal", "categorical_as_str"),
    ("multimodal.py", "decode_image", None),
    ("multimodal.py", "image_ahash", "id_cols"),
    ("llm/text.py", "corpus_report", "id_col"),
}


def audit(show_all: bool = False) -> list[str]:
    hits = []
    for p in pathlib.Path("polars_spark").rglob("*.py"):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            body_src = ast.unparse(ast.Module(body=node.body, type_ignores=[]))
            params = [a.arg for a in node.args.args + node.args.kwonlyargs]
            for prm in params:
                if prm in IGNORE or prm.startswith("_"):
                    continue
                if not re.search(rf"\b{re.escape(prm)}\b", body_src):
                    if not show_all:
                        suppressed = any(
                            str(p).endswith(f) and fn == node.name and (pp is None or pp == prm)
                            for f, fn, pp in KNOWN_NOOPS
                        )
                        if suppressed:
                            continue
                    hits.append(f"{p}:{node.lineno} {node.name}({prm})")
    return hits


if __name__ == "__main__":
    rows = audit(show_all="--all" in sys.argv)
    for h in rows:
        print(h)
    print(f"{len(rows)} unwired parameter(s)")
    sys.exit(0)
