"""API-parity diff vs the reference py-polars source (name level).

AST-parses the PUBLIC surface out of the reference's .py files (classes
can't be imported — the compiled core isn't present) and diffs each
against the engine's live classes/modules.  This makes the parity numbers
the VERDICT reports reproducible on demand:

    python tools/api_parity.py            # summary table
    python tools/api_parity.py -v         # + the missing names per surface

Name-level parity only (presence, not signatures); the correctness gates
and the doctest harvest cover behavior.
"""

from __future__ import annotations

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/py-polars/src/polars"

# (label, reference file, reference class, ours-getter)
SURFACES = [
    # instances, not classes: parts of the eager/Series surface resolve
    # dynamically, and pl.DataFrame is a factory returning the (unified)
    # frame class
    ("Expr", "expr/expr.py", "Expr", lambda pl: pl.Expr),
    ("LazyFrame", "lazyframe/frame.py", "LazyFrame", lambda pl: pl.LazyFrame),
    ("DataFrame", "dataframe/frame.py", "DataFrame", lambda pl: pl.DataFrame({"x": [1]})),
    ("Series", "series/series.py", "Series", lambda pl: pl.Series("x", [1])),
    ("Expr.str", "expr/string.py", "ExprStringNameSpace", lambda pl: pl.col("x").str),
    ("Expr.dt", "expr/datetime.py", "ExprDateTimeNameSpace", lambda pl: pl.col("x").dt),
    ("Expr.list", "expr/list.py", "ExprListNameSpace", lambda pl: pl.col("x").list),
    ("Expr.arr", "expr/array.py", "ExprArrayNameSpace", lambda pl: pl.col("x").arr),
    ("Expr.struct", "expr/struct.py", "ExprStructNameSpace", lambda pl: pl.col("x").struct),
    ("Expr.bin", "expr/binary.py", "ExprBinaryNameSpace", lambda pl: pl.col("x").bin),
    ("Expr.cat", "expr/categorical.py", "ExprCatNameSpace", lambda pl: pl.col("x").cat),
    ("Expr.name", "expr/name.py", "ExprNameNameSpace", lambda pl: pl.col("x").name),
    ("Expr.meta", "expr/meta.py", "ExprMetaNameSpace", lambda pl: pl.col("x").meta),
]


def ref_class_methods(path: str, cls: str) -> set[str]:
    tree = ast.parse(open(os.path.join(REF, path)).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == cls:
            return {
                n.name
                for n in node.body
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                and not n.name.startswith("_")
            }
    return set()


def ref_module_all() -> set[str]:
    """The reference's top-level __all__ (polars/__init__.py)."""
    tree = ast.parse(open(os.path.join(REF, "__init__.py")).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    return {
                        e.value
                        for e in node.value.elts
                        if isinstance(e, ast.Constant) and isinstance(e.value, str)
                    }
    return set()


def main() -> int:
    verbose = "-v" in sys.argv
    import polars_spark as pl

    total_ref = total_have = 0
    print(f"{'surface':12s} {'ours/ref':>9s}  missing")
    rows = []
    for label, path, cls, get in SURFACES:
        ref = ref_class_methods(path, cls)
        if not ref:
            rows.append((label, 0, 0, {"<class not found in reference>"}))
            continue
        ours = get(pl)
        def _has(o, n: str) -> bool:
            # properties may legitimately raise on access (env-gated .plot
            # without altair — reference behaves the same); presence on the
            # class still counts as surface parity
            if hasattr(type(o), n):
                return True
            try:
                return hasattr(o, n)
            except Exception:
                return True  # raised = exists (env-gated)

        have = {n for n in ref if _has(ours, n)}
        missing = ref - have
        total_ref += len(ref)
        total_have += len(have)
        rows.append((label, len(have), len(ref), missing))
    top_ref = ref_module_all()
    top_have = {n for n in top_ref if hasattr(pl, n)}
    rows.append(("pl.*", len(top_have), len(top_ref), top_ref - top_have))
    total_ref += len(top_ref)
    total_have += len(top_have)

    worst = []
    for label, h, r, missing in rows:
        print(f"{label:12s} {h:4d}/{r:<4d}  {len(missing)} missing")
        if missing and verbose:
            for m in sorted(missing):
                print(f"    - {m}")
        if missing:
            worst.extend((label, m) for m in sorted(missing))
    print(f"\nTOTAL {total_have}/{total_ref} = {100.0 * total_have / total_ref:.1f}%")
    if worst and not verbose:
        print("(-v lists the missing names)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
