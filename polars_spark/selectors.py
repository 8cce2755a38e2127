"""Column selectors (polars ``cs.*`` — py-polars/src/polars/selectors.py,
rust polars-plan/src/dsl/selector.rs).

Selectors are pure front-end: they resolve against the frame schema before
any plan is built, so Catalyst sees only concrete column references.

    import polars_spark.selectors as cs
    lf.select(cs.numeric())                      # all numeric columns
    lf.select(cs.starts_with("l_") - cs.float_())  # set algebra
"""

from __future__ import annotations

import re as _re

from polars_spark.plans.expr import Expr

__all__ = [
    "all",
    "numeric",
    "integer",
    "float_",
    "string",
    "temporal",
    "boolean",
    "by_name",
    "by_dtype",
    "starts_with",
    "ends_with",
    "contains",
    "matches",
]

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"} | {
    f"decimal({p},{s})" for p in range(1, 39) for s in (0, 2)
}
_INTEGER = {"tinyint", "smallint", "int", "bigint"}
_FLOAT = {"float", "double"}
_TEMPORAL = {"date", "timestamp", "timestamp_ntz", "interval day to second"}


class Selector(Expr):
    """An Expr that expands to every matching column at resolution time.
    Supports polars selector set algebra: ``|`` union, ``&`` intersection,
    ``-`` difference, ``~`` complement."""

    def __init__(self, predicate, label: str):
        super().__init__(lambda ctx: (_ for _ in ()).throw(RuntimeError("unexpanded selector")), label)
        self._selector = predicate

    def __or__(self, other):
        return Selector(lambda n, t: self._selector(n, t) or other._selector(n, t), "or")

    def __and__(self, other):
        return Selector(lambda n, t: self._selector(n, t) and other._selector(n, t), "and")

    def __sub__(self, other):
        return Selector(lambda n, t: self._selector(n, t) and not other._selector(n, t), "sub")

    def __invert__(self):
        return Selector(lambda n, t: not self._selector(n, t), "not")


def all() -> Selector:  # noqa: A001 - polars name
    return Selector(lambda n, t: True, "all")


def numeric() -> Selector:
    return Selector(lambda n, t: t in _NUMERIC or t.startswith("decimal"), "numeric")


def integer() -> Selector:
    return Selector(lambda n, t: t in _INTEGER, "integer")


def float_() -> Selector:
    return Selector(lambda n, t: t in _FLOAT, "float")


def string() -> Selector:
    return Selector(lambda n, t: t == "string", "string")


def boolean() -> Selector:
    return Selector(lambda n, t: t == "boolean", "boolean")


def temporal() -> Selector:
    return Selector(lambda n, t: t in _TEMPORAL or t.startswith("timestamp"), "temporal")


def by_name(*names: str) -> Selector:
    ns = set(names)
    return Selector(lambda n, t: n in ns, "by_name")


def by_dtype(*dtypes: str) -> Selector:
    ds = {d.lower() for d in dtypes}
    return Selector(lambda n, t: t in ds, "by_dtype")


def starts_with(*prefixes: str) -> Selector:
    return Selector(lambda n, t: any(n.startswith(p) for p in prefixes), "starts_with")


def ends_with(*suffixes: str) -> Selector:
    return Selector(lambda n, t: any(n.endswith(s) for s in suffixes), "ends_with")


def contains(*substrings: str) -> Selector:
    return Selector(lambda n, t: any(s in n for s in substrings), "contains")


def matches(pattern: str) -> Selector:
    rx = _re.compile(pattern)
    return Selector(lambda n, t: rx.search(n) is not None, "matches")


# ---------------------------------------------------------------------------
# selector expression chains: cs.numeric().fill_null(0), cs.string().str.
# to_uppercase(), cs.float_() * 2 ... — polars lets any Expr operation ride
# on a selector and applies it per expanded column (keeping each column's
# name, or the name the chain's .name.* ops produce).  The chain records a
# pure Expr -> Expr function; LazyFrame._resolve_exprs expands the selector
# against the schema and applies the function to each matched pl.col(name).


class _SelectorChain:
    """A selector plus a recorded expression transform, expanded per
    matching column at plan-build time (pure front-end, like Selector)."""

    def __init__(self, pred, fn, label: str):
        self._selector = pred
        self._chain_fn = fn
        self._label = label

    def __repr__(self):  # pragma: no cover - repr only
        return f"<selector-chain {self._label}>"


def _chain_method(name: str):
    def meth(self, *a, **k):
        base = getattr(self, "_chain_fn", None) or (lambda e: e)

        def fn(e, _base=base):
            return getattr(_base(e), name)(*a, **k)

        return _SelectorChain(self._selector, fn, f"{getattr(self, '_label', 'sel')}.{name}")

    meth.__name__ = name
    return meth


class _ChainNS:
    """Deferred namespace access on a selector chain (cs.string().str....)."""

    def __init__(self, owner, ns: str):
        self._owner = owner
        self._ns = ns

    def __getattr__(self, meth: str):
        owner, ns = self._owner, self._ns
        base = getattr(owner, "_chain_fn", None) or (lambda e: e)

        def call(*a, **k):
            def fn(e, _base=base):
                return getattr(getattr(_base(e), ns), meth)(*a, **k)

            return _SelectorChain(
                owner._selector, fn, f"{getattr(owner, '_label', 'sel')}.{ns}.{meth}"
            )

        return call


def _install_chain_surface() -> None:
    for n in dir(Expr):
        if n.startswith("_"):
            continue
        attr = getattr(Expr, n, None)
        if callable(attr):
            setattr(Selector, n, _chain_method(n))
            setattr(_SelectorChain, n, _chain_method(n))
        elif isinstance(attr, property):
            def _mk(nsname):
                return property(lambda self, _ns=nsname: _ChainNS(self, _ns))

            setattr(Selector, n, _mk(n))
            setattr(_SelectorChain, n, _mk(n))
    # arithmetic/comparison dunders chain too (cs.numeric() * 2); the
    # SET-ALGEBRA dunders (__or__/__and__/__sub__/__invert__) stay selector
    # combinators on Selector itself, but chain on an already-started chain
    for dunder in ("__add__", "__mul__", "__truediv__", "__pow__", "__mod__",
                   "__gt__", "__lt__", "__ge__", "__le__", "__neg__"):
        if hasattr(Expr, dunder):
            setattr(Selector, dunder, _chain_method(dunder))
            setattr(_SelectorChain, dunder, _chain_method(dunder))
    for dunder in ("__or__", "__and__", "__sub__", "__invert__"):
        setattr(_SelectorChain, dunder, _chain_method(dunder))


_install_chain_surface()


def _selector_exclude(self, *names):
    """pl.all().exclude(...) / selector.exclude(...): set difference."""
    flat = []
    for n in names:
        flat.extend(n) if isinstance(n, (list, tuple)) else flat.append(n)
    return self - by_name(*flat)


Selector.exclude = _selector_exclude
