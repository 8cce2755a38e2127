"""Column selectors (polars ``cs.*`` — py-polars/src/polars/selectors.py,
rust polars-plan/src/dsl/selector.rs).

Selectors are pure front-end: they resolve against the frame schema before
any plan is built, so Catalyst sees only concrete column references.

    import polars_spark.selectors as cs
    lf.select(cs.numeric())                      # all numeric columns
    lf.select(cs.starts_with("l_") - cs.float_())  # set algebra

Dtype-detail notes (SURVEY §1.2 physical mappings): selectors see the
SPARK schema, so dtypes that map onto the same physical Spark type are
indistinguishable here — ``time()`` (ns-bigint mapping), ``enum()`` /
``categorical()`` (string passthrough) and ``object()`` (binary) match
nothing, documented per-function.  ``unsigned_integer()`` matches the
UInt64 physical mapping decimal(20,0).
"""

from __future__ import annotations

import builtins
import re as _re

from polars_spark.plans.expr import Expr

__all__ = [
    "all",
    "alpha",
    "alphanumeric",
    "array",
    "binary",
    "boolean",
    "by_dtype",
    "by_index",
    "by_name",
    "categorical",
    "contains",
    "date",
    "datetime",
    "decimal",
    "digit",
    "duration",
    "empty",
    "ends_with",
    "enum",
    "exclude",
    "expand_selector",
    "first",
    "float",
    "float_",
    "integer",
    "is_selector",
    "last",
    "list",
    "matches",
    "nested",
    "numeric",
    "object",
    "signed_integer",
    "starts_with",
    "string",
    "struct",
    "temporal",
    "time",
    "unsigned_integer",
]

_INTEGER = {"tinyint", "smallint", "int", "bigint"}
_FLOAT = {"float", "double"}
_UNSIGNED = {"decimal(20,0)"}  # the UInt64 physical mapping
_TEMPORAL = {"date", "timestamp", "timestamp_ntz"}


def _is_numeric_t(t: str) -> bool:
    return t in _INTEGER or t in _FLOAT or t.startswith("decimal")


class Selector(Expr):
    """An Expr that expands to every matching column at resolution time.
    Supports polars selector set algebra: ``|`` union, ``&`` intersection,
    ``-`` difference, ``^`` symmetric difference, ``~`` complement.

    Two expansion protocols: ``_selector(name, spark_type) -> bool`` for
    per-column predicates, or ``_schema_expand(items) -> list[str]`` for
    positional selectors (by_index/first/last) and combined selectors —
    ``expand_names`` below is the single entry point every plan-side
    consumer uses."""

    def __init__(self, predicate=None, label: str = "sel", expand=None):
        super().__init__(
            lambda ctx: (_ for _ in ()).throw(RuntimeError("unexpanded selector")),
            label,
        )
        self._selector = predicate if predicate is not None else (lambda n, t: False)
        if expand is not None:
            self._schema_expand = expand

    def as_expr(self) -> Expr:
        """The selector as a plain (still multi-output) expression —
        identity here: selectors already ride the Expr surface."""
        return self

    # -- set algebra --------------------------------------------------------
    def __or__(self, other):
        if isinstance(other, Selector):
            return _combine(self, other, "or")
        return _selector_expr_op(self, "__or__", other)

    def __and__(self, other):
        if isinstance(other, Selector):
            return _combine(self, other, "and")
        return _selector_expr_op(self, "__and__", other)

    def __sub__(self, other):
        if isinstance(other, Selector):
            return _combine(self, other, "sub")
        return _selector_expr_op(self, "__sub__", other)

    def __xor__(self, other):
        if isinstance(other, Selector):
            return _combine(self, other, "xor")
        return _selector_expr_op(self, "__xor__", other)

    def __invert__(self):
        me = self

        def exp(items):
            hit = set(expand_names(me, dict(items)))
            return [n for n, _ in items if n not in hit]

        return Selector(label="not", expand=exp)


def expand_names(sel, schema) -> builtins.list[str]:
    """Ordered column names a selector matches against a schema mapping
    ({name: spark_type_str}) — THE expansion entry point for plan code.
    Accepts polars dtype values too (a user-built pl.Schema), normalizing
    them to Spark type strings first."""
    items = builtins.list(schema.items() if hasattr(schema, "items") else schema)
    if items and not isinstance(items[0][1], str):
        from polars_spark.plans.expr import _dtype_to_spark

        items = [(n, _dtype_to_spark(t)) for n, t in items]
    exp = getattr(sel, "_schema_expand", None)
    if exp is not None:
        return exp(items)
    pred = sel._selector
    return [n for n, t in items if pred(n, t)]


def _expand_selectors(frame, *items) -> builtins.list:
    """Expand selectors in a mixed list to names, passing through
    non-selector items (reference selectors._expand_selectors)."""
    out: builtins.list = []
    for it in items:
        if isinstance(it, (builtins.list, tuple)):
            for x in it:
                if isinstance(x, Selector):
                    out.extend(expand_names(x, frame.schema))
                else:
                    out.append(x)
        elif isinstance(it, Selector):
            out.extend(expand_names(it, frame.schema))
        else:
            out.append(it)
    return out


def _combine(a, b, mode: str) -> Selector:
    def exp(items):
        sa = set(expand_names(a, dict(items)))
        sb = set(expand_names(b, dict(items)))
        keep = {
            "or": sa | sb,
            "and": sa & sb,
            "sub": sa - sb,
            "xor": sa ^ sb,
        }[mode]
        return [n for n, _ in items if n in keep]

    return Selector(label=mode, expand=exp)


def _selector_expr_op(sel, dunder: str, other):
    """cs.numeric() | expr → per-column Expr op chain (reference: a
    selector combined with a non-selector broadcasts the op)."""
    from polars_spark.plans.expr import _to_expr

    o = _to_expr(other)

    def fn(e, _o=o, _d=dunder):
        return getattr(Expr, _d)(e, _o)

    return _SelectorChain(sel._selector, fn, f"sel{dunder}",
                          expand=getattr(sel, "_schema_expand", None))


def is_selector(obj) -> bool:
    """True for a plain selector (not an expression chain on one)."""
    return isinstance(obj, Selector)


def expand_selector(target, selector, *, strict: bool = True) -> tuple:
    """Expand a selector against a frame (or schema mapping) to a tuple
    of matched column names (reference selectors.expand_selector)."""
    schema = target.schema if hasattr(target, "schema") else target
    if not strict and not (
        isinstance(selector, Selector) or hasattr(selector, "_chain_fn")
    ):
        from polars_spark.plans.expr import _to_expr

        name = _to_expr(selector)._name
        return (name,) if name else ()
    return tuple(expand_names(selector, schema))


# -- simple predicate selectors ---------------------------------------------


def all() -> Selector:  # noqa: A001 - polars name
    return Selector(lambda n, t: True, "all")


def empty() -> Selector:
    """Select no columns (composition identity)."""
    return Selector(lambda n, t: False, "empty")


def numeric() -> Selector:
    return Selector(lambda n, t: _is_numeric_t(t), "numeric")


def integer() -> Selector:
    return Selector(lambda n, t: t in _INTEGER or t in _UNSIGNED, "integer")


def signed_integer() -> Selector:
    """All Spark integral types are signed; the UInt64 decimal(20,0)
    physical mapping is excluded."""
    return Selector(lambda n, t: t in _INTEGER, "signed_integer")


def unsigned_integer() -> Selector:
    """Matches only the UInt64 physical mapping decimal(20,0) — narrower
    unsigned dtypes map onto wider SIGNED Spark ints (§1.2) and are
    indistinguishable at schema level."""
    return Selector(lambda n, t: t in _UNSIGNED, "unsigned_integer")


def float() -> Selector:  # noqa: A001 - polars name
    return Selector(lambda n, t: t in _FLOAT, "float")


float_ = float  # back-compat alias (pre-round-5 name)


def decimal() -> Selector:
    return Selector(lambda n, t: t.startswith("decimal"), "decimal")


def string(*, include_categorical: bool = False) -> Selector:
    # Categorical IS a string physically here, so include_categorical is
    # a no-op: categorical columns always match.
    return Selector(lambda n, t: t == "string", "string")


def boolean() -> Selector:
    return Selector(lambda n, t: t == "boolean", "boolean")


def binary() -> Selector:
    return Selector(lambda n, t: t == "binary", "binary")


def date() -> Selector:
    return Selector(lambda n, t: t == "date", "date")


def datetime(time_unit=None, time_zone=("*", None)) -> Selector:
    """All Spark timestamps are µs; time_unit/time_zone filters therefore
    select every timestamp column (unit is uniform, zone is a session
    property — SURVEY §1.2)."""
    return Selector(lambda n, t: t.startswith("timestamp"), "datetime")


def duration(time_unit=None) -> Selector:
    return Selector(lambda n, t: t.startswith("interval"), "duration")


def time() -> Selector:
    """polars Time maps to ns-since-midnight bigint (§1.2) — physically
    indistinguishable from Int64, so this matches nothing (documented)."""
    return Selector(lambda n, t: False, "time")


def temporal() -> Selector:
    return Selector(
        lambda n, t: t in _TEMPORAL or t.startswith(("timestamp", "interval")),
        "temporal",
    )


def categorical() -> Selector:
    """Categorical is a string passthrough (§1.2): physically
    indistinguishable from String, so this matches nothing (documented)."""
    return Selector(lambda n, t: False, "categorical")


def enum() -> Selector:
    """Enum is a validated string passthrough (§1.2) — schema-invisible,
    matches nothing (documented)."""
    return Selector(lambda n, t: False, "enum")


def object() -> Selector:  # noqa: A001 - polars name
    """Object maps to binary (§1.2); matching it here would double-count
    real Binary columns, so this matches nothing (documented)."""
    return Selector(lambda n, t: False, "object")


def list(inner=None) -> Selector:  # noqa: A001 - polars name
    return Selector(lambda n, t: t.startswith("array<"), "list")


def array(inner=None, *, width=None) -> Selector:
    """Fixed-size arrays map to Spark array<> with the width as a
    constraint (§1.2) — same physical match as list()."""
    return Selector(lambda n, t: t.startswith("array<"), "array")


def struct() -> Selector:
    return Selector(lambda n, t: t.startswith("struct<"), "struct")


def nested() -> Selector:
    return Selector(
        lambda n, t: t.startswith(("array<", "struct<", "map<")), "nested"
    )


# -- name-based selectors ----------------------------------------------------


def _flat_strs(vals) -> builtins.list[str]:
    out = []
    for v in vals:
        if isinstance(v, str):
            out.append(v)
        else:
            out.extend(v)
    return out


def by_name(*names, require_all: bool = True) -> Selector:
    ns = _flat_strs(names)
    nset = set(ns)

    def exp(items):
        have = {n for n, _ in items}
        if require_all:
            missing = nset - have
            if missing:
                from polars_spark.exceptions import ColumnNotFoundError

                raise ColumnNotFoundError(
                    f"columns not found: {sorted(missing)}"
                )
        return [n for n, _ in items if n in nset]

    return Selector(lambda n, t: n in nset, "by_name", expand=exp)


def by_index(*indices, require_all: bool = True) -> Selector:
    flat: builtins.list[int] = []
    for ix in indices:
        if isinstance(ix, (range, builtins.list, tuple)):
            flat.extend(ix)
        else:
            flat.append(ix)

    def exp(items):
        width = len(items)
        names = [n for n, _ in items]
        out, seen = [], set()
        for i in flat:
            if -width <= i < width:
                n = names[i]
                if n not in seen:
                    seen.add(n)
                    out.append(n)
            elif require_all:
                from polars_spark.exceptions import ColumnNotFoundError

                raise ColumnNotFoundError(
                    f"index {i} out of bounds for width {width}"
                )
        return out

    return Selector(label="by_index", expand=exp)


def first(*, strict: bool = True) -> Selector:
    def exp(items):
        if not items:
            if strict:
                from polars_spark.exceptions import ColumnNotFoundError

                raise ColumnNotFoundError("no columns in scope for cs.first()")
            return []
        return [items[0][0]]

    return Selector(label="first", expand=exp)


def last(*, strict: bool = True) -> Selector:
    def exp(items):
        if not items:
            if strict:
                from polars_spark.exceptions import ColumnNotFoundError

                raise ColumnNotFoundError("no columns in scope for cs.last()")
            return []
        return [items[-1][0]]

    return Selector(label="last", expand=exp)


def by_dtype(*dtypes) -> Selector:
    from polars_spark.plans.expr import _dtype_to_spark

    flat = []
    for d in dtypes:
        if isinstance(d, (builtins.list, tuple, set, frozenset)):
            flat.extend(d)
        else:
            flat.append(d)
    ds = {_dtype_to_spark(d).lower() if not isinstance(d, str) else d.lower()
          for d in flat}
    return Selector(lambda n, t: t in ds, "by_dtype")


def starts_with(*prefix) -> Selector:
    ps = tuple(_flat_strs(prefix))
    return Selector(lambda n, t: n.startswith(ps), "starts_with")


def ends_with(*suffix) -> Selector:
    ss = tuple(_flat_strs(suffix))
    return Selector(lambda n, t: n.endswith(ss), "ends_with")


def contains(*substring) -> Selector:
    subs = _flat_strs(substring)
    return Selector(lambda n, t: any(s in n for s in subs), "contains")


def matches(pattern: str) -> Selector:
    rx = _re.compile(pattern)
    return Selector(lambda n, t: rx.search(n) is not None, "matches")


def alpha(ascii_only: bool = False, *, ignore_spaces: bool = False) -> Selector:  # noqa: FBT001,FBT002
    def pred(n, t, _ascii=ascii_only, _sp=ignore_spaces):
        s = n.replace(" ", "") if _sp else n
        if not s:
            return False
        return s.isascii() and s.isalpha() if _ascii else s.isalpha()

    return Selector(pred, "alpha")


def alphanumeric(ascii_only: bool = False, *, ignore_spaces: bool = False) -> Selector:  # noqa: FBT001,FBT002
    def pred(n, t, _ascii=ascii_only, _sp=ignore_spaces):
        s = n.replace(" ", "") if _sp else n
        if not s:
            return False
        return s.isascii() and s.isalnum() if _ascii else s.isalnum()

    return Selector(pred, "alphanumeric")


def digit(ascii_only: bool = False) -> Selector:  # noqa: FBT001,FBT002
    def pred(n, t, _ascii=ascii_only):
        if not n:
            return False
        return n.isascii() and n.isdigit() if _ascii else n.isdigit()

    return Selector(pred, "digit")


def exclude(*columns) -> Selector:
    """Everything except the given names/selectors/dtypes (reference
    selectors.exclude = ~combined)."""
    sels = []
    names = []
    for c in columns:
        if isinstance(c, Selector):
            sels.append(c)
        elif isinstance(c, str):
            names.append(c)
        elif isinstance(c, (builtins.list, tuple, set, frozenset)):
            for x in c:
                (sels if isinstance(x, Selector) else names).append(x)
        else:  # a dtype
            sels.append(by_dtype(c))
    combined = by_name(*[n for n in names if isinstance(n, str)],
                       require_all=False) if names else empty()
    for s in sels:
        combined = combined | s
    return ~combined


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

    def __init__(self, pred, fn, label: str, expand=None):
        self._selector = pred
        self._chain_fn = fn
        self._label = label
        if expand is not None:
            self._schema_expand = expand

    def __repr__(self):  # pragma: no cover - repr only
        return f"<selector-chain {self._label}>"

    @property
    def _name(self) -> str:
        return self._label.rsplit(".", 1)[-1]


def _chain_method(name: str):
    def meth(self, *a, **k):
        base = getattr(self, "_chain_fn", None) or (lambda e: e)

        def fn(e, _base=base):
            return getattr(_base(e), name)(*a, **k)

        return _SelectorChain(
            self._selector, fn, f"{getattr(self, '_label', 'sel')}.{name}",
            expand=getattr(self, "_schema_expand", None),
        )

    meth.__name__ = name
    return meth


class _ChainNS:
    """Deferred namespace access on a selector chain (cs.string().str....)."""

    def __init__(self, owner, ns: str):
        self._owner = owner
        self._ns = ns

    def __getattr__(self, meth: str):
        owner, ns = self._owner, self._ns
        if ns == "meta" and meth in ("as_selector", "as_expression"):
            # plan-level introspection, not a per-column chain: the selector
            # IS the selector/expression (reference meta.py:284-299)
            return lambda: owner if meth == "as_selector" else owner.as_expr()
        base = getattr(owner, "_chain_fn", None) or (lambda e: e)

        def call(*a, **k):
            def fn(e, _base=base):
                return getattr(getattr(_base(e), ns), meth)(*a, **k)

            return _SelectorChain(
                owner._selector, fn,
                f"{getattr(owner, '_label', 'sel')}.{ns}.{meth}",
                expand=getattr(owner, "_schema_expand", None),
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
    # SET-ALGEBRA dunders (__or__/__and__/__sub__/__xor__/__invert__) stay
    # selector combinators on Selector itself (defined in the class body),
    # but chain on an already-started chain
    for dunder in ("__add__", "__mul__", "__truediv__", "__pow__", "__mod__",
                   "__gt__", "__lt__", "__ge__", "__le__", "__neg__",
                   "__eq__", "__ne__"):
        if hasattr(Expr, dunder):
            setattr(Selector, dunder, _chain_method(dunder))
            setattr(_SelectorChain, dunder, _chain_method(dunder))
    for dunder in ("__or__", "__and__", "__sub__", "__xor__", "__invert__"):
        setattr(_SelectorChain, dunder, _chain_method(dunder))


_install_chain_surface()


def _selector_exclude(self, *names):
    """selector.exclude(...): set difference against names/dtypes."""
    flat = []
    for n in names:
        flat.extend(n) if isinstance(n, (builtins.list, tuple)) else flat.append(n)
    str_names = [n for n in flat if isinstance(n, str)]
    other = by_name(*str_names, require_all=False) if str_names else empty()
    dts = [n for n in flat if not isinstance(n, str)]
    if dts:
        other = other | by_dtype(*dts)
    return self - other


Selector.exclude = _selector_exclude
