"""Top-level polars functions (py-polars/src/polars/functions/): horizontal
reductions, concat_str/concat_list, fold/reduce, struct, coalesce, ranges.

All lowerings are built-in Spark column functions — no Python UDFs.
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from polars_spark.plans.expr import Expr, ExprContext, _to_expr, col, lit, when, all_, nth
from polars_spark.plans.namespaces import element

__all__ = [
    "col",
    "lit",
    "when",
    "nth",
    "element",
    "sum",
    "min",
    "max",
    "len",
    "first",
    "last",
    "count",
    "mean",
    "median",
    "n_unique",
    "sum_horizontal",
    "min_horizontal",
    "max_horizontal",
    "mean_horizontal",
    "all_horizontal",
    "any_horizontal",
    "concat_str",
    "concat_list",
    "struct",
    "coalesce",
    "fold",
    "reduce",
    "corr",
    "cov",
    "exclude",
    "rolling_corr",
    "rolling_cov",
    "int_ranges",
    "date_ranges",
    "business_day_count",
    "repeat",
]


def _cols(exprs) -> list[Expr]:
    out = []
    for e in exprs:
        if isinstance(e, (list, tuple)):
            out.extend(_cols(e))
        elif isinstance(e, str):
            out.append(col(e))
        else:
            out.append(_to_expr(e))
    return out


# -- column-wise shortcuts (pl.sum('a') == pl.col('a').sum()) ----------------


def sum(*names):
    return col(*names).sum()


def min(*names):
    return col(*names).min()


def max(*names):
    return col(*names).max()


def mean(*names):
    return col(*names).mean()


def median(*names):
    return col(*names).median()


def first(name):
    return col(name).first()


def last(name):
    return col(name).last()


def count(name=None):
    if name is None:
        return len()
    return col(name).count()


def n_unique(name):
    return col(name).n_unique()


def len() -> Expr:  # noqa: A001 - polars name
    return Expr(lambda ctx: F.count(F.lit(1)), "len", is_agg=True)


# -- horizontal (FunctionExpr::{Sum,Max,Min,Mean}Horizontal) ------------------


def _horizontal(exprs, combine, name: str) -> Expr:
    es = _cols(exprs)

    def fn(ctx: ExprContext) -> Column:
        return combine([e._resolve(ctx) for e in es])

    return Expr(fn, name)


def sum_horizontal(*exprs, ignore_nulls: bool = True) -> Expr:
    def combine(cs):
        if ignore_nulls:
            cs = [F.coalesce(c, F.lit(0)) for c in cs]
        return _reduce(lambda a, b: a + b, cs)

    return _horizontal(exprs, combine, "sum")


def min_horizontal(*exprs) -> Expr:
    return _horizontal(exprs, lambda cs: F.least(*cs), "min")


def max_horizontal(*exprs) -> Expr:
    return _horizontal(exprs, lambda cs: F.greatest(*cs), "max")


def mean_horizontal(*exprs, ignore_nulls: bool = True) -> Expr:
    def combine(cs):
        vals = _reduce(lambda a, b: a + b, [F.coalesce(c, F.lit(0)) for c in cs])
        cnt = _reduce(lambda a, b: a + b, [F.when(c.isNotNull(), 1).otherwise(0) for c in cs])
        return vals / cnt

    return _horizontal(exprs, combine, "mean")


def all_horizontal(*exprs) -> Expr:
    return _horizontal(exprs, lambda cs: _reduce(lambda a, b: a & b, cs), "all")


def any_horizontal(*exprs) -> Expr:
    return _horizontal(exprs, lambda cs: _reduce(lambda a, b: a | b, cs), "any")


# -- constructors ---------------------------------------------------------------


def concat_str(exprs, *more, separator: str = "", ignore_nulls: bool = False) -> Expr:
    es = _cols([exprs, *more])

    def fn(ctx: ExprContext) -> Column:
        cs = [e._resolve(ctx).cast("string") for e in es]
        if ignore_nulls:
            return F.concat_ws(separator, *cs)
        # strict: any null -> null (Spark concat does exactly this)
        if separator:
            joined = cs[0]
            for c in cs[1:]:
                joined = F.concat(joined, F.lit(separator), c)
            return joined
        return F.concat(*cs)

    return Expr(fn, es[0]._name if es else "literal")


def concat_list(*exprs) -> Expr:
    es = _cols(exprs)

    def fn(ctx: ExprContext) -> Column:
        return F.array(*[e._resolve(ctx) for e in es])

    return Expr(fn, es[0]._name if es else "literal")


def struct(*exprs, **named) -> Expr:
    es = _cols(exprs)

    def fn(ctx: ExprContext) -> Column:
        cs = [e._resolve(ctx).alias(e._name) for e in es]
        cs += [_to_expr(e)._resolve(ctx).alias(n) for n, e in named.items()]
        return F.struct(*cs)

    return Expr(fn, es[0]._name if es else "struct")


def coalesce(*exprs) -> Expr:
    es = _cols(exprs)

    def fn(ctx: ExprContext) -> Column:
        return F.coalesce(*[e._resolve(ctx) for e in es])

    return Expr(fn, es[0]._name if es else "literal")


# -- fold / reduce (FunctionExpr::FoldHorizontal) ---------------------------------


def fold(acc, function, exprs) -> Expr:
    es = _cols(exprs if isinstance(exprs, (list, tuple)) else [exprs])
    a0 = _to_expr(acc)

    def fn(ctx: ExprContext) -> Column:
        out = a0._resolve(ctx)
        for e in es:
            nxt = e._resolve(ctx)
            out = function(_wrap_col(out), _wrap_col(nxt))._resolve(ctx)
        return out

    return Expr(fn, "fold")


def reduce(function, exprs) -> Expr:
    es = _cols(exprs if isinstance(exprs, (list, tuple)) else [exprs])

    def fn(ctx: ExprContext) -> Column:
        out = es[0]._resolve(ctx)
        for e in es[1:]:
            out = function(_wrap_col(out), _wrap_col(e._resolve(ctx)))._resolve(ctx)
        return out

    return Expr(fn, es[0]._name if es else "reduce")


def _wrap_col(c: Column) -> Expr:
    return Expr(lambda ctx: c, "literal")


# -- correlation ------------------------------------------------------------------


def exclude(*names: str):
    """pl.exclude: every column except the named ones (selector complement)."""
    from polars_spark import selectors as cs

    return ~cs.by_name(*names)


def rolling_corr(a, b, *, window_size: int, min_samples: int | None = None) -> Expr:
    """Rolling Pearson correlation of two columns over the frame order."""
    ea = _to_expr(a if not isinstance(a, str) else col(a))
    eb = _to_expr(b if not isinstance(b, str) else col(b))
    need = window_size if min_samples is None else min_samples

    def fn(ctx: ExprContext) -> Column:
        w = ctx.order_window().rowsBetween(-(window_size - 1), 0)
        ca, cb = ea._resolve(ctx), eb._resolve(ctx)
        val = F.corr(ca, cb).over(w)
        return F.when(F.count(ca).over(w) >= need, val)

    return Expr(fn, "rolling_corr")


def rolling_cov(a, b, *, window_size: int, min_samples: int | None = None, ddof: int = 1) -> Expr:
    ea = _to_expr(a if not isinstance(a, str) else col(a))
    eb = _to_expr(b if not isinstance(b, str) else col(b))
    f = F.covar_samp if ddof == 1 else F.covar_pop
    need = window_size if min_samples is None else min_samples

    def fn(ctx: ExprContext) -> Column:
        w = ctx.order_window().rowsBetween(-(window_size - 1), 0)
        ca, cb = ea._resolve(ctx), eb._resolve(ctx)
        val = f(ca, cb).over(w)
        return F.when(F.count(ca).over(w) >= need, val)

    return Expr(fn, "rolling_cov")


def corr(a, b, *, method: str = "pearson") -> Expr:
    ea, eb = _to_expr(a if not isinstance(a, str) else col(a)), _to_expr(
        b if not isinstance(b, str) else col(b)
    )
    if method != "pearson":
        raise NotImplementedError("corr: only pearson (spearman needs rank pre-pass)")

    def fn(ctx: ExprContext) -> Column:
        return F.corr(ea._resolve(ctx), eb._resolve(ctx))

    return Expr(fn, "corr", is_agg=True)


def cov(a, b, *, ddof: int = 1) -> Expr:
    ea = _to_expr(a if not isinstance(a, str) else col(a))
    eb = _to_expr(b if not isinstance(b, str) else col(b))
    f = F.covar_samp if ddof == 1 else F.covar_pop

    def fn(ctx: ExprContext) -> Column:
        return f(ea._resolve(ctx), eb._resolve(ctx))

    return Expr(fn, "cov", is_agg=True)


# -- per-row ranges (FunctionExpr ranges, function_expr/range.rs:57) ---------------


def int_ranges(start, end, step: int = 1) -> Expr:
    s, e = _to_expr(start), _to_expr(end)

    def fn(ctx: ExprContext) -> Column:
        # sequence is inclusive on both ends; polars int_range excludes end
        return F.sequence(
            s._resolve(ctx).cast("bigint"),
            (e._resolve(ctx) - (1 if step > 0 else -1)).cast("bigint"),
            F.lit(step),
        )

    return Expr(fn, "int_range")


def date_ranges(start, end, interval: str = "1d") -> Expr:
    """Per-row date/datetime range arrays (FunctionExpr ranges,
    function_expr/range.rs:57) — F.sequence with an interval literal;
    inclusive of both ends like polars ``date_range``."""
    s, e = _to_expr(start), _to_expr(end)
    from polars_spark.plans.frame import _duration_str

    iv = _duration_str(interval)

    def fn(ctx: ExprContext) -> Column:
        return F.sequence(s._resolve(ctx), e._resolve(ctx), F.expr(f"INTERVAL {iv}"))

    return Expr(fn, "date_range")


def business_day_count(start, end) -> Expr:
    """Business days in [start, end) (function_expr/business.rs:10) — counts
    ISO weekdays Mon-Fri via a generated day array (no UDF)."""
    s, e = _to_expr(start), _to_expr(end)

    def fn(ctx: ExprContext) -> Column:
        sd = F.to_date(s._resolve(ctx))
        ed = F.to_date(e._resolve(ctx))
        days = F.sequence(sd, F.date_sub(ed, 1))
        wd = lambda d: (F.dayofweek(d) + 5) % 7 + 1  # ISO Mon=1..Sun=7
        return F.when(ed > sd, F.size(F.filter(days, lambda d: wd(d) <= 5))).otherwise(F.lit(0))

    return Expr(fn, "business_day_count")


def repeat(value, n) -> Expr:
    v, k = _to_expr(value), _to_expr(n)

    def fn(ctx: ExprContext) -> Column:
        return F.array_repeat(v._resolve(ctx), k._resolve(ctx).cast("int"))

    return Expr(fn, "repeat")
