"""Driver-local Series facade (reference polars-core/src/series/mod.rs:150;
SURVEY §1: Series -> "a single-column DataFrame / Column").

polars' Series is an EAGER in-memory structure — its Spark-side analogue
for anything large is a single-column LazyFrame (use ``to_frame()``); this
wrapper exists so drop-in code that builds small Series, passes them to
constructors, or calls scalar reductions keeps working.  It delegates
storage/ops to pandas on the driver and is intentionally NOT a distributed
structure — at 100 TB a Series-shaped workload belongs in a frame.
"""

from __future__ import annotations

import pandas as pd


class Series:
    def __init__(self, name="", values=None, dtype=None, *, spark=None):
        if not isinstance(name, str):
            name, values = "", name
        if values is None:
            values = []
        self._s = pd.Series(list(values), name=name or None)
        if dtype is not None:
            from polars_spark.plans.expr import Categorical, _dtype_to_spark

            if isinstance(dtype, Categorical) and dtype.categories is not None:
                # feed the named driver-side mapping (pl.Categories) in
                # first-appearance order, like the reference's ingest path
                dtype.categories._register(self._s.tolist())

            spark_t = _dtype_to_spark(dtype)
            pd_map = {
                "tinyint": "int8", "smallint": "int16", "int": "int32",
                "bigint": "int64", "float": "float32", "double": "float64",
                "string": "object", "boolean": "bool",
            }
            if spark_t in pd_map:
                self._s = self._s.astype(pd_map[spark_t])
        self._spark = spark

    # -- basics -----------------------------------------------------------
    @property
    def name(self) -> str:
        return self._s.name or ""

    def rename(self, name: str) -> "Series":
        out = Series(name, self._s.tolist(), spark=self._spark)
        return out

    def __len__(self) -> int:
        return int(self._s.size)

    def len(self) -> int:
        return self.__len__()

    def to_list(self) -> list:
        return [None if pd.isna(v) else v for v in self._s.tolist()]

    def to_pandas(self) -> pd.Series:
        return self._s.copy()

    def to_frame(self, name: str | None = None):
        """Promote to a (distributed) single-column LazyFrame — the scale
        path for any further computation."""
        from polars_spark.sources import from_pandas

        col = name or self.name or "column_0"
        return from_pandas(pd.DataFrame({col: self._s}), spark=self._spark)

    def __repr__(self) -> str:
        return f"Series({self.name!r}, {self._s.tolist()!r})"

    # -- scalar reductions -------------------------------------------------
    def sum(self):
        return self._s.sum() if self._s.size else 0

    def min(self):
        return None if not self._s.size else self._s.min()

    def max(self):
        return None if not self._s.size else self._s.max()

    def mean(self):
        return None if not self._s.size else float(self._s.mean())

    def median(self):
        return None if not self._s.size else float(self._s.median())

    def std(self, ddof: int = 1):
        return None if not self._s.size else float(self._s.std(ddof=ddof))

    def var(self, ddof: int = 1):
        return None if not self._s.size else float(self._s.var(ddof=ddof))

    def n_unique(self) -> int:
        return int(self._s.nunique(dropna=False))

    def null_count(self) -> int:
        return int(self._s.isna().sum())

    def is_empty(self) -> bool:
        return self._s.size == 0

    def value_counts(self, *, sort: bool = False):
        vc = self._s.value_counts(dropna=False)
        out = pd.DataFrame({self.name or "value": vc.index, "count": vc.values})
        if not sort:
            out = out.sort_values(self.name or "value", ignore_index=True)
        return out

    def is_null(self) -> "Series":
        return self._wrap(self._s.isna())

    def is_not_null(self) -> "Series":
        return self._wrap(~self._s.isna())

    def fill_null(self, value) -> "Series":
        return self._wrap(self._s.fillna(value))

    def drop_nulls(self) -> "Series":
        return self._wrap(self._s.dropna().reset_index(drop=True))

    def abs(self) -> "Series":
        return self._wrap(self._s.abs())

    def round(self, decimals: int = 0) -> "Series":
        return self._wrap(self._s.round(decimals))

    def cast(self, dtype) -> "Series":
        from polars_spark.plans.expr import _dtype_to_spark

        t = _dtype_to_spark(dtype)
        pd_map = {
            "tinyint": "Int8", "smallint": "Int16", "int": "Int32",
            "bigint": "Int64", "float": "float32", "double": "float64",
            "string": "object", "boolean": "boolean",
        }
        return self._wrap(self._s.astype(pd_map.get(t, "object")))

    def to_numpy(self):
        return self._s.to_numpy()

    def cum_sum(self) -> "Series":
        return self._wrap(self._s.cumsum())

    def arg_max(self):
        return None if not self._s.size else int(self._s.idxmax())

    def arg_min(self):
        return None if not self._s.size else int(self._s.idxmin())

    def mode(self) -> "Series":
        return self._wrap(self._s.mode())

    def shift(self, n: int = 1) -> "Series":
        return self._wrap(self._s.shift(n))

    def diff(self, n: int = 1) -> "Series":
        return self._wrap(self._s.diff(n))

    def clip(self, lower=None, upper=None) -> "Series":
        return self._wrap(self._s.clip(lower, upper))

    def alias(self, name: str) -> "Series":
        return self.rename(name)

    def filter(self, mask: "Series") -> "Series":
        return self._wrap(self._s[mask._s.to_numpy()].reset_index(drop=True))

    def slice(self, offset: int, length: int | None = None) -> "Series":
        end = None if length is None else offset + length
        return self._wrap(self._s.iloc[offset:end].reset_index(drop=True))

    # -- elementwise (pandas-delegated) ------------------------------------
    def _wrap(self, s: pd.Series) -> "Series":
        out = Series(self.name, [], spark=self._spark)
        out._s = s
        return out

    def _other(self, other):
        return other._s if isinstance(other, Series) else other

    def __add__(self, other):
        return self._wrap(self._s + self._other(other))

    def __sub__(self, other):
        return self._wrap(self._s - self._other(other))

    def __mul__(self, other):
        return self._wrap(self._s * self._other(other))

    def __truediv__(self, other):
        return self._wrap(self._s / self._other(other))

    def __eq__(self, other):  # type: ignore[override]
        return self._wrap(self._s == self._other(other))

    def __ne__(self, other):  # type: ignore[override]
        return self._wrap(self._s != self._other(other))

    def __lt__(self, other):
        return self._wrap(self._s < self._other(other))

    def __gt__(self, other):
        return self._wrap(self._s > self._other(other))

    def __getitem__(self, i):
        v = self._s.iloc[i]
        return None if pd.isna(v) else v

    def head(self, n: int = 10) -> "Series":
        return self._wrap(self._s.head(n))

    def tail(self, n: int = 10) -> "Series":
        return self._wrap(self._s.tail(n))

    def unique(self) -> "Series":
        return self._wrap(self._s.drop_duplicates())

    def sort(self, *, descending: bool = False, nulls_last: bool | None = None) -> "Series":
        # polars null-smallest rule: nulls FIRST ascending, LAST descending
        if nulls_last is None:
            nulls_last = descending
        return self._wrap(
            self._s.sort_values(
                ascending=not descending,
                ignore_index=True,
                na_position="last" if nulls_last else "first",
            )
        )

    def dot(self, other) -> float:
        import pandas as pd

        o = other._s if isinstance(other, Series) else pd.Series(list(other))
        return float((self._s * o.values).sum())

    def equals(self, other: "Series") -> bool:
        return bool(self._s.reset_index(drop=True).equals(other._s.reset_index(drop=True)))


class _SeriesExprNS:
    """Namespace proxy (s.str / s.dt / ...): each call routes through a
    single-column frame and the Expr namespace of the same name."""

    def __init__(self, series: "Series", ns: str):
        self._series = series
        self._ns = ns

    def __getattr__(self, method: str):
        def call(*args, **kwargs):
            e = getattr(self._series._as_expr(), self._ns)
            return self._series._run_expr(getattr(e, method)(*args, **kwargs))

        return call


def _series_getattr(self, name: str):
    """Fallback: any Expr method or namespace works on a Series by routing
    through a one-column frame (same trick the reference uses in reverse —
    its Expr ops run on a Series under the hood).  Driver-local by design;
    explicitly-defined Series methods take precedence."""
    if name.startswith("_"):
        raise AttributeError(name)
    from polars_spark.plans.expr import Expr

    attr = getattr(Expr, name, None)
    if isinstance(attr, property):
        return _SeriesExprNS(self, name)
    if callable(attr):
        def call(*args, **kwargs):
            return self._run_expr(getattr(self._as_expr(), name)(*args, **kwargs))

        return call
    raise AttributeError(name)


def _series_as_expr(self):
    from polars_spark.plans.expr import col

    return col(self.name or "column_0")


def _series_run_expr(self, expr) -> "Series":
    from polars_spark.plans.expr import col

    # thread a row index so window/rank exprs keep the Series' element
    # order (and get an order contract to rank against)
    lf = self.to_frame(self.name or "column_0").with_row_index("__sidx")
    pdf = lf.select(col("__sidx"), expr.alias("__out")).collect()
    pdf = pdf.sort_values("__sidx")
    return Series(self.name, pdf["__out"].tolist())


Series.__getattr__ = _series_getattr
Series._as_expr = _series_as_expr
Series._run_expr = _series_run_expr
