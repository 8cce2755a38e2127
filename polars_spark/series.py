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
        vals = list(values)
        if (
            dtype is None
            and any(v is None for v in vals)
            and any(v is not None for v in vals)
            and all(
                v is None or (isinstance(v, int) and not isinstance(v, bool))
                for v in vals
            )
        ):
            # int + null: pandas' plain Series widens to float64/NaN; the
            # nullable Int64 extension keeps polars' int-with-null semantics
            self._s = pd.Series(pd.array(vals, dtype="Int64"), name=name or None)
        else:
            self._s = pd.Series(vals, name=name or None)
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
                target = pd_map[spark_t]
                if self._s.isna().any() and target[0] in "bi":
                    # nulls present: the nullable extension dtypes keep
                    # int/bool-with-null (plain astype raises on NaN)
                    target = {"int8": "Int8", "int16": "Int16",
                              "int32": "Int32", "int64": "Int64",
                              "bool": "boolean"}[target]
                self._s = self._s.astype(target)
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
        out = []
        for v in self._s.tolist():
            if type(v).__name__ == "ndarray":
                out.append(v.tolist())
            else:
                try:
                    out.append(None if pd.isna(v) else v)
                except (TypeError, ValueError):
                    out.append(v)
        return out

    def search_sorted(self, element, side: str = "any"):
        """Index where element would be inserted to keep order (reference
        Series.search_sorted: scalar in -> scalar out, list in -> Series).
        Driver-local numpy searchsorted — the facade is driver-resident by
        design; the distributed form is Expr.search_sorted on a frame."""
        import numpy as np

        np_side = "left" if side in ("any", "left") else "right"
        arr = self._s.to_numpy()
        if isinstance(element, (list, tuple, Series)):
            items = element.to_list() if isinstance(element, Series) else list(element)
            return Series(
                self.name, [int(i) for i in np.searchsorted(arr, items, side=np_side)]
            )
        return int(np.searchsorted(arr, element, side=np_side))

    def to_pandas(self, *, use_pyarrow_extension_array: bool = False, **kwargs) -> pd.Series:
        if use_pyarrow_extension_array:
            import pyarrow as pa

            return pd.Series(
                pd.arrays.ArrowExtensionArray(pa.Array.from_pandas(self._s)),
                name=self._s.name,
            )
        return self._s.copy()

    def to_frame(self, name: str | None = None):
        """Promote to a (distributed) single-column LazyFrame — the scale
        path for any further computation."""
        from polars_spark.sources import from_pandas

        col = name or self.name or "column_0"
        return from_pandas(pd.DataFrame({col: self._s}), spark=self._spark)

    def hist(self, bins=None, *, bin_count=None, include_category: bool = True, include_breakpoint: bool = True):
        """Reference Series.hist: a DATAFRAME of bins — its defaults include
        BOTH the breakpoint and the category label (Expr.hist defaults to
        neither; series.py:2792)."""
        from pyspark.sql import functions as F

        from polars_spark.plans.expr import col as _col
        from polars_spark.plans.frame import LazyFrame

        name = self.name or "column_0"
        e = _col(name).hist(
            bins, bin_count=bin_count,
            include_breakpoint=include_breakpoint, include_category=include_category,
        ).alias("h")
        sdf = self.to_frame(name).select(e).to_spark().select(F.explode("h").alias("b"))
        if include_breakpoint or include_category:
            sdf = sdf.select("b.*")
        else:
            sdf = sdf.select(F.col("b").alias("count"))
        return LazyFrame(sdf).collect()

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

    def is_empty(self, *, ignore_nulls: bool = False) -> bool:
        if ignore_nulls:
            return int(self._s.notna().sum()) == 0
        return self._s.size == 0

    def value_counts(self, *, sort: bool = False, parallel: bool = False, name: str | None = None, normalize: bool = False):
        """-> DataFrame with (value, count) like the reference (not pandas)."""
        vc = self._s.value_counts(dropna=False, normalize=normalize)
        cname = name or ("proportion" if normalize else "count")
        out = pd.DataFrame({self.name or "value": vc.index, cname: vc.values})
        if not sort:
            out = out.sort_values(self.name or "value", ignore_index=True)
        from polars_spark.sources import from_pandas

        return from_pandas(out)

    def is_null(self) -> "Series":
        return self._wrap(self._s.isna())

    def is_not_null(self) -> "Series":
        return self._wrap(~self._s.isna())

    def fill_null(self, value=None, strategy: str | None = None, limit: int | None = None) -> "Series":
        if strategy is not None:
            s = self._s
            if strategy in ("forward", "ffill"):
                return self._wrap(s.ffill(limit=limit))
            if strategy in ("backward", "bfill"):
                return self._wrap(s.bfill(limit=limit))
            if strategy in ("min", "max", "mean"):
                return self._wrap(s.fillna(getattr(s, strategy)()))
            if strategy == "zero":
                return self._wrap(s.fillna(0))
            if strategy == "one":
                return self._wrap(s.fillna(1))
            msg = f"fill_null strategy {strategy!r}"
            raise ValueError(msg)
        return self._wrap(self._s.fillna(value))

    def drop_nulls(self) -> "Series":
        return self._wrap(self._s.dropna().reset_index(drop=True))

    def abs(self) -> "Series":
        return self._wrap(self._s.abs())

    def round(self, decimals: int = 0, mode: str = "half_to_even") -> "Series":
        if mode == "half_away_from_zero":
            import numpy as _np

            p = 10.0 ** decimals
            return self._wrap(
                self._s.map(lambda v: v if v is None else _np.floor(abs(v) * p + 0.5) / p * (1 if v >= 0 else -1))
            )
        return self._wrap(self._s.round(decimals))

    def cast(self, dtype) -> "Series":
        from polars_spark.plans.expr import _dtype_to_spark

        t = _dtype_to_spark(dtype)
        pd_map = {
            "tinyint": "Int8", "smallint": "Int16", "int": "Int32",
            "bigint": "Int64", "float": "float32", "double": "float64",
            "string": "object", "boolean": "boolean",
        }
        target = pd_map.get(t, "object")
        if target.startswith("Int") and pd.api.types.is_float_dtype(self._s):
            # polars float->int casts truncate toward zero (pandas astype
            # refuses non-integral floats)
            vals = [None if pd.isna(v) else int(v) for v in self._s]
            return self._wrap(pd.Series(pd.array(vals, dtype=target), name=self._s.name))
        return self._wrap(self._s.astype(target))

    def to_numpy(self, *, writable: bool = False, **kwargs):
        out = self._s.to_numpy()
        if writable and not out.flags.writeable:
            out = out.copy()
        return out

    def cum_sum(self) -> "Series":
        return self._wrap(self._s.cumsum())

    def arg_max(self):
        return None if not self._s.size else int(self._s.idxmax())

    def arg_min(self):
        return None if not self._s.size else int(self._s.idxmin())

    def mode(self) -> "Series":
        return self._wrap(self._s.mode())

    def _keep_int(self, out: pd.Series) -> pd.Series:
        """shift/diff on ints: pandas widens to float64 + NaN; polars keeps
        the integer dtype with nulls — restore via nullable Int64."""
        if pd.api.types.is_integer_dtype(self._s) and pd.api.types.is_float_dtype(out):
            return out.astype("Int64")
        return out

    def shift(self, n: int = 1, *, fill_value=None) -> "Series":
        shifted = self._s.shift(n)
        if fill_value is not None:
            k = min(abs(n), len(shifted))
            if n > 0:
                shifted.iloc[:k] = fill_value
            elif n < 0 and k:
                shifted.iloc[-k:] = fill_value
        return self._wrap(self._keep_int(shifted))

    def diff(self, n: int = 1, null_behavior: str = "ignore") -> "Series":
        out = self._keep_int(self._s.diff(n))
        if null_behavior == "drop":
            out = out.iloc[abs(n):].reset_index(drop=True)
        return self._wrap(out)

    def item(self, index: int | None = None):
        if index is not None:
            v = self._s.iloc[index]
            return None if (v is None or (not isinstance(v, (list, tuple)) and pd.isna(v))) else v
        if self._s.size != 1:
            raise ValueError(f"item() needs a 1-element Series, got {self._s.size}")
        v = self._s.iloc[0]
        return None if (v is None or (not isinstance(v, (list, tuple)) and pd.isna(v))) else v

    def clip(self, lower_bound=None, upper_bound=None, *, lower=None, upper=None) -> "Series":
        lower = lower_bound if lower_bound is not None else lower
        upper = upper_bound if upper_bound is not None else upper
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

    def __pow__(self, other):
        return self._wrap(self._s ** self._other(other))

    def __rpow__(self, other):
        return self._wrap(self._other(other) ** self._s)

    def __mod__(self, other):
        return self._wrap(self._s % self._other(other))

    def __floordiv__(self, other):
        return self._wrap(self._s // self._other(other))

    def __eq__(self, other):  # type: ignore[override]
        return self._wrap(self._s == self._other(other))

    def __ne__(self, other):  # type: ignore[override]
        return self._wrap(self._s != self._other(other))

    def __lt__(self, other):
        return self._wrap(self._s < self._other(other))

    def __gt__(self, other):
        return self._wrap(self._s > self._other(other))

    def __setitem__(self, i, value) -> None:
        self._s.iloc[i] = value

    def gather_every(self, n: int, offset: int = 0) -> "Series":
        return self._wrap(self._s.iloc[offset::n].reset_index(drop=True))

    def __getitem__(self, i):
        if isinstance(i, slice):
            return self._wrap(self._s.iloc[i].reset_index(drop=True))
        if isinstance(i, (list, tuple)):
            return self._wrap(self._s.iloc[list(i)].reset_index(drop=True))
        v = self._s.iloc[i]
        return None if pd.isna(v) else v

    def head(self, n: int = 10) -> "Series":
        return self._wrap(self._s.head(n))

    def limit(self, n: int = 10) -> "Series":
        return self.head(n)

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

    # -- structural / memory surface (reference series/series.py) ----------
    @property
    def shape(self) -> tuple:
        return (len(self),)

    @property
    def dtype(self):
        """Map the pandas storage dtype back to the polars dtype class
        (reference Series.dtype)."""
        from polars_spark.plans import expr as _e

        k = str(self._s.dtype).lower()
        table = {
            "int8": _e.Int8, "int16": _e.Int16, "int32": _e.Int32,
            "int64": _e.Int64, "uint8": _e.UInt8, "uint16": _e.UInt16,
            "uint32": _e.UInt32, "uint64": _e.UInt64,
            "float32": _e.Float32, "float64": _e.Float64,
            "bool": _e.Boolean, "boolean": _e.Boolean,
            "object": _e.String, "string": _e.String,
        }
        if k.startswith("datetime64"):
            return _e.Datetime
        if k == "object":
            # pandas stores time/date/bytes as objects: sniff the first
            # non-null value so Time/Date/Binary report their real dtype
            import datetime as _dt

            nn = self._s.dropna()
            if len(nn):
                v = nn.iloc[0]
                if isinstance(v, _dt.time) and not isinstance(v, _dt.datetime):
                    return _e.Time
                if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                    return _e.Date
                if isinstance(v, (bytes, bytearray)):
                    return _e.Binary
        if k in table:
            return table[k]
        return _e.Object

    @property
    def flags(self) -> dict:
        """Sortedness flags (reference Series.flags).  The facade keeps no
        sortedness metadata — always unsorted, like a freshly-built Series."""
        return {"SORTED_ASC": False, "SORTED_DESC": False}

    # chunk model: pandas storage is one contiguous block, so the chunk
    # surface is the trivial single-chunk answer (reference n_chunks/
    # chunk_lengths/get_chunks/rechunk on a rechunked Series)
    def n_chunks(self) -> int:
        return 1

    def chunk_lengths(self) -> list:
        return [len(self)]

    def get_chunks(self) -> list:
        return [self]

    def rechunk(self, *, in_place: bool = False) -> "Series":
        return self if in_place else self.clone()

    def shrink_to_fit(self, *, in_place: bool = False) -> "Series":
        return self if in_place else self.clone()

    def clear(self, n: int = 0) -> "Series":
        return Series(self.name, [None] * n, spark=self._spark)

    def clone(self) -> "Series":
        return self._wrap(self._s.copy())

    def estimated_size(self, unit: str = "b"):
        nbytes = int(self._s.memory_usage(index=False, deep=True))
        scale = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3, "tb": 1024**4}
        if unit not in scale:
            raise ValueError(f"unit must be one of {list(scale)}, got {unit!r}")
        return nbytes if unit == "b" else nbytes / scale[unit]

    def has_validity(self) -> bool:
        return bool(self._s.isna().any())

    def extend(self, other: "Series") -> "Series":
        """In-place append (reference Series.extend — the physically-
        contiguous variant of append; one block here either way)."""
        self._s = pd.concat([self._s, other._s], ignore_index=True).rename(
            self._s.name
        )
        return self

    def append(self, other: "Series") -> "Series":
        """In-place append (reference Series.append; chunk model is trivial
        here so append == extend)."""
        return self.extend(other)

    def sample(
        self,
        n: int | None = None,
        *,
        fraction: float | None = None,
        with_replacement: bool = False,
        shuffle: bool = False,
        seed: int | None = None,
    ) -> "Series":
        out = self._s.sample(
            n=n if fraction is None else None,
            frac=fraction,
            replace=with_replacement,
            random_state=seed,
        )
        return self._wrap(out.reset_index(drop=True))

    def shuffle(self, seed: int | None = None) -> "Series":
        return self._wrap(
            self._s.sample(frac=1.0, random_state=seed).reset_index(drop=True)
        )

    def new_from_index(self, index: int, length: int) -> "Series":
        return Series(self.name, [self[index]] * length, spark=self._spark)

    def scatter(self, indices, values) -> "Series":
        """Set values at positions (reference Series.scatter — mutating)."""
        idx = [indices] if isinstance(indices, int) else list(indices)
        if not isinstance(values, (list, tuple)):
            values = [values] * len(idx)
        s = self._s.copy()
        for i, v in zip(idx, values):
            s.iloc[i] = v
        self._s = s
        return self

    def set(self, filter_mask: "Series", value) -> "Series":
        mask = filter_mask._s.fillna(False).to_numpy(dtype=bool)
        s = self._s.copy()
        s[mask] = value
        return self._wrap(s)

    def zip_with(self, mask: "Series", other: "Series") -> "Series":
        """where(mask, self, other) elementwise (reference Series.zip_with)."""
        m = mask._s.fillna(False).to_numpy(dtype=bool)
        return self._wrap(self._s.where(m, other._s))

    def index_of(self, element):
        hits = self._s[self._s == element] if element is not None else self._s[self._s.isna()]
        return None if hits.empty else int(hits.index[0])

    def describe(self, percentiles=(0.25, 0.50, 0.75)):
        """Summary statistics frame (reference Series.describe)."""
        rows = [
            ("count", float(self._s.notna().sum())),
            ("null_count", float(self._s.isna().sum())),
        ]
        if pd.api.types.is_numeric_dtype(self._s):
            rows += [
                ("mean", self.mean()), ("std", self.std()), ("min", self.min()),
            ]
            for p in percentiles or ():
                rows.append((f"{int(p*100)}%", float(self._s.quantile(p)) if self._s.notna().any() else None))
            rows.append(("max", self.max()))
        else:
            # non-numeric: the value column is STRING-typed (reference
            # describe on str/bool series) — stringify the counts too
            nn = self._s.dropna()
            rows = [(k, None if v is None else str(int(v))) for k, v in rows]
            rows += [
                ("min", None if nn.empty else nn.min()),
                ("max", None if nn.empty else nn.max()),
            ]
            rows = [(k, None if v is None else str(v)) for k, v in rows]
        import polars_spark as pl

        return pl.DataFrame(
            {"statistic": [r[0] for r in rows], "value": [r[1] for r in rows]},
            spark=self._spark,
        )

    def sql(self, query: str, *, table_name: str = "self"):
        """Run SQL against this Series registered as ``table_name``
        (reference Series.sql)."""
        from polars_spark.sql import SQLContext

        ctx = SQLContext(frames={table_name: self.to_frame(self.name or "column_0")})
        return ctx.execute(query)

    def to_arrow(self):
        import pyarrow as pa

        return pa.Array.from_pandas(self._s)

    def to_dummies(self, *, separator: str = "_", drop_first: bool = False, drop_nulls: bool = False):
        name = self.name or "column_0"
        d = pd.get_dummies(self._s.rename(name), prefix=name, prefix_sep=separator,
                           drop_first=drop_first, dtype="int8")
        from polars_spark.sources import from_pandas

        return from_pandas(d, spark=self._spark)

    def to_init_repr(self, n: int = 1000) -> str:
        vals = self.head(n).to_list()
        return f'pl.Series("{self.name}", {vals!r})'

    def to_torch(self):
        try:
            import torch
        except ImportError as exc:
            raise NotImplementedError("to_torch needs the 'torch' package") from exc
        return torch.from_numpy(self._s.to_numpy())

    def to_jax(self):
        try:
            import jax.numpy as jnp
        except ImportError as exc:
            raise NotImplementedError("to_jax needs the 'jax' package") from exc
        return jnp.asarray(self._s.to_numpy())

    @property
    def plot(self):
        """Altair plot namespace — ``s.plot.hist/kde/line`` plus any
        ``mark_*`` via attribute access (reference series/plotting.py:24).
        Env-gated: raises when altair is absent (not in this image)."""
        import pandas as _pd

        from polars_spark.plotting import SeriesPlot

        name = self.name or ""
        pdf = _pd.DataFrame({"index": range(len(self)), name: self.to_list()})
        return SeriesPlot(name, pdf)

    @property
    def ext(self):
        raise NotImplementedError(
            "extension-type namespaces target polars' Rust extension registry; "
            "register Spark-side logic as expressions instead"
        )


class _SeriesExprNS:
    """Namespace proxy (s.str / s.dt / ...): each call routes through a
    single-column frame and the Expr namespace of the same name."""

    def __init__(self, series: "Series", ns: str):
        self._series = series
        self._ns = ns

    def __getattr__(self, method: str):
        def call(*args, **kwargs):
            e = getattr(self._series._as_expr(), self._ns)
            out = getattr(e, method)(*args, **kwargs)
            res = self._series._run_expr(out)
            if getattr(out, "_is_agg", False) and hasattr(res, "to_list"):
                # aggregate results (s.dt.min()) are SCALARS on a Series —
                # but only when the result is a single non-list value
                # (list-valued aggs like str.explode stay Series)
                vals = res.to_list()
                if not vals:
                    return None
                if len(vals) == 1 and not isinstance(vals[0], (list, tuple)) and not hasattr(vals[0], "tolist"):
                    return vals[0]
            return res

        return call

    def __getitem__(self, item):
        """Subscript namespaces (s.struct["field"] / s.struct[0]) route to
        the Expr namespace's own __getitem__."""
        e = getattr(self._series._as_expr(), self._ns)
        return self._series._run_expr(e[item])


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
    try:
        pdf = lf.select(col("__sidx"), expr.alias("__out")).collect()
        return Series(self.name, pdf.sort_values("__sidx")["__out"].tolist())
    except Exception as exc:
        # aggregate / length-changing exprs (top_k, arg_true, hist, ...)
        # cannot carry the row index through the projection — run bare
        if "MISSING_GROUP_BY" not in str(exc):
            raise
    out = lf.select(expr.alias("__out")).collect()["__out"]
    if len(out) == 1 and (
        isinstance(out.iloc[0], (list, tuple))
        or type(out.iloc[0]).__name__ == "ndarray"
    ):
        # imploded aggregate (one row, one array): flatten back to the
        # element Series, the polars shape for top_k/arg_true/...
        return Series(self.name, list(out.iloc[0]))
    if len(out) == 1:
        # scalar aggregate (quantile/any/all/entropy/...): polars returns
        # the VALUE, not a 1-row Series
        v = out.iloc[0]
        if v is None or pd.isna(v):
            return None
        return v.item() if hasattr(v, "item") else v
    return Series(self.name, out.tolist())


Series.__getattr__ = _series_getattr
Series._as_expr = _series_as_expr
Series._run_expr = _series_run_expr
