"""polars.testing.parametric parity (py-polars/src/polars/testing/parametric/):
hypothesis strategies that generate frames for property-based tests.

``dataframes()`` / ``series()`` return hypothesis strategies producing
LazyFrames / pandas Series with randomized (or caller-pinned) columns,
null patterns and sizes — the same shape our own tests/test_property.py
uses, packaged for downstream users.  Exposed as
``polars_spark.testing.parametric`` would shadow the module file layout,
so import directly: ``from polars_spark.testing_parametric import dataframes``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

try:
    from hypothesis import strategies as st
except ImportError as exc:  # pragma: no cover
    raise NotImplementedError("testing_parametric needs hypothesis") from exc


@dataclass
class column:
    """Column spec for dataframes() (reference parametric.column)."""

    name: str
    dtype: str = "float"  # int | float | str | bool
    allow_null: bool = True


_VALUE_STRATEGIES = {
    "int": st.integers(-(2**31), 2**31 - 1),
    "float": st.floats(-1e12, 1e12, allow_nan=False),
    "str": st.text(alphabet="abcdefg h", max_size=12),
    "bool": st.booleans(),
}


def _col_strategy(spec: column, n: int):
    base = _VALUE_STRATEGIES[spec.dtype]
    if spec.allow_null:
        base = st.one_of(st.none(), base)
    return st.lists(base, min_size=n, max_size=n)


def dataframes(
    cols: list[column] | int = 3,
    *,
    min_size: int = 0,
    max_size: int = 20,
    lazy: bool = True,
):
    """Strategy producing LazyFrames (or pandas frames with ``lazy=False``).

    ``cols`` is a list of ``column`` specs, or an int for that many
    auto-named float columns (reference dataframes() default shape)."""
    if isinstance(cols, int):
        cols = [column(f"col{i}") for i in range(cols)]

    @st.composite
    def build(draw):
        n = draw(st.integers(min_size, max_size))
        data = {c.name: draw(_col_strategy(c, n)) for c in cols}
        pdf = pd.DataFrame(data, columns=[c.name for c in cols])
        if not lazy:
            return pdf
        import polars_spark as pl

        return pl.from_pandas(pdf)

    return build()


def series(*, dtype: str = "float", allow_null: bool = True, min_size: int = 0, max_size: int = 20):
    """Strategy producing pandas Series (the engine's Series facade accepts
    them directly)."""

    @st.composite
    def build(draw):
        n = draw(st.integers(min_size, max_size))
        vals = draw(_col_strategy(column("s", dtype, allow_null), n))
        return pd.Series(vals, name="s")

    return build()
