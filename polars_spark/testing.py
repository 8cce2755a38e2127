"""polars.testing parity: assert_frame_equal / assert_series_equal /
assert_frame_not_equal / assert_series_not_equal.

Reference surface: py-polars/src/polars/testing/asserts/frame.py:36 and
series.py:30 (signatures and comparison semantics only — the implementation
here materializes through pandas and compares driver-side, which is exactly
what a unit-test assertion should do; the frames under test still execute
distributed up to the collect).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pandas as pd

__all__ = [
    "assert_frame_equal",
    "assert_frame_not_equal",
    "assert_schema_equal",
    "assert_series_equal",
    "assert_series_not_equal",
]


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "collect"):
        return obj.collect()
    if hasattr(obj, "to_pandas"):
        out = obj.to_pandas()
        return out.to_frame() if isinstance(out, pd.Series) else out
    raise TypeError(f"cannot compare object of type {type(obj).__name__}")


def _values_equal(a: Any, b: Any, *, check_exact: bool, rel_tol: float, abs_tol: float) -> bool:
    a_na = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_na = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    try:
        a_na = a_na or pd.isna(a)
        b_na = b_na or pd.isna(b)
    except (TypeError, ValueError):
        pass
    if a_na or b_na:
        return bool(a_na and b_na)
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(b, (list, tuple, np.ndarray)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(
            _values_equal(x, y, check_exact=check_exact, rel_tol=rel_tol, abs_tol=abs_tol)
            for x, y in zip(la, lb)
        )
    if isinstance(a, float) or isinstance(b, float):
        if check_exact:
            return float(a) == float(b)
        return math.isclose(float(a), float(b), rel_tol=rel_tol, abs_tol=abs_tol)
    return a == b


def assert_frame_equal(
    left,
    right,
    *,
    check_row_order: bool = True,
    check_column_order: bool = True,
    check_dtypes: bool = True,
    check_exact: bool = False,
    rel_tol: float = 1e-5,
    abs_tol: float = 1e-8,
    rtol: float | None = None,
    atol: float | None = None,
    categorical_as_str: bool = False,
) -> None:
    """Assert two frames (LazyFrame or pandas) are equal, with a detailed
    AssertionError on mismatch (reference asserts/frame.py:36 semantics:
    row/column order and dtype checks toggleable, float tolerance).
    ``rtol``/``atol`` are the reference's parameter names (aliases)."""
    if rtol is not None:
        rel_tol = rtol
    if atol is not None:
        abs_tol = atol
    lp, rp = _to_pandas(left), _to_pandas(right)

    lcols, rcols = list(lp.columns), list(rp.columns)
    if check_column_order:
        if lcols != rcols:
            raise AssertionError(f"columns differ: {lcols} != {rcols}")
    else:
        if sorted(lcols) != sorted(rcols):
            raise AssertionError(f"column sets differ: {sorted(lcols)} != {sorted(rcols)}")
        rp = rp[lcols]
    if len(lp) != len(rp):
        raise AssertionError(f"height differs: {len(lp)} != {len(rp)}")
    if check_dtypes:
        for c in lcols:
            if str(lp[c].dtype) != str(rp[c].dtype):
                raise AssertionError(
                    f"dtype of column {c!r} differs: {lp[c].dtype} != {rp[c].dtype}"
                )
    if not check_row_order:
        key = [c for c in lcols if lp[c].dtype != object] or lcols

        def norm(df):
            d = df.copy()
            for c in lcols:
                if d[c].dtype == object:
                    d[c] = d[c].map(
                        lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
                    )
            return d.sort_values(lcols, ignore_index=True)

        lp, rp = norm(lp), norm(rp)
    for c in lcols:
        for i, (a, b) in enumerate(zip(lp[c].tolist(), rp[c].tolist())):
            if not _values_equal(a, b, check_exact=check_exact, rel_tol=rel_tol, abs_tol=abs_tol):
                raise AssertionError(
                    f"value mismatch in column {c!r} at row {i}: {a!r} != {b!r}"
                )


def assert_frame_not_equal(left, right, **kwargs) -> None:
    try:
        assert_frame_equal(left, right, **kwargs)
    except AssertionError:
        return
    raise AssertionError("frames are equal (expected not equal)")


def _series_to_list(s) -> tuple[str, list, str]:
    if isinstance(s, pd.Series):
        return (s.name or "", s.tolist(), str(s.dtype))
    if hasattr(s, "to_pandas"):
        p = s.to_pandas()
        name = getattr(s, "name", None) or (p.name or "")
        return (name, p.tolist(), str(p.dtype))
    if isinstance(s, (list, tuple)):
        return ("", list(s), "object")
    raise TypeError(f"cannot compare object of type {type(s).__name__}")


def assert_series_equal(
    left,
    right,
    *,
    check_dtypes: bool = True,
    check_names: bool = True,
    check_order: bool = True,
    check_exact: bool = False,
    rel_tol: float = 1e-5,
    abs_tol: float = 1e-8,
    categorical_as_str: bool = False,
) -> None:
    ln, lv, ld = _series_to_list(left)
    rn, rv, rd = _series_to_list(right)
    if check_names and ln != rn:
        raise AssertionError(f"name mismatch: {ln!r} != {rn!r}")
    if len(lv) != len(rv):
        raise AssertionError(f"length mismatch: {len(lv)} != {len(rv)}")
    if check_dtypes and ld != rd:
        raise AssertionError(f"dtype mismatch: {ld} != {rd}")
    if not check_order:
        lv, rv = sorted(lv, key=repr), sorted(rv, key=repr)
    for i, (a, b) in enumerate(zip(lv, rv)):
        if not _values_equal(a, b, check_exact=check_exact, rel_tol=rel_tol, abs_tol=abs_tol):
            raise AssertionError(f"value mismatch at index {i}: {a!r} != {b!r}")


def assert_series_not_equal(left, right, **kwargs) -> None:
    try:
        assert_series_equal(left, right, **kwargs)
    except AssertionError:
        return
    raise AssertionError("series are equal (expected not equal)")


def assert_schema_equal(left, right, *, check_column_order: bool = True, check_dtypes: bool = True) -> None:
    """Assert two schemas are equal (reference testing/asserts/schema.py).
    Accepts Schema/dict mappings; detailed AssertionError on mismatch."""
    ln, rn = list(left.keys()), list(right.keys())
    if check_column_order:
        if ln != rn:
            msg = f"schemas have different column order:\n[left]: {ln}\n[right]: {rn}"
            raise AssertionError(msg)
    elif sorted(ln) != sorted(rn):
        msg = f"schemas have different columns:\n[left]: {sorted(ln)}\n[right]: {sorted(rn)}"
        raise AssertionError(msg)
    if check_dtypes:
        for k in ln:
            if str(left[k]) != str(right[k]):
                msg = (
                    f"schemas have different dtypes for column {k!r}:"
                    f"\n[left]: {left[k]}\n[right]: {right[k]}"
                )
                raise AssertionError(msg)
