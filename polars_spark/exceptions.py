"""polars-compatible exception hierarchy (reference
py-polars/src/polars/exceptions.py) so drop-in code can keep its
``except pl.exceptions.ColumnNotFoundError`` handlers.

Spark raises AnalysisException with a structured errorClass;
``translate_errors`` (used by the LazyFrame entry points) re-raises the
common classes as their polars names, chaining the original so the Spark
diagnostics (suggestions, plan fragment) stay visible.
"""

from __future__ import annotations

from contextlib import contextmanager


class PolarsError(Exception):
    """Base class (reference exceptions.py PolarsError)."""


class ColumnNotFoundError(PolarsError):
    """A referenced column does not exist."""


class ComputeError(PolarsError):
    """The engine could not finish an operation."""


class DuplicateError(PolarsError):
    """A column/field name occurs more than once."""


class InvalidOperationError(PolarsError):
    """The operation is not allowed on this dtype/shape."""


class NoDataError(PolarsError):
    """Operation on an empty frame that requires data."""


class OutOfBoundsError(PolarsError):
    """An index is outside the frame bounds."""


class SchemaError(PolarsError):
    """Unexpected schema (dtype mismatch, wrong column set)."""


class SchemaFieldNotFoundError(SchemaError):
    """A named field is missing from the schema."""


class ShapeError(PolarsError):
    """Frame/column lengths are incompatible."""


class StructFieldNotFoundError(PolarsError):
    """A struct field does not exist."""


_CLASS_MAP = {
    "UNRESOLVED_COLUMN": ColumnNotFoundError,
    "UNRESOLVED_USING_COLUMN_FOR_JOIN": ColumnNotFoundError,
    "COLUMN_ALREADY_EXISTS": DuplicateError,
    "FIELD_NOT_FOUND": StructFieldNotFoundError,
    "CANNOT_RESOLVE_STAR_EXPAND": ColumnNotFoundError,
    "DATATYPE_MISMATCH": SchemaError,
    "NUM_COLUMNS_MISMATCH": ShapeError,
    "INVALID_COLUMN_OR_FIELD_DATA_TYPE": SchemaError,
    # missing scan paths raise the builtin FileNotFoundError, like polars
    "PATH_NOT_FOUND": FileNotFoundError,
}


_RUNTIME_MAP = {
    # execution-time (collect) error classes -> polars names
    "CAST_INVALID_INPUT": InvalidOperationError,
    "CAST_OVERFLOW": InvalidOperationError,
    "NUMERIC_VALUE_OUT_OF_RANGE": InvalidOperationError,
    "ARITHMETIC_OVERFLOW": InvalidOperationError,
    "DIVIDE_BY_ZERO": InvalidOperationError,
    "INVALID_ARRAY_INDEX": OutOfBoundsError,
    "INVALID_INDEX_OF_ZERO": OutOfBoundsError,
}


@contextmanager
def translate_errors():
    """Re-raise Spark AnalysisExceptions under their polars names."""
    from pyspark.errors import AnalysisException

    try:
        yield
    except AnalysisException as exc:
        cls = None
        error_class = None
        try:
            error_class = exc.getErrorClass()
        except Exception:
            pass
        if error_class:
            cls = _CLASS_MAP.get(error_class.split(".")[0])
        if cls is None:
            raise
        raise cls(str(exc)) from exc


@contextmanager
def translate_runtime_errors():
    """Re-raise Spark EXECUTION failures under their polars names: strict
    casts (polars InvalidOperationError), raise_error-backed guards (Enum
    validation and option guards raise via F.raise_error, arriving as
    USER_RAISED_EXCEPTION), index OOB.  Analysis errors pass through
    translate_errors' mapping too (collect analyzes lazily-built extras
    like the frame-order sort)."""
    from pyspark.errors import AnalysisException
    from pyspark.errors.exceptions.base import PySparkException

    try:
        yield
    except AnalysisException as exc:
        cls = None
        try:
            ec = exc.getErrorClass()
        except Exception:
            ec = None
        if ec:
            cls = _CLASS_MAP.get(ec.split(".")[0])
        if cls is None:
            raise
        raise cls(str(exc)) from exc
    except PySparkException as exc:
        msg = str(exc)
        cls = None
        for key, mapped in _RUNTIME_MAP.items():
            if key in msg:
                cls = mapped
                break
        if cls is None and "USER_RAISED_EXCEPTION" in msg:
            cls = InvalidOperationError
        if cls is None:
            raise
        raise cls(msg) from exc
