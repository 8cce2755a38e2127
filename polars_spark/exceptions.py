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
