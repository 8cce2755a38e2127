"""polars_spark: a PySpark-native analytics engine with polars capabilities."""

from polars_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
