"""IO plugins: user-defined sources (polars ``register_io_source``,
py-polars/src/polars/io/plugins.py) on the Spark 4 Python DataSource API.

A plugin is a generator of pandas batches; it is registered as a first-class
datasource, so ``spark.read.format(name)`` plans it like any scan (the
generator runs on executors, partitioned by the plugin's ``partitions``
hint — nothing flows through the driver)."""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader
from pyspark.sql.types import StructType

from polars_spark.plans.frame import LazyFrame

__all__ = ["register_io_source", "scan_io_source"]

_REGISTRY: dict[str, tuple[str, Callable[[int], Iterator]]] = {}


def register_io_source(
    name: str,
    *,
    schema: str,
    generator: Callable[[int], Iterator],
    num_partitions: int = 1,
    spark: SparkSession | None = None,
) -> None:
    """Register ``generator(partition_index) -> iterator of row tuples`` as
    datasource ``name`` with the given DDL ``schema``."""
    spark = spark or SparkSession.getActiveSession()

    class _Reader(DataSourceReader):
        def __init__(self, schema_, options):
            self._schema = schema_

        def partitions(self):
            from pyspark.sql.datasource import InputPartition

            return [InputPartition(i) for i in range(num_partitions)]

        def read(self, partition):
            import pandas as pd
            import pyarrow as pa

            for item in generator(partition.value):
                # polars io-plugin generators yield whole frames; accept
                # Arrow batches/tables and pandas frames on the Arrow fast
                # path (no per-row Python conversion), plain tuples otherwise
                if isinstance(item, pa.RecordBatch):
                    yield item
                elif isinstance(item, pa.Table):
                    yield from item.to_batches()
                elif isinstance(item, pd.DataFrame):
                    yield from pa.Table.from_pandas(
                        item, preserve_index=False
                    ).to_batches()
                else:
                    yield item

    class _Source(DataSource):
        @classmethod
        def name(cls):
            return name

        def schema(self):
            return schema

        def reader(self, schema):
            return _Reader(schema, self.options)

    spark.dataSource.register(_Source)
    _REGISTRY[name] = (schema, generator)


def scan_io_source(name: str, *, spark: SparkSession | None = None) -> LazyFrame:
    spark = spark or SparkSession.getActiveSession()
    return LazyFrame(spark.read.format(name).load())
