"""polars_spark: a PySpark-native analytics engine with polars capabilities.

Usage mirrors polars (``import polars_spark as pl``):

    import polars_spark as pl
    lf = pl.scan_parquet("/data/lineitem.parquet")
    out = (
        lf.filter(pl.col("l_shipdate") <= pl.lit("1998-09-02").cast("Datetime"))
          .group_by("l_returnflag")
          .agg(pl.col("l_quantity").sum().alias("sum_qty"))
          .sort("l_returnflag")
    )
    out.collect()          # pandas result, frame order applied
    out.to_spark()         # the underlying pyspark DataFrame

The whole engine is declarative Spark DataFrame lineage — Catalyst/AQE own
optimization and execution (SURVEY.md §3/§4).
"""

from polars_spark.session import get_spark, stop_spark
from polars_spark.plans.expr import (  # noqa: A004
    Categorical,
    Enum,
    Expr,
    all_ as all,
    col,
    lit,
    nth,
    when,
)
from polars_spark.plans.frame import LazyFrame, concat
from polars_spark.plans.namespaces import element
from polars_spark.sources import (
    scan_parquet,
    read_parquet,
    scan_csv,
    read_csv,
    scan_ndjson,
    read_ndjson,
    scan_ipc,
    scan_pyarrow_dataset,
    from_arrow,
    from_pandas,
    DataFrame,
)
from polars_spark.sql import SQLContext, sql
from polars_spark.plans.expr import sql_expr  # noqa: E402
from polars_spark.functions import (
    sum,  # noqa: A004
    min,  # noqa: A004
    max,  # noqa: A004
    mean,
    median,
    first,
    last,
    count,
    n_unique,
    len,  # noqa: A004
    sum_horizontal,
    min_horizontal,
    max_horizontal,
    mean_horizontal,
    all_horizontal,
    any_horizontal,
    concat_str,
    concat_list,
    struct,
    coalesce,
    fold,
    reduce,  # noqa: A004
    corr,
    cov,
    exclude,
    rolling_corr,
    rolling_cov,
    int_ranges,
    date_ranges,
    business_day_count,
    repeat,
)

__all__ = [
    "get_spark",
    "stop_spark",
    "Categorical",
    "Enum",
    "Expr",
    "LazyFrame",
    "col",
    "lit",
    "when",
    "all",
    "nth",
    "element",
    "concat",
    "scan_parquet",
    "read_parquet",
    "scan_csv",
    "read_csv",
    "scan_ndjson",
    "read_ndjson",
    "scan_ipc",
    "scan_pyarrow_dataset",
    "from_arrow",
    "from_pandas",
    "DataFrame",
    "SQLContext",
    "sql",
    "sql_expr",
    "sum",
    "min",
    "max",
    "mean",
    "median",
    "first",
    "last",
    "count",
    "n_unique",
    "len",
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
__version__ = "0.2.0"
