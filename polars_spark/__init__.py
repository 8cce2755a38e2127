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
from polars_spark.plans.frame import LazyFrame, align_frames, concat
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
    scan_delta,
    scan_iceberg,
    scan_orc,
    read_avro,
    read_database,
    read_excel,
    read_json,
    from_arrow,
    from_pandas,
    from_dict,
    from_dicts,
    from_records,
    from_numpy,
    from_repr,
    scan_table,
    int_range,
    linear_space,
    date_range,
    datetime_range,
    zeros,
    ones,
    select,
    collect_all,
    show_versions,
    set_random_seed,
    enable_string_cache,
    disable_string_cache,
    using_string_cache,
    read_ipc,
    read_ipc_stream,
    read_delta,
    read_database_uri,
    scan_lines,
    read_lines,
    read_parquet_schema,
    read_parquet_metadata,
    read_ipc_schema,
    json_normalize,
    from_dataframe,
    from_torch,
    merge_sorted,
    union,
    align_frames,
    explain_all,
    collect_all_async,
    thread_pool_size,
    threadpool_size,
    build_info,
    get_index_type,
    DataFrame,
)
from polars_spark import selectors  # noqa: E402
from polars_spark import exceptions  # noqa: E402
from polars_spark.series import Series  # noqa: E402
from polars_spark.sql import SQLContext, sql
from polars_spark.plans.expr import sql_expr  # noqa: E402
from polars_spark.plans.expr import (  # noqa: E402
    Int8,
    Int16,
    Int32,
    Int64,
    Int128,
    UInt8,
    UInt16,
    UInt32,
    UInt64,
    Float32,
    Float64,
    Boolean,
    String,
    Utf8,
    Binary,
    Date,
    Datetime,
    Time,
    Duration,
    Null,
)
from polars_spark.functions import (
    salted_join,
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
    std,
    var,
    head,
    tail,
    implode,
    quantile,
    cum_sum,
    cum_count,
    approx_n_unique,
    any,  # noqa: A004
    arctan2,
    arctan2d,
    format,  # noqa: A004
    from_epoch,
    cum_fold,
    cum_reduce,
    cum_sum_horizontal,
    date,
    datetime,
    duration,
    datetime_ranges,
    linear_spaces,
    escape_regex,
    field,
    arg_sort_by,
    arg_where,
    row_index,
)

# thin aliases (deprecated polars names kept for drop-in compatibility)
arange = int_range
concat_arr = concat_list

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
    "align_frames",
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
    "from_repr",
    "scan_table",
    "salted_join",
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
__version__ = "0.4.0"
