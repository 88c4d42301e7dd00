from datafusion_sqlgen_spark.functions.registry import (
    AGGREGATES,
    WINDOW_FUNCS,
    render_func,
    spark_agg_column,
    spark_func_column,
)

__all__ = [
    "render_func",
    "spark_func_column",
    "spark_agg_column",
    "AGGREGATES",
    "WINDOW_FUNCS",
]
