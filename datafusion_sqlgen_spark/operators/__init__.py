from datafusion_sqlgen_spark.operators import (
    dedup,
    joins,
    multimodal,
    profiling,
    sampling,
    similarity,
    text,
    timeseries,
)

__all__ = ["dedup", "similarity", "text", "joins", "multimodal", "sampling", "timeseries", "profiling"]
