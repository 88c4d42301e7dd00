from datafusion_sqlgen_spark.operators import (
    affinity,
    dedup,
    joins,
    multimodal,
    profiling,
    sampling,
    similarity,
    text,
    timeseries,
)

__all__ = ["affinity", "dedup", "similarity", "text", "joins", "multimodal", "sampling", "timeseries", "profiling"]
