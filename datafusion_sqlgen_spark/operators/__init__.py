from datafusion_sqlgen_spark.operators import (
    affinity,
    dedup,
    graph,
    joins,
    multimodal,
    profiling,
    sampling,
    similarity,
    text,
    timeseries,
)

__all__ = ["affinity", "dedup", "graph", "similarity", "text", "joins", "multimodal", "sampling", "timeseries", "profiling"]
