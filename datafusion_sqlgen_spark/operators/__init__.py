from datafusion_sqlgen_spark.operators import dedup, joins, similarity, text

__all__ = ["dedup", "similarity", "text", "joins"]
