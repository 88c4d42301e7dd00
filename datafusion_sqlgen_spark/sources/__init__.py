from datafusion_sqlgen_spark.sources.io import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    write_bucketed,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)

__all__ = [
    "read_parquet", "read_csv", "read_json", "read_orc",
    "write_parquet", "write_csv", "write_json", "write_orc", "write_bucketed",
]
