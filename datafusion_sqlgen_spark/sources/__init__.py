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
    write_training_shards,
    write_zordered,
    write_zordered_auto,
    zorder_key,
)

__all__ = [
    "read_parquet", "read_csv", "read_json", "read_orc",
    "write_parquet", "write_csv", "write_json", "write_orc", "write_bucketed",
    "write_training_shards", "write_zordered", "write_zordered_auto",
    "zorder_key",
]
