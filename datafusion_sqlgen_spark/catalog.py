"""Catalog registration: parquet/csv/in-memory tables -> Spark temp views.

Mirrors the reference's three registration modes (Parquet
``tests/select.rs:73-78``, CSV ``tests/select.rs:90-95``, in-memory
``tests/select.rs:270-273`` in /root/reference) on the Spark session
catalog, plus the unsigned-int/Float16 widening map from SURVEY.md §1.3
(Spark has no unsigned integers or half floats).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# SURVEY.md §1.3: DataFusion types Spark lacks, widened without overflow.
# Keys are Arrow-style names as they'd appear in external schemas.
WIDENING_MAP: dict[str, T.DataType] = {
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float16": T.FloatType(),
}


def widen_type(type_name: str) -> T.DataType:
    """Map an Arrow/DataFusion type name to a safe Spark type.

    Unsigned ints widen one rank (reference surface: sqlgenerator/src/
    expr.rs:288-339 renders UNSIGNED TINYINT..BIGINT, which Spark cannot
    hold natively).
    """
    key = type_name.strip().lower()
    if key in WIDENING_MAP:
        return WIDENING_MAP[key]
    atomic = {
        "boolean": T.BooleanType(), "tinyint": T.ByteType(), "int8": T.ByteType(),
        "smallint": T.ShortType(), "int16": T.ShortType(),
        "int": T.IntegerType(), "int32": T.IntegerType(), "integer": T.IntegerType(),
        "bigint": T.LongType(), "int64": T.LongType(), "long": T.LongType(),
        "float": T.FloatType(), "float32": T.FloatType(),
        "double": T.DoubleType(), "float64": T.DoubleType(),
        "string": T.StringType(), "utf8": T.StringType(), "largeutf8": T.StringType(),
        "binary": T.BinaryType(), "date": T.DateType(),
        "timestamp": T.TimestampType(),
    }
    if key in atomic:
        return atomic[key]
    # complex types (array<...>, struct<...>, decimal(p,s)) need the DDL
    # parser, which requires an active SparkContext
    return T._parse_datatype_string(key)  # noqa: SLF001 - public-enough helper


def _parquet_footer(path: str) -> tuple[list[str], int, int]:
    """(nanos-timestamp columns, num_rows, num_row_groups) from the footer.

    Nanos columns: stored as parquet TIMESTAMP(NANOS) — Spark reads them
    as int64 only (spark.sql.legacy.parquet.nanosAsLong)."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        f = pq.ParquetFile(path)
        nanos = [
            fld.name
            for fld in f.schema_arrow
            if pa.types.is_timestamp(fld.type) and fld.type.unit == "ns"
        ]
        return nanos, f.metadata.num_rows, f.metadata.num_row_groups
    except Exception:
        return [], 0, 0


FAN_OUT_MIN_ROWS = 1024


def register_parquet(
    spark: SparkSession, name: str, path: str, fan_out: bool = True
) -> DataFrame:
    """Parquet: self-describing schema (reference tests/select.rs:73-78).

    TIMESTAMP(NANOS) columns (illegal in Spark's parquet reader) arrive as
    int64 nanos and are converted to TimestampType at the view layer —
    a projection Catalyst pushes into the scan, no materialization.

    **Scan fan-out**: parquet splits at row-group granularity, so a file
    with fewer row groups than the session has cores scans (near-)serially
    no matter what ``maxPartitionBytes`` says. When that's the case (and
    the table isn't dim-tiny) the view gets a round-robin ``repartition``
    to the default parallelism: a few-MB exchange that unlocks every core
    for the compute above it. Production-scale tables have row_groups >=
    parallelism and skip this branch entirely; Catalyst still pushes
    filters and column pruning through the Repartition into the scan.
    """
    from pyspark.sql import functions as F

    nanos_cols, n_rows, n_groups = _parquet_footer(path)
    df = spark.read.parquet(path)
    for c in nanos_cols:
        # integer DIV, not `/`: nanos exceed 2^53 so double division would
        # round the microsecond (off-by-one vs DuckDB's truncation)
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    parallelism = spark.sparkContext.defaultParallelism
    if fan_out and n_rows >= FAN_OUT_MIN_ROWS and n_groups < parallelism:
        df = df.repartition(parallelism)
    df.createOrReplaceTempView(name)
    return df


def register_csv(
    spark: SparkSession,
    name: str,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV: inferred schema by default (reference tests/select.rs:90-95)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    df.createOrReplaceTempView(name)
    return df


def register_memtable(
    spark: SparkSession,
    name: str,
    rows: list,
    schema: T.StructType | list[str],
) -> DataFrame:
    """In-memory table with explicit schema (reference tests/select.rs:253-273)."""
    df = spark.createDataFrame(rows, schema=schema)
    df.createOrReplaceTempView(name)
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register the driver's synthetic star schema (TESTDATA.md) as views.

    Missing files are skipped so smaller fixture dirs still work. Works on
    *any* SparkSession (e.g. one the driver created without our factory):
    the two confs results depend on — nanos-parquet reading and UTC
    timestamps — are runtime-settable and pinned here.

    Registration is memoized per (session, path): the driver and bench
    call this once per query, and re-deriving footers/views each time
    costs more than the queries themselves at small scale.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # div-by-zero -> NULL (matches the DuckDB oracle); see session.py
    spark.conf.set("spark.sql.ansi.enabled", "false")
    memo: dict[str, DataFrame] = spark.__dict__.setdefault("_dsq_registered", {})
    out: dict[str, DataFrame] = {}
    for name in tables or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        key = f"{name}\0{path}"
        if key not in memo:
            memo[key] = register_parquet(spark, name, path)
        out[name] = memo[key]
    return out
