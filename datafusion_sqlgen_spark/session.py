"""SparkSession factory with scale-oriented defaults.

The reference has no execution engine (it delegates to DataFusion); our
execution engine is Spark itself, so this module is where the 100-TB
posture lives: AQE (runtime coalescing, skew-join splitting, join
demotion), Arrow on every Python boundary, explicit shuffle-partition
sizing, and UTC session time so results are reproducible against the
DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# On a real cluster these come from spark-submit; in this repo's tests we
# run local[$SPARK_GRAFT_CPUS] (default 32 threads, single JVM).
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "datafusion-sqlgen-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    Defaults are chosen for the scale story, not just local tests:

    * ``spark.sql.adaptive.*`` — AQE re-plans at runtime: coalesces tiny
      shuffle partitions, splits skewed ones, demotes sort-merge joins to
      broadcast when the built side turns out small. This is the main
      defense for 100-TB joins over skewed TPC-H-ish keys.
    * ``spark.sql.shuffle.partitions`` — sized to the local core count
      here; at cluster scale you want ~2-3x total cores and AQE coalesce
      takes care of the rest.
    * ``spark.sql.execution.arrow.pyspark.enabled`` — every pandas-UDF /
      toPandas boundary moves columnar Arrow batches, not pickled rows.
    * ``spark.sql.session.timeZone=UTC`` — timestamps hash identically
      against the DuckDB oracle regardless of host TZ.
    * ``spark.sql.parquet.filterPushdown`` / aggregatePushdown — scans do
      the filtering; verified via .explain() PushedFilters in tests.
    """
    cpus = str(cpus or DEFAULT_CPUS)
    shuffle_partitions = int(shuffle_partitions or max(int(cpus), 8))
    # Python workers must be able to import this package for pandas-UDF
    # closures (cloudpickle serializes module functions by reference).
    # Local mode: workers inherit the JVM env, which inherits ours — set
    # PYTHONPATH before the JVM spawns. Cluster mode: ship via --py-files.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # NULL-tolerant arithmetic (Spark 4 defaults ANSI on): x/0 -> NULL
        # like DuckDB, and one malformed row cannot kill a 1000-executor
        # job — the right default for a data pipeline engine
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # the driver's parquet uses TIMESTAMP(NANOS) which Spark rejects;
        # read as int64 nanos and catalog.register_parquet converts to
        # TimestampType (micros) at the view layer — stays lazy/distributed
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
