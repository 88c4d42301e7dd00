"""Catalog unit tests: type widening (SURVEY.md §1.3) and scan fan-out."""

import pyspark.sql.types as T
import pytest

from datafusion_sqlgen_spark.catalog import (
    FAN_OUT_MIN_ROWS,
    register_parquet,
    widen_type,
)
from tests.conftest import SF_DIR


@pytest.mark.parametrize(
    "src,expected",
    [
        ("uint8", T.ShortType()),
        ("uint16", T.IntegerType()),
        ("uint32", T.LongType()),
        ("uint64", T.DecimalType(20, 0)),
        ("float16", T.FloatType()),
        ("bigint", T.LongType()),
        ("string", T.StringType()),
    ],
)
def test_widen_type(src, expected):
    assert widen_type(src) == expected


def test_fan_out_only_for_large_tables(spark):
    """Tables below FAN_OUT_MIN_ROWS keep their native partitioning;
    larger single-row-group files fan out to the default parallelism."""
    region = register_parquet(spark, "t_region_fo", f"{SF_DIR}/region.parquet")
    assert region.rdd.getNumPartitions() == 1  # 5 rows: no pointless exchange

    import pyarrow.parquet as pq

    li_path = f"{SF_DIR}/lineitem.parquet"
    n_rows = pq.ParquetFile(li_path).metadata.num_rows
    li = register_parquet(spark, "t_lineitem_fo", li_path)
    parallelism = spark.sparkContext.defaultParallelism
    if n_rows >= FAN_OUT_MIN_ROWS:
        assert li.rdd.getNumPartitions() == parallelism
    else:
        assert li.rdd.getNumPartitions() == 1


def test_uint_widening_end_to_end(spark, tmp_path):
    """SURVEY §1.3's top type-mapping hazard, pinned end-to-end: a real
    UInt8/16/32/64 parquet file (written with pyarrow, including
    UInt64.max > Int64.max) flows through register_parquet to
    value-checked results that match DuckDB reading the same file.

    Spark's parquet reader performs exactly the widening WIDENING_MAP
    documents (uint8->short, uint16->int, uint32->long,
    uint64->decimal(20,0)) — the schema assertion keeps us honest if a
    Spark upgrade ever changes that."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "uints.parquet")
    table = pa.table(
        {
            "u8": pa.array([0, 1, 255], type=pa.uint8()),
            "u16": pa.array([0, 1, 65535], type=pa.uint16()),
            "u32": pa.array([0, 1, 4294967295], type=pa.uint32()),
            # 2^64-1 and 2^63 both exceed Int64.max — the overflow zone
            "u64": pa.array(
                [0, 9223372036854775808, 18446744073709551615],
                type=pa.uint64(),
            ),
        }
    )
    pq.write_table(table, path)

    df = register_parquet(spark, "t_uints", path)
    got = {f.name: f.dataType for f in df.schema.fields}
    assert got["u8"] == widen_type("uint8")
    assert got["u16"] == widen_type("uint16")
    assert got["u32"] == widen_type("uint32")
    assert got["u64"] == widen_type("uint64")

    spark_rows = sorted(
        tuple(str(v) for v in r)
        for r in spark.sql(
            "SELECT u8, u16, u32, CAST(u64 AS STRING) AS u64 FROM t_uints"
        ).collect()
    )
    duck_rows = sorted(
        tuple(str(v) for v in r)
        for r in duckdb.sql(
            "SELECT u8, u16, u32, CAST(u64 AS VARCHAR) AS u64 "
            f"FROM read_parquet('{path}')"
        ).fetchall()
    )
    assert spark_rows == duck_rows
    assert ("255", "65535", "4294967295", "18446744073709551615") in spark_rows

    # arithmetic above Int64.max stays exact through the decimal widening
    total = spark.sql("SELECT CAST(sum(u64) AS STRING) FROM t_uints").collect()
    assert total[0][0] == "27670116110564327423"  # 2^63 + (2^64 - 1)


def test_fan_out_keeps_pushdown(spark):
    """Predicate pushdown and column pruning must reach the scan through
    the Repartition node."""
    import io
    from contextlib import redirect_stdout

    df = register_parquet(spark, "t_orders_fo", f"{SF_DIR}/orders.parquet")
    q = df.filter("o_orderstatus = 'F'").select("o_orderkey")
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    txt = buf.getvalue()
    assert "EqualTo(o_orderstatus,F)" in txt
    read_schema = txt.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" not in read_schema
