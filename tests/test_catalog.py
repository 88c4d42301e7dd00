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
