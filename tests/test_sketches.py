"""HLL sketch distinct counting: mergeability law + accuracy bounds.

No cross-engine oracle exists (sketch bytes are implementation-
specific), so correctness is the algebra: (a) merging per-group
sketches gives the SAME estimate as one global sketch — the property
that makes per-shard sketch persistence sound at 100 TB; (b) the
estimate tracks the exact distinct count within HLL's error bound."""

from pyspark.sql import functions as F

from datafusion_sqlgen_spark.operators import profiling


def test_sketch_merge_equals_global(spark):
    ev = spark.table("events")
    per_type = profiling.distinct_sketches(ev, "user_id", "event_type")
    merged = profiling.merged_distinct_estimate(per_type).collect()[0][0]
    global_est = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint")
    ).collect()[0][0]
    assert merged == global_est


def test_sketch_estimate_tracks_exact(spark):
    ev = spark.table("events")
    exact = ev.select("user_id").distinct().count()
    per_type = profiling.distinct_sketches(ev, "user_id", "event_type")
    est = profiling.merged_distinct_estimate(per_type).collect()[0][0]
    # default lgK=12 -> relative error ~1.6%; allow 5% slack
    assert abs(est - exact) <= max(2, 0.05 * exact)


def test_sketches_are_small(spark):
    ev = spark.table("events")
    rows = profiling.distinct_sketches(ev, "user_id", "event_type").collect()
    assert all(len(r["sketch"]) < 64 * 1024 for r in rows)
