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


# --- deterministic portable HLL (oracle-checkable twin) ----------------


def test_det_hll_merge_equals_global_registers(spark):
    """HLL union law on the portable registers: max-merging the
    per-group register tables equals building one register table over
    the ungrouped data — shard sketches union losslessly."""
    ev = spark.table("events").where(F.col("user_id").isNotNull())
    per_type = profiling.hll_registers(ev, "user_id", "event_type")
    merged = {
        (r["register"],): r["rho"]
        for r in profiling.hll_merge(per_type).collect()
    }
    whole = {
        (r["register"],): r["rho"]
        for r in profiling.hll_registers(
            ev.withColumn("__all", F.lit("all")), "user_id", "__all"
        ).collect()
    }
    assert merged == whole


def test_det_hll_estimate_tracks_exact(spark):
    """m=256 registers -> ~6.5% relative error; allow 3 sigma."""
    ev = spark.table("events")
    rows = profiling.hll_estimate(ev, "user_id", "event_type").collect()
    assert rows
    for r in rows:
        exact = r["n_distinct_exact"]
        assert abs(r["n_distinct_est"] - exact) <= max(5, 0.2 * exact), r


def test_det_hll_registers_bounded(spark):
    """State is <= 256 rows per group no matter the input size, and
    rho stays in [1, 53] — the fixed-width-state property that makes
    the sketch a mergeable rollup cell."""
    regs = profiling.hll_registers(spark.table("events")).collect()
    per_group: dict = {}
    for r in regs:
        per_group.setdefault(r["event_type"], 0)
        per_group[r["event_type"]] += 1
        assert 0 <= r["register"] < 256
        assert 1 <= r["rho"] <= 53
    assert all(n <= 256 for n in per_group.values())
