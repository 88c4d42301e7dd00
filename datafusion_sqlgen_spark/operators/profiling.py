"""Column profiling: data-quality stats for pipeline inputs.

No analogue in the reference (its only introspection is schema capture at
registration, tests/select.rs:73-95); this is the beyond-reference
data-pipeline mandate — before a 100-TB training run you profile the
inputs: null rates, cardinalities, value ranges.

Scale design: ONE pass over the table computes every column's stats in a
single partial+final aggregate (Catalyst plans the multi-DISTINCT via
expand; the shuffle carries one row of partial states per column set,
not data rows). The long-form reshape is a k-row ``stack`` over that one
aggregated row — driver-side cost is nil. The per-column UNION ALL
alternative (the oracle's formulation, which DuckDB optimizes fine at
test scale) would scan k times — that is the formulation to avoid at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-form profile: one row per column with row count, non-null
    count, null count, exact distinct count, and min/max rendered as
    strings (cast AFTER the aggregate — ``min(cast(c))`` would compare
    lexicographically).

    Avoid float columns: engines format doubles differently; cast to
    decimal first if a float column must be profiled against an oracle.
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nnull"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.append(
            f"'{c}', __rows, `{c}__n`, `{c}__nnull`, `{c}__nd`, "
            f"`{c}__min`, `{c}__max`"
        )
    stacked = (
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(col_name, n_rows, n_non_null, n_null, n_distinct, min_s, max_s)"
    )
    return one.selectExpr(stacked)


def profile_columns_oracle(table: str, cols: list[str]) -> str:
    parts = []
    for c in cols:
        parts.append(f"""
        SELECT '{c}' AS col_name,
               count(*) AS n_rows,
               count({c}) AS n_non_null,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_s,
               CAST(max({c}) AS VARCHAR) AS max_s
        FROM {table}""")
    return " UNION ALL ".join(parts)


def key_skew(
    df: DataFrame, key_col: str, top: int = 10
) -> DataFrame:
    """Join-key skew diagnostic: the planning signal for salting /
    AQE-skew-join decisions at scale. Reports the top heavy-hitter keys
    with their row share, plus the global skew ratio (max group size
    over mean group size) repeated on every row.

    Scale shape: one partial-aggregated count per key, a 1-row global
    aggregate broadcast back, and a TakeOrdered top-N — the per-key
    count table is never globally sorted or single-partitioned, so the
    operator works when distinct keys number in the billions."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
    )
    topk = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(top)
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    return (
        topk.crossJoin(F.broadcast(totals))
        .select(
            F.row_number().over(w).alias("rank"),
            F.col("key").cast("string").alias("key"),
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("total_rows"), 6).alias("share"),
            F.round(
                F.col("max_n")
                / (F.col("total_rows") / F.col("n_keys")),
                4,
            ).alias("skew_ratio"),
        )
    )


def key_skew_oracle(table: str, key_col: str, top: int = 10) -> str:
    return f"""
    WITH counts AS (
        SELECT {key_col} AS key, count(*) AS n FROM {table} GROUP BY 1
    ),
    tot AS (
        SELECT sum(n) AS total_rows, count(*) AS n_keys, max(n) AS max_n
        FROM counts
    ),
    topk AS (
        SELECT key, n FROM counts ORDER BY n DESC, key ASC LIMIT {top}
    )
    SELECT CAST(row_number() OVER (ORDER BY n DESC, key ASC) AS INT) AS rank,
           CAST(key AS VARCHAR) AS key,
           n,
           round(n / total_rows::DOUBLE, 6) AS share,
           round(max_n / (total_rows::DOUBLE / n_keys), 4) AS skew_ratio
    FROM topk CROSS JOIN tot
    """


def distinct_sketches(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """Per-group HLL sketches of a key's distinct count (Spark's
    Datasketches-backed ``hll_sketch_agg``). The 100-TB distinct-count
    pattern: sketches are small (KB), build map-side in one pass, and
    MERGE losslessly — so per-shard / per-day sketches can be persisted
    and unioned later instead of re-scanning history. No engine-portable
    oracle exists (sketch bytes are implementation-specific), so the
    correctness evidence is the mergeability law + exact-count tolerance
    in tests/test_sketches.py."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(key_col).alias("sketch"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


def merged_distinct_estimate(sketches: DataFrame) -> DataFrame:
    """Union per-group sketches into one global distinct estimate —
    the reduce side of the pattern (rows crossing the wire: one sketch
    per group, not one per key)."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("bigint")
        .alias("n_distinct_est")
    )


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 10,
) -> DataFrame:
    """Fixed-range histogram of a numeric column: ``width_bucket``
    binning (bin 0 = below range, nbins+1 = above), counts per bin with
    explicit bounds — the data-profiling staple. One map-side-combined
    aggregation over at most nbins+2 groups; empty bins are densified
    with a tiny generated spine so the output shape is stable.

    Deterministic and engine-portable: width_bucket has identical
    semantics in Spark and DuckDB (the registry maps it), and the bin
    bounds are pure arithmetic."""
    b = F.width_bucket(F.col(col), F.lit(lo), F.lit(hi), F.lit(nbins))
    counts = df.filter(F.col(col).isNotNull()).groupBy(
        b.cast("int").alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spark = df.sparkSession
    spine = spark.range(0, nbins + 2).select(
        F.col("id").cast("int").alias("bin")
    )
    width = (hi - lo) / nbins
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.round(F.lit(lo) + (F.col("bin") - 1) * F.lit(width), 6)
            .alias("bin_lo"),
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6)
            .alias("bin_hi"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
    )


def histogram_oracle(
    table: str, col: str, lo: float, hi: float, nbins: int = 10
) -> str:
    width = (hi - lo) / nbins
    # DuckDB 1.x has no width_bucket — the registry's CASE formula
    # (functions/registry.py) is inlined here verbatim
    wb = (
        f"(CASE WHEN ({col}) < ({lo}) THEN 0 "
        f"WHEN ({col}) >= ({hi}) THEN ({nbins}) + 1 "
        f"ELSE CAST(floor((({col}) - ({lo})) * ({nbins}) "
        f"/ (({hi}) - ({lo}))) AS BIGINT) + 1 END)"
    )
    return f"""
    WITH counts AS (
        SELECT CAST({wb} AS INT) AS bin,
               count(*) AS n
        FROM {table} WHERE {col} IS NOT NULL GROUP BY 1
    ),
    spine AS (
        SELECT CAST(unnest(range(0, {nbins + 2})) AS INT) AS bin
    )
    SELECT bin,
           round({lo} + (bin - 1) * {width}, 6) AS bin_lo,
           round({lo} + bin * {width}, 6) AS bin_hi,
           coalesce(n, 0) AS n
    FROM spine LEFT JOIN counts USING (bin)
    """


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns — the feature
    sanity check before a training run (collinear or dead metrics show
    up immediately). ONE pass: every pair's ``corr`` rides a single
    partial+final aggregate (the shuffle carries one row of moment
    states per pair, never data rows); the long-form reshape is a
    ``stack`` over that one aggregated row. Values round to 4 —
    correlation's normalized form absorbs partial-aggregation
    summation-order ULP."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = [
        F.round(F.corr(a, b), 4).alias(f"{a}__{b}") for a, b in pairs
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', `{a}__{b}`" for a, b in pairs
    )
    return one.select(
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
        )
    )


def correlation_matrix_oracle(table: str, cols: list[str]) -> str:
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    selects = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"round(corr({a}, {b}), 4) AS corr FROM {table}"
        for a, b in pairs
    ]
    return "\nUNION ALL\n".join(selects)


def robust_stats(
    df: DataFrame,
    val_col: str = "value",
    group_col: str = "event_type",
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    decimals: int = 4,
) -> DataFrame:
    """Winsorized per-group statistics — the outlier-robust metric gate
    (a handful of corrupt readings shouldn't move a monitoring mean):
    exact p_lo/p_hi percentiles per group, values clipped into that
    band, then the winsorized mean.

    Two passes by necessity (thresholds are an aggregate of the data
    they clip): one EXACT percentile aggregate (per-group sort in the
    agg — fine for bounded group counts; switch to approx_percentile
    when groups are huge), thresholds broadcast back (#groups rows),
    then one clipped re-aggregation. Both engines use the standard
    1+(n-1)p linear interpolation, so the thresholds agree exactly."""
    pcts = df.groupBy(group_col).agg(
        F.percentile(val_col, p_lo).alias("__plo"),
        F.percentile(val_col, p_hi).alias("__phi"),
    )
    clipped = df.join(F.broadcast(pcts), group_col).select(
        group_col,
        F.col("__plo"), F.col("__phi"),
        F.least(
            F.greatest(F.col(val_col), F.col("__plo")), F.col("__phi")
        ).alias("__cv"),
    )
    return clipped.groupBy(group_col).agg(
        F.round(F.min("__plo"), decimals).alias("p_lo"),
        F.round(F.min("__phi"), decimals).alias("p_hi"),
        F.round(F.avg("__cv"), decimals).alias("winsor_mean"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


def robust_stats_oracle(
    table: str = "events",
    val_col: str = "value",
    group_col: str = "event_type",
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    decimals: int = 4,
) -> str:
    return f"""
    WITH pcts AS (
        SELECT {group_col},
               quantile_cont({val_col}, {p_lo}) AS plo,
               quantile_cont({val_col}, {p_hi}) AS phi
        FROM {table} GROUP BY {group_col}
    )
    SELECT e.{group_col},
           round(min(p.plo), {decimals}) AS p_lo,
           round(min(p.phi), {decimals}) AS p_hi,
           round(avg(least(greatest(e.{val_col}, p.plo), p.phi)),
                 {decimals}) AS winsor_mean,
           count(*) AS n
    FROM {table} e JOIN pcts p USING ({group_col})
    GROUP BY e.{group_col}
    """


# --- Deterministic portable HyperLogLog -------------------------------
#
# distinct_sketches() above uses Spark's Datasketches-backed HLL, whose
# sketch bytes no other engine can replay — so its correctness evidence
# is law-based tests only. This variant trades a few bits of accuracy
# for full engine portability: registers derive from md5 (idx = first
# 2 hex chars, rho = leading-zero rank of the next 13), so DuckDB can
# rebuild the exact same register table and the driver can hash-compare
# it. The 100-TB shape is identical to the native path: per-group state
# is <= 256 (group, register, rho) rows built map-side in one pass,
# merge = max per register (associative, commutative, idempotent), and
# historical shards union without re-scanning data.

_HLL_P = 8                       # 2^8 = 256 registers
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 52                  # 13 md5 hex chars after the 2 index chars
_HLL_RHO_MAX = _HLL_WBITS + 1    # w == 0 -> all 52 bits zero
# Flajolet et al.'s bias constant for m >= 128, folded together with
# m^2 * 2^53 (the fixed-point scale of the register sum) into ONE float
# literal so both engines parse the identical double.
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_NUM = repr(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_WBITS + 1)))


def hll_registers(
    df: DataFrame, key_col: str = "user_id", group_col: str = "event_type"
) -> DataFrame:
    """Per-group deterministic-HLL register table: ``(group, register,
    rho)`` with rho = max leading-zero rank seen in that register.
    Engine-portable (md5-derived), so unlike :func:`distinct_sketches`
    the state itself is oracle-checkable. One narrow projection + one
    groupBy on (group, register) — the shuffle carries at most
    ``groups * 256`` rows regardless of input size."""
    key = F.col(key_col).cast("string")
    hx = F.md5(key)
    idx = F.conv(F.substring(hx, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(hx, 3, 13), 16, 10).cast("bigint")
    rho = (
        F.when(w == 0, F.lit(_HLL_RHO_MAX))
        .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.conv(w.cast("string"), 10, 2)))
        .cast("int")
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(group_col), idx.alias("register"), rho.alias("rho"))
        .groupBy(group_col, "register")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_merge(registers: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Merge per-group register tables into ONE global register set —
    max per register, the HLL union. This is the lossless-merge law the
    native-sketch path proves in tests, here visible to the oracle:
    merging shard sketches equals sketching the union."""
    return (
        registers.groupBy("register")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def _hll_estimate_col(s_present: Column, n_regs: Column) -> Column:
    """Estimate from a register aggregate: raw = alpha*m^2 / sum(2^-rho)
    (fixed-point: each register contributes 2^(53-rho), absent registers
    2^53 — BIGINT-exact, <= 2^61), with Flajolet's small-range linear
    counting m*ln(m/V) when raw <= 2.5m and V zero registers exist.
    Every input to the float ops is integer-exact, so both engines
    compute the identical double."""
    from datafusion_sqlgen_spark.operators.similarity import _stable_round

    v = F.lit(_HLL_M) - n_regs
    s_scaled = (
        s_present + v.cast("bigint") * F.lit(1 << (_HLL_WBITS + 1)).cast("bigint")
    )
    raw = F.lit(float(_HLL_NUM)) / s_scaled.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (v > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return _stable_round(est, 4)


def hll_estimate(
    df: DataFrame, key_col: str = "user_id", group_col: str = "event_type"
) -> DataFrame:
    """Per-group distinct estimate from the deterministic registers,
    alongside the exact count for audit. The exact branch is the
    expensive one (distinct shuffle) — at 100 TB you keep only the
    register branch; it is joined here so sf-level tests can see the
    error. Small group-count join, broadcast by AQE."""
    regs = hll_registers(df, key_col, group_col)
    agg = regs.groupBy(group_col).agg(
        # SQL-side shiftleft: the Python wrapper only takes a literal
        # shift amount, the engine function takes a column
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - rho)"))
        .alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    est = agg.select(
        F.col(group_col),
        _hll_estimate_col(F.col("__s"), F.col("__n")).alias("n_distinct_est"),
    )
    exact = df.where(F.col(key_col).isNotNull()).groupBy(group_col).agg(
        F.countDistinct(key_col).cast("bigint").alias("n_distinct_exact")
    )
    return est.join(exact, group_col)


def _hll_regs_sql(table: str, key_col: str, group_col: str) -> str:
    return f"""
    SELECT {group_col},
           CAST(CAST(concat('0x', substr(md5(CAST({key_col} AS VARCHAR)), 1, 2))
                AS BIGINT) AS INT) AS register,
           CAST(max(CASE
               WHEN CAST(concat('0x', substr(md5(CAST({key_col} AS VARCHAR)), 3, 13))
                    AS BIGINT) = 0 THEN {_HLL_RHO_MAX}
               ELSE {_HLL_RHO_MAX} - length(bin(CAST(concat('0x',
                    substr(md5(CAST({key_col} AS VARCHAR)), 3, 13)) AS BIGINT)))
           END) AS INT) AS rho
    FROM {table} WHERE {key_col} IS NOT NULL
    GROUP BY 1, 2"""


def hll_registers_oracle(
    table: str = "events", key_col: str = "user_id",
    group_col: str = "event_type",
) -> str:
    return _hll_regs_sql(table, key_col, group_col)


def hll_estimate_oracle(
    table: str = "events", key_col: str = "user_id",
    group_col: str = "event_type",
) -> str:
    from datafusion_sqlgen_spark.operators.similarity import _duck_round

    raw = f"({_HLL_NUM} / CAST(__s + ({_HLL_M} - __n) * (1::BIGINT << {_HLL_RHO_MAX}) AS DOUBLE))"
    est = (
        f"CASE WHEN {raw} <= {2.5 * _HLL_M} AND __n < {_HLL_M} "
        f"THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / CAST({_HLL_M} - __n AS DOUBLE)) "
        f"ELSE {raw} END"
    )
    return f"""
    WITH regs AS ({_hll_regs_sql(table, key_col, group_col)}),
    agg AS (
        SELECT {group_col},
               sum(1::BIGINT << ({_HLL_RHO_MAX} - rho)) AS __s,
               count(*) AS __n
        FROM regs GROUP BY {group_col}
    ),
    exact AS (
        SELECT {group_col},
               CAST(count(DISTINCT {key_col}) AS BIGINT) AS n_distinct_exact
        FROM {table} WHERE {key_col} IS NOT NULL GROUP BY {group_col}
    )
    SELECT a.{group_col}, {_duck_round(est, 4)} AS n_distinct_est,
           e.n_distinct_exact
    FROM agg a JOIN exact e USING ({group_col})"""


def hll_native_vs_portable(
    df: DataFrame, key_col: str = "user_id", group_col: str = "event_type"
) -> DataFrame:
    """Cross-tier HLL consistency (VERDICT r7 item 7): the native
    Datasketches estimate (``hll_sketch_agg``, the production tier — its
    sketch BYTES have no cross-engine oracle) and the engine-portable
    deterministic HLL must both land within their published error bounds
    of the exact count, per group, in one row the driver can hash-check.

    Bounds: Spark's default native lgConfigK=12 has relative standard
    error 1.04/sqrt(4096) ≈ 1.6% — 6% is >3σ.  The portable sketch has
    m=256 registers (RSE ≈ 6.5%) — 25% is >3σ.  The oracle recomputes
    the exact count and portable estimate independently and pins both
    agreement flags to TRUE, so a native-sketch regression (or a Spark
    upgrade changing its estimator beyond bounds) turns the row red.

    Scale shape: the native branch is the one you keep at 100 TB — one
    map-side sketch per group per partition, KB-sized merge.  The exact
    branch (distinct shuffle) exists here as the audit yardstick."""
    est = hll_estimate(df, key_col, group_col)
    native = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg(key_col))
            .cast("bigint")
            .alias("__native")
        )
    )
    j = est.join(native, group_col)
    exact = F.col("n_distinct_exact").cast("double")
    return j.select(
        group_col,
        "n_distinct_exact",
        "n_distinct_est",
        (F.abs(F.col("__native").cast("double") - exact) / exact
         <= F.lit(0.06)).alias("native_ok"),
        (F.abs(F.col("n_distinct_est") - exact) / exact
         <= F.lit(0.25)).alias("portable_ok"),
    )


def hll_native_vs_portable_oracle(
    table: str = "events", key_col: str = "user_id",
    group_col: str = "event_type",
) -> str:
    """Independent replay: exact + portable recomputed from scratch,
    ``native_ok`` pinned TRUE (the bound IS the claim — no engine other
    than Spark can produce the native estimate)."""
    return f"""
    WITH tiers AS ({hll_estimate_oracle(table, key_col, group_col)})
    SELECT {group_col}, n_distinct_exact, n_distinct_est,
           TRUE AS native_ok,
           abs(n_distinct_est - CAST(n_distinct_exact AS DOUBLE))
               / CAST(n_distinct_exact AS DOUBLE) <= 0.25 AS portable_ok
    FROM tiers"""


# ---------------------------------------------------------------------------
# Count-min sketch: deterministic portable heavy-hitter counting.
#
# No analogue in the reference (no sketching surface at all); this is the
# training-pipeline mandate: frequency questions ("which domains / users /
# n-grams dominate the corpus?") at 100 TB are answered from a sketch whose
# state is depth x width COUNTER CELLS, not keys. Like the deterministic HLL
# above, every hash is md5-derived so Spark and DuckDB build bit-identical
# sketches and the state itself is oracle-checkable.
#
# Scale design: the sketch build is one narrow projection (explode of a
# depth-length literal array) into a groupBy whose map-side partial
# aggregation bounds the shuffle at depth*width rows PER MAPPER regardless
# of input size. Merging shard sketches is a plain per-cell SUM -- exact,
# associative, commutative -- so per-day / per-shard sketches persist and
# combine without rescanning history (cms_merge of shard sketches is
# cell-identical to sketching the union, a law the heavy-hitter workload
# proves against the oracle). Point queries broadcast the KB-sized sketch.
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_cells(
    df: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """(d, bucket) probe cells for every input row: d in [0, depth), and
    bucket = first 8 md5 hex chars of 'd:key' mod width. 8 hex chars is
    32 bits -- exact in BIGINT in both engines."""
    key = F.col(key_col).cast("string")
    rows = df.where(F.col(key_col).isNotNull()).select(
        F.explode(F.array([F.lit(d) for d in range(depth)])).alias("d"),
        key.alias("__k"),
    )
    hx = F.md5(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("__k")))
    bucket = (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint") % F.lit(width)
    ).cast("int")
    return rows.select(F.col("d").cast("int").alias("d"), bucket.alias("bucket"))


def cms_sketch(
    df: DataFrame,
    key_col: str = "user_id",
    depth: int = _CMS_DEPTH,
    width: int = _CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of a key column: ``(d, bucket, cnt)`` with at most
    depth*width rows (absent cells are implicit zeros). Point-lookup
    estimate = min over d of the key's cell -- an overestimate bounded by
    n/width per extra colliding key, never an underestimate."""
    return (
        _cms_cells(df, key_col, depth, width)
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge shard sketches (a union of cms_sketch outputs) into one:
    per-cell SUM. Exact -- the merged sketch is cell-identical to
    sketching the concatenated inputs."""
    return (
        sketches.groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = _CMS_DEPTH,
    width: int = _CMS_WIDTH,
    out_col: str = "cms_cnt",
) -> DataFrame:
    """Point-query the sketch for each key in ``keys`` (one row per key):
    min over the depth rows of that key's cells. The sketch side is
    depth*width rows at most -- broadcast it; the probe explode is k
    rows per key into a map-side-combined min."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array([F.lit(d) for d in range(depth)])).alias("d"),
        key.alias("__k"),
    )
    hx = F.md5(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("__k")))
    bucket = (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint") % F.lit(width)
    ).cast("int")
    probes = probes.select(
        F.col(key_col), F.col("d").cast("int").alias("d"), bucket.alias("bucket")
    )
    from pyspark.sql.functions import broadcast

    joined = probes.join(broadcast(sketch), ["d", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias(out_col)
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str = "user_id",
    top: int = 10,
    depth: int = _CMS_DEPTH,
    width: int = _CMS_WIDTH,
) -> DataFrame:
    """Heavy hitters with sketch-vs-exact audit, exercising the merge law
    end-to-end: the corpus is split into two disjoint shards (even/odd
    md5 of the key), each shard sketched independently, the sketches
    merged -- then the top-N keys by EXACT count (deterministic
    tie-break on the key) are point-queried against the merged sketch.
    Output: (key, exact_cnt, cms_cnt) with cms_cnt >= exact_cnt always.
    At scale the exact branch is the one you drop; it is joined here so
    the sketch error is audit-visible."""
    key = F.col(key_col)
    base = df.where(key.isNotNull())
    # per-shard sub-sketches from ONE scan: the shard is a grouping
    # column of the cell build, not a filter — two real shard states
    # exist as rows and merge by sum, without scanning the data twice
    shard = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 2
    ).alias("shard")
    cells = base.select(
        shard,
        F.explode(F.array([F.lit(d) for d in range(depth)])).alias("d"),
        key.cast("string").alias("__k"),
    )
    hx = F.md5(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("__k")))
    bucket = (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint") % F.lit(width)
    ).cast("int")
    per_shard = (
        cells.select("shard", F.col("d").cast("int").alias("d"), bucket.alias("bucket"))
        .groupBy("shard", "d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    merged = cms_merge(per_shard.select("d", "bucket", "cnt"))
    exact = base.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    # orderBy+limit plans as TakeOrderedAndProject (per-partition heaps,
    # no global sort/window over the key-cardinality table)
    cand = exact.orderBy(F.col("exact_cnt").desc(), key.asc()).limit(top)
    est = cms_estimate(merged, cand.select(key_col), key_col, depth, width)
    return cand.join(est, key_col).select(key_col, "exact_cnt", "cms_cnt")


def _cms_cells_sql(
    source: str, key_col: str, depth: int, width: int
) -> str:
    """DuckDB twin of _cms_cells over an arbitrary FROM source."""
    k = f"CAST({key_col} AS VARCHAR)"
    return f"""
    SELECT CAST(i.i AS INT) AS d,
           CAST(CAST(concat('0x', substr(md5(concat(CAST(i.i AS VARCHAR), ':', {k})), 1, 8))
                AS BIGINT) % {width} AS INT) AS bucket
    FROM {source}, (SELECT unnest(range({depth})) AS i) i
    WHERE {key_col} IS NOT NULL"""


def cms_heavy_hitters_oracle(
    table: str = "events",
    key_col: str = "user_id",
    top: int = 10,
    depth: int = _CMS_DEPTH,
    width: int = _CMS_WIDTH,
) -> str:
    """DuckDB replay of cms_heavy_hitters. The two-shard build + merge on
    the Spark side is cell-identical to one global build (the merge law),
    so the oracle builds the sketch in one pass -- a driver hash match IS
    the merge-law proof."""
    k = f"CAST({key_col} AS VARCHAR)"
    return f"""
    WITH sketch AS (
        SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM ({_cms_cells_sql(table, key_col, depth, width)})
        GROUP BY d, bucket
    ),
    exact AS (
        SELECT {key_col}, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM {table} WHERE {key_col} IS NOT NULL GROUP BY {key_col}
    ),
    cand AS (
        SELECT {key_col}, exact_cnt
        FROM (SELECT *, row_number() OVER (ORDER BY exact_cnt DESC, {key_col} ASC) AS rn
              FROM exact)
        WHERE rn <= {top}
    ),
    probes AS (
        SELECT c.{key_col}, CAST(i.i AS INT) AS d,
               CAST(CAST(concat('0x', substr(md5(concat(CAST(i.i AS VARCHAR), ':', {k})), 1, 8))
                    AS BIGINT) % {width} AS INT) AS bucket
        FROM cand c, (SELECT unnest(range({depth})) AS i) i
    ),
    est AS (
        SELECT p.{key_col},
               CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cms_cnt
        FROM probes p LEFT JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
        GROUP BY p.{key_col}
    )
    SELECT c.{key_col}, c.exact_cnt, e.cms_cnt
    FROM cand c JOIN est e USING ({key_col})"""


# ---------------------------------------------------------------------------
# Binned quantile sketch: the third mergeable-state family (HLL =
# distinct, CMS = frequency, this = quantiles). DDSketch-shaped but with
# FIXED-POINT bins (floor(value * scale)) instead of log-gamma bins:
# double multiply + floor are bit-identical IEEE ops in Spark and DuckDB,
# while log() could differ in the last ulp at a bin boundary — the same
# determinism rule as similarity._stable_round. Absolute resolution is
# 1/scale; state is one (group, bin, cnt) row per OCCUPIED bin — bounded
# by value-range * scale, independent of row count — and shard states
# merge by per-bin SUM (exact), so per-day quantile states persist and
# combine without rescanning history. The estimate never touches floats
# that engines could disagree on: cum >= q*n compares integer-exact
# counts against q * (BIGINT-exact n).
# ---------------------------------------------------------------------------

_QSK_SCALE = 4  # bins of width 0.25


def binned_quantile_sketch(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    scale: int = _QSK_SCALE,
) -> DataFrame:
    """Per-group quantile state: ``(group, bin, cnt)``, one map-side-
    combined groupBy whose shuffle carries occupied bins, not rows."""
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col),
            F.floor(F.col(value_col) * F.lit(scale)).cast("bigint").alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def binned_quantile_merge(states: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Merge shard states: per-(group, bin) SUM — exact, so merged
    equals sketching the concatenated inputs."""
    return states.groupBy(group_col, "bin").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def binned_quantiles(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    qs: tuple = (0.5, 0.95, 0.99),
    scale: int = _QSK_SCALE,
) -> DataFrame:
    """Per-group quantile estimates from the merged sketch, exercising
    the merge law end-to-end like cms_heavy_hitters: the input splits
    into two md5 shards, each sketched independently, merged, then for
    each q the estimate is the midpoint of the smallest bin whose
    cumulative count reaches q*n. Window + joins run over the bounded
    state table (occupied bins), never over data rows. Estimate error
    is at most 1/(2*scale) absolute — the audit column ``n`` carries
    the exact population so tests can bound it."""
    from pyspark.sql import Window

    base = df.where(F.col(value_col).isNotNull())
    # one-scan shard demo, same shape as cms_heavy_hitters: shard is a
    # grouping column, the two sub-states merge by per-bin sum
    shard = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 2
    ).alias("shard")
    per_shard = (
        base.select(
            shard,
            F.col(group_col),
            F.floor(F.col(value_col) * F.lit(scale)).cast("bigint").alias("bin"),
        )
        .groupBy("shard", group_col, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    merged = binned_quantile_merge(
        per_shard.select(group_col, "bin", "cnt"), group_col
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = merged.withColumn("cum", F.sum("cnt").over(w))
    tot = merged.groupBy(group_col).agg(F.sum("cnt").cast("bigint").alias("n"))
    # every quantile picks its bin in ONE conditional aggregation over
    # the (broadcast-joined) state rows — not one join branch per q
    aggs = [
        (
            (
                F.min(F.when(F.col("cum") >= F.lit(q) * F.col("n"), F.col("bin")))
                + F.lit(0.5)
            )
            / F.lit(float(scale))
        ).alias(f"p{int(q * 100)}_est")
        for q in qs
    ]
    picks = cum.join(tot, group_col).groupBy(group_col).agg(
        F.max("n").cast("bigint").alias("n"), *aggs
    )
    return picks.select(group_col, "n", *[f"p{int(q * 100)}_est" for q in qs])


def binned_quantiles_oracle(
    table: str = "events",
    value_col: str = "value",
    group_col: str = "event_type",
    qs: tuple = (0.5, 0.95, 0.99),
    scale: int = _QSK_SCALE,
) -> str:
    """DuckDB one-pass replay — the driver hash match doubles as the
    merge-law proof, exactly like cms_heavy_hitters_oracle."""
    cols = ", ".join(
        f"(min(CASE WHEN cum >= {q!r} * n THEN bin END) + 0.5) / {float(scale)!r}"
        f" AS p{int(q * 100)}_est"
        for q in qs
    )
    return f"""
    WITH state AS (
        SELECT {group_col},
               CAST(floor({value_col} * {scale}) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM {table} WHERE {value_col} IS NOT NULL
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT {group_col}, bin, cnt,
               sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM state
    ),
    tot AS (
        SELECT {group_col}, CAST(sum(cnt) AS BIGINT) AS n
        FROM state GROUP BY {group_col}
    )
    SELECT {group_col}, CAST(max(n) AS BIGINT) AS n, {cols}
    FROM cum JOIN tot USING ({group_col})
    GROUP BY {group_col}"""


# ---------------------------------------------------------------------------
# KMV theta sketch: mergeable distinct sketches that, unlike HLL, support
# SET-OPERATION estimates (intersection/difference) — the sketch family
# behind Apache DataSketches' theta sketches (Dasgupta et al., "Theta-
# Sketch Framework", and Beyer et al. 2007's KMV estimator).  State is
# the k smallest distinct md5-derived 52-bit hash values per group:
# KB-sized, union-mergeable (k-min of concatenated k-min lists), and —
# because the hash is deterministic — bit-identical in any engine, so
# estimates are oracle-checkable exactly like the portable HLL above.
# ---------------------------------------------------------------------------

_THETA_K = 64
_THETA_HBITS = 52  # 13 md5 hex digits -> uniform in [0, 2^52)
_THETA_FULL = 1 << _THETA_HBITS


def _theta_hash_col(key_col: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 13), 16, 10
    ).cast("bigint")


def theta_sketch(
    df: DataFrame,
    key_col: str = "user_id",
    group_col: str = "event_type",
    k: int = _THETA_K,
) -> DataFrame:
    """Per-group KMV theta sketch: ``(group, ks)`` where ``ks`` is the
    sorted k smallest DISTINCT 52-bit hashes of ``key_col``.

    Two-level reduction so the per-group shuffle is bounded: level 0
    computes candidate k-mins per (group, input partition) — partition-
    local, so the level-1 exchange carries at most ``k * P`` rows per
    group instead of every distinct key.  Level 0's ``collect_set``
    holds that partition's distinct hashes during the fold; a
    production-hardened tier would swap in a bounded JVM UDAF
    (DataSketches' ThetaSketch UDAF) — the documented trade for staying
    dependency-free here.  The RESULT is partitioning-independent: the
    global k-min of distinct values equals the k-min of the union of
    partition k-mins."""
    lvl0 = (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.col(group_col),
            _theta_hash_col(key_col).alias("h"),
            F.spark_partition_id().alias("__pid"),
        )
        .groupBy(group_col, "__pid")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("ks"))
    )
    return (
        lvl0.select(group_col, F.explode("ks").alias("h"))
        .groupBy(group_col)
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("ks"))
    )


def theta_merge(sketches: DataFrame, k: int = _THETA_K) -> DataFrame:
    """Union-merge per-group sketches into ONE sketch: k smallest of the
    concatenated retained sets — the lossless KMV merge law (merging
    shard sketches equals sketching the shard union), proven in tests by
    sketching disjoint shards and comparing against a build-once run."""
    return (
        sketches.select(F.explode("ks").alias("h"))
        .distinct()
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("ks"))
    )


def _theta_threshold(ks: Column, k: int) -> Column:
    """The sketch's theta as an INTEGER hash threshold: the k-th
    smallest retained hash when full, else 2^52 (exact mode — the
    sketch saw fewer than k distinct keys and retains all of them)."""
    return (
        F.when(F.size(ks) < k, F.lit(_THETA_FULL))
        .otherwise(F.element_at(ks, k))
        .cast("bigint")
    )


def theta_set_estimates(
    sketches: DataFrame,
    group_col: str = "event_type",
    k: int = _THETA_K,
) -> DataFrame:
    """Pairwise INTERSECTION and UNION distinct estimates from per-group
    sketches — the operation HLL registers cannot express.  For a pair
    (A, B): theta = min(theta_A, theta_B); common = |{h in ka ∩ kb :
    h < theta}|; est_common = common * 2^52 / theta.  Union k-mins come
    from the merged retained sets (exact k smallest of A ∪ B — every
    missing hash is >= its own sketch's theta >= the merged k-th);
    est_union = (k-1) * 2^52 / theta_u, or the exact merged size when
    under k.  Every input to the float division is integer-exact, so
    both engines compute identical doubles (same discipline as the
    portable HLL estimate)."""
    from datafusion_sqlgen_spark.operators.similarity import _stable_round

    a = sketches.select(
        F.col(group_col).alias("type_a"), F.col("ks").alias("ka")
    )
    b = sketches.select(
        F.col(group_col).alias("type_b"), F.col("ks").alias("kb")
    )
    pairs = a.crossJoin(b).where(F.col("type_a") < F.col("type_b"))
    theta = F.least(
        _theta_threshold(F.col("ka"), k), _theta_threshold(F.col("kb"), k)
    )
    th = F.col("__theta")
    common = F.size(
        F.filter(F.array_intersect("ka", "kb"), lambda x: x < th)
    )
    est_common = _stable_round(
        common.cast("double") * F.lit(float(_THETA_FULL)) / th.cast("double"),
        4,
    )
    merged = F.slice(F.array_sort(F.array_union("ka", "kb")), 1, k)
    mth = _theta_threshold(F.col("__merged"), k)
    est_union = F.when(
        F.size("__merged") < k, F.size("__merged").cast("double")
    ).otherwise(
        _stable_round(
            F.lit(float(k - 1)) * F.lit(float(_THETA_FULL))
            / mth.cast("double"),
            4,
        )
    )
    return (
        pairs.withColumn("__theta", theta)
        .withColumn("__merged", merged)
        .select(
            "type_a",
            "type_b",
            est_common.alias("est_common"),
            est_union.alias("est_union"),
        )
    )


def theta_estimates_oracle(
    table: str = "events",
    key_col: str = "user_id",
    group_col: str = "event_type",
    k: int = _THETA_K,
) -> str:
    """DuckDB twin: replay the k-min-distinct state and the identical
    integer-threshold arithmetic (list_intersect/list_filter stand in
    for Spark's array ops; the estimates divide the same exact
    integers, so doubles match bit-for-bit)."""
    from datafusion_sqlgen_spark.operators.similarity import _duck_round

    full = _THETA_FULL
    return f"""
WITH h AS (
    SELECT DISTINCT {group_col} AS g,
           CAST(concat('0x', substr(md5(CAST({key_col} AS VARCHAR)), 1, 13))
                AS BIGINT) AS h
    FROM {table} WHERE {key_col} IS NOT NULL
),
sk AS (
    SELECT g, (list(h ORDER BY h))[1:{k}] AS ks FROM h GROUP BY g
),
pairs AS (
    SELECT a.g AS type_a, b.g AS type_b, a.ks AS ka, b.ks AS kb,
           least(
               CASE WHEN len(a.ks) < {k} THEN {full} ELSE a.ks[{k}] END,
               CASE WHEN len(b.ks) < {k} THEN {full} ELSE b.ks[{k}] END
           ) AS theta
    FROM sk a JOIN sk b ON a.g < b.g
),
calc AS (
    SELECT type_a, type_b, theta,
           len(list_filter(list_intersect(ka, kb), x -> x < theta))
               AS common,
           list_sort(list_distinct(ka || kb))[1:{k}] AS merged
    FROM pairs
)
SELECT type_a, type_b,
       {_duck_round(f"CAST(common AS DOUBLE) * CAST({full} AS DOUBLE) / CAST(theta AS DOUBLE)", 4)}
           AS est_common,
       CASE WHEN len(merged) < {k} THEN CAST(len(merged) AS DOUBLE)
            ELSE {_duck_round(f"CAST({k - 1} AS DOUBLE) * CAST({full} AS DOUBLE) / CAST(merged[{k}] AS DOUBLE)", 4)}
       END AS est_union
FROM calc
"""


def drift_psi(
    df: DataFrame,
    value_col: str,
    cohort_col: str,
    ref: str,
    cur: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two cohorts of one column —
    the standard drift gate between a reference corpus snapshot and a
    fresh crawl/ingest (PSI > 0.2 is the conventional "investigate"
    threshold; each bucket's term shows WHERE the distribution moved).

    Shape for 100 TB: one 1-row min/max aggregate broadcast back
    (bucket edges — never a quantile shuffle), fixed-width bucket
    assignment map-side, then ONE partial-aggregated count shuffle of
    at most ``n_buckets`` groups; the PSI arithmetic runs on those
    n_buckets rows against a second 1-row broadcast of the cohort
    totals. Nothing after the scan is proportional to the data.
    Smoothing: proportions are floored at ``eps`` so empty-on-one-side
    buckets contribute a finite term (the textbook Laplace-free PSI
    convention). Terms snap to 1e-6 fixed point (engine-identical
    rounding, see _stable_round).

    No reference-repo counterpart (the reference is a SQL unparser,
    sqlgenerator/src/lib.rs); this is LLM-pipeline surface beyond it.
    """
    from datafusion_sqlgen_spark.operators.similarity import _stable_round

    two = df.filter(
        F.col(cohort_col).isin(ref, cur) & F.col(value_col).isNotNull()
    ).select(F.col(value_col).alias("v"), F.col(cohort_col).alias("c"))
    mm = two.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets))
    bucket = F.when(F.col("hi") <= F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("v") - F.col("lo")) / width).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    counts = (
        two.crossJoin(F.broadcast(mm))  # 1-row edge broadcast, bounded
        .select(bucket.alias("bucket"), F.col("c"))
        .groupBy("bucket")
        .agg(
            F.sum((F.col("c") == ref).cast("long")).alias("n_ref"),
            F.sum((F.col("c") == cur).cast("long")).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")
    )
    p = F.greatest(F.col("n_ref").cast("double") / F.col("tr"), F.lit(eps))
    q = F.greatest(F.col("n_cur").cast("double") / F.col("tc"), F.lit(eps))
    return (
        counts.crossJoin(F.broadcast(tot))  # 1-row totals, bounded
        .select(
            F.col("bucket"),
            F.col("n_ref"),
            F.col("n_cur"),
            _stable_round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


def drift_psi_oracle(
    table: str,
    value_col: str,
    cohort_col: str,
    ref: str,
    cur: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> str:
    from datafusion_sqlgen_spark.operators.similarity import _duck_round

    p = f"greatest(CAST(n_ref AS DOUBLE) / tr, {eps!r})"
    q = f"greatest(CAST(n_cur AS DOUBLE) / tc, {eps!r})"
    return f"""
WITH two AS (
    SELECT {value_col} AS v, {cohort_col} AS c FROM {table}
    WHERE {cohort_col} IN ('{ref}', '{cur}') AND {value_col} IS NOT NULL
),
mm AS (SELECT min(v) AS lo, max(v) AS hi FROM two),
b AS (
    SELECT CASE WHEN hi <= lo THEN 0
                ELSE least(CAST(floor((v - lo) /
                         ((hi - lo) / {float(n_buckets)!r})) AS INT),
                           {n_buckets - 1}) END AS bucket,
           c
    FROM two, mm
),
counts AS (
    SELECT bucket,
           CAST(sum(CASE WHEN c = '{ref}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ref,
           CAST(sum(CASE WHEN c = '{cur}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cur
    FROM b GROUP BY bucket
),
tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts)
SELECT bucket, n_ref, n_cur,
       {_duck_round(f"(({p}) - ({q})) * ln(({p}) / ({q}))", 6)} AS psi_term
FROM counts, tot
"""


def drift_ks(
    df: DataFrame,
    value_col: str,
    cohort_col: str,
    ref: str,
    cur: str,
    n_buckets: int = 50,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic on bucketed CDFs — the
    drift gate PSI cannot replace: PSI sees per-bucket mass movement,
    KS sees the worst cumulative displacement (a small shift smeared
    across every bucket maxes KS while each PSI term stays tiny).
    Computed on the same fixed-width buckets as :func:`drift_psi`
    (``n_buckets`` finer by default — KS converges to the exact
    statistic as buckets shrink), which keeps it a bounded-state
    operator instead of the textbook full-sort formulation (at 100 TB
    a global sort per cohort is the wrong plan; the bucketed CDF needs
    ONE n_buckets-group count shuffle).

    Output: one row per bucket with both CDFs and the running |diff|,
    plus the gate reads ``max(ks_term)``. Fixed-point 1e-6 snapping.
    """
    from pyspark.sql import Window

    from datafusion_sqlgen_spark.operators.similarity import _stable_round

    two = df.filter(
        F.col(cohort_col).isin(ref, cur) & F.col(value_col).isNotNull()
    ).select(F.col(value_col).alias("v"), F.col(cohort_col).alias("c"))
    mm = two.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets))
    bucket = F.when(F.col("hi") <= F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("v") - F.col("lo")) / width).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    counts = (
        two.crossJoin(F.broadcast(mm))  # 1-row edge broadcast, bounded
        .select(bucket.alias("bucket"), F.col("c"))
        .groupBy("bucket")
        .agg(
            F.sum((F.col("c") == ref).cast("long")).alias("n_ref"),
            F.sum((F.col("c") == cur).cast("long")).alias("n_cur"),
        )
    )
    # running CDFs over the <= n_buckets count rows: a single-partition
    # window over a bounded relation (never the corpus)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    tot = counts.agg(F.sum("n_ref").alias("tr"),
                     F.sum("n_cur").alias("tc"))
    cum = (
        counts.crossJoin(F.broadcast(tot))  # 1-row totals, bounded
        .select(
            "bucket", "n_ref", "n_cur",
            (F.sum("n_ref").over(w).cast("double")
             / F.col("tr")).alias("cdf_ref_raw"),
            (F.sum("n_cur").over(w).cast("double")
             / F.col("tc")).alias("cdf_cur_raw"),
        )
    )
    return cum.select(
        "bucket", "n_ref", "n_cur",
        _stable_round(F.col("cdf_ref_raw"), 6).alias("cdf_ref"),
        _stable_round(F.col("cdf_cur_raw"), 6).alias("cdf_cur"),
        _stable_round(
            F.abs(F.col("cdf_ref_raw") - F.col("cdf_cur_raw")), 6
        ).alias("ks_term"),
    )


def drift_ks_oracle(
    table: str,
    value_col: str,
    cohort_col: str,
    ref: str,
    cur: str,
    n_buckets: int = 50,
) -> str:
    from datafusion_sqlgen_spark.operators.similarity import _duck_round

    return f"""
WITH two AS (
    SELECT {value_col} AS v, {cohort_col} AS c FROM {table}
    WHERE {cohort_col} IN ('{ref}', '{cur}') AND {value_col} IS NOT NULL
),
mm AS (SELECT min(v) AS lo, max(v) AS hi FROM two),
b AS (
    SELECT CASE WHEN hi <= lo THEN 0
                ELSE least(CAST(floor((v - lo) /
                         ((hi - lo) / {float(n_buckets)!r})) AS INT),
                           {n_buckets - 1}) END AS bucket,
           c
    FROM two, mm
),
counts AS (
    SELECT bucket,
           CAST(sum(CASE WHEN c = '{ref}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ref,
           CAST(sum(CASE WHEN c = '{cur}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cur
    FROM b GROUP BY bucket
),
tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts),
cum AS (
    SELECT bucket, n_ref, n_cur,
           CAST(sum(n_ref) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / tr AS cdf_ref_raw,
           CAST(sum(n_cur) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / tc AS cdf_cur_raw
    FROM counts, tot
)
SELECT bucket, n_ref, n_cur,
       {_duck_round("cdf_ref_raw", 6)} AS cdf_ref,
       {_duck_round("cdf_cur_raw", 6)} AS cdf_cur,
       {_duck_round("abs(cdf_ref_raw - cdf_cur_raw)", 6)} AS ks_term
FROM cum
"""


def embedding_dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension embedding statistics — the standard collapse /
    staleness audit before trusting an index (a dimension whose std is
    ~0 carries no information; a mean far from 0 breaks cosine
    assumptions; min==max flags a dead dimension). Returns ``(dim, n,
    mean_v, std_v, min_v, max_v)``.

    Determinism: values enter the mean/std as 1e-6 fixed-point BIGINTs
    (floor(v*1e6+0.5)), so the sums are order-free integers and the
    derived moments are identical doubles on both engines; min/max are
    exact. Sample variance via the sum-of-squares identity over the
    fixed-point sums.

    Scale shape: one posexplode (dims-fold of the corpus, a narrow
    map) and ONE dims-group aggregate with map-side partials — output
    is `dims` rows."""
    from datafusion_sqlgen_spark.operators.similarity import _stable_round

    vals = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("dim", "v"))
    vfp = F.floor(F.col("v") * 1e6 + F.lit(0.5)).cast("bigint")
    agg = vals.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vfp).alias("sfp"),
        F.sum(vfp * vfp).alias("qfp"),
        F.min("v").alias("min_raw"),
        F.max("v").alias("max_raw"),
    )
    n = F.col("n").cast("double")
    mean = F.col("sfp").cast("double") / (F.lit(1e6) * n)
    var = (
        (F.col("qfp").cast("double") / F.lit(1e12)
         - (F.col("sfp").cast("double") / F.lit(1e6))
         * (F.col("sfp").cast("double") / F.lit(1e6)) / n)
        / (n - F.lit(1.0))
    )
    return agg.select(
        F.col("dim").cast("int").alias("dim"), "n",
        _stable_round(mean, 6).alias("mean_v"),
        _stable_round(F.sqrt(F.greatest(var, F.lit(0.0))), 6)
        .alias("std_v"),
        _stable_round(F.col("min_raw"), 6).alias("min_v"),
        _stable_round(F.col("max_raw"), 6).alias("max_v"),
    )


def embedding_dim_stats_oracle(
    table: str = "embeddings",
    vec_col: str = "embedding",
) -> str:
    from datafusion_sqlgen_spark.operators.similarity import _duck_round

    mean = "CAST(sfp AS DOUBLE) / (1000000.0 * n)"
    var = ("(CAST(qfp AS DOUBLE) / 1000000000000.0 "
           "- (CAST(sfp AS DOUBLE) / 1000000.0) "
           "* (CAST(sfp AS DOUBLE) / 1000000.0) / n) / (n - 1.0)")
    return f"""
WITH vals AS (
    SELECT CAST(generate_subscripts({vec_col}, 1) - 1 AS INT) AS dim,
           CAST(unnest({vec_col}) AS DOUBLE) AS v
    FROM {table}
),
agg AS (
    SELECT dim, CAST(count(*) AS BIGINT) AS n,
           sum(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS sfp,
           sum(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)
               * CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS qfp,
           min(v) AS min_raw, max(v) AS max_raw
    FROM vals GROUP BY dim
)
SELECT dim, n,
       {_duck_round(mean, 6)} AS mean_v,
       {_duck_round(f"sqrt(greatest({var}, 0.0))", 6)} AS std_v,
       {_duck_round("min_raw", 6)} AS min_v,
       {_duck_round("max_raw", 6)} AS max_v
FROM agg
"""


def winsorize_stats(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization audit: clip ``value_col`` to its
    group's [lo, hi] interpolated percentiles (both snapped to 1e-6
    before clipping so the clip boundary is the same double on both
    engines) and report ``(group, lo_b, hi_b, n, n_lo, n_hi,
    mean_w)`` — the outlier-trimming pass a score/length column gets
    before feeding mixing weights or a regression.

    Scale shape: one group aggregate for the bounds (exact percentile
    — swap for the quantile sketch when groups are huge), a broadcast
    join of the bounds table back, and one group reduce with
    fixed-point sums of the clipped values."""
    from datafusion_sqlgen_spark.operators.similarity import _stable_round

    src = df.filter(F.col(value_col).isNotNull())
    bounds = src.groupBy(group_col).agg(
        _stable_round(F.percentile(F.col(value_col), F.lit(lo)), 6)
        .alias("lo_b"),
        _stable_round(F.percentile(F.col(value_col), F.lit(hi)), 6)
        .alias("hi_b"),
    )
    v = F.col(value_col)
    j = src.join(F.broadcast(bounds), group_col)
    clipped = F.least(F.greatest(v, F.col("lo_b")), F.col("hi_b"))
    cfp = F.floor(clipped * 1e6 + F.lit(0.5)).cast("bigint")
    return (
        j.groupBy(group_col, "lo_b", "hi_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((v < F.col("lo_b")).cast("bigint")).alias("n_lo"),
            F.sum((v > F.col("hi_b")).cast("bigint")).alias("n_hi"),
            F.sum(cfp).alias("sfp"),
        )
        .select(
            group_col, "lo_b", "hi_b", "n", "n_lo", "n_hi",
            _stable_round(
                F.col("sfp").cast("double") / F.lit(1e6)
                / F.col("n").cast("double"), 6,
            ).alias("mean_w"),
        )
    )


def winsorize_stats_oracle(
    table: str = "events",
    value_col: str = "value",
    group_col: str = "event_type",
    lo: float = 0.05,
    hi: float = 0.95,
) -> str:
    from datafusion_sqlgen_spark.operators.similarity import _duck_round

    return f"""
WITH src AS (
    SELECT {group_col}, {value_col} AS v FROM {table}
    WHERE {value_col} IS NOT NULL
),
bounds AS (
    SELECT {group_col},
           {_duck_round(f"quantile_cont(v, {lo})", 6)} AS lo_b,
           {_duck_round(f"quantile_cont(v, {hi})", 6)} AS hi_b
    FROM src GROUP BY {group_col}
)
SELECT s.{group_col}, b.lo_b, b.hi_b,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN s.v < b.lo_b THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lo,
       CAST(sum(CASE WHEN s.v > b.hi_b THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hi,
       {_duck_round(
           "sum(CAST(floor(least(greatest(s.v, b.lo_b), b.hi_b) "
           "* 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 / count(*)", 6)}
           AS mean_w
FROM src s JOIN bounds b USING ({group_col})
GROUP BY s.{group_col}, b.lo_b, b.hi_b
"""


def snapshot_drift(
    df: DataFrame,
    cohort_sql: str,
    columns: list[str],
    numeric_cols: list[str] | None = None,
) -> DataFrame:
    """Per-COLUMN health drift between two snapshots of one table —
    the schema-level companion to the value-level :func:`drift_psi` /
    :func:`drift_ks` gates. ``cohort_sql`` is a boolean SQL expression
    (TRUE = current snapshot, FALSE = baseline); for every listed
    column the audit reports null-rate (basis points), exact distinct
    count, and — for ``numeric_cols`` — a 1e-3 fixed-point mean, each
    as baseline/current/delta. The question it answers is the first
    one a pipeline owner asks about a fresh crawl: "did any column's
    null rate, cardinality, or level shift?" — BEFORE looking at full
    value distributions.

    Exactness: null counts and distincts are integers; means sum
    pre-rounded 1e-3 fixed-point BIGINTs (order-free, engine-exact;
    headroom to ~1e10 rows at 1e6-scale values — beyond that, widen
    the fixed point to cents). Deltas are plain BIGINT subtraction.

    Scale shape: ONE pass over the scan — a 2-group aggregate (map-side
    partials) carrying per-column null sums and fixed-point sums, plus
    the multi-column exact COUNT(DISTINCT) Spark executes via a single
    Expand (one extra shuffle row per column per input row — the
    documented exact-cardinality cost; at 100 TB swap
    ``approx_count_distinct`` into the same shape for a sketch-sized
    shuffle). The per-column unpivot runs on the 1×2 aggregate rows,
    never the corpus. Beyond-reference LLM-pipeline surface."""
    numeric_cols = numeric_cols or []
    d = df.withColumn("__cur", F.expr(cohort_sql).cast("boolean"))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in columns:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint")
            .alias(f"__null_{c}")
        )
        aggs.append(
            F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}")
        )
    for c in numeric_cols:
        aggs.append(
            F.sum(F.expr(f"CAST(round({c} * 1000) AS BIGINT)"))
            .cast("bigint").alias(f"__summ_{c}")
        )
    g = d.groupBy("__cur").agg(*aggs)
    base = g.filter(~F.col("__cur")).select(
        F.col("n_rows").alias("__b_rows"),
        *[F.col(f"__null_{c}").alias(f"__b_null_{c}") for c in columns],
        *[F.col(f"__nd_{c}").alias(f"__b_nd_{c}") for c in columns],
        *[F.col(f"__summ_{c}").alias(f"__b_summ_{c}") for c in numeric_cols],
    )
    cur = g.filter(F.col("__cur")).select(
        F.col("n_rows").alias("__c_rows"),
        *[F.col(f"__null_{c}").alias(f"__c_null_{c}") for c in columns],
        *[F.col(f"__nd_{c}").alias(f"__c_nd_{c}") for c in columns],
        *[F.col(f"__summ_{c}").alias(f"__c_summ_{c}") for c in numeric_cols],
    )
    joined = base.crossJoin(F.broadcast(cur))
    # unpivot over the 1x1 joined aggregate row: one output row per
    # audited column, all arithmetic BIGINT
    parts = []
    for c in columns:
        if c in numeric_cols:
            bm = f"CAST(__b_summ_{c} DIV __b_rows AS BIGINT)"
            cm = f"CAST(__c_summ_{c} DIV __c_rows AS BIGINT)"
        else:
            bm = cm = "CAST(NULL AS BIGINT)"
        parts.append(
            f"'{c}', __b_rows, __c_rows, "
            f"CAST(__b_null_{c} * 10000 DIV __b_rows AS BIGINT), "
            f"CAST(__c_null_{c} * 10000 DIV __c_rows AS BIGINT), "
            f"__b_nd_{c}, __c_nd_{c}, "
            f"CAST((__c_nd_{c} - __b_nd_{c}) * 10000 "
            f"DIV greatest(__b_nd_{c}, 1) AS BIGINT), "
            f"{bm}, {cm}"
        )
    stack = (
        f"stack({len(columns)}, " + ", ".join(parts) + ") AS "
        "(column_name, base_rows, curr_rows, base_null_bp, curr_null_bp,"
        " base_distinct, curr_distinct, distinct_delta_bp,"
        " base_mean_milli, curr_mean_milli)"
    )
    return joined.select(F.expr(stack)).withColumn(
        "null_delta_bp",
        (F.col("curr_null_bp") - F.col("base_null_bp")).cast("bigint"),
    )


def snapshot_drift_oracle(
    table: str,
    cohort_sql: str,
    columns: list[str],
    numeric_cols: list[str] | None = None,
) -> str:
    numeric_cols = numeric_cols or []
    aggs = ["CAST(count(*) AS BIGINT) AS n_rows"]
    for c in columns:
        aggs.append(
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS null_{c}"
        )
        aggs.append(f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c}")
    for c in numeric_cols:
        aggs.append(
            f"CAST(sum(CAST(round({c} * 1000) AS BIGINT)) AS BIGINT)"
            f" AS summ_{c}"
        )
    arms = []
    for c in columns:
        if c in numeric_cols:
            bm = f"CAST(b.summ_{c} // b.n_rows AS BIGINT)"
            cm = f"CAST(c.summ_{c} // c.n_rows AS BIGINT)"
        else:
            bm = cm = "CAST(NULL AS BIGINT)"
        arms.append(f"""
    SELECT '{c}' AS column_name,
           b.n_rows AS base_rows, c.n_rows AS curr_rows,
           CAST(b.null_{c} * 10000 // b.n_rows AS BIGINT) AS base_null_bp,
           CAST(c.null_{c} * 10000 // c.n_rows AS BIGINT) AS curr_null_bp,
           b.nd_{c} AS base_distinct, c.nd_{c} AS curr_distinct,
           CAST((c.nd_{c} - b.nd_{c}) * 10000
               // greatest(b.nd_{c}, 1) AS BIGINT) AS distinct_delta_bp,
           {bm} AS base_mean_milli, {cm} AS curr_mean_milli,
           CAST(c.null_{c} * 10000 // c.n_rows
               - b.null_{c} * 10000 // b.n_rows AS BIGINT) AS null_delta_bp
    FROM b, c""")
    return f"""
    WITH cohorts AS (
        SELECT *, CAST(({cohort_sql}) AS BOOLEAN) AS cur FROM {table}
    ),
    g AS (
        SELECT cur, {", ".join(aggs)} FROM cohorts GROUP BY cur
    ),
    b AS (SELECT * FROM g WHERE NOT cur),
    c AS (SELECT * FROM g WHERE cur)
    {" UNION ALL ".join(arms)}
    """
