"""Property-based tests for the round-4 operators: random inputs vs
brute-force Python twins. The DuckDB oracles pin cross-engine agreement
on the driver tables; these pin the SEMANTICS on adversarial inputs the
fixed corpus never produces (exact-gap boundaries, all-identical docs,
empty shingle sets, negative/zero vectors).
"""

import datetime as dt
import math

import pytest
from hypothesis import given, settings, strategies as st

from datafusion_sqlgen_spark.operators import similarity, text, timeseries

BASE = dt.datetime(2024, 1, 1)


def _py_sessions(events, gap_s, strict):
    """Brute-force sessionizer: events = [(key, seconds, value)]."""
    out = {}
    by_key = {}
    for k, s, v in sorted(events, key=lambda e: (e[0], e[1])):
        by_key.setdefault(k, []).append((s, v))
    for k, evs in by_key.items():
        sess = 0
        prev = None
        for s, v in evs:
            diff = None if prev is None else s - prev
            new = prev is None or (diff >= gap_s if strict else diff > gap_s)
            if new:
                sess += 1
                out[(k, sess)] = [s, s, 0, 0.0]
            rec = out[(k, sess)]
            rec[1] = s
            rec[2] += 1
            rec[3] += v
            prev = s
    return {
        (k, n): (BASE + dt.timedelta(seconds=a), BASE + dt.timedelta(seconds=b),
                 c, round(total, 4))
        for (k, n), (a, b, c, total) in out.items()
    }


@settings(max_examples=20, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),                      # key
            st.integers(0, 7200),                   # seconds offset
            st.integers(-5, 5),                     # value (int: exact sums)
        ),
        min_size=1,
        max_size=25,
    ),
    strict=st.booleans(),
)
def test_sessionize_matches_bruteforce(spark, events, strict):
    """Includes exact-gap boundaries (multiples of the 600s gap are in
    range) and duplicate timestamps — the two cases the driver corpus
    can't produce."""
    rows = [
        (k, BASE + dt.timedelta(seconds=s), float(v)) for k, s, v in events
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = {
        (r.user_id, r.session_no): (
            r.session_start, r.session_end, r.n_events, r.total_value
        )
        for r in timeseries.sessionize(
            df, gap_s=600, strict_gap=strict
        ).collect()
    }
    want = _py_sessions(events, 600, strict)
    assert got == want


def _py_shingles(txt, n=3):
    words = txt.lower().split()
    if not words:
        words = [""]
    k = max(len(words) - (n - 1), 1)
    return {" ".join(words[i:i + n]) for i in range(k)}


WORD = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
DOC = st.lists(WORD, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(
    corpus=st.lists(DOC, min_size=1, max_size=6),
    bench=st.lists(DOC, min_size=1, max_size=4),
)
def test_decontaminate_matches_bruteforce(spark, corpus, bench):
    cdf = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id bigint, text string"
    )
    bdf = spark.createDataFrame(
        list(enumerate(bench)), "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_matched, r.contaminated)
        for r in text.decontaminate(cdf, bdf, threshold=0.5).collect()
    }
    bset = set().union(*(_py_shingles(b) for b in bench))
    for i, doc in enumerate(corpus):
        shs = _py_shingles(doc)
        matched = len(shs & bset)
        assert got[i] == (
            len(shs), matched, matched >= 0.5 * len(shs)
        ), (doc, shs, bset)


@settings(max_examples=15, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-8, 8, allow_nan=False, width=32),
            min_size=2,
            max_size=5,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_quantize_int8_matches_bruteforce(spark, vecs):
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id bigint, embedding array<float>"
    )
    got = {
        r.vec_id: (r.scale, r.q_sum, r.max_abs_err)
        for r in similarity.quantize_int8(df).collect()
    }
    for i, v in enumerate(vecs):
        # replicate float32 storage then the double math
        v32 = [float(__import__("numpy").float32(x)) for x in v]
        maxabs = max(abs(x) for x in v32)
        if maxabs == 0:
            assert got[i][0] is None
            continue
        scale = 127.0 / maxabs
        q = [_round_half_away(x * scale) for x in v32]
        err = max(abs(qi / scale - xi) for qi, xi in zip(q, v32))
        assert got[i] == (round(scale, 4), int(sum(q)), round(err, 6)), (
            v32, scale, q
        )


def _round_half_away(x: float) -> float:
    f = math.floor(abs(x))
    frac = abs(x) - f
    r = f + 1 if frac >= 0.5 else f
    return math.copysign(r, x)


@settings(max_examples=15, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),            # hour bucket
            st.sampled_from(["a", "b"]),  # event_type
            st.integers(-5, 5),           # value (int: exact partial sums)
            st.integers(0, 3),            # partition assignment
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_merge_rollup_law_under_arbitrary_splits(spark, events):
    """The mergeable-rollup algebra (round 5 streaming-sink substrate):
    for ANY partition of the input into batches, folding merge_rollups
    over per-batch states then finalizing equals finalizing the rollup
    of all rows at once — the invariant that makes the foreachBatch
    materialized view trustworthy under arbitrary trigger boundaries."""
    from functools import reduce

    rows = [
        (dt.datetime(2024, 1, 1, h), t, float(v), p)
        for h, t, v, p in events
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double, part int"
    )
    whole = timeseries.finalize_rollup(
        timeseries.mergeable_rollup(df.drop("part"))
    )
    parts = [
        timeseries.mergeable_rollup(
            df.filter(f"part = {p}").drop("part")
        )
        for p in sorted({r[3] for r in rows})
    ]
    merged = timeseries.finalize_rollup(reduce(timeseries.merge_rollups, parts))
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b


# --- round-6 sketches: properties on adversarial generated inputs -------


@settings(max_examples=15, deadline=None)
@given(
    keys=st.lists(st.integers(-5, 5), min_size=1, max_size=60),
)
def test_fuzz_cms_overestimates_every_key(spark, keys):
    """CMS point estimates >= true counts for EVERY key, on multisets
    with heavy duplication and negatives the events table never has."""
    from collections import Counter

    from datafusion_sqlgen_spark.operators import profiling

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    sketch = profiling.cms_sketch(df, "k", depth=3, width=8)  # tiny width: force collisions
    uniq = spark.createDataFrame([(k,) for k in set(keys)], "k bigint")
    est = {
        r["k"]: r["cms_cnt"]
        for r in profiling.cms_estimate(sketch, uniq, "k", depth=3, width=8).collect()
    }
    true = Counter(keys)
    assert all(est[k] >= n for k, n in true.items()), (est, true)


@settings(max_examples=10, deadline=None)
@given(
    members=st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4),
                     min_size=1, max_size=30),
    probes=st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4),
                    min_size=1, max_size=10),
)
def test_fuzz_bloom_never_false_negative(spark, members, probes):
    """Membership never misses a real member, for any key set — even at
    a deliberately saturated 64-bit filter."""
    from datafusion_sqlgen_spark.operators import dedup

    mdf = spark.createDataFrame([(m,) for m in members], "fp string")
    bloom = dedup.bloom_build(mdf, "fp", m_bits=64, k=3)
    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(set(members) | set(probes))],
        "pid bigint, fp string",
    )
    flags = {
        r["pid"]: r["bloom_hit"]
        for r in dedup.bloom_maybe_contains(
            pdf, "fp", bloom, "pid", m_bits=64, k=3
        ).collect()
    }
    rows = {r["pid"]: r["fp"] for r in pdf.collect()}
    mem = set(members)
    for pid, fp in rows.items():
        if fp in mem:
            assert flags[pid], (fp, "false negative")


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=50,
    ),
)
def test_fuzz_quantile_sketch_within_resolution(spark, vals):
    """p50/p95/p99 estimates stay within 1/(2*scale) of the exact
    discrete quantile on arbitrary (negative, clustered, single-value)
    inputs."""
    from datafusion_sqlgen_spark.operators import profiling

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    row = profiling.binned_quantiles(
        df, value_col="v", group_col="g", scale=4
    ).collect()[0]
    tol = 1.0 / (2 * 4) + 1e-9
    sv = sorted(vals)
    for q, col in ((0.5, "p50_est"), (0.95, "p95_est"), (0.99, "p99_est")):
        # discrete quantile: smallest x with cum fraction >= q
        import math as _m

        idx = max(0, _m.ceil(q * len(sv)) - 1)
        assert abs(row[col] - sv[idx]) <= tol, (q, row[col], sv[idx], sv)
