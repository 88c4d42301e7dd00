"""Round-12 parser/render surface (VERDICT r11 "Next round" items 4+5):

1. ASOF render/plan parity: ``AsofJoin.to_sql("spark")`` now renders
   the SAME union + last-non-null-window desugar ``to_df`` executes
   (built as plan IR in ``AsofJoin._spark_desugar`` and rendered by
   the ordinary machinery), replacing the lateral-LIMIT-1 fallback
   whose physical plan was a BroadcastNestedLoopJoin. Gated here:
   ``spark.sql(plan.to_sql("spark"))`` must contain NO join operator,
   and its values must equal to_df and DuckDB's native ASOF.
2. Parsed ASOF tolerance bound (merge_asof semantics): a second,
   opposite-direction range conjunct on the same right time column —
   ``r.ts <= l.ts AND r.ts >= l.ts - INTERVAL ...`` — bounds the match
   window. Inner drops out-of-window rows; LEFT keeps the left row
   with a NULLed payload. The DuckDB render fails closed (DuckDB
   rejects a second ASOF inequality even via WHERE — its optimizer
   pushes the filter into the join; probed this round), so oracles are
   hand-written windowed twins.
3. ``struct(t.*)`` parses as a function arg (the desugar's payload
   form): Spark expands the star inside CreateStruct, DuckDB renders
   the bare relation alias (row struct).
"""

import duckdb
import pytest

from datafusion_sqlgen_spark.parser import ParseError, parse_sql


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l AS SELECT * FROM (VALUES (1,10,'a'),(1,25,'b'),"
        "(2,5,'c'),(2,99,'d'),(3,7,'e')) t(k,ts,ev)"
    )
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES (1,8,1.0),(1,20,2.0),"
        "(1,30,3.0),(2,7,4.0)) t(k,ts,price)"
    )
    return con


def _views(spark):
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW a12l AS SELECT * FROM VALUES "
        "(1,10,'a'),(1,25,'b'),(2,5,'c'),(2,99,'d'),(3,7,'e') t(k,ts,ev)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW a12r AS SELECT * FROM VALUES "
        "(1,8,CAST(1.0 AS DOUBLE)),(1,20,2.0),(1,30,3.0),(2,7,4.0) "
        "t(k,ts,price)"
    )


# ---------------------------------------------------------------------------
# 1. render/plan parity: the spark TEXT plans join-free
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("q", [
    "SELECT l.k AS k, l.ts AS lts, r.ts AS rts, r.price AS p "
    "FROM a12l AS l ASOF JOIN a12r AS r ON l.k = r.k AND l.ts >= r.ts",
    "SELECT l.k AS k, l.ts AS lts, r.ts AS rts "
    "FROM a12l AS l ASOF LEFT JOIN a12r AS r ON l.k = r.k AND l.ts >= r.ts",
    "SELECT l.k AS k, l.ts AS lts, r.ts AS rts "
    "FROM a12l AS l ASOF JOIN a12r AS r ON l.k = r.k AND l.ts <= r.ts",
])
def test_asof_spark_text_plans_join_free(spark, q):
    _views(spark)
    plan = parse_sql(q)
    s = plan.to_sql("spark")
    assert parse_sql(s).to_sql("spark") == s  # render->parse fixpoint
    df = spark.sql(s)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in phys, phys[:400]
    assert "Window" in phys
    # and the TEXT computes the same rows as to_df
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, plan.to_df(spark).collect()))


def test_asof_spark_text_matches_duckdb_native(spark):
    _views(spark)
    con = _duck()
    q = ("SELECT l.k AS k, l.ts AS lts, r.ts AS rts, r.price AS p "
         "FROM a12l AS l ASOF LEFT JOIN a12r AS r ON l.k = r.k AND l.ts >= r.ts")
    srows = sorted(map(tuple, spark.sql(parse_sql(q).to_sql("spark"))
                       .collect()))
    native = sorted(con.execute(
        "SELECT l.k, l.ts, r.ts, r.price FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.ts >= r.ts"
    ).fetchall(), key=lambda t: tuple((v is None, v) for v in t))
    srows = sorted(srows, key=lambda t: tuple((v is None, v) for v in t))
    assert len(srows) == 5
    assert [tuple(r) for r in srows] == [tuple(r) for r in native]


def test_asof_star_flatten_matches_between_text_and_df(spark):
    """`SELECT *` above an asof join flattens the payload struct in the
    spark TEXT too (`* EXCEPT (r), r.*`), matching to_df and DuckDB."""
    _views(spark)
    for proj in ("*", "l.*", "r.*"):
        plan = parse_sql(
            f"SELECT {proj} FROM a12l AS l ASOF LEFT JOIN a12r AS r "
            "ON l.k = r.k AND l.ts >= r.ts"
        )
        via_sql = spark.sql(plan.to_sql("spark"))
        assert plan.to_df(spark).columns == via_sql.columns, proj


# ---------------------------------------------------------------------------
# 2. tolerance bound
# ---------------------------------------------------------------------------

def test_asof_inner_tolerance_matches_windowed_twin(spark):
    _views(spark)
    con = _duck()
    plan = parse_sql(
        "SELECT l.k AS k, l.ts AS lts, r.ts AS rts FROM a12l AS l ASOF JOIN a12r AS r "
        "ON l.k = r.k AND l.ts >= r.ts AND r.ts >= l.ts - 6"
    )
    oracle = con.execute(
        "SELECT k, ts, rts FROM (SELECT l.k, l.ts, (SELECT max(r.ts) "
        "FROM r WHERE r.k=l.k AND r.ts<=l.ts) AS rts FROM l) "
        "WHERE rts IS NOT NULL AND rts >= ts - 6 ORDER BY ALL"
    ).fetchall()
    s = plan.to_sql("spark")
    assert parse_sql(s).to_sql("spark") == s
    assert sorted(map(tuple, spark.sql(s).collect())) == oracle
    assert sorted(map(tuple, plan.to_df(spark).collect())) == oracle
    assert oracle == [(1, 10, 8), (1, 25, 20)]  # k=2@99 match 7 is stale


def test_asof_left_tolerance_nulls_instead_of_dropping(spark):
    _views(spark)
    plan = parse_sql(
        "SELECT l.k AS k, l.ts AS lts, r.ts AS rts FROM a12l AS l ASOF "
        "LEFT JOIN a12r AS r ON l.k = r.k AND l.ts >= r.ts "
        "AND r.ts >= l.ts - 6"
    )
    want = [(1, 10, 8), (1, 25, 20), (2, 5, None), (2, 99, None),
            (3, 7, None)]  # k=2@99: nearest (7) outside window -> NULLed
    key = lambda t: tuple((v is None, v) for v in t)
    assert sorted(map(tuple, plan.to_df(spark).collect()), key=key) == want
    s = plan.to_sql("spark")
    assert parse_sql(s).to_sql("spark") == s
    assert sorted(map(tuple, spark.sql(s).collect()), key=key) == want


def test_asof_forward_tolerance(spark):
    _views(spark)
    plan = parse_sql(
        "SELECT l.k AS k, l.ts AS lts, r.ts AS rts FROM a12l AS l ASOF JOIN a12r AS r "
        "ON l.k = r.k AND l.ts <= r.ts AND r.ts <= l.ts + 6"
    )
    # forward matches: (1,25)->30 within +6; (2,5)->7 within +6;
    # (1,10)->20 is 10 ahead -> dropped
    assert sorted(map(tuple, plan.to_df(spark).collect())) == [
        (1, 25, 30), (2, 5, 7)]
    assert sorted(map(tuple,
                      spark.sql(plan.to_sql("spark")).collect())) == [
        (1, 25, 30), (2, 5, 7)]


def test_asof_tolerance_duckdb_render_fails_closed():
    plan = parse_sql(
        "SELECT 1 FROM a12l AS l ASOF JOIN a12r AS r ON l.k = r.k AND l.ts >= r.ts "
        "AND r.ts >= l.ts - 6"
    )
    with pytest.raises(ValueError, match="no native DuckDB render"):
        plan.to_sql("duckdb")


@pytest.mark.parametrize("bad", [
    # same-direction pair is not a window
    "ON l.k = r.k AND l.ts >= r.ts AND r.ts <= l.ts - 6",
    # offset sign contradicts the match direction (backward needs '-')
    "ON l.k = r.k AND l.ts >= r.ts AND r.ts >= l.ts + 6",
    # second bound on a DIFFERENT right column
    "ON l.k = r.k AND l.ts >= r.ts AND r.price >= l.ts - 6",
])
def test_asof_tolerance_rejections(bad):
    with pytest.raises(ParseError):
        parse_sql(f"SELECT 1 FROM a12l AS l ASOF JOIN a12r AS r {bad}")


def test_asof_three_bounds_rejected():
    with pytest.raises(ParseError, match="at most two"):
        parse_sql(
            "SELECT 1 FROM a12l AS l ASOF JOIN a12r AS r ON l.k = r.k AND l.ts >= r.ts "
            "AND r.ts >= l.ts - 6 AND r.ts >= l.ts - 9"
        )


# ---------------------------------------------------------------------------
# 3. struct(t.*)
# ---------------------------------------------------------------------------

def test_struct_star_parses_and_renders_both_dialects():
    p = parse_sql("SELECT struct(l.*) AS s FROM nation l")
    s = p.to_sql("spark")
    assert "struct(l.*)" in s
    assert parse_sql(s).to_sql("spark") == s
    d = p.to_sql("duckdb")
    assert " l AS s" in d  # bare relation alias = row struct in DuckDB
    con = duckdb.connect()
    con.execute("CREATE TABLE nation AS SELECT 1 AS a, 'x' AS b")
    assert con.execute(f"SELECT s.* FROM ({d})").fetchall() == [(1, 'x')]


def test_struct_star_executes_on_spark(spark):
    # fresh view name: redefining a shared fixture view (nation etc.)
    # would leak into later tests in the session-scoped SparkSession
    spark.sql("CREATE OR REPLACE TEMP VIEW ss_rel12 AS SELECT 1 AS a, "
              "'x' AS b")
    rows = spark.sql(
        parse_sql("SELECT struct(l.*) AS s FROM ss_rel12 l")
        .to_sql("spark")
    ).collect()
    assert rows[0].s.a == 1 and rows[0].s.b == "x"
