"""Statement-form parsing (round 8, VERDICT r7 item 6): MERGE INTO and
TABLESAMPLE — the two maintenance-statement forms a pipeline operator
writes that previously had API-only coverage (operators/joins.upsert,
operators/sampling.stable_sample).

Both DESUGAR at parse time into the existing relational IR (no new plan
nodes), so the reference's own round-trip invariant
(/root/reference/datafusion-sqlgen/tests/select.rs:57-68) — render is a
parse fixpoint — holds by construction and is pinned here anyway.
"""

import pytest

from datafusion_sqlgen_spark.parser import ParseError, parse_sql
from tests.test_operators import check

MERGE_UPSERT = (
    "MERGE INTO customer AS t USING ("
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal, "
    "'UPDATED' AS c_mktsegment FROM customer WHERE c_custkey % 7 = 0 "
    "UNION ALL "
    "SELECT c_custkey + 10000000 AS c_custkey, c_name, c_nationkey, "
    "c_acctbal, 'INSERTED' AS c_mktsegment FROM customer "
    "WHERE c_custkey % 11 = 0) AS s "
    "ON t.c_custkey = s.c_custkey "
    "WHEN MATCHED THEN UPDATE SET * "
    "WHEN NOT MATCHED THEN INSERT *"
)


def _fixpoint(sql: str) -> None:
    """The statement's Spark render re-parses and re-renders to the
    identical string (the desugared plan is made of ordinary IR nodes,
    so one render reaches the fixpoint)."""
    s1 = parse_sql(sql).to_sql("spark")
    s2 = parse_sql(s1).to_sql("spark")
    assert s1 == s2, f"not a parse fixpoint:\n{s1}\n{s2}"


def test_merge_upsert_three_way(spark, duck):
    """MERGE upsert: DataFrame execution == generated Spark SQL ==
    an oracle that never joins (CASE rewrite + shifted insert arm)."""
    p = parse_sql(MERGE_UPSERT)
    _fixpoint(MERGE_UPSERT)
    a = check(
        spark, duck, p.to_df(spark),
        """
        SELECT c_custkey, c_name, c_nationkey, c_acctbal,
               CASE WHEN c_custkey % 7 = 0 THEN 'UPDATED'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
        UNION ALL
        SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal,
               'INSERTED'
        FROM customer WHERE c_custkey % 11 = 0
        """,
    )
    b = sorted(
        tuple(r) for r in spark.sql(p.to_sql("spark")).collect()
    )
    assert len(a) == len(b)
    # both merge arms actually fired
    segs = {r[-1] for r in a}
    assert "UPDATED" in segs and "INSERTED" in segs


def test_merge_matches_upsert_operator(spark):
    """The parsed statement and operators/joins.upsert are the same
    operator entered two ways."""
    from pyspark.sql import functions as F

    from datafusion_sqlgen_spark.operators.joins import upsert

    cust = spark.table("customer")
    updates = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_mktsegment", F.lit("UPDATED")
    ).unionByName(
        cust.filter(F.col("c_custkey") % 11 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + 10000000)
        .withColumn("c_mktsegment", F.lit("INSERTED"))
    )
    via_op = upsert(cust, updates, "c_custkey")
    via_sql = parse_sql(MERGE_UPSERT).to_df(spark)
    assert sorted(map(tuple, via_op.collect())) == sorted(
        map(tuple, via_sql.collect())
    )


def test_merge_delete_only(spark, duck):
    """WHEN MATCHED THEN DELETE alone is the anti-join: customers from
    nations 0-4 with no orders plus every customer of other nations
    stay — here keyed so matches exist but don't cover the table."""
    sql = (
        "MERGE INTO nation AS t USING region AS s "
        "ON t.n_regionkey = s.r_regionkey AND s.r_name = 'ASIA' "
        "WHEN MATCHED THEN DELETE"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT * FROM nation
        WHERE n_regionkey NOT IN
            (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
        """,
    )


def test_merge_insert_only(spark, duck):
    sql = (
        "MERGE INTO region AS t USING "
        "(SELECT r_regionkey + 50 AS r_regionkey, r_name "
        "FROM region) AS s "
        "ON t.r_regionkey = s.r_regionkey "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT * FROM region
        UNION ALL
        SELECT r_regionkey + 50, r_name FROM region
        """,
    )


@pytest.mark.parametrize("bad,msg", [
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey",
     "WHEN"),
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN MATCHED THEN UPDATE SET *", "INSERT"),
    # a matched arm after an UNCONDITIONED matched arm is dead code
    # under first-match-wins (was 'duplicate WHEN MATCHED' pre-cascade)
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN MATCHED THEN DELETE WHEN MATCHED THEN UPDATE SET * "
     "WHEN NOT MATCHED THEN INSERT *", "unreachable"),
    # SET * cannot participate in a cascaded chain (no per-arm layout)
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN MATCHED AND s.o_totalprice > 0 THEN UPDATE SET * "
     "WHEN MATCHED THEN DELETE "
     "WHEN NOT MATCHED THEN INSERT *", "SET [*] is not supported in a cascaded"),
    # two DELETE arms: the second is unreachable or contradictory
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN MATCHED AND s.o_totalprice > 0 THEN DELETE "
     "WHEN MATCHED AND s.o_totalprice < 0 THEN DELETE "
     "WHEN MATCHED THEN UPDATE SET c_acctbal = 0",
     "at most one DELETE arm"),
    # ADVICE r9: column-list INSERT with ANY matched arm (not just SET
    # col = expr) binds Col(c, s) against renamed source columns
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN MATCHED THEN UPDATE SET * "
     "WHEN NOT MATCHED THEN INSERT (c_custkey) VALUES (s.o_custkey)",
     "column-list INSERT with UPDATE SET"),
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN MATCHED AND s.o_totalprice > 0 THEN DELETE "
     "WHEN NOT MATCHED THEN INSERT (c_custkey) VALUES (s.o_custkey)",
     "column-list INSERT with UPDATE SET"),
    # a second arm after an unconditioned one can never fire
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN NOT MATCHED THEN INSERT * WHEN NOT MATCHED THEN INSERT *",
     "unreachable"),
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN NOT MATCHED BY SOURCE THEN DELETE "
     "WHEN NOT MATCHED BY SOURCE THEN DELETE",
     "duplicate WHEN NOT MATCHED BY SOURCE"),
    # truncate-in-disguise: everything matched deletes, everything
    # unmatched-by-source deletes, nothing inserts
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN MATCHED THEN DELETE "
     "WHEN NOT MATCHED BY SOURCE THEN DELETE", "deletes every row"),
    # mismatched column/value list lengths
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN NOT MATCHED THEN INSERT (a, b) VALUES (s.o_custkey)",
     "2 columns but 1 values"),
    # column-list INSERT redefines the layout; SET edits in place —
    # the combination is ambiguous and rejected
    ("MERGE INTO customer t USING orders s ON t.c_custkey = s.o_custkey "
     "WHEN MATCHED THEN UPDATE SET c_acctbal = 0 "
     "WHEN NOT MATCHED THEN INSERT (c_custkey) VALUES (s.o_custkey)",
     "column-list INSERT with UPDATE SET"),
])
def test_merge_rejects_unsupported_forms(bad, msg):
    with pytest.raises(ParseError, match=msg):
        parse_sql(bad)


# ---- round 9 (VERDICT r8 items 2 and 5): conditional arms, column-list
# INSERT, and WHEN NOT MATCHED BY SOURCE THEN DELETE --------------------


def test_merge_conditional_update_set(spark, duck):
    """WHEN MATCHED AND <cond>: the condition ANDs into the CASE's
    match test — matched-but-condition-false rows keep target values."""
    sql = (
        "MERGE INTO customer AS t USING ("
        "SELECT c_custkey, c_acctbal FROM customer "
        "WHERE c_custkey % 3 = 0) AS s "
        "ON t.c_custkey = s.c_custkey "
        "WHEN MATCHED AND s.c_acctbal > 5000 "
        "THEN UPDATE SET c_acctbal = s.c_acctbal * 2"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               CASE WHEN c_custkey % 3 = 0 AND c_acctbal > 5000
                    THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal
        FROM customer
        """,
    )


def test_merge_conditional_update_star(spark, duck):
    """Conditional UPDATE SET *: matched rows split into a cond-true arm
    (source version) and a cond-not-true arm (target version) — NULL
    conditions must NOT fire the action (three-valued test)."""
    sql = (
        "MERGE INTO customer AS t USING ("
        "SELECT c_custkey, c_name, c_nationkey, "
        "c_acctbal * 3 AS c_acctbal, c_mktsegment FROM customer "
        "WHERE c_custkey % 4 = 0) AS s "
        "ON t.c_custkey = s.c_custkey "
        "WHEN MATCHED AND t.c_acctbal < 0 THEN UPDATE SET *"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 4 = 0 AND c_acctbal < 0
                    THEN c_acctbal * 3 ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer
        """,
    )


def test_merge_conditional_delete(spark, duck):
    """WHEN MATCHED AND <cond> THEN DELETE keeps matched rows whose
    condition is false or NULL."""
    sql = (
        "MERGE INTO customer AS t USING ("
        "SELECT c_custkey FROM customer WHERE c_custkey % 6 = 0) AS s "
        "ON t.c_custkey = s.c_custkey "
        "WHEN MATCHED AND t.c_acctbal < 0 THEN DELETE"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT * FROM customer
        WHERE NOT (c_custkey % 6 = 0 AND c_acctbal < 0)
        """,
    )


def test_merge_not_matched_by_source_delete(spark, duck):
    """Snapshot full sync: UPDATE SET * + BY SOURCE DELETE = matched
    source rows only (the survivors union loses its anti-join arm)."""
    sql = (
        "MERGE INTO customer AS t USING ("
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal, "
        "c_mktsegment FROM customer WHERE c_custkey % 2 = 0) AS s "
        "ON t.c_custkey = s.c_custkey "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        "SELECT * FROM customer WHERE c_custkey % 2 = 0",
    )


def test_merge_by_source_delete_conditional(spark, duck):
    """BY SOURCE AND <cond>: unmatched target rows the condition spares
    survive."""
    sql = (
        "MERGE INTO customer AS t USING ("
        "SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0) AS s "
        "ON t.c_custkey = s.c_custkey "
        "WHEN NOT MATCHED BY SOURCE AND t.c_acctbal < 1000 THEN DELETE"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT * FROM customer
        WHERE c_custkey % 2 = 0
           OR NOT (c_acctbal < 1000)
        """,
    )


def test_merge_column_list_insert(spark, duck):
    """INSERT (cols) VALUES (exprs): the column list defines the merged
    output layout — every arm projects exactly those columns."""
    sql = (
        "MERGE INTO customer AS t USING ("
        "SELECT c_custkey + 9000000 AS k, c_name AS nm, "
        "c_acctbal AS bal FROM customer WHERE c_custkey % 5 = 0) AS s "
        "ON t.c_custkey = s.k "
        "WHEN NOT MATCHED THEN INSERT (c_custkey, c_name, c_acctbal) "
        "VALUES (s.k, s.nm, s.bal)"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        UNION ALL
        SELECT c_custkey + 9000000, c_name, c_acctbal
        FROM customer WHERE c_custkey % 5 = 0
        """,
    )


def test_merge_conditional_insert(spark, duck):
    """WHEN NOT MATCHED AND <cond> THEN INSERT * filters the insert arm
    only."""
    sql = (
        "MERGE INTO region AS t USING "
        "(SELECT r_regionkey + 50 AS r_regionkey, r_name "
        "FROM region) AS s "
        "ON t.r_regionkey = s.r_regionkey "
        "WHEN NOT MATCHED AND s.r_regionkey > 52 THEN INSERT *"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT * FROM region
        UNION ALL
        SELECT r_regionkey + 50, r_name FROM region
        WHERE r_regionkey + 50 > 52
        """,
    )


def test_tablesample_matches_stable_sample(spark, duck):
    """TABLESAMPLE (p PERCENT ON id) is stable_sample entered as SQL:
    identical membership, dual-dialect, fixpoint after one render."""
    from datafusion_sqlgen_spark.operators.sampling import stable_sample

    sql = ("SELECT doc_id FROM documents "
           "TABLESAMPLE (10 PERCENT ON doc_id)")
    _fixpoint(sql)
    p = parse_sql(sql)
    check(spark, duck, p.to_df(spark), p.to_sql("duckdb"))
    got = {r.doc_id for r in p.to_df(spark).collect()}
    via_op = {
        r.doc_id for r in
        stable_sample(spark.table("documents"), 0.10).select("doc_id")
        .collect()
    }
    assert got == via_op
    assert 0 < len(got) < spark.table("documents").count()


def test_tablesample_repeatable_salt_draws_independent_sample(spark):
    base = parse_sql(
        "SELECT doc_id FROM documents TABLESAMPLE (20 PERCENT ON doc_id)"
    ).to_df(spark)
    salted = parse_sql(
        "SELECT doc_id FROM documents TABLESAMPLE (20 PERCENT ON doc_id) "
        "REPEATABLE ('v2')"
    ).to_df(spark)
    a = {r.doc_id for r in base.collect()}
    b = {r.doc_id for r in salted.collect()}
    assert a != b  # independent draws
    # ... of roughly the same size
    assert abs(len(a) - len(b)) < max(len(a), len(b))


def test_tablesample_requires_on_column():
    with pytest.raises(ParseError, match="ON"):
        parse_sql("SELECT * FROM documents TABLESAMPLE (10 PERCENT)")


def test_tablesample_pushes_filter_to_scan(spark):
    """The desugared md5 filter sits directly over the scan — Catalyst
    collapses it into the FileScan's data filters, so at 100 TB the
    sample never materializes unsampled rows past the scan stage."""
    p = parse_sql(
        "SELECT doc_id FROM documents TABLESAMPLE (10 PERCENT ON doc_id)"
    )
    plan = p.to_df(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan and "Exchange" not in plan


MERGE_SET = (
    "MERGE INTO customer AS t USING ("
    "SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0"
    ") AS s ON t.c_custkey = s.c_custkey "
    "WHEN MATCHED THEN UPDATE SET c_acctbal = s.c_acctbal * 2, "
    "c_mktsegment = 'BOOSTED'"
)


def test_merge_update_set_columns(spark, duck):
    """Per-column UPDATE SET (round 8): one left join, SET columns
    re-emitted at the end via CASE over the matched test — the oracle
    is the CASE rewrite with no join at all."""
    _fixpoint(MERGE_SET)
    p = parse_sql(MERGE_SET)
    check(
        spark, duck, p.to_df(spark),
        """
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 3 = 0 THEN c_acctbal * 2
                    ELSE c_acctbal END AS c_acctbal,
               CASE WHEN c_custkey % 3 = 0 THEN 'BOOSTED'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
        """,
    )
    # generated Spark SQL must agree with the DataFrame path
    a = sorted(map(tuple, p.to_df(spark).collect()))
    b = sorted(map(tuple, spark.sql(p.to_sql("spark")).collect()))
    assert a == b


def test_merge_update_set_with_insert(spark, duck):
    sql = (
        "MERGE INTO region AS t USING ("
        "SELECT r_regionkey + 3 AS r_regionkey, r_name FROM region"
        ") AS s ON t.r_regionkey = s.r_regionkey "
        "WHEN MATCHED THEN UPDATE SET r_name = s.r_name "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT t.r_regionkey,
               CASE WHEN s.r_regionkey IS NOT NULL THEN s.r_name
                    ELSE t.r_name END AS r_name
        FROM region t LEFT JOIN
             (SELECT r_regionkey + 3 AS r_regionkey, r_name FROM region) s
          ON t.r_regionkey = s.r_regionkey
        UNION ALL
        SELECT s2.r_regionkey, s2.r_name
        FROM (SELECT r_regionkey + 3 AS r_regionkey, r_name FROM region) s2
        WHERE NOT EXISTS (SELECT 1 FROM region t2
                          WHERE t2.r_regionkey = s2.r_regionkey)
        """,
    )


def test_merge_update_set_requires_source_equi_key():
    with pytest.raises(ParseError, match="equi-condition"):
        parse_sql(
            "MERGE INTO customer AS t USING orders AS s "
            "ON t.c_custkey < s.o_custkey "
            "WHEN MATCHED THEN UPDATE SET c_acctbal = 0"
        )


def test_merge_subquery_source_requires_alias():
    with pytest.raises(ParseError, match="needs an alias"):
        parse_sql(
            "MERGE INTO customer AS t USING (SELECT 1 AS x) "
            "ON t.c_custkey = x WHEN MATCHED THEN DELETE"
        )


def test_tablesample_rows_matches_stable_topk(spark, duck):
    """TABLESAMPLE (n ROWS ON id) is stable_topk_sample entered as SQL:
    exactly-n deterministic permutation prefix, TakeOrdered plan (never
    a global sort), dual-dialect equality, fixpoint."""
    from datafusion_sqlgen_spark.operators.sampling import (
        stable_topk_sample,
    )

    sql = ("SELECT doc_id FROM documents "
           "TABLESAMPLE (25 ROWS ON doc_id)")
    _fixpoint(sql)
    p = parse_sql(sql)
    check(spark, duck, p.to_df(spark), p.to_sql("duckdb"))
    got = sorted(r.doc_id for r in p.to_df(spark).collect())
    via_op = sorted(
        r.doc_id for r in
        stable_topk_sample(spark.table("documents"), 25)
        .select("doc_id").collect()
    )
    assert got == via_op and len(got) == 25
    plan = p.to_df(spark)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition top-k + merge


def test_tablesample_rows_requires_on_and_unit():
    with pytest.raises(ParseError, match="PERCENT or ROWS"):
        parse_sql("SELECT * FROM documents TABLESAMPLE (25 ON doc_id)")
    with pytest.raises(ParseError, match="ON"):
        parse_sql("SELECT * FROM documents TABLESAMPLE (25 ROWS)")


@pytest.mark.parametrize("pct,expect", [
    (0, "none"),     # empty sample
    (100, "all"),    # the 'g'-sentinel threshold edge: must keep ALL
])
def test_tablesample_percent_boundaries(spark, pct, expect):
    """0 and 100 PERCENT hit sampling._threshold's documented edge: a
    naive format() of 100% yields '10000', which sorts BELOW most hex
    prefixes and silently turns keep-all into keep-~6% — the sentinel
    'g' fix must survive the parser path too."""
    n_all = spark.table("documents").count()
    got = parse_sql(
        f"SELECT doc_id FROM documents TABLESAMPLE ({pct} PERCENT ON doc_id)"
    ).to_df(spark).count()
    assert got == (0 if expect == "none" else n_all)


def test_tablesample_zero_rows(spark):
    got = parse_sql(
        "SELECT doc_id FROM documents TABLESAMPLE (0 ROWS ON doc_id)"
    ).to_df(spark).count()
    assert got == 0


# ---- round 9 ADVICE r8 fixes: TABLESAMPLE validation + aliased ROWS ---


@pytest.mark.parametrize("count", ["40.7", "40.0", "4e1"])
def test_tablesample_rejects_non_integer_literal_rows(count):
    """ADVICE r9: '40.0 ROWS' and '4e1 ROWS' round-trip through float()
    as integers but are not integer literals — the token TEXT is what
    must validate."""
    with pytest.raises(ParseError, match="integer count"):
        parse_sql(
            f"SELECT doc_id FROM documents TABLESAMPLE ({count} ROWS ON doc_id)"
        )


def test_tablesample_rejects_percent_out_of_range():
    with pytest.raises(ParseError, match=r"\[0, 100\]"):
        parse_sql(
            "SELECT doc_id FROM documents "
            "TABLESAMPLE (140 PERCENT ON doc_id)"
        )


def test_tablesample_rows_aliased_qualified_refs(spark, duck):
    """ADVICE r8: 'documents AS d TABLESAMPLE (n ROWS ...)' with
    d-qualified projections diverged between renders (to_sql nested the
    limit under a fresh _q alias where 'd.' no longer resolved; to_df
    resolved it).  The desugar now re-applies the user's alias ABOVE the
    sort/limit, so both renders resolve the qualifier."""
    sql = (
        "SELECT d.doc_id, d.lang FROM documents AS d "
        "TABLESAMPLE (40 ROWS ON doc_id)"
    )
    _fixpoint(sql)
    p = parse_sql(sql)
    via_df = sorted(tuple(r) for r in p.to_df(spark).collect())
    via_sql = sorted(
        tuple(r) for r in spark.sql(p.to_sql("spark")).collect()
    )
    assert via_df == via_sql and len(via_df) == 40
    check(spark, duck, p.to_df(spark), p.to_sql("duckdb"))


# ---- round 10: cascaded multi-arm WHEN MATCHED chains (VERDICT r9 #6) --

MERGE_CASCADE = (
    "MERGE INTO customer AS t USING ("
    "SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0"
    ") AS s ON t.c_custkey = s.c_custkey "
    "WHEN MATCHED AND s.c_acctbal > 5000 "
    "THEN UPDATE SET c_acctbal = s.c_acctbal * 2, c_mktsegment = 'HIGH' "
    "WHEN MATCHED AND s.c_acctbal > 0 "
    "THEN UPDATE SET c_acctbal = s.c_acctbal + 100 "
    "WHEN MATCHED THEN UPDATE SET c_mktsegment = 'NONPOS'"
)


def test_merge_cascade_first_match_wins(spark, duck):
    """Three matched arms, first-match-wins: rows taken by arm 1 never
    reach arm 2 even though arm 2's condition also holds for them; an
    arm that fires but does not set a column keeps the target value
    (arm 2 leaves c_mktsegment alone).  Oracle is the no-join nested
    CASE rewrite."""
    _fixpoint(MERGE_CASCADE)
    p = parse_sql(MERGE_CASCADE)
    check(
        spark, duck, p.to_df(spark),
        """
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 2 = 0 AND c_acctbal > 5000
                    THEN c_acctbal * 2
                    WHEN c_custkey % 2 = 0 AND c_acctbal > 0
                    THEN c_acctbal + 100
                    ELSE c_acctbal END AS c_acctbal,
               CASE WHEN c_custkey % 2 = 0 AND c_acctbal > 5000
                    THEN 'HIGH'
                    WHEN c_custkey % 2 = 0 AND c_acctbal > 0
                    THEN c_mktsegment
                    WHEN c_custkey % 2 = 0 THEN 'NONPOS'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
        """,
    )
    # generated Spark SQL must agree with the DataFrame path
    a = sorted(map(tuple, p.to_df(spark).collect()))
    b = sorted(map(tuple, spark.sql(p.to_sql("spark")).collect()))
    assert a == b


def test_merge_cascade_delete_arm(spark, duck):
    """A DELETE arm in the chain removes exactly the rows it claims
    (matched, earlier arms not fired, own condition TRUE); later arms
    see only the survivors."""
    sql = (
        "MERGE INTO customer AS t USING ("
        "SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0"
        ") AS s ON t.c_custkey = s.c_custkey "
        "WHEN MATCHED AND s.c_acctbal < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET c_acctbal = s.c_acctbal + 1"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               CASE WHEN c_custkey % 2 = 0 AND NOT (c_acctbal < 0)
                    THEN c_acctbal + 1 ELSE c_acctbal END AS c_acctbal
        FROM customer
        WHERE NOT (c_custkey % 2 = 0 AND c_acctbal < 0)
        """,
    )


def test_merge_cascade_null_condition_falls_through(spark, duck):
    """Three-valued fire tests: a NULL arm condition does NOT fire that
    arm AND does not poison the rest of the chain — the row falls to
    the next arm whose condition is TRUE."""
    sql = (
        "MERGE INTO customer AS t USING ("
        "SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0"
        ") AS s ON t.c_custkey = s.c_custkey "
        "WHEN MATCHED AND nullif(s.c_acctbal, s.c_acctbal) > 0 "
        "THEN UPDATE SET c_mktsegment = 'NEVER' "
        "WHEN MATCHED THEN UPDATE SET c_mktsegment = 'TAKEN'"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT c_custkey, c_name, c_nationkey, c_acctbal,
               CASE WHEN c_custkey % 2 = 0 THEN 'TAKEN'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
        """,
    )


def test_merge_cascade_insert_arms(spark, duck):
    """Cascaded WHEN NOT MATCHED chains (the insert-side twin of
    m_arms): first-match-wins per-column CASE over the anti-joined
    source; a trailing unconditioned arm claims the remainder, and with
    conditioned arms only, unclaimed source rows are NOT inserted."""
    sql = (
        "MERGE INTO region AS t USING ("
        "SELECT n_nationkey AS k, n_name AS nm, n_regionkey AS rk "
        "FROM nation) AS s ON t.r_regionkey = s.k "
        "WHEN NOT MATCHED AND s.rk = 0 "
        "THEN INSERT (r_regionkey, r_name) VALUES (s.k, upper(s.nm)) "
        "WHEN NOT MATCHED AND s.rk = 1 "
        "THEN INSERT (r_regionkey, r_name) VALUES (s.k + 100, lower(s.nm)) "
        "WHEN NOT MATCHED THEN INSERT (r_regionkey, r_name) "
        "VALUES (s.k, 'OTHER')"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT r_regionkey, r_name FROM region
        UNION ALL
        SELECT CASE WHEN n_regionkey = 1 THEN n_nationkey + 100
                    ELSE n_nationkey END AS r_regionkey,
               CASE WHEN n_regionkey = 0 THEN upper(n_name)
                    WHEN n_regionkey = 1 THEN lower(n_name)
                    ELSE 'OTHER' END AS r_name
        FROM nation
        WHERE NOT EXISTS (SELECT 1 FROM region
                          WHERE r_regionkey = n_nationkey)
        """,
    )
    # conditioned arms only: the claim filter drops the rest
    sql2 = (
        "MERGE INTO region AS t USING ("
        "SELECT n_nationkey AS k, n_name AS nm, n_regionkey AS rk "
        "FROM nation) AS s ON t.r_regionkey = s.k "
        "WHEN NOT MATCHED AND s.rk = 2 "
        "THEN INSERT (r_regionkey, r_name) VALUES (s.k, s.nm) "
        "WHEN NOT MATCHED AND s.rk = 3 "
        "THEN INSERT (r_regionkey, r_name) VALUES (s.k + 50, s.nm)"
    )
    _fixpoint(sql2)
    check(
        spark, duck, parse_sql(sql2).to_df(spark),
        """
        SELECT r_regionkey, r_name FROM region
        UNION ALL
        SELECT CASE WHEN n_regionkey = 3 THEN n_nationkey + 50
                    ELSE n_nationkey END AS r_regionkey,
               n_name AS r_name
        FROM nation
        WHERE n_regionkey IN (2, 3)
          AND NOT EXISTS (SELECT 1 FROM region
                          WHERE r_regionkey = n_nationkey)
        """,
    )
    # a NULL arm condition neither fires nor blocks later arms
    sql3 = (
        "MERGE INTO region AS t USING ("
        "SELECT n_nationkey AS k, n_name AS nm, "
        "CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END AS rk "
        "FROM nation) AS s ON t.r_regionkey = s.k "
        "WHEN NOT MATCHED AND s.rk < 2 "
        "THEN INSERT (r_regionkey, r_name) VALUES (s.k, 'LOW') "
        "WHEN NOT MATCHED THEN INSERT (r_regionkey, r_name) "
        "VALUES (s.k, 'REST')"
    )
    _fixpoint(sql3)
    check(
        spark, duck, parse_sql(sql3).to_df(spark),
        """
        SELECT r_regionkey, r_name FROM region
        UNION ALL
        SELECT n_nationkey AS r_regionkey,
               CASE WHEN n_regionkey <> 2 AND n_regionkey < 2 THEN 'LOW'
                    ELSE 'REST' END AS r_name
        FROM nation
        WHERE NOT EXISTS (SELECT 1 FROM region
                          WHERE r_regionkey = n_nationkey)
        """,
    )


def test_merge_cascade_with_insert(spark, duck):
    """Cascade + NOT MATCHED INSERT *: the insert arm re-emits the SET
    columns at the end exactly like the single-arm update_set path, so
    the positional union stays aligned."""
    sql = (
        "MERGE INTO region AS t USING ("
        "SELECT r_regionkey + 3 AS r_regionkey, r_name FROM region"
        ") AS s ON t.r_regionkey = s.r_regionkey "
        "WHEN MATCHED AND s.r_regionkey > 3 THEN UPDATE SET r_name = 'UP' "
        "WHEN MATCHED THEN UPDATE SET r_name = s.r_name "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT t.r_regionkey,
               CASE WHEN s.r_regionkey IS NOT NULL AND s.r_regionkey > 3
                    THEN 'UP'
                    WHEN s.r_regionkey IS NOT NULL THEN s.r_name
                    ELSE t.r_name END AS r_name
        FROM region t LEFT JOIN
             (SELECT r_regionkey + 3 AS r_regionkey, r_name FROM region) s
          ON t.r_regionkey = s.r_regionkey
        UNION ALL
        SELECT s2.r_regionkey, s2.r_name
        FROM (SELECT r_regionkey + 3 AS r_regionkey, r_name FROM region) s2
        WHERE NOT EXISTS (SELECT 1 FROM region t2
                          WHERE t2.r_regionkey = s2.r_regionkey)
        """,
    )
