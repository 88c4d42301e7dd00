

def test_bpe_train_merges_matches_oracle_and_is_deterministic(spark, duck):
    """Round-8 BPE trainer: merge table matches the iteration-unrolled
    DuckDB twin exactly, ranks are dense, and re-running is
    bit-identical (no RNG anywhere)."""
    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    out = tx.bpe_train_merges(spark.table("documents"))
    rows = check(spark, duck, out, tx.bpe_train_merges_oracle())
    assert len(rows) == 6
    first = sorted(map(tuple, out.collect()))
    again = sorted(map(tuple, tx.bpe_train_merges(
        spark.table("documents")).collect()))
    assert again == first


def test_bpe_encode_matches_oracle_and_conserves_tokens(spark, duck):
    """Round-10 serving half: per-doc token budgets match the DuckDB
    twin (which re-derives the rules), every doc has n_tokens between
    n_words (fully merged) and total chars (no merges applied), and
    encoding with ZERO merges degenerates to character counts."""
    from pyspark.sql import functions as F

    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    docs = spark.table("documents")
    merges = tx.bpe_train_merges(docs)
    out = tx.bpe_encode(docs, merges)
    rows = check(spark, duck, out, tx.bpe_encode_oracle())
    assert len(rows) > 0
    assert all(r[2] >= r[1] for r in rows)  # (doc_id, n_words, n_tokens)
    # zero merges: every word tokenizes to its characters
    none = tx.bpe_encode(docs, merges.limit(0))
    chars = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                              r"\s+")).alias("w"),
        )
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("doc_id")
        .agg(F.sum(F.length("w")).cast("bigint").alias("n_chars"))
    )
    j = none.join(chars, "doc_id").where(
        F.col("n_tokens") != F.col("n_chars")
    )
    assert j.count() == 0


def test_bpe_merges_compose(spark):
    """A later merge may build on an earlier one (multi-char symbols
    appear once pairs chain), and pair counts are non-increasing."""
    from datafusion_sqlgen_spark.operators import text as tx

    rows = sorted(
        map(tuple, tx.bpe_train_merges(
            spark.table("documents"), n_merges=8).collect())
    )
    counts = [r[3] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_vocab_growth_curve_properties(spark, duck):
    """Heaps curve invariants: cumulative counts strictly positive and
    non-decreasing per source, final cum_vocab <= final cum_tokens,
    slope in (0, 1] for natural-ish text, and the bucket checkpoints
    hash-equal to the DuckDB twin."""
    from datafusion_sqlgen_spark.operators import text as T

    rows = T.vocab_growth(spark.table("documents")).collect()
    assert rows
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.bucket)
        toks = [r.cum_tokens for r in rs]
        voc = [r.cum_vocab for r in rs]
        assert toks == sorted(toks) and voc == sorted(voc)
        assert 0 < voc[-1] <= toks[-1]
        # synthetic docs share a tiny vocabulary, so saturation
        # (slope ~ 0) is legitimate at test SF; natural text reads
        # 0.4-0.6
        assert 0 <= rs[0].heaps_slope <= 1.0, (src, rs[0].heaps_slope)
        assert all(r.heaps_slope == rs[0].heaps_slope for r in rs)
    assert any(rs[0].heaps_slope > 0 for rs in by_src.values())
    want = sorted(map(tuple, duck.execute(T.vocab_growth_oracle()).fetchall()))
    got = sorted(map(tuple, (tuple(r) for r in rows)))
    assert got == want


def test_rrf_hybrid_topk_fuses_both_lists(spark, duck):
    """Round-13 RRF fusion: matches the composed DuckDB oracle on the
    driver fixture; docs in BOTH lists carry both rank columns and the
    exact fixed-point sum floor(1e12/(60+lex)) + floor(1e12/(60+vec));
    single-list docs carry a NULL for the missing rank; k > depth is
    rejected."""
    import pytest as _pytest

    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    terms = ["hash", "join", "vector"]
    out = tx.rrf_hybrid_topk(
        spark.table("documents"), spark.table("embeddings"), terms,
        query_vec_id=0, k=15, depth=50,
    )
    rows = check(spark, duck, out, tx.rrf_hybrid_topk_oracle(
        terms, query_vec_id=0, k=15, depth=50))
    assert 0 < len(rows) <= 15
    by_id = {r[0]: r for r in ((t["doc_id"], t["lex_rank"], t["vec_rank"],
                                t["rrf_fp"], t["rnk"])
                               for t in out.collect())}
    fp = 10**12
    both = single = 0
    for doc_id, lex_r, vec_r, rrf_fp, _ in by_id.values():
        expect = sum(fp // (60 + r) for r in (lex_r, vec_r)
                     if r is not None)
        assert rrf_fp == expect, (doc_id, lex_r, vec_r, rrf_fp)
        if lex_r is not None and vec_r is not None:
            both += 1
        else:
            single += 1
    # the fixture query produces a genuine hybrid: some overlap, some
    # list-exclusive docs (guards against a fusion that drops a side)
    assert both >= 1 and single >= 1, (both, single)
    # final ranks are dense 1..n in fused order
    ranks = sorted(r[4] for r in by_id.values())
    assert ranks == list(range(1, len(ranks) + 1))

    with _pytest.raises(ValueError):
        tx.rrf_hybrid_topk(
            spark.table("documents"), spark.table("embeddings"), terms,
            k=20, depth=10,
        )


def test_unigram_lm_train_properties(spark, duck):
    """Round-13 unigram-LM trainer: matches the unrolled array-DP
    DuckDB twin; pieces are 1..4 chars; every corpus character
    survives as a single (coverage — singles are never pruned);
    multi-char pieces all carry Viterbi usage (zero-usage multis are
    pruned); logprobs are negative and probs sum to ~1; re-running is
    bit-identical (no RNG anywhere)."""
    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    out = tx.unigram_lm_train(spark.table("documents"))
    rows = check(spark, duck, out, tx.unigram_lm_train_oracle())
    got = list(map(tuple, out.collect()))
    assert len(got) > 0
    by_piece = {p: (n, lp) for p, n, lp in got}
    assert all(1 <= len(p) <= 4 for p in by_piece)
    corpus_chars = {
        c
        for (w,) in spark.sql(
            "SELECT DISTINCT w FROM (SELECT explode(split(lower("
            "coalesce(text, '')), '\\\\s+')) w FROM documents) "
            "WHERE w RLIKE '^[a-z]+$' AND length(w) <= 12"
        ).collect()
        for c in w
    }
    assert corpus_chars <= {p for p in by_piece if len(p) == 1}
    assert all(n > 0 for p, (n, lp) in by_piece.items() if len(p) > 1)
    assert all(lp < 0 for _, lp in by_piece.values())
    import math

    total_p = sum(math.exp(lp) for _, lp in by_piece.values())
    assert 0.98 < total_p < 1.02, total_p

    again = sorted(map(tuple, tx.unigram_lm_train(
        spark.table("documents")).collect()))
    assert again == sorted(got)


def test_unigram_encode_matches_oracle_and_bounds(spark, duck):
    """Round-13 serving half: per-doc budgets match the re-derived
    DuckDB twin; n_tokens sits between n_words (fully merged) and the
    total alpha chars (char-level fallback); logprob is negative; a
    chars-only vocab degenerates to character counts."""
    from pyspark.sql import functions as F

    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    vocab = tx.unigram_lm_train(spark.table("documents"))
    out = tx.unigram_encode(spark.table("documents"), vocab)
    rows = check(spark, duck, out, tx.unigram_encode_oracle())
    assert len(rows) > 0
    for r in out.collect():
        assert r["n_words"] <= r["n_tokens"]
        assert r["logprob"] < 0

    # chars-only vocab (prune every multi): n_tokens == total chars
    chars_only = vocab.filter(F.length("piece") == 1)
    degen = tx.unigram_encode(spark.table("documents"), chars_only)
    chars = (
        spark.sql(
            "SELECT doc_id, CAST(sum(length(w)) AS BIGINT) AS n_chars "
            "FROM (SELECT doc_id, explode(split(lower(coalesce(text, "
            "'')), '\\\\s+')) w FROM documents) "
            "WHERE w RLIKE '^[a-z]+$' AND length(w) <= 30 "
            "GROUP BY doc_id")
    )
    j = degen.join(chars, "doc_id").collect()
    assert len(j) > 0
    assert all(r["n_tokens"] == r["n_chars"] for r in j)


def test_pii_scrub_masks_and_counts(spark, duck):
    """Round-13 PII scrub: crafted rows — all three classes masked in
    order, clean text untouched, NULL text scrubs to empty; matches
    the DuckDB twin on the same fixture."""
    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    spark.sql(
        "CREATE OR REPLACE TEMP VIEW pii_docs AS SELECT * FROM VALUES "
        "(CAST(0 AS BIGINT), "
        " 'mail a.b-c@ex-ample.co.uk or 10.1.2.3 call +44-555-0100 x'), "
        "(CAST(1 AS BIGINT), 'two mails p@q.io r@s.ai one 1.2.3.4'), "
        "(CAST(2 AS BIGINT), 'nothing to see 1234 here'), "
        "(CAST(3 AS BIGINT), CAST(NULL AS STRING)) "
        "t(doc_id, text)"
    )
    out = tx.pii_scrub(spark.table("pii_docs"))
    import duckdb as _duck

    con = _duck.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(0, 'mail a.b-c@ex-ample.co.uk or 10.1.2.3 call +44-555-0100 x'), "
        "(1, 'two mails p@q.io r@s.ai one 1.2.3.4'), "
        "(2, 'nothing to see 1234 here'), "
        "(3, NULL)) t(doc_id, text)"
    )
    mine = {r["doc_id"]: r for r in out.collect()}
    orc = {r[0]: r for r in con.execute(tx.pii_scrub_oracle()).fetchall()}
    assert len(mine) == len(orc) == 4
    for k in mine:
        assert (mine[k]["n_email"], mine[k]["n_ip"], mine[k]["n_phone"],
                mine[k]["scrubbed"]) == orc[k][1:], k
    assert mine[0]["scrubbed"] == "mail <EMAIL> or <IP> call <PHONE> x"
    assert (mine[1]["n_email"], mine[1]["n_ip"]) == (2, 1)
    assert mine[2]["scrubbed"] == "nothing to see 1234 here"
    assert mine[3]["scrubbed"] == ""

    # and the driver-fixture workload agrees cross-engine (check()
    # needs the real documents view on the session duck fixture)
    from datafusion_sqlgen_spark.workloads import build_oracles, build_queries

    import tests.conftest as cf

    q = build_queries()["text_pii_scrub"](spark, cf.SF_DIR)
    check(spark, duck, q, build_oracles()["text_pii_scrub"])


def test_tokenizer_fertility_per_lang(spark, duck):
    """Round-13 fertility audit: matches the composed DuckDB twin;
    every language's fertility is >= 1 (a word is at least one token)
    and doc counts sum to the alpha-word-bearing corpus."""
    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    merges = tx.bpe_train_merges(spark.table("documents"))
    out = tx.tokenizer_fertility(spark.table("documents"), merges)
    rows = check(spark, duck, out, tx.tokenizer_fertility_oracle())
    assert len(rows) > 0
    for r in out.collect():
        assert r["fertility"] >= 1.0
        assert r["n_tokens"] >= r["n_words"] >= r["n_docs"]


def test_label_agreement_kappa_properties(spark, duck):
    """Round-13 kappa: matches the DuckDB twin; confusion counts sum
    to n; kappa == 1 when a labeler is compared against itself and
    <= its po against an independent one; perfect-agreement crafted
    rows give kappa 1, perfect disagreement gives kappa <= 0."""
    from pyspark.sql import functions as F

    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    w = tx.make_hash_weights(spark)
    out = tx.label_agreement(spark.table("documents"), w)
    rows = check(spark, duck, out, tx.label_agreement_oracle())
    r = out.collect()[0]
    assert r["n"] == r["n11"] + r["n10"] + r["n01"] + r["n00"]
    assert -1.0 <= r["kappa"] <= 1.0
    assert 0.0 <= r["po"] <= 1.0 and 0.0 <= r["pe"] <= 1.0

    # self-agreement: threshold the classifier against itself via a
    # label_col that IS the classifier decision -> po = 1, kappa = 1
    scored = tx.classifier_score(spark.table("documents"), w)
    docs2 = spark.table("documents").join(
        scored.select("doc_id", (F.col("score") >= 0.5).alias("self_lab")),
        "doc_id")
    r2 = tx.label_agreement(
        docs2, w, label_col=F.col("self_lab")).collect()[0]
    assert r2["po"] == 1.0
    assert r2["kappa"] == 1.0 or r2["kappa"] is None  # None iff pe==1
