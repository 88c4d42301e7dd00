"""Round-13 fuzz: the unigram Viterbi encoder vs brute-force
segmentation enumeration.

One Spark job over ~40 seeded-random words against a seeded-random
vocab; per word, brute force enumerates EVERY segmentation into pieces
of length 1..4 (a piece is usable iff it is in the vocab, or is a
single char at the UNK cost) and checks that the encoder's path cost
equals the true minimum and its token count matches some minimal-cost
segmentation. Non-circular on the cost (exhaustive enumeration shares
no code with the DP)."""

import random

from datafusion_sqlgen_spark.operators.text import (
    _UNIGRAM_UNK,
    unigram_encode,
)


def _brute(w, costs, max_len=4):
    """(min_cost, {n_tok of every minimal segmentation})."""
    best = {}

    def rec(pos):
        if pos == len(w):
            return [(0, 0)]
        if pos in best:
            return best[pos]
        outs = []
        for j in range(pos + 1, min(pos + max_len, len(w)) + 1):
            sub = w[pos:j]
            c = costs.get(sub)
            if c is None and len(sub) == 1:
                c = _UNIGRAM_UNK
            if c is None:
                continue
            outs.extend((c + rc, 1 + rn) for rc, rn in rec(j))
        best[pos] = outs
        return outs

    paths = rec(0)
    mc = min(c for c, _ in paths)
    return mc, {n for c, n in paths if c == mc}


def test_unigram_encode_matches_bruteforce(spark):
    rng = random.Random(42)
    alphabet = "abcde"  # tight alphabet -> dense vocab collisions
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        for _ in range(40)
    ]
    # vocab: every single char of a SUBSET of the alphabet (so some
    # words hit the UNK path) + random multi-char pieces
    vocab = {}
    for ch in "abcd":
        vocab[ch] = rng.randint(1, 30) * 10**6
    for _ in range(25):
        ln = rng.randint(2, 4)
        piece = "".join(rng.choice(alphabet) for _ in range(ln))
        vocab.setdefault(piece, rng.randint(1, 60) * 10**5)

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id BIGINT, text STRING")
    vocab_df = spark.createDataFrame(
        [(p, 1, -c / 1e6) for p, c in vocab.items()],
        "piece STRING, n_uses BIGINT, logprob DOUBLE")

    out = {r["doc_id"]: r for r in unigram_encode(docs, vocab_df).collect()}
    assert len(out) == len(words)
    for i, w in enumerate(words):
        mc, ntoks = _brute(w, vocab)
        got_cost = int(round(-out[i]["logprob"] * 1e6))
        assert got_cost == mc, (w, got_cost, mc)
        assert out[i]["n_tokens"] in ntoks, (w, out[i]["n_tokens"], ntoks)
        assert out[i]["n_words"] == 1
