"""The BPE Arrow apply path (plans/text.bpe_apply_merges) must be bit-equal
to the registered expression form (a chain of literal F.replace) — pandas'
non-regex str.replace, Spark's F.replace and DuckDB's replace all share
left-to-right non-overlapping semantics on the brace encoding, and these
tests pin that claim on the adversarial cases where replace semantics can
diverge (self-overlap, adjacent repeats, chained merges)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.plans import REGISTRY
from songs_etl_spark.plans.text import bpe_apply_merges

SF_DIR = "/root/testdata/sf0.001"


def _brace(word: str) -> str:
    return "".join("{%s}" % c for c in word) + "{#}"


def _expression_chain(df, merges):
    out = df
    for a, b in merges:
        out = out.select(
            "word",
            F.replace(
                F.col("p"), F.lit("{%s}{%s}" % (a, b)), F.lit("{%s%s}" % (a, b))
            ).alias("p"),
        )
    return out


# (words, merges) cases where replace semantics could diverge:
CASES = [
    # adjacent repeats: left-to-right non-overlap on 'abab' and 'aaa'
    (["abab", "aaa", "aaaa", "ababa"], [("a", "b"), ("a", "a")]),
    # chained merges: later rules consume earlier rules' output symbols
    (["abcabc", "abab"], [("a", "b"), ("ab", "c"), ("abc", "abc")]),
    # end-marker merges and single-char words
    (["a", "ab", "ba"], [("a", "#"), ("b", "a#")]),
    # merge output equal to a later pattern's substring
    (["xxyy", "xyxy"], [("x", "x"), ("y", "y"), ("xx", "yy")]),
]


@pytest.mark.parametrize("words,merges", CASES)
def test_arrow_equals_expression_chain(spark, words, merges):
    df = spark.createDataFrame(
        [(w, _brace(w)) for w in words], "word string, p string"
    )
    expr = {r["word"]: r["p"] for r in _expression_chain(df, merges).collect()}
    arrow = {r["word"]: r["p"] for r in bpe_apply_merges(df, merges).collect()}
    # also pin against plain Python, the reference semantics
    py = {}
    for w in words:
        p = _brace(w)
        for a, b in merges:
            p = p.replace("{%s}{%s}" % (a, b), "{%s%s}" % (a, b))
        py[w] = p
    assert arrow == expr == py


def test_registered_arrow_query_equals_expression_query(spark):
    """End-to-end at R=8 on real data: the Arrow-encoded segment counts must
    equal the expression-encoded ones row for row."""
    expr = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in REGISTRY["bpe_segment_counts"].fn(spark, SF_DIR).collect()
    }
    arrow = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in REGISTRY["bpe_segment_counts_arrow"].fn(spark, SF_DIR).collect()
    }
    assert arrow == expr and len(arrow) == 500


def test_unigram_lm_viterbi_invariants(spark):
    """Viterbi piece counts are bounded (ceil(len/4) <= n <= len), scores
    are the max-likelihood split, and the Arrow DP is partitioning-
    independent."""
    import math

    from songs_etl_spark.plans.text import (
        _ULM_PIECE_MAX,
        unigram_segment_arrow,
    )

    lp = {}
    words = ["a", "ab", "abcab", "zzzzzzzz", "abcdefgh"]
    for w in words:
        for i in range(len(w)):
            for l in range(1, _ULM_PIECE_MAX + 1):
                p = w[i : i + l]
                if p:
                    lp.setdefault(p, -1.5 * len(p) + (-0.1 if len(p) == 1 else 0.0))
    df = spark.createDataFrame([(w,) for w in words], "word string")
    a = {r.word: (r.n, r.score) for r in unigram_segment_arrow(df, lp).collect()}
    b = {r.word: (r.n, r.score)
         for r in unigram_segment_arrow(df.repartition(4), lp).collect()}
    assert a == b
    for w in words:
        n, score = a[w]
        assert math.ceil(len(w) / _ULM_PIECE_MAX) <= n <= len(w)
    # hand-check: under lp above, per-char cost is -1.6 but a 4-char piece
    # costs -6.0 < 2x(-3.05)... the DP must beat any naive split:
    # brute-force the 8-char word
    def brute(w):
        best = None
        def rec(pos, n, s):
            nonlocal best
            if pos == len(w):
                c = (-s, n)
                if best is None or c < best:
                    best = c
                return
            for l in range(1, min(_ULM_PIECE_MAX, len(w) - pos) + 1):
                rec(pos + l, n + 1, s + lp[w[pos : pos + l]])
        rec(0, 0, 0.0)
        return (-best[0], best[1])
    bs, bn = brute("abcdefgh")
    assert a["abcdefgh"] == (bn, bs)
