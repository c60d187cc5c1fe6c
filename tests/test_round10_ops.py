"""Round-10 operator contracts beyond the oracle gate: suffix-granularity
exact substring dedup pinned against planted repeats (maximal extent, exact
positions, sub-threshold silence, within-doc repeats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from songs_etl_spark.plans.dedup import SA_MIN_LEN, exact_substring_runs

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in sorted(texts.items())], "doc_id bigint, text string"
    )


def _toks(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_repeat_exact_extent_and_positions(spark):
    """A 20-token substring shared by two docs at different offsets comes
    back as ONE run with match_len exactly 20 and the exact 0-based token
    positions — not fragmented into 12-token windows."""
    shared = _toks("dup", 20)
    docs = _docs(
        spark,
        {
            1: _toks("a", 3) + " " + shared + " " + _toks("b", 5),
            2: _toks("c", 7) + " " + shared + " " + _toks("d", 2),
            3: _toks("e", 40),  # no repeats anywhere
        },
    )
    rows = exact_substring_runs(docs, SA_MIN_LEN).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.pos_a, r.doc_b, r.pos_b) == (1, 3, 2, 7)
    assert r.match_len == 20


def test_sub_threshold_repeat_is_silent(spark):
    """A shared run of min_len - 1 tokens must not be reported."""
    shared = _toks("dup", SA_MIN_LEN - 1)
    docs = _docs(
        spark,
        {
            1: _toks("a", 4) + " " + shared,
            2: shared + " " + _toks("b", 4),
        },
    )
    assert exact_substring_runs(docs, SA_MIN_LEN).count() == 0


def test_exact_threshold_repeat_is_found(spark):
    shared = _toks("dup", SA_MIN_LEN)
    docs = _docs(spark, {1: shared + " " + _toks("a", 3), 2: _toks("b", 2) + " " + shared})
    rows = exact_substring_runs(docs, SA_MIN_LEN).collect()
    assert len(rows) == 1
    assert rows[0].match_len == SA_MIN_LEN


def test_within_doc_repeat_reported(spark):
    """Self-repetition (the same doc containing the substring twice) is a
    real curation signal and must surface with doc_a == doc_b."""
    shared = _toks("dup", 15)
    docs = _docs(spark, {7: shared + " " + _toks("x", 4) + " " + shared})
    rows = exact_substring_runs(docs, SA_MIN_LEN).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.doc_a == 7 and r.doc_b == 7
    assert (r.pos_a, r.pos_b) == (0, 19)
    assert r.match_len == 15


def test_three_way_repeat_chain_covers_all_docs(spark):
    """k occurrences pair as a (k-1)-link chain in (doc_id, pos) order —
    linear in occurrences, and every occurrence appears in some pair."""
    shared = _toks("dup", 13)
    docs = _docs(
        spark,
        {
            1: shared,
            2: _toks("p", 1) + " " + shared,
            3: _toks("q", 2) + " " + shared,
        },
    )
    rows = exact_substring_runs(docs, SA_MIN_LEN).collect()
    assert len(rows) == 2
    chain = sorted((r.doc_a, r.doc_b) for r in rows)
    assert chain == [(1, 2), (2, 3)]
    assert all(r.match_len == 13 for r in rows)
