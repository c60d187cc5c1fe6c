"""Property tests for the corpus-curation operators (plans/curation.py);
exact values are driver/oracle-checked — these pin the semantic contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from songs_etl_spark.plans.curation import (
    _EVAL_MOD,
    _HAMMING_MAX,
    decontaminate_ngram_overlap,
    dedup_keep_best,
    dedup_simhash_hamming,
    doc_ngram_repetition,
    gopher_quality_filter,
)

SF_DIR = "/root/testdata/sf0.001"


def test_quality_filter_gates_both_ways(spark):
    rows = gopher_quality_filter(spark, SF_DIR).collect()
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped  # thresholds actually separate the corpus
    for r in rows:
        assert 0 < r.mean_word_len < 20
        assert 0.0 <= r.stop_frac <= 1.0
        assert 0.0 < r.distinct_ratio <= 1.0


def test_repetition_bounds_and_extremes(spark):
    rows = doc_ngram_repetition(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_distinct <= r.n_grams
        assert 0.0 <= r.dup_frac < 1.0


def test_decontaminate_never_flags_eval_docs(spark):
    rows = decontaminate_ngram_overlap(spark, SF_DIR).collect()
    assert rows  # tiny vocabulary → overlap must exist
    assert all(r.doc_id % _EVAL_MOD != 0 for r in rows)
    assert all(r.n_shared_ngrams >= 1 for r in rows)


def test_simhash_hamming_pairs_verified(spark):
    rows = dedup_simhash_hamming(spark, SF_DIR).collect()
    seen = set()
    for r in rows:
        assert r.da < r.db
        assert 0 <= r.hamming <= _HAMMING_MAX
        assert (r.da, r.db) not in seen
        seen.add((r.da, r.db))


def test_keep_best_covers_every_doc_once(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    out = dedup_keep_best(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) == n_docs  # total mapping, one row per doc
    by_id = {r.doc_id: r for r in rows}
    chars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    for r in rows:
        canon = by_id[r.canonical_id]
        # The canonical of a canonical is itself (idempotent mapping)...
        assert canon.is_canonical and canon.canonical_id == canon.doc_id
        # ...and it never has less content than the docs it represents.
        assert chars[r.canonical_id] >= chars[r.doc_id] or r.canonical_id == r.doc_id
    # Clustered docs point at a different canonical; at least the exact-dup
    # replicas in the corpus must cluster (non-trivial output).
    assert any(not r.is_canonical for r in rows)
