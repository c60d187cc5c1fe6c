"""Semantic tests for the training-data pipeline operators (plans/training.py);
cross-engine value equality is covered by the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from songs_etl_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_pii_redaction_removes_all_pii(spark):
    out = REGISTRY["pii_redact_docs"].fn(spark, SF_DIR)
    rows = out.collect()
    # Every doc was seeded with exactly one email and one phone; both counted.
    assert all(r.n_emails == 1 and r.n_phones == 1 for r in rows)


def test_pack_budget_prefix_semantics(spark):
    rows = REGISTRY["pack_documents_budget"].fn(spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, packs in by_lang.items():
        packs.sort(key=lambda r: r.pack_id)
        # Pack ids are dense from 0 and doc ranges never overlap.
        assert [p.pack_id for p in packs] == list(range(len(packs)))
        for prev, cur in zip(packs, packs[1:]):
            assert prev.last_doc < cur.first_doc
        # Exclusive-prefix rule: every pack except the last starts a doc
        # before the budget boundary, so no pack is left empty.
        assert all(p.n_docs >= 1 for p in packs)


def test_lang_quota_cap_and_determinism(spark):
    a = REGISTRY["lang_quota_sample"].fn(spark, SF_DIR)
    counts = {r.lang: r.n for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts and all(n <= 40 for n in counts.values())
    b = {(r.doc_id, r.lang, r.rk) for r in REGISTRY["lang_quota_sample"].fn(spark, SF_DIR).collect()}
    assert b == {(r.doc_id, r.lang, r.rk) for r in a.collect()}


def test_label_centroid_norms_positive(spark):
    rows = REGISTRY["embedding_label_centroids"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r.n_vecs > 0 and 0 < r.centroid_norm < 10 for r in rows)
