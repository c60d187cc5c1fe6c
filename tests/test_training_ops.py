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


def _corpus(spark, tmp_path, rows):
    d = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_temperature_mix_rates_and_determinism(spark, tmp_path):
    """4 en docs vs 1 fr doc at tau=0.5: rate_en = sqrt(1/4) = 0.5, rate_fr = 1
    (the minority domain is never downsampled); the kept set is a pure
    function of content, so two runs agree row-for-row."""
    rows = [(i, f"text number {i}", "en", "s", 10) for i in range(4)]
    rows.append((9, "le texte", "fr", "s", 8))
    path = _corpus(spark, tmp_path, rows)
    fn = REGISTRY["domain_temperature_mix"].fn
    got = {r.doc_id: r for r in fn(spark, path).collect()}
    assert 9 in got and got[9].keep_rate == 1.0
    for did, r in got.items():
        if did != 9:
            assert r.keep_rate == 0.5
    assert {r.doc_id for r in fn(spark, path).collect()} == set(got)


def test_dsir_weights_rank_target_like_docs_higher(spark, tmp_path):
    """A non-target doc written in the target's vocabulary must outscore a
    non-target doc with vocabulary the target never uses."""
    rows = [
        (0, "alpha beta gamma", "en", "s", 10),
        (1, "alpha beta gamma", "en", "s", 10),
        (2, "alpha beta gamma", "fr", "s", 10),  # target-like vocabulary
        (3, "zulu yankee xray", "fr", "s", 10),  # out-of-target vocabulary
    ]
    path = _corpus(spark, tmp_path, rows)
    w = {
        r.doc_id: r.dsir_logweight
        for r in REGISTRY["dsir_importance_weights"].fn(spark, path).collect()
    }
    assert w[2] > w[3]
    assert w[0] == w[1] == w[2]  # same text → same buckets → same weight
