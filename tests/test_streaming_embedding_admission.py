"""E2E: continuous near-dup admission for EMBEDDINGS — new vectors stream
through the persisted sign-LSH band-index probe under Trigger.AvailableNow
(streaming/ingest.admit_embeddings_stream), the vector-modality counterpart
of test_streaming_admission. Two drains: batch-2 near-dups of batch-1
vectors are rejected, in-batch earlier vectors are admission targets, the
persisted band index grows only by admitted rows, and a replayed
micro-batch merges to identical state (exactly-once effect)."""

from __future__ import annotations

import pytest

from songs_etl_spark.streaming.ingest import (
    admit_embedding_batch_into,
    admit_embeddings_stream,
)

SCHEMA = "vec_id bigint, embedding array<double>"

# dim-4 fixtures, all components far from 0 so sign patterns are stable:
# A ⊥ B ⊥ E, C = -B; D ≈ A (cos ≈ 0.9997, same signs → all bands collide);
# F ≈ E likewise.
V_A = [1.0, 1.0, 1.0, 1.0]
V_B = [1.0, -1.0, 1.0, -1.0]
V_C = [-1.0, 1.0, -1.0, 1.0]
V_D = [1.01, 0.99, 1.02, 0.98]
V_E = [1.0, 1.0, -1.0, -1.0]
V_F = [1.02, 0.98, -1.01, -0.99]


def _write_batch(spark, in_dir, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)


def _drain(spark, paths):
    stream = spark.readStream.schema(SCHEMA).parquet(paths["in"])
    q = admit_embeddings_stream(
        stream, paths["corpus"], paths["index"], paths["verdicts"]
    ).option("checkpointLocation", paths["ckpt"]).start()
    q.awaitTermination()


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("emb_admission")
    return {
        "in": str(d / "incoming"),
        "corpus": str(d / "corpus"),
        "index": str(d / "band_index"),
        "verdicts": str(d / "verdicts"),
        "ckpt": str(d / "ckpt"),
    }


def test_streaming_embedding_admission_two_batches_and_replay(spark, paths):
    # drain 1: three mutually-orthogonal (or opposite) vectors — all admitted
    _write_batch(spark, paths["in"], [(10, V_A), (20, V_B), (30, V_C)])
    _drain(spark, paths)
    v1 = {r.vec_id: r for r in spark.read.parquet(paths["verdicts"]).collect()}
    assert sorted(v1) == [10, 20, 30]
    assert all(v.is_new and v.duplicate_of is None for v in v1.values())
    assert sorted(
        r.vec_id for r in spark.read.parquet(paths["corpus"]).collect()
    ) == [10, 20, 30]
    idx1 = spark.read.parquet(paths["index"])
    assert sorted(r.rep for r in idx1.select("rep").distinct().collect()) == [10, 20, 30]

    # drain 2: D near-dups corpus vector A; E is new; F near-dups E within
    # the SAME micro-batch (earlier id wins)
    _write_batch(spark, paths["in"], [(40, V_D), (50, V_E), (60, V_F)])
    _drain(spark, paths)
    v2 = {r.vec_id: r for r in spark.read.parquet(paths["verdicts"]).collect()}
    assert sorted(v2) == [10, 20, 30, 40, 50, 60]
    assert v2[40].duplicate_of == 10 and not v2[40].is_new
    assert v2[50].is_new and v2[50].duplicate_of is None
    assert v2[60].duplicate_of == 50 and not v2[60].is_new
    assert sorted(
        r.vec_id for r in spark.read.parquet(paths["corpus"]).collect()
    ) == [10, 20, 30, 50]
    # the persisted index grew ONLY by the admitted vector's bands
    idx2 = spark.read.parquet(paths["index"])
    assert sorted(r.rep for r in idx2.select("rep").distinct().collect()) == [
        10, 20, 30, 50,
    ]
    idx2_rows = idx2.count()  # eager: the replay below overwrites these files

    # replay: the sink body re-invoked with the SAME micro-batch (Spark
    # replays foreachBatch after a failure) must merge to identical state
    batch2 = spark.createDataFrame([(40, V_D), (50, V_E), (60, V_F)], SCHEMA)
    admit_embedding_batch_into(
        batch2, paths["corpus"], paths["index"], paths["verdicts"]
    )
    v3 = {r.vec_id: (r.duplicate_of, r.is_new)
          for r in spark.read.parquet(paths["verdicts"]).collect()}
    assert v3 == {k: (v.duplicate_of, v.is_new) for k, v in v2.items()}
    assert sorted(
        r.vec_id for r in spark.read.parquet(paths["corpus"]).collect()
    ) == [10, 20, 30, 50]
    assert spark.read.parquet(paths["index"]).count() == idx2_rows


def test_embedding_admission_seeded_corpus_bootstrap(spark, tmp_path):
    """Externally-seeded corpus (corpus_path exists, index_path does NOT):
    the bootstrap drain must PERSIST the corpus-derived band signatures into
    index_path, not just the admitted batch's — otherwise the next drain's
    index silently omits the seeded corpus and wrongly admits its
    near-duplicates (round-6 ADVICE, streaming/ingest.py bootstrap)."""
    d = str(tmp_path)
    corpus_path = d + "/corpus"
    index_path = d + "/index"
    verdicts_path = d + "/verdicts"
    # seed the corpus out-of-band: vector A admitted by some prior system
    spark.createDataFrame([(10, V_A)], SCHEMA).write.parquet(corpus_path)

    # drain 1 (bootstrap): E is orthogonal to A — admitted; the index must
    # now cover BOTH the seeded corpus (A) and the admitted batch (E)
    admit_embedding_batch_into(
        spark.createDataFrame([(50, V_E)], SCHEMA),
        corpus_path, index_path, verdicts_path,
    )
    idx = spark.read.parquet(index_path)
    assert sorted(r.rep for r in idx.select("rep").distinct().collect()) == [10, 50]

    # drain 2: D near-dups the SEEDED vector A — must be rejected via the
    # persisted index (pre-fix, A's signatures were absent and D admitted)
    admit_embedding_batch_into(
        spark.createDataFrame([(40, V_D)], SCHEMA),
        corpus_path, index_path, verdicts_path,
    )
    v = {r.vec_id: (r.duplicate_of, r.is_new)
         for r in spark.read.parquet(verdicts_path).collect()}
    assert v[40] == (10, False)
    assert sorted(
        r.vec_id for r in spark.read.parquet(corpus_path).collect()
    ) == [10, 50]


def test_embedding_admission_exact_duplicates_in_batch(spark, paths):
    """Bit-identical vectors in one batch collapse to one group: the min id
    is admitted (given no corpus neighbor), the rest point at it."""
    corpus = spark.createDataFrame([(1, V_A)], SCHEMA)
    corpus.write.mode("overwrite").parquet(paths["corpus"] + "_x")
    from songs_etl_spark.plans.similarity import embedding_admission_verdicts

    batch = spark.createDataFrame([(7, V_E), (8, V_E), (9, V_E)], SCHEMA)
    got = {
        r.vec_id: (r.duplicate_of, r.is_new)
        for r in embedding_admission_verdicts(
            batch, corpus, threshold=0.9, bits_per_band=4, n_bands=4, dim=4
        ).collect()
    }
    assert got == {7: (None, True), 8: (7, False), 9: (7, False)}
