"""E2E for the embedding-admission index-lifecycle pass
(streaming/ingest.compact_embedding_admission_state, round-6 verdict task 3):

1. A duplicate-heavy stream replayed through two independent state dirs —
   one compacting after EVERY drain, one never — produces IDENTICAL
   verdicts and corpora (compaction is provably a no-op on stream-built
   state), while the compacting run's index never exceeds the other's.
2. An externally-seeded corpus containing near-dups AMONG ITSELF (the case
   admission never probes) shrinks to its admission-invariant form: the
   index drops the dominated reps, and future drains still reject
   near-dups of the surviving representative.
3. The keep_predicate TTL hook expires rows from corpus AND index.
"""

from __future__ import annotations

from songs_etl_spark.streaming.ingest import (
    admit_embedding_batch_into,
    admit_embeddings_stream,
    compact_embedding_admission_state,
)

SCHEMA = "vec_id bigint, embedding array<double>"

V_A = [1.0, 1.0, 1.0, 1.0]
V_B = [1.0, -1.0, 1.0, -1.0]
V_D = [1.01, 0.99, 1.02, 0.98]   # ~ V_A (cos ≈ 0.9997)
V_E = [1.0, 1.0, -1.0, -1.0]
V_F = [1.02, 0.98, -1.01, -0.99]  # ~ V_E


def _drain(spark, paths, compact_every=None):
    stream = spark.readStream.schema(SCHEMA).parquet(paths["in"])
    q = admit_embeddings_stream(
        stream, paths["corpus"], paths["index"], paths["verdicts"],
        compact_every=compact_every,
    ).option("checkpointLocation", paths["ckpt"]).start()
    q.awaitTermination()


def _mkpaths(d):
    return {k: str(d / k) for k in ("in", "corpus", "index", "verdicts", "ckpt")}


def _state(spark, paths):
    verdicts = {
        r.vec_id: (r.duplicate_of, r.is_new)
        for r in spark.read.parquet(paths["verdicts"]).collect()
    }
    corpus = sorted(r.vec_id for r in spark.read.parquet(paths["corpus"]).collect())
    index_rows = spark.read.parquet(paths["index"]).count()
    return verdicts, corpus, index_rows


def test_compaction_is_noop_on_stream_built_state(spark, tmp_path):
    """Same duplicate-heavy batches through a compacting and a
    non-compacting pipeline: verdicts and corpora identical, and the
    compacting index stays no larger — sub-growth on a duplicate-heavy
    stream comes from rejection, compaction guarantees it never regresses."""
    batches = [
        [(10, V_A), (20, V_B)],
        # duplicate-heavy: three near/exact dups, one new
        [(30, V_D), (31, V_A), (32, V_A), (40, V_E)],
        [(50, V_F), (51, V_E), (60, [-1.0, 1.0, 1.0, -1.0])],
    ]
    p_plain = _mkpaths(tmp_path / "plain")
    p_comp = _mkpaths(tmp_path / "comp")
    for i, rows in enumerate(batches):
        for p, every in ((p_plain, None), (p_comp, 1)):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(p["in"])
            _drain(spark, p, compact_every=every)
        v1, c1, i1 = _state(spark, p_plain)
        v2, c2, i2 = _state(spark, p_comp)
        assert v1 == v2, f"verdicts diverged after batch {i}"
        assert c1 == c2, f"corpus diverged after batch {i}"
        assert i2 <= i1, f"compacted index grew past append-only after batch {i}"
    # the duplicate-heavy stream admitted 4 of 9 vectors
    assert c1 == [10, 20, 40, 60]


def test_compaction_collapses_seeded_near_dups(spark, tmp_path):
    """Seeded corpus with intra-seed near-dups (A, D≈A, E): compaction
    removes D (duplicate of the smaller-id A), rebuilds the index to the
    survivors, and a following drain still rejects near-dups of A."""
    paths = _mkpaths(tmp_path)
    spark.createDataFrame(
        [(10, V_A), (11, V_D), (40, V_E)], SCHEMA
    ).write.parquet(paths["corpus"])
    # bootstrap drain (also persists the seed's signatures)
    admit_embedding_batch_into(
        spark.createDataFrame([(20, V_B)], SCHEMA),
        paths["corpus"], paths["index"], paths["verdicts"],
    )
    idx_before = spark.read.parquet(paths["index"]).count()
    compact_embedding_admission_state(spark, paths["corpus"], paths["index"])
    corpus = sorted(r.vec_id for r in spark.read.parquet(paths["corpus"]).collect())
    assert corpus == [10, 20, 40]  # 11 collapsed into 10
    assert spark.read.parquet(paths["index"]).count() < idx_before
    # near-dup of the SURVIVING rep is still rejected post-compaction
    admit_embedding_batch_into(
        spark.createDataFrame([(70, V_A)], SCHEMA),
        paths["corpus"], paths["index"], paths["verdicts"],
    )
    v = {r.vec_id: (r.duplicate_of, r.is_new)
         for r in spark.read.parquet(paths["verdicts"]).collect()}
    assert v[70] == (10, False)


def test_compaction_keep_predicate_expires_rows(spark, tmp_path):
    """TTL hook: rows failing keep_predicate leave corpus and index, so a
    re-presented twin of an expired vector is admitted again."""
    paths = _mkpaths(tmp_path)
    admit_embedding_batch_into(
        spark.createDataFrame([(10, V_A), (40, V_E)], SCHEMA),
        paths["corpus"], paths["index"], paths["verdicts"],
    )
    compact_embedding_admission_state(
        spark, paths["corpus"], paths["index"], keep_predicate="vec_id >= 40"
    )
    assert [r.vec_id for r in spark.read.parquet(paths["corpus"]).collect()] == [40]
    admit_embedding_batch_into(
        spark.createDataFrame([(80, V_A)], SCHEMA),
        paths["corpus"], paths["index"], paths["verdicts"],
    )
    v = {r.vec_id: r.is_new
         for r in spark.read.parquet(paths["verdicts"]).collect()}
    assert v[80] is True
