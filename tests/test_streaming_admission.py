"""E2E: continuous near-dup admission — newly ingested documents stream
through the dedup_incremental_batch corpus-index probe under
Trigger.AvailableNow (streaming/ingest.admit_documents_stream). Two drains:
the second batch's near-dups of first-batch docs are rejected, in-batch
earlier docs are admission targets, and a replayed micro-batch merges to
identical state (exactly-once effect)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.streaming.ingest import (
    admit_against_corpus,
    admit_batch_into,
    admit_documents_stream,
)

SCHEMA = "doc_id bigint, text string, lang string"

T_A = "the quick brown fox jumps over the lazy dog again today"
T_B = "pack my box with five dozen liquor jugs before noon strikes"
T_C = "sphinx of black quartz judge my vow tonight under bright stars"
T_E = "how vexingly quick daft zebras jump across the frozen river"


def _write_batch(spark, in_dir, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)


def _drain(spark, in_dir, corpus, verdicts, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = admit_documents_stream(stream, corpus, verdicts).option(
        "checkpointLocation", ckpt
    ).start()
    q.awaitTermination()


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("admission")
    return {
        "in": str(d / "incoming"),
        "corpus": str(d / "corpus"),
        "verdicts": str(d / "verdicts"),
        "ckpt": str(d / "ckpt"),
    }


def test_streaming_admission_two_batches_and_replay(spark, paths):
    # drain 1: three distinct docs — all admitted
    _write_batch(
        spark,
        paths["in"],
        [(10, T_A, "en"), (20, T_B, "en"), (30, T_C, "en")],
    )
    _drain(spark, paths["in"], paths["corpus"], paths["verdicts"], paths["ckpt"])
    v1 = {r.doc_id: r for r in spark.read.parquet(paths["verdicts"]).collect()}
    assert sorted(v1) == [10, 20, 30]
    assert all(v.is_new and v.duplicate_of is None for v in v1.values())
    assert sorted(r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()) == [
        10, 20, 30,
    ]

    # drain 2: D is a near-dup of corpus doc A, E is new, F duplicates E
    # within the SAME micro-batch (earlier doc wins)
    _write_batch(
        spark,
        paths["in"],
        [(40, T_A, "en"), (50, T_E, "en"), (60, T_E, "en")],
    )
    _drain(spark, paths["in"], paths["corpus"], paths["verdicts"], paths["ckpt"])
    v2 = {r.doc_id: r for r in spark.read.parquet(paths["verdicts"]).collect()}
    assert sorted(v2) == [10, 20, 30, 40, 50, 60]
    assert v2[40].duplicate_of == 10 and not v2[40].is_new
    assert v2[50].is_new and v2[50].duplicate_of is None
    assert v2[60].duplicate_of == 50 and not v2[60].is_new
    corpus_ids = sorted(r.doc_id for r in spark.read.parquet(paths["corpus"]).collect())
    assert corpus_ids == [10, 20, 30, 50]

    # replay: the sink body re-invoked with the SAME micro-batch (Spark
    # replays foreachBatch after a failure) must merge to identical state
    batch2 = spark.createDataFrame(
        [(40, T_A, "en"), (50, T_E, "en"), (60, T_E, "en")], SCHEMA
    )
    admit_batch_into(batch2, paths["corpus"], paths["verdicts"])
    v3 = {r.doc_id: (r.duplicate_of, r.is_new)
          for r in spark.read.parquet(paths["verdicts"]).collect()}
    assert v3 == {k: (v.duplicate_of, v.is_new) for k, v in v2.items()}
    assert sorted(
        r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()
    ) == [10, 20, 30, 50]


def test_admission_short_docs_are_admitted(spark):
    """Docs under 3 tokens have no shingles — they can't match anything and
    must be admitted, not dropped by the size filter."""
    corpus = spark.createDataFrame([(1, T_A, "en")], SCHEMA)
    batch = spark.createDataFrame([(2, "hi there", "en")], SCHEMA)
    got = admit_against_corpus(batch, corpus).collect()
    assert len(got) == 1 and got[0].is_new and got[0].duplicate_of is None
