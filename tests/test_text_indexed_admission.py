"""The persisted-inverted-index text admission
(streaming/ingest.admit_text_batch_indexed) must produce EXACTLY the
verdicts of the corpus-rescanning probe (admit_against_corpus) at every
drain — same DF_CAP stop-shingle rule, same rare-filtered Jaccard sizes,
same min-earlier-id duplicate — while never re-tokenizing the admitted
corpus. Covers: cross-drain rejection, in-batch earlier-doc targets, the
batch-flips-a-shingle-hot denominator correction, replay convergence, and
the end-to-end stream drain."""

from __future__ import annotations

from pyspark.sql import functions as F

from songs_etl_spark.streaming.ingest import (
    admit_against_corpus,
    admit_documents_stream_indexed,
    admit_text_batch_indexed,
    compact_text_admission_state,
)

SCHEMA = "doc_id bigint, text string"


def _verdicts(spark, path):
    return {
        r.doc_id: (r.duplicate_of, r.is_new)
        for r in spark.read.parquet(path).collect()
    }


def _drain_and_compare(
    spark, paths, batches, threshold=0.8, df_cap=None, compact_every=None
):
    """Run each batch through the indexed path AND the one-shot rescan
    probe against the admitted-so-far corpus; assert identical verdicts.
    With ``compact_every``, fold the state segments between drains — the
    verdicts must not change (compaction is read-equivalent)."""
    admitted_rows: list = []
    for i, rows in enumerate(batches):
        batch = spark.createDataFrame(rows, SCHEMA)
        corpus = spark.createDataFrame(admitted_rows, SCHEMA)
        expected = {
            r.doc_id: (r.duplicate_of, r.is_new)
            for r in admit_against_corpus(
                batch, corpus, threshold, df_cap=df_cap
            ).collect()
        }
        admit_text_batch_indexed(
            batch, paths["corpus"], paths["state"], paths["verdicts"],
            threshold, df_cap=df_cap,
        )
        got = {k: v for k, v in _verdicts(spark, paths["verdicts"]).items()
               if k in expected}
        assert got == expected, f"drain {i}: indexed != one-shot rescan"
        admitted_rows += [r for r in rows if got[r[0]][1]]
        if compact_every and (i + 1) % compact_every == 0:
            compact_text_admission_state(spark, paths["state"], df_cap=df_cap)
    return admitted_rows


def _paths(tmp_path):
    return {k: str(tmp_path / k) for k in ("corpus", "state", "verdicts", "in", "ckpt")}


def test_indexed_matches_rescan_across_drains(spark, tmp_path):
    paths = _paths(tmp_path)
    batches = [
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text about database engines and storage")],
        # 3 near-dups corpus doc 1; 5 near-dups 4 within the batch
        [(3, "the quick brown fox jumps over the lazy dog again"),
         (4, "spark structured streaming drains micro batches exactly once"),
         (5, "spark structured streaming drains micro batches exactly once ok"),
         (6, "nothing like anything admitted before in any shingle at all")],
        # another drain probing both old corpus and newly admitted docs
        [(7, "completely unrelated text about database engines and storage yes"),
         (8, "the quick brown fox jumps over the lazy dog"),
         (9, "fresh tokens entirely distinct from previous corpus content here")],
    ]
    admitted = _drain_and_compare(spark, paths, batches)
    assert sorted(r[0] for r in admitted) == [1, 2, 4, 6, 9]


def test_indexed_with_compaction_matches_rescan(spark, tmp_path):
    """Folding the state segments between drains (compaction) must leave
    every later drain's verdicts identical — the fold is read-equivalent,
    and it physically prunes hot-shingle postings."""
    paths = _paths(tmp_path)
    batches = [
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text about database engines and storage")],
        [(3, "the quick brown fox jumps over the lazy dog again"),
         (4, "spark structured streaming drains micro batches exactly once")],
        [(5, "spark structured streaming drains micro batches exactly once ok"),
         (6, "nothing like anything admitted before in any shingle at all")],
    ]
    admitted = _drain_and_compare(spark, paths, batches, compact_every=1)
    assert sorted(r[0] for r in admitted) == [1, 2, 4, 6]
    # after the final compaction everything sits in the base segment
    import glob
    segs = glob.glob(paths["state"] + "/postings/seg=*")
    assert [s.rsplit("=", 1)[1] for s in segs] == ["0"]


def test_indexed_stop_shingle_flip_correction(spark, tmp_path):
    """A shingle rare in the stored index but pushed past the cap by the
    batch must leave BOTH the candidate set and the stored docs' Jaccard
    denominators — the corr pass. df_cap=2: 'xx yy zz' is rare when doc 1
    is admitted, and flips hot when two batch docs also carry it."""
    paths = _paths(tmp_path)
    batches = [
        [(1, "xx yy zz aa bb cc dd")],
        [(2, "xx yy zz aa bb cc ee"),
         (3, "xx yy zz pp qq rr ss")],
    ]
    _drain_and_compare(spark, paths, batches, df_cap=2)


def test_indexed_replay_converges(spark, tmp_path):
    paths = _paths(tmp_path)
    b1 = [(1, "the quick brown fox jumps over the lazy dog"),
          (2, "completely unrelated text about database engines and storage")]
    b2 = [(3, "the quick brown fox jumps over the lazy dog again"),
          (4, "fresh tokens entirely distinct from previous corpus content")]
    admit_text_batch_indexed(
        spark.createDataFrame(b1, SCHEMA),
        paths["corpus"], paths["state"], paths["verdicts"])
    admit_text_batch_indexed(
        spark.createDataFrame(b2, SCHEMA),
        paths["corpus"], paths["state"], paths["verdicts"])
    v_before = _verdicts(spark, paths["verdicts"])
    state_before = {
        p: spark.read.parquet(paths["state"] + "/" + p).count()
        for p in ("postings", "counts", "sizes")
    }
    # replay batch 2 (foreachBatch re-invocation after a failure)
    admit_text_batch_indexed(
        spark.createDataFrame(b2, SCHEMA),
        paths["corpus"], paths["state"], paths["verdicts"])
    assert _verdicts(spark, paths["verdicts"]) == v_before
    assert {
        p: spark.read.parquet(paths["state"] + "/" + p).count()
        for p in ("postings", "counts", "sizes")
    } == state_before


def test_compaction_crash_recovery(spark, tmp_path):
    """A crash at ANY point of compact_text_admission_state must leave the
    state recoverable: the fold is written to <relation>.__compact__ first
    and swapped in afterwards, and _recover_text_compaction (run at the top
    of every drain) promotes or discards leftovers. Simulates both crash
    windows with real directory states and asserts the next drain's
    verdicts are unaffected."""
    import shutil

    import pytest

    paths = _paths(tmp_path)
    batches = [
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text about database engines and storage")],
        [(3, "spark structured streaming drains micro batches exactly once"),
         (4, "nothing like anything admitted before in any shingle at all")],
    ]
    admitted = _drain_and_compare(spark, paths, batches, compact_every=2)
    assert sorted(r[0] for r in admitted) == [1, 2, 3, 4]

    # Crash window B (old dir deleted, rename pending): live postings dir
    # missing, complete fold sitting in the temp → must be promoted.
    shutil.move(paths["state"] + "/postings", paths["state"] + "/postings.__compact__")
    # Crash window A (temp written, old dir not yet deleted): both present
    # → the old segments stay authoritative, the temp is discarded.
    shutil.copytree(paths["state"] + "/counts", paths["state"] + "/counts.__compact__")
    probe = [(5, "the quick brown fox jumps over the lazy dog again"),
             (6, "fresh tokens entirely distinct from previous corpus content")]
    admit_text_batch_indexed(
        spark.createDataFrame(probe, SCHEMA),
        paths["corpus"], paths["state"], paths["verdicts"],
    )
    v = _verdicts(spark, paths["verdicts"])
    assert v[5] == (1, False) and v[6] == (None, True)
    import glob
    assert glob.glob(paths["state"] + "/*__compact__") == []

    # Impossible-by-construction state (live missing AND temp incomplete)
    # must fail loudly, never continue on partial state.
    shutil.move(paths["state"] + "/sizes", paths["state"] + "/sizes.__compact__")
    import os
    for root, _dirs, files in os.walk(paths["state"] + "/sizes.__compact__"):
        for f in files:
            if f == "_SUCCESS":
                os.remove(os.path.join(root, f))
    with pytest.raises(Exception, match="corrupted"):
        admit_text_batch_indexed(
            spark.createDataFrame([(7, "x y z")], SCHEMA),
            paths["corpus"], paths["state"], paths["verdicts"],
        )


def test_represented_ids_with_changed_text_get_own_segment(spark, tmp_path):
    """Round-7 ADVICE: the segment id fingerprints batch CONTENTS, not the
    id set — re-presenting the same doc_ids with changed text must NOT
    collide with (and silently overwrite) the original admission's
    segments; it routes through the cross-batch re-presentation path and
    is re-probed as new content."""
    import glob

    paths = _paths(tmp_path)
    b1 = [(1, "the quick brown fox jumps over the lazy dog"),
          (2, "completely unrelated text about database engines and storage")]
    b1_changed = [(1, "entirely new text replacing the first document body"),
                  (2, "completely unrelated text about database engines and storage")]
    admit_text_batch_indexed(
        spark.createDataFrame(b1, SCHEMA),
        paths["corpus"], paths["state"], paths["verdicts"])
    segs_before = set(glob.glob(paths["verdicts"] + "/seg=*"))
    admit_text_batch_indexed(
        spark.createDataFrame(b1_changed, SCHEMA),
        paths["corpus"], paths["state"], paths["verdicts"])
    segs_after = set(glob.glob(paths["verdicts"] + "/seg=*"))
    # distinct fingerprint → the first admission's segment survives intact
    assert segs_before < segs_after and len(segs_after) == 2
    # the verdict log keeps BOTH admission events (it is a log, keyed by
    # (seg, doc_id)); the re-presented content was re-probed against the
    # corpus minus the re-presented ids and admitted as new
    vlog = spark.read.parquet(paths["verdicts"])
    assert vlog.count() == 4
    assert vlog.filter("doc_id = 1 and is_new").count() == 2


def test_indexed_stream_e2e(spark, tmp_path):
    paths = _paths(tmp_path)
    batches = [
        [(1, "the quick brown fox jumps over the lazy dog")],
        [(2, "the quick brown fox jumps over the lazy dog again"),
         (3, "completely unrelated text about database engines and storage")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(paths["in"])
        stream = spark.readStream.schema(SCHEMA).parquet(paths["in"])
        q = admit_documents_stream_indexed(
            stream, paths["corpus"], paths["state"], paths["verdicts"]
        ).option("checkpointLocation", paths["ckpt"]).start()
        q.awaitTermination()
    v = _verdicts(spark, paths["verdicts"])
    assert v == {1: (None, True), 2: (1, False), 3: (None, True)}
    assert sorted(
        r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()
    ) == [1, 3]
