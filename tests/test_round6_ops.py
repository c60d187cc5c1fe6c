"""Unit pins for round-6 operators beyond their oracle checks: the
winnowing recall guarantee on adversarial constructions, and the
bounded-staleness as-of join's mask semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.operators.temporal import asof_join


def _fps(spark, rows):
    """Run the winnowing core on an in-memory documents relation by
    monkey-free construction: mirror _winnow_fp_relation's body over a
    temp view is overkill — instead reuse the plan function against a
    parquet fixture."""
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    from songs_etl_spark.plans.dedup import _winnow_fp_relation

    return _fp_sets(_winnow_fp_relation(spark, d))


def _fp_sets(fp_df):
    out: dict[int, set[int]] = {}
    for r in fp_df.collect():
        out.setdefault(r.doc_id, set()).add(r.fp_hash)
    return out


def test_winnowing_guarantee_shared_run(spark):
    """Schleimer et al.'s theorem: any shared token run of length
    >= w + k - 1 = 6 yields at least one SHARED fingerprint, regardless of
    the differing surroundings. Adversarial framing: the shared run sits at
    different positions inside otherwise-disjoint documents."""
    shared = "alpha bravo charlie delta echo foxtrot"  # 6 tokens
    rows = [
        (1, f"one two three four five {shared} six seven eight nine", "en", "a", 0),
        (2, f"{shared} ten eleven twelve thirteen fourteen fifteen sixteen", "en", "a", 0),
        (3, "totally different content with no overlap at all whatsoever here", "en", "a", 0),
    ]
    fps = _fps(spark, rows)
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnowing_density(spark):
    """Fingerprints are a sparse subset: ~2/(w+1) of the k-grams, never all
    of them, and every fingerprint position is a real k-gram position."""
    text = " ".join(f"tok{i}" for i in range(40))
    rows = [(1, text, "en", "a", 0)]
    from songs_etl_spark.plans.dedup import _winnow_fp_relation
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = _winnow_fp_relation(spark, d).collect()
    n_kgrams = 40 - 2
    assert 0 < len(got) < n_kgrams
    assert all(1 <= r.fp_pos <= n_kgrams for r in got)


def test_asof_tolerance_masks_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 100_000, "p1"), (1, 200_000, "p2")],
        "user_id int, ms bigint, pid string",
    ).select("user_id", F.timestamp_millis(F.col("ms")).alias("ts"), "pid")
    right = spark.createDataFrame(
        [(1, 95_000, "fresh"), (1, 40_000, "stale")],
        "user_id int, ms bigint, tag string",
    ).select("user_id", F.timestamp_millis(F.col("ms")).alias("ts"), "tag")
    got = {
        r.pid: r.asof_tag
        for r in asof_join(
            left, right, ["user_id"], "ts", ["tag"], tolerance_ms=10_000
        ).collect()
    }
    # p1 at 100s: latest prior is 95s (5s old) -> kept; p2 at 200s: latest
    # prior is still 95s (105s old) -> masked to NULL, NOT the even-staler 40s
    assert got == {"p1": "fresh", "p2": None}


def test_asof_without_tolerance_unchanged(spark):
    left = spark.createDataFrame(
        [(1, 200_000, "p2")], "user_id int, ms bigint, pid string"
    ).select("user_id", F.timestamp_millis(F.col("ms")).alias("ts"), "pid")
    right = spark.createDataFrame(
        [(1, 40_000, "old")], "user_id int, ms bigint, tag string"
    ).select("user_id", F.timestamp_millis(F.col("ms")).alias("ts"), "tag")
    got = asof_join(left, right, ["user_id"], "ts", ["tag"]).collect()
    assert got[0].asof_tag == "old"
