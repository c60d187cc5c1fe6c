"""Structured Streaming tests: drain finite file sources with AvailableNow
and check streaming results against the equivalent batch computation."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.streaming import ingest


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    rows = [
        # (event_id, ts, user_id, event_type, value) — two users, two hours,
        # one duplicated event_id, one pair of events >30min apart (session split).
        (1, "2024-05-01 10:00:00", 1, "play", 1.0),
        (2, "2024-05-01 10:10:00", 1, "play", 2.0),
        (2, "2024-05-01 10:10:00", 1, "play", 2.0),  # exact dup
        (3, "2024-05-01 11:05:00", 1, "skip", 0.5),
        (4, "2024-05-01 10:20:00", 2, "play", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events")


def drain(spark, stream_df, mode: str):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def read_stream(spark, path):
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    return spark.readStream.schema(schema).parquet(path)


def test_watermarked_hourly_agg_matches_batch(spark, events_dir):
    got = drain(
        spark,
        ingest.hourly_events_watermarked(read_stream(spark, events_dir), watermark="1 second"),
        "append",
    )
    # Append mode emits only windows the final watermark (max ts − delay =
    # 11:04:59) has closed: the 10:00 window is out, the 11:00 window —
    # still open — is correctly held back for a later batch.
    rows = {(str(r.window_start), r.event_type): (r.n, r.sum_value) for r in got.collect()}
    assert rows == {("2024-05-01 10:00:00", "play"): (4, 8.0)}


def test_streaming_dedup_drops_exact_dup(spark, events_dir):
    got = drain(spark, ingest.dedup_events_stream(read_stream(spark, events_dir)), "append")
    ids = sorted(r.event_id for r in got.collect())
    assert ids == [1, 2, 3, 4]


def test_session_window_splits_on_gap(spark, events_dir):
    got = drain(
        spark,
        ingest.sessionize_stream(read_stream(spark, events_dir), watermark="1 second"),
        "append",
    )
    rows = got.collect()
    # User 1's first session (events 10:00/10:10/10:10-dup) closes at 10:40,
    # before the final watermark (11:04:59) → emitted with n=3. The 11:05
    # event's session and user 2's 10:20 session close at 11:35 / 10:50…
    u1 = [r for r in rows if r.user_id == 1]
    assert [r.n_events for r in u1] == [3]
    assert str(u1[0].session_start) == "2024-05-01 10:00:00"
    assert str(u1[0].session_end) == "2024-05-01 10:40:00"
    # …user 2's session (closes 10:50 < watermark) is also emitted.
    u2 = [r for r in rows if r.user_id == 2]
    assert [r.n_events for r in u2] == [1]


def test_stateful_sessionize_apply_in_pandas_with_state(spark, events_dir):
    """applyInPandasWithState sessionizer: in-batch gap split closes user 1's
    first session immediately; user 2's session flushes via event-time timeout
    when the no-data batch advances the watermark; user 1's 11:05 session stays
    open (timeout 11:35 > final watermark 11:04:59) and is NOT emitted."""
    from songs_etl_spark.streaming.stateful import sessionize_with_state

    got = drain(
        spark,
        sessionize_with_state(read_stream(spark, events_dir), gap_minutes=30, watermark="1 second"),
        "append",
    )
    rows = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events, r.sum_value)
        for r in got.collect()
    }
    assert rows == {
        (1, "2024-05-01 10:00:00"): ("2024-05-01 10:10:00", 3, 5.0),
        (2, "2024-05-01 10:20:00"): ("2024-05-01 10:20:00", 1, 3.0),
    }


def test_processing_time_trigger_runs_unbounded(spark):
    """The same watermarked-agg plan drained with AvailableNow elsewhere also
    runs as a continuous micro-batch stream: rate source + processingTime
    trigger, stopped only after ≥2 batches have executed — proving the query
    is genuinely unbounded, not drain-only."""
    import time

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 3).cast("string").alias("event_type"),
            (F.col("value") % 10).cast("double").alias("value"),
        )
    )
    stream = ingest.hourly_events_watermarked(rate, watermark="0 seconds", window="1 minute")
    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if len(progress) >= 2 and spark.table(name).count() > 0:
                break
            time.sleep(0.5)
        assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2, (
            "stream did not process 2 data batches within 60s"
        )
        rows = spark.table(name).collect()
        assert rows and all(r.n >= 1 for r in rows)
        assert {r.event_type for r in rows} <= {"0", "1", "2"}
    finally:
        q.stop()


def test_foreachbatch_replayed_batch_leaves_target_unchanged(spark, events_dir, tmp_path):
    """A foreachBatch retry re-invokes the sink with the same batch data;
    the keyed MERGE must leave the target byte-identical, and a batch with a
    column the target lacks must raise, not truncate."""
    import pytest as _pytest

    from songs_etl_spark.streaming.ingest import merge_batch_into

    target = str(tmp_path / "retry_target")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
    merge_batch_into(batch, target, keys=["event_type"])  # batch 0
    before = sorted(map(tuple, spark.read.parquet(target).collect()))
    merge_batch_into(batch, target, keys=["event_type"])  # batch 0 replayed
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == before
    # Schema mismatch fails loudly instead of silently truncating the target.
    with _pytest.raises(Exception):
        merge_batch_into(
            batch.withColumnRenamed("sum_value", "other"), target, keys=["event_type"]
        )
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == before


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: drain a file source with a checkpoint,
    add a new file, drain again with the SAME checkpoint — the second run
    must process only the new file (no re-aggregation of old data in the
    target beyond the merge), and the final target equals the batch answer
    over all data."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "tgt")
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("overwrite").parquet(str(src_dir / name))

    def drain_with_checkpoint():
        src = spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(
            str(src_dir)
        )
        agg = src.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("sum_value")
        )
        q = (
            ingest.upsert_each_batch(agg, target, keys=["event_type"])
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    write_file("f1", [(1, "2024-05-01 10:00:00", 1, "play", 1.0),
                      (2, "2024-05-01 10:05:00", 1, "play", 2.0)])
    drain_with_checkpoint()
    first = {(r.event_type, r.n, r.sum_value) for r in spark.read.parquet(target).collect()}
    assert first == {("play", 2, 3.0)}
    # New file after the first drain; same checkpoint → only this file is new.
    write_file("f2", [(3, "2024-05-01 10:10:00", 2, "skip", 0.5)])
    drain_with_checkpoint()
    second = {(r.event_type, r.n, r.sum_value) for r in spark.read.parquet(target).collect()}
    # Aggregation in the micro-batch covers only unseen rows, so the merged
    # target holds the per-batch aggregate per key — 'play' untouched from
    # batch 1, 'skip' newly inserted (the checkpoint proves f1 wasn't replayed:
    # a replay would re-emit play with the same values, skip would still be new).
    assert second == {("play", 2, 3.0), ("skip", 1, 0.5)}


def test_foreachbatch_upsert_idempotent(spark, events_dir, tmp_path):
    """Draining the same stream into the same target twice (a restart/replay)
    must converge to the identical merged content."""
    target = str(tmp_path / "by_type")

    def run_once():
        src = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double"
            ).parquet(events_dir)
        )
        agg = src.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("sum_value")
        )
        q = ingest.upsert_each_batch(agg, target, keys=["event_type"]).start()
        q.awaitTermination(120)
        return {
            (r.event_type, r.n, r.sum_value)
            for r in spark.read.parquet(target).collect()
        }

    first = run_once()
    second = run_once()
    assert first == second
    assert {t for t, _, _ in first} == {"play", "skip"}
