"""Streaming ingest operators: watermarked event-time aggregation, streaming
dedup, and stateful sessionization.

The reference has no streaming — its freshness model is a daily cron full
refresh (terraform/cloud-scheduler.tf:4-5, WRITE_TRUNCATE loads). These
operators are the incremental replacement: a file-source stream drained with
``Trigger.AvailableNow`` gives exactly-once catch-up batches (the cron
shape), and the same plans run continuously against a live source.

Scale notes: state (window aggregates, seen-keys for dedup, open sessions)
lives in the partitioned state store keyed by the group keys, so state size
is bounded by watermark horizon × key cardinality, not stream length;
watermarks both bound state and define late-data semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from songs_etl_spark.plans._util import money


def hourly_events_watermarked(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Event-time tumbling-window aggregate in *append* mode discipline: the
    watermark lets the store drop windows older than the horizon and emit
    them exactly once. (The oracle-checked complete-mode variant for finite
    drains is plans/streaming.py.)"""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(money("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def upsert_each_batch(
    agg_stream: DataFrame, target_path: str, keys: list[str]
):
    """``foreachBatch`` sink that MERGEs each micro-batch into a Parquet
    target by key — the streaming→warehouse landing pattern (stream update
    mode + batch merge), replacing the reference's daily WRITE_TRUNCATE with
    continuous incremental upserts.

    Idempotency (exactly-once effect under retries): the merge keys make a
    replayed micro-batch rewrite the same rows with the same values, so a
    restart from the last checkpoint converges to the identical target
    (asserted by the registry query's oracle and tests). The target is
    re-read per batch; ``localCheckpoint`` materializes the merge before the
    overwrite so the read and the write of the same path never overlap.

    At scale the same sink body runs MERGE INTO against a transactional
    table format; the merge plan itself (operators/merge.py) is
    broadcast-capable and keyed — per-batch cost scales with batch size,
    not target size, once the table format provides key-range pruning.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into(batch_df, target_path, keys)

    return (
        agg_stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def merge_batch_into(batch_df: DataFrame, target_path: str, keys: list[str]) -> None:
    """The ``foreachBatch`` sink body of :func:`upsert_each_batch`, public so
    a replayed micro-batch (Spark re-invokes the sink with the same data
    after a failure) can be exercised directly: re-running a batch MERGEs the
    same keys to the same values — the target is unchanged (asserted by
    tests/test_streaming.py).

    First batch is detected by an explicit filesystem existence check, NOT
    by catching exceptions around the target read: a transient read failure,
    corrupt footer, or batch/target schema mismatch must FAIL the stream
    (the checkpoint replays the batch) rather than silently overwrite the
    target with only the current micro-batch."""
    from songs_etl_spark.operators.merge import merge_upsert

    spark = batch_df.sparkSession
    Path = spark._jvm.org.apache.hadoop.fs.Path
    jvm_path = Path(target_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jvm_path):
        target = spark.read.parquet(target_path)
        merged = merge_upsert(target, batch_df.select(*target.columns), keys)
    else:
        merged = batch_df
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on the event key within the watermark horizon
    (``dropDuplicatesWithinWatermark``): the seen-key state is evicted as the
    watermark advances, so memory is bounded — the streaming analog of the
    batch dedup_exact operator."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window aggregation with a dynamic gap (F.session_window): the
    streaming restatement of the batch lag/gap sessionization
    (plans/relational.py user_sessionization). Sessions close when no event
    arrives within ``gap``; the watermark finalizes closed sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum(money("value")).cast("double").alias("sum_value"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
