"""Structured Streaming query surface (registered in queries() with a batch
SQL oracle: for a finite source drained with Trigger.AvailableNow, the
windowed streaming aggregate must equal the batch aggregate).

The reference has no streaming (daily cron full refresh, SURVEY.md §2.7/O3);
this is the engine's replacement path: file-source streaming ingest with
event-time windows. More streaming machinery (watermarked append mode,
applyInPandasWithState sessionization) lives in songs_etl_spark/streaming/.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from songs_etl_spark.plans._util import dec2, fmt_ts, money
from songs_etl_spark.plans.registry import register

#: events.parquet stores TIMESTAMP(NANOS); the streaming reader takes it as
#: int64 nanos (see sources/catalog.py) and converts.
_EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@register(
    "streaming_hourly_events",
    doc="Structured Streaming: event-time tumbling-window agg, Trigger.AvailableNow",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
)
def streaming_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(parquet) → event-time 1-hour tumbling windows → complete-mode
    memory sink, drained with AvailableNow. Complete mode (not append+watermark)
    because a drained finite source must emit *every* window to match the batch
    oracle — append mode would hold back windows newer than the final watermark.

    At scale this same plan runs continuously: the file source incrementally
    lists new partitions, state lives in the checkpointed state store keyed by
    (window, event_type), and AvailableNow gives exactly-once batch-boundary
    semantics for catch-up runs (the reference's daily-cron replacement, O3/O5).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    table = f"se_stream_hourly_{uuid.uuid4().hex[:8]}"
    src = (
        spark.readStream.schema(_EVENTS_NANOS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = src.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), dec2(F.sum(money("value"))).alias("sum_value"))
    )
    query = (
        agg.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    return spark.table(table).select(
        fmt_ts(F.col("win.start")).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )
