"""As-of join query surface (operators/temporal.py) with DuckDB's native
ASOF JOIN as the oracle — the strongest possible cross-check for an operator
Spark has no built-in for."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.operators.temporal import asof_join
from songs_etl_spark.plans._util import t
from songs_etl_spark.plans.registry import register


@register(
    "asof_click_attribution",
    doc="as-of join: latest prior click attached to each purchase (union+window, 1 shuffle)",
    oracle="""
        SELECT p.user_id,
               epoch_us(p.ts) AS purchase_us,
               p.event_id AS purchase_id,
               c.event_id AS asof_event_id,
               epoch_us(c.ts) AS asof_us,
               c.value AS asof_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: each purchase gets the same user's most recent prior (or
    same-instant) click; purchases with no prior click keep NULLs.
    Timestamps are compared/emitted as epoch microseconds (the testdata's
    nanos are truncated to micros identically by both engines —
    sources/catalog.py)."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        partition_cols=["user_id"],
        ts_col="ts",
        payload_cols=["event_id", "value", "click_ts"],
    )
    return joined.select(
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "purchase_id",
        F.col("asof_event_id"),
        F.unix_micros("asof_click_ts").alias("asof_us"),
        F.col("asof_value"),
    )
