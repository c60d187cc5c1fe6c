"""Banded range join: "events within a time window of each other" — expressed
as a bucketed EQUI-join, not a theta join.

Spark plans a raw ``ON a.user = b.user AND b.ts BETWEEN a.ts-w AND a.ts+w``
as an equi-join on user followed by a per-user pair filter — quadratic in the
hottest user's event count. The bucketed formulation maps timestamps to
window-sized buckets and equi-joins on (user, bucket) with the probe side
exploded to its 3 adjacent buckets, then applies the exact band filter:
shuffle is keyed by (user, bucket), per-key work is bounded by events-per-
bucket² and the fixed 3× fan-out, and no pair outside adjacent buckets is
ever materialized. This is the standard interval-bucketing trick the
range-join literature (and e.g. Databricks' range-join hints) formalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.plans._util import t
from songs_etl_spark.plans.registry import register

#: Band half-width in microseconds (5 minutes).
_W_US = 5 * 60 * 1_000_000


@register(
    "range_join_error_clicks",
    doc="banded range join via interval bucketing (equi-join; no theta-join pair scan)",
    oracle=f"""
        SELECT e.event_id AS error_id,
               e.user_id,
               COUNT(c.event_id) AS n_clicks_5min,
               MIN(ABS(epoch_us(c.ts) - epoch_us(e.ts))) AS min_gap_us
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id
         AND epoch_us(c.ts) BETWEEN epoch_us(e.ts) - {_W_US} AND epoch_us(e.ts) + {_W_US}
        GROUP BY e.event_id, e.user_id
    """,
)
def range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: how many clicks the same user made within ±5
    minutes, and the closest gap. Left-outer band semantics (errors with no
    nearby click keep count 0 / NULL gap)."""
    events = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", us.alias("e_us")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", us.alias("c_us")
    )
    # Build side: each click lands in its own bucket. Probe side: each error
    # probes its bucket and both neighbors, so any |gap| <= W pair shares a
    # (user, bucket) key.
    clicks_b = clicks.withColumn("bucket", (F.col("c_us") / _W_US).cast("bigint"))
    errors_b = errors.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("e_us") / _W_US).cast("bigint") - 1,
                (F.col("e_us") / _W_US).cast("bigint"),
                (F.col("e_us") / _W_US).cast("bigint") + 1,
            )
        ),
    )
    pairs = errors_b.join(clicks_b, ["user_id", "bucket"]).filter(
        (F.col("c_us") >= F.col("e_us") - _W_US) & (F.col("c_us") <= F.col("e_us") + _W_US)
    )
    matched = pairs.groupBy("error_id", "user_id").agg(
        F.count("click_id").alias("n_clicks_5min"),
        F.min(F.abs(F.col("c_us") - F.col("e_us"))).alias("min_gap_us"),
    )
    # Left-outer completion: errors with no in-band click.
    return (
        errors.select("error_id", "user_id")
        .join(matched, ["error_id", "user_id"], "left")
        .select(
            "error_id",
            "user_id",
            F.coalesce("n_clicks_5min", F.lit(0)).alias("n_clicks_5min"),
            "min_gap_us",
        )
    )
