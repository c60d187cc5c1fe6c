"""Sketch-based approximate aggregates — the scale path for metrics whose
exact forms don't fit executor memory at 100 TB.

Exact COUNT(DISTINCT) shuffles every distinct value; exact percentiles sort
whole groups. Their sketch twins (HyperLogLog++, Greenwald-Khanna) keep
O(1/ε) state per group, merge associatively map-side, and never shuffle raw
values — the only formulations that survive a 1000-executor fan-in. Sketch
internals are engine-specific, so these two queries have NO DuckDB oracle
(the driver records the weaker rows-only check); their accuracy contracts
are pytest-asserted against the exact operators instead
(tests/test_sketches.py), and the exact twins in this registry
(count_distinct_by_flag, quantiles_price_by_flag) stay the value-hash
correctness anchors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.functions.text import tokens
from songs_etl_spark.plans._util import spread, t
from songs_etl_spark.plans.registry import register


@register(
    "approx_distinct_tokens",
    oracle=None,  # sketch estimates are engine-specific; accuracy pytest-asserted
    doc="HyperLogLog++ approximate distinct-token counts per language",
)
def approx_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct token vocabulary per document language via
    ``approx_count_distinct`` (HLL++, rsd 2%). The exact twin would shuffle
    every distinct token; the sketch ships one ~kilobyte register set per
    group regardless of vocabulary size."""
    docs = spread(t(spark, sf_dir, "documents"))
    return (
        docs.select("lang", F.explode(tokens("text")).alias("token"))
        .groupBy("lang")
        .agg(F.approx_count_distinct("token", rsd=0.02).alias("approx_vocab"))
    )


@register(
    "approx_quantiles_event_value",
    oracle=None,  # sketch estimates are engine-specific; accuracy pytest-asserted
    doc="Greenwald-Khanna approximate quantiles of event value per type",
)
def approx_quantiles_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per event type via ``percentile_approx``
    (GK sketch, accuracy 10000 → ε=1e-4). The sketch is mergeable, so the
    aggregation is map-side partial like any sum — no per-group sort."""
    events = t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10_000).alias(
            "quantiles"
        )
    )
