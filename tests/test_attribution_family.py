"""Conservation and policy invariants of the multi-touch attribution family
(linear / U-shape / time-decay): integer-cent shares must sum exactly to the
attributed purchases' value — the property that justifies the floor-division
+ remainder-placement design over float apportioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.plans.registry import REGISTRY
from tests.conftest import SF_DIR

ATTRIBUTION_QUERIES = (
    "linear_attribution_clicks",
    "ushape_attribution_clicks",
    "timedecay_attribution_clicks",
)


def _attributed_purchase_cents(spark):
    """Exact cents of purchases that have >= 1 qualifying click touch
    (same 24 h band as the queries)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pe"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        F.round(F.col("value").cast("decimal(18,4)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    touched = (
        p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 24 HOURS")),
        )
        .select("pe", "cents")
        .distinct()
    )
    return touched.agg(F.sum("cents")).first()[0]


@pytest.mark.parametrize("name", ATTRIBUTION_QUERIES)
def test_shares_conserve_purchase_value(spark, name):
    """Sum of attributed cents across clicks == sum of touched purchases'
    cents, exactly (no float drift, no lost remainder)."""
    total_attr = (
        REGISTRY[name].fn(spark, SF_DIR).agg(F.sum("attributed_cents")).first()[0]
    )
    assert total_attr == _attributed_purchase_cents(spark)


def test_family_disagrees_per_click_but_agrees_in_total(spark):
    """The three policies move money BETWEEN clicks, never in/out of the
    pool: totals match pairwise, but at least one click differs between
    linear and U-shape (otherwise the position weighting is dead code)."""
    frames = {
        name: REGISTRY[name].fn(spark, SF_DIR).select(
            "click_event_id", F.col("attributed_cents").alias(name)
        )
        for name in ATTRIBUTION_QUERIES
    }
    lin = frames["linear_attribution_clicks"]
    ush = frames["ushape_attribution_clicks"]
    joined = lin.join(ush, "click_event_id", "full_outer").na.fill(0)
    diff = joined.filter(
        F.col("linear_attribution_clicks") != F.col("ushape_attribution_clicks")
    ).count()
    assert diff > 0
