"""Bucketed writes must produce shuffle-free joins: same key + same bucket
count on both sides → SortMergeJoin with no Exchange in the physical plan."""

from __future__ import annotations

import pytest

from songs_etl_spark.operators.bucketing import bucketed_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # Disable broadcast so the planner must choose SortMergeJoin — the
    # strategy bucketing de-shuffles (broadcast would mask the property).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            bucketed_join(spark, left, right, ["o_orderkey"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, ["o_orderkey"]).count()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    want = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
    assert got == want


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also skips its shuffle."""
    _, right = bucketed_tables
    plan = (
        spark.table(right)
        .groupBy("o_orderkey")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
