"""merge_upsert must implement MERGE INTO semantics: update matched (update
row wins, even NULL cells), insert unmatched, keep untouched target rows."""

from __future__ import annotations

import pytest

from songs_etl_spark.operators.merge import merge_upsert


@pytest.fixture(scope="module")
def sides(spark):
    target = spark.createDataFrame(
        [(1, "one", 10.0), (2, "two", 20.0), (3, "three", 30.0)],
        "k bigint, name string, bal double",
    )
    updates = spark.createDataFrame(
        [(2, "TWO", 99.0), (3, None, 33.0), (4, "four", 40.0)],
        "k bigint, name string, bal double",
    )
    return target, updates


def test_upsert_rows(spark, sides):
    target, updates = sides
    got = {r.k: (r.name, r.bal) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {
        1: ("one", 10.0),  # untouched
        2: ("TWO", 99.0),  # updated
        3: (None, 33.0),  # NULL in the update row still wins
        4: ("four", 40.0),  # inserted
    }


def test_schema_preserved(spark, sides):
    target, updates = sides
    merged = merge_upsert(target, updates, ["k"])
    assert merged.columns == target.columns
    assert merged.schema == target.schema


def test_rejects_missing_columns(spark, sides):
    target, _ = sides
    bad = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(target, bad, ["k"])


def test_broadcastable_updates_dont_shuffle_target(spark, sides):
    """With a small updates side the planner should broadcast it; the big
    target must not shuffle (the property that makes upsert cheap at scale)."""
    from pyspark.sql.functions import broadcast

    target, updates = sides
    plan = merge_upsert(target, broadcast(updates), ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# cdc_apply
# ---------------------------------------------------------------------------


def test_cdc_apply_latest_wins_and_delete_removes(spark):
    from songs_etl_spark.operators.merge import cdc_apply

    feed = spark.createDataFrame(
        [
            # key 1: insert v1, update v2 → survives with v2 payload
            (1, 1, "I", "a"),
            (1, 2, "U", "b"),
            # key 2: insert then delete → gone
            (2, 1, "I", "x"),
            (2, 2, "D", None),
            # key 3: delete then (out-of-order arrival) later re-insert → survives
            (3, 5, "I", "z"),
            (3, 2, "D", None),
            # key 4: only a delete → gone
            (4, 1, "D", None),
        ],
        "k bigint, v bigint, op string, payload string",
    )
    got = {r.k: (r.v, r.payload) for r in cdc_apply(feed, ["k"], ["v"]).collect()}
    assert got == {1: (2, "b"), 3: (5, "z")}


def test_cdc_apply_drops_op_column_and_no_sort(spark):
    from songs_etl_spark.operators.merge import cdc_apply

    feed = spark.createDataFrame([(1, 1, "I", "a")], "k bigint, v bigint, op string, p string")
    out = cdc_apply(feed, ["k"], ["v"])
    assert out.columns == ["k", "v", "p"]
    # argmax via max_by: a hash aggregate, not a window sort per partition.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
