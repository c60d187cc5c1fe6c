"""The write path's partitionBy must yield scan-side partition pruning: a
filter on the partition column appears in PartitionFilters and only matching
directories are read — the property that makes `ingest_date`-partitioned
facts cheap to query at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.sources.catalog import load_table
from songs_etl_spark.sources.writers import overwrite_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part_events") / "events")
    events = load_table(spark, SF_DIR, "events")
    overwrite_table(events, path, partition_by=["event_type"], sort_within_partitions=["ts"])
    return path


def test_partition_filter_reaches_scan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]


def test_pruned_scan_reads_only_matching_files(spark, partitioned_events):
    """The scan's numFiles/numPartitions metrics (not inputFiles(), which
    reports the unpruned relation) prove only the matching directory is read."""
    df = spark.read.parquet(partitioned_events).filter(F.col("event_type") == "click")
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    scan = leaves.apply(0)
    assert scan.metrics().apply("numFiles").value() == 1
    assert scan.metrics().apply("numPartitions").value() == 1


def test_roundtrip_values_survive_partitioned_write(spark, partitioned_events):
    orig = load_table(spark, SF_DIR, "events")
    back = spark.read.parquet(partitioned_events)
    assert back.count() == orig.count()
    want = orig.filter(F.col("event_type") == "click").agg(F.sum("event_id")).first()[0]
    got = back.filter(F.col("event_type") == "click").agg(F.sum("event_id")).first()[0]
    assert got == want
