"""Schema evolution on the read path: a landing zone written by successive
pipeline versions (columns added over time) must stay readable as one table
with mergeSchema, old files null-filling the new columns — the S-family
robustness a long-lived 100 TB landing layout depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def evolved_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("evolved"))
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    ).write.parquet(f"{d}/v=1")
    spark.createDataFrame(
        [(3, "c", 0.5)], "id bigint, name string, score double"
    ).write.parquet(f"{d}/v=2")
    return d


def test_merge_schema_unifies_versions(spark, evolved_dir):
    df = spark.read.option("mergeSchema", "true").parquet(evolved_dir)
    assert {f.name for f in df.schema} == {"id", "name", "score", "v"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[3].score == 0.5
    assert rows[1].v == 1 and rows[3].v == 2


def test_explicit_schema_projects_old_files(spark, evolved_dir):
    """The no-inference production path: an explicit schema (superset) reads
    every vintage, null-filling absent columns — no mergeSchema footer pass
    over the whole landing zone."""
    df = spark.read.schema("id bigint, name string, score double").parquet(
        f"{evolved_dir}/v=1", f"{evolved_dir}/v=2"
    )
    assert df.filter(F.col("score").isNull()).count() == 2
    assert df.count() == 3
