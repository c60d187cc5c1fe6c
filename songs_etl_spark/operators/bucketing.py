"""Bucketed tables: pre-shuffled storage for co-located, shuffle-free joins.

The reference declares BigQuery clustering on the fact table's FK columns
(`terraform/bigquery.tf:13`) — its engine-side analog in Spark is bucketing:
``bucketBy(n, key)`` hash-partitions rows into a fixed number of files per
key at WRITE time, so every later join or aggregation on that key reads
already-partitioned data and skips the shuffle entirely. For a 100 TB fact
table joined daily against other bucketed tables on the same key, this turns
the dominant repeated cost (full-table shuffle per run) into a one-time
write-side cost.

Requirements Spark imposes (and tests/test_bucketing.py proves): both sides
bucketed on the join key with compatible bucket counts, table read through
the catalog (``spark.table``), ``spark.sql.sources.bucketing.enabled=true``
(default). The join then plans as SortMergeJoin with NO Exchange on either
side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a catalog-managed Parquet table bucketed (and
    sorted-within-buckets, default: the bucket key) for shuffle-free joins.

    ``n_buckets`` sizing at scale: total table size / n_buckets should land
    near the target partition size (128-512 MB); joins between tables whose
    bucket counts are equal (or integer multiples, with AQE) avoid the
    shuffle.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two catalog tables; when both are bucketed on ``on`` with equal
    bucket counts the physical plan contains no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
