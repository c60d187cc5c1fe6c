"""Warehouse sinks (reference op S11).

The reference loads every table with BigQuery ``WRITE_TRUNCATE`` after
fetching the declared schema (`cf_transform/main.py:66-84`, duplicated in the
four dimension builders). Spark equivalent: cast-to-declared-schema, then
``mode("overwrite")`` Parquet — idempotent daily full refresh (reference op
O5: same-day rerun overwrites the same outputs).

Scale posture: fact tables are written partitioned by ``ingest_date`` (the
reference's date-partitioned landing path, cf_extract/main.py:231) and sorted
within partitions on the clustering keys BigQuery declared
(terraform/bigquery.tf:13) so scan-side filters prune at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def conform_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Load-time schema enforcement (cf_transform/main.py:69-75): select the
    declared columns in declared order, casting each to its declared type."""
    return df.select(
        *[F.col(field.name).cast(field.dataType).alias(field.name) for field in schema.fields]
    )


def overwrite_table(
    df: DataFrame,
    path: str,
    schema: T.StructType | None = None,
    partition_by: Sequence[str] = (),
    sort_within_partitions: Sequence[str] = (),
) -> None:
    """Full-overwrite Parquet load (WRITE_TRUNCATE semantics)."""
    if schema is not None:
        df = conform_to_schema(df, schema)
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_bytes_per_file: int = 256 * 1024 * 1024,
    sort_within_partitions: Sequence[str] = (),
) -> int:
    """Small-file compaction: rewrite a Parquet table into ~target-sized
    files; returns the output file count.

    The table-maintenance op every incremental pipeline needs: streaming
    sinks, per-batch MERGEs, and fine-grained partitionBy all accumulate
    small files, and at 100 TB a scan's task count (and the namenode/object
    listing) is governed by file count. File count is derived from the
    CURRENT on-disk bytes (compressed), coalesce (no shuffle) brings the
    partition count down, and the rewrite goes through a temp sibling +
    atomic-ish swap so a crash never leaves the table truncated. An optional
    within-partition sort restores clustering for scan-side pruning.
    """
    import math
    import shutil
    import uuid

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(total / target_bytes_per_file))
    df = spark.read.parquet(path).coalesce(n_files)
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    out = spark.read.parquet(path)
    return len([f for f in out.inputFiles()])
