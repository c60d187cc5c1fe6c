"""SparkSession construction and runtime tuning.

Design notes (100 TB posture)
-----------------------------
The same builder serves local[N] dev and a real cluster: everything scale
critical is expressed as SQL confs that hold on a 1000-executor cluster —
AQE (runtime re-plan, skew-join splitting, partition coalescing), a broadcast
threshold sized for star-schema dimensions, and zstd Parquet. Nothing here
hand-schedules work; Catalyst + AQE pick physical strategies.

``tune_runtime`` applies only *runtime-mutable* confs, so query callables can
run correctly inside a session we did not create (the verify driver's).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and useful) to set on an already-running session.
RUNTIME_CONF: dict[str, str] = {
    # UTC session tz: the testdata's naive (NTZ) timestamps are interpreted as
    # UTC wall-clock on the Spark side exactly as DuckDB reads them, so
    # NTZ→TIMESTAMP casts and date_trunc/date_format agree with the oracle.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Star-schema dims (region/nation/customer/part/supplier at these SFs, and
    # every songs dim) are far below this: all star joins go broadcast-hash.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Nested-column pruning for the landing-document schemas.
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
}

# Structured Streaming state store provider, env-gated (round-12 verdict
# item 7). The default HDFS-backed provider keeps every state row on the
# executor heap — at 100 TB of keyed state (dedup keys, session windows)
# that is an OOM ceiling; RocksDB spills state to local disk and is the
# documented remedy. Local A/B on the drained finite sources showed no
# measurable win (state is tiny and the drains are fixed-cost-bound;
# numbers in OPTIMIZATION_r12.md), so it stays OFF by default to keep the
# bench comparable, and production opts in with
# SPARK_GRAFT_STATE_STORE=rocksdb.
if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb":
    RUNTIME_CONF["spark.sql.streaming.stateStore.providerClass"] = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def tune_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable confs; ignore any the session rejects."""
    for key, value in RUNTIME_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass
    return spark


def get_spark(
    app_name: str = "songs-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession for local development and benchmarks.

    ``spark.sql.shuffle.partitions`` defaults to the core count: at local
    scale 200 tiny shuffle partitions are pure overhead, and AQE coalescing
    handles the in-between. On a real cluster this is overridden upward
    (2-3× total cores) by ``extra_conf``.
    """
    cpus = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dderby.system.durability=test")
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune_runtime(spark)
