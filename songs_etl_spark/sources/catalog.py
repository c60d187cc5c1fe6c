"""Testdata catalog: load the driver's Parquet tables as DataFrames/temp views.

The only quirk is ``events``: its ``ts`` column is Parquet TIMESTAMP(NANOS),
which Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read the
raw int64 nanos (``spark.sql.legacy.parquet.nanosAsLong``) and convert with
``timestamp_micros(ts div 1000)`` — integer truncation toward zero, matching
how DuckDB truncates nanos to its microsecond timestamps, so oracle
comparisons stay bit-exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; normalizes the events nanos timestamp."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (for spark.sql) and return the DFs."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
