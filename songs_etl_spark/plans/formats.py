"""File-format coverage: CSV and ORC sink→source round-trips with explicit
schemas (no inference scan). The engine's storage format is Parquet
(sources/catalog.py, writers.py); these queries prove the interchange
formats a pipeline meets at its edges — CSV for export/import boundaries,
ORC for warehouse interop — preserve values exactly under an explicit
schema. The oracle computes the same aggregate directly, so any loss in the
write→read hop (float text round-trip, timestamp formatting, header
handling) fails the value hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.plans._util import dec2, fmt_date, money, t
from songs_etl_spark.plans.registry import register

_ORACLE = """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1, 2
"""

_SCHEMA = "month string, o_orderstatus string, n_orders bigint, revenue double"


def _monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            fmt_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month"),
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            dec2(F.sum(money("o_totalprice"))).alias("revenue"),
        )
    )


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, **write_opts) -> DataFrame:
    path = os.path.join(
        "/tmp", "songs_etl_roundtrip", fmt, os.path.basename(sf_dir.rstrip("/"))
    )
    _monthly_revenue(spark, sf_dir).write.mode("overwrite").options(**write_opts).format(
        fmt
    ).save(path)
    reader = spark.read.options(**write_opts)
    if fmt == "csv":
        # Explicit schema: a header-only inference scan would re-read the
        # data and guess types; the declared schema makes the read one pass
        # and the types exact.
        reader = reader.schema(_SCHEMA)
    return reader.format(fmt).load(path)


@register(
    "csv_roundtrip_monthly_revenue",
    doc="CSV sink → CSV source round-trip with explicit schema (export/import boundary)",
    oracle=_ORACLE,
)
def csv_roundtrip_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the monthly-revenue aggregate as headered CSV, read it back with
    a declared schema, and return the re-read frame. Doubles survive because
    Spark writes shortest-round-trip representations; timestamps are
    formatted to strings before the hop (CSV has no timestamp type)."""
    return _roundtrip(spark, sf_dir, "csv", header="true")


@register(
    "orc_roundtrip_monthly_revenue",
    doc="ORC sink → ORC source round-trip (columnar warehouse interop)",
    oracle=_ORACLE,
)
def orc_roundtrip_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregate through ORC — a typed columnar hop (schema travels in
    the file footer, no declared schema needed on read)."""
    return _roundtrip(spark, sf_dir, "orc")


@register(
    "xml_roundtrip_monthly_revenue",
    doc="XML sink → XML source round-trip (Spark 4 native XML, declared schema)",
    oracle=_ORACLE,
)
def xml_roundtrip_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregate through Spark 4's built-in XML format (one element per
    row under ``rowTag``). Like CSV, XML is schemaless text: the read
    declares the schema so types come back exact in one pass — no
    inference scan, no float drift through the text hop."""
    path = os.path.join(
        "/tmp", "songs_etl_roundtrip", "xml", os.path.basename(sf_dir.rstrip("/"))
    )
    _monthly_revenue(spark, sf_dir).write.mode("overwrite").format("xml").option(
        "rowTag", "row"
    ).save(path)
    return spark.read.format("xml").option("rowTag", "row").schema(_SCHEMA).load(path)
