"""Testdata-drift guard: the catalog must hand every query a stable schema
even when the driver regenerates the parquet with different physical types
(events.ts has already drifted TIMESTAMP(NANOS) → TIMESTAMP(MICROS, naive)
between rounds). These tests fail in seconds if the normalization stops
matching the data on disk."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from songs_etl_spark.sources.catalog import TESTDATA_TABLES, load_table
from tests.conftest import SF_DIR


def test_events_ts_is_timestamp(spark):
    df = load_table(spark, SF_DIR, "events")
    assert df.schema["ts"].dataType == T.TimestampType(), (
        "events.ts must normalize to TIMESTAMP regardless of parquet vintage; "
        f"got {df.schema['ts'].dataType}"
    )
    # unix_micros is TIMESTAMP-only — the exact call that broke on NTZ drift.
    row = df.select(F.min(F.unix_micros("ts")).alias("us")).first()
    assert row["us"] is not None and row["us"] > 0


def test_session_timezone_utc(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


@pytest.mark.parametrize("name", TESTDATA_TABLES)
def test_all_tables_loadable(spark, name):
    path = os.path.join(SF_DIR, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{name} not in {SF_DIR}")
    df = load_table(spark, SF_DIR, name)
    assert len(df.schema) > 0


def test_date_columns_have_known_types(spark):
    """Early-warning tripwire for the next physical-type drift: every
    date/timestamp column the query surface compares against ts_lit()
    literals must stay NTZ (or become TIMESTAMP, which load_table would then
    need to normalize — this failing is the signal to extend it)."""
    expected = {
        ("orders", "o_orderdate"),
        ("lineitem", "l_shipdate"),
    }
    for table, col in expected:
        df = load_table(spark, SF_DIR, table)
        dtype = df.schema[col].dataType
        assert isinstance(dtype, (T.TimestampNTZType, T.TimestampType)), (
            f"{table}.{col} drifted to {dtype}; extend catalog normalization "
            "and re-verify every query comparing against ts_lit()"
        )
