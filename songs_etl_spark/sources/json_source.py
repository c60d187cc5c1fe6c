"""Landing-zone JSON source (reference ops S6/S7).

The reference reads whole-file JSON arrays from an object store, one blob per
(entity, date) (`cf_extract/main.py:228-232,294-298`; readers duplicated at
`cf_transform/main.py:35-49` etc.). Spark equivalent: ``spark.read.json`` with
an explicit StructType (schema-on-read; no inference scan) over a path or
glob — `spark.read.json("landing/spotify/tracks/*.json")` is the prefix-scan
S7. ``multiLine=True`` because each blob is one JSON array, not JSON-lines.

At scale, landing data should be converted to Parquet on ingest (see
``songs_etl_spark.operators.star.ingest_landing_to_parquet``) so downstream
reads get columnar pruning + predicate pushdown; raw JSON is read exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_landing_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multi_line: bool = True,
) -> DataFrame:
    """Schema'd read of landing JSON blob(s); `path` may be a file, dir, or glob."""
    return spark.read.schema(schema).json(path, multiLine=multi_line)


def read_landing_json_audited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines read with explicit bad-record capture: PERMISSIVE mode plus
    a declared corrupt-record column, so malformed rows become DATA (the
    raw line lands in ``corrupt_col``, typed fields null) instead of either
    silent nulls or task failures. The caller splits the frame on
    ``corrupt_col IS NULL`` — clean rows flow on, bad rows go to a
    quarantine sink with their original bytes intact for replay. At 100 TB
    this is the only sane failure mode: one poisoned line in a billion must
    neither kill the job (FAILFAST) nor vanish (DROPMALFORMED).
    tests/test_corrupt_records.py pins the contract."""
    audited = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType())]
    )
    df = (
        spark.read.schema(audited)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    # Spark disallows queries that reference ONLY the corrupt column on a
    # raw JSON scan (SPARK-21610: the parser would need a second pass to
    # know which rows are corrupt); caching the parsed frame is the
    # documented resolution and also means the quarantine split reads the
    # file once. Tracked so clear_tracked_persists() can release it.
    from songs_etl_spark.plans._util import track_persist

    return track_persist(df)
