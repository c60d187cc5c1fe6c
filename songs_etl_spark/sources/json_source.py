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
