"""Bad-input robustness: malformed landing JSON becomes quarantinable DATA
(PERMISSIVE + corrupt-record column), never a task failure and never a
silent drop — the only acceptable failure mode for a poisoned line in a
100 TB ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from songs_etl_spark.sources.json_source import read_landing_json_audited

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)

GOOD = ['{"id": 1, "name": "alpha"}', '{"id": 2, "name": "beta"}']
BAD = ['{"id": 3, "name": ', 'not json at all']


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    p = tmp_path_factory.mktemp("landing") / "rows.json"
    p.write_text("\n".join(GOOD + BAD) + "\n")
    return str(p)


def test_clean_rows_parse_and_bad_rows_quarantine(spark, landing):
    df = read_landing_json_audited(spark, landing, SCHEMA)
    clean = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert df.count() == len(GOOD) + len(BAD)
    assert clean.count() == len(GOOD)
    assert {r["id"] for r in clean.collect()} == {1, 2}
    # quarantined rows keep their ORIGINAL bytes for replay
    assert sorted(r["_corrupt_record"] for r in bad.collect()) == sorted(BAD)


def test_typed_fields_null_on_corrupt_rows(spark, landing):
    df = read_landing_json_audited(spark, landing, SCHEMA)
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert bad.filter(F.col("id").isNotNull() | F.col("name").isNotNull()).count() == 0
