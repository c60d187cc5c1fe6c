"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``songs_etl_spark`` package; the query surface is
the registry in ``songs_etl_spark.plans`` (one entry per operator family from
SURVEY.md §2 plus the large-scale pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from songs_etl_spark.plans import REGISTRY  # noqa: E402
from songs_etl_spark.session import tune_runtime  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the broadcast star join + grouped
    aggregation (TPC-H Q5 shape) — the engine restatement of the reference's
    fact-build star join (cf_transform/main.py:98-176)."""
    tune_runtime(spark)
    return REGISTRY["star_revenue_by_nation"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extended ops)."""

    def bind(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_runtime(spark)
            return REGISTRY[name].fn(spark, sf_dir)

        run.__name__ = name
        run.__doc__ = REGISTRY[name].doc
        return run

    return {name: bind(name) for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (keys match ``queries()``); queries
    without an entry get the driver's weaker rows-only check."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
