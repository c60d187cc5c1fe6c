"""Query registry: the engine's public query surface.

Importing this package registers every query. ``REGISTRY`` maps name →
QuerySpec; ``__spark_entry__`` exposes it to the verify driver.
"""

from songs_etl_spark.plans.registry import REGISTRY, QuerySpec, register

# Import for registration side effects (order = rough SURVEY.md §2 order).
from songs_etl_spark.plans import relational  # noqa: E402,F401
from songs_etl_spark.plans import star  # noqa: E402,F401
from songs_etl_spark.plans import text  # noqa: E402,F401
from songs_etl_spark.plans import dedup  # noqa: E402,F401
from songs_etl_spark.plans import curation  # noqa: E402,F401
from songs_etl_spark.plans import similarity  # noqa: E402,F401
from songs_etl_spark.plans import temporal  # noqa: E402,F401
from songs_etl_spark.plans import ranges  # noqa: E402,F401
from songs_etl_spark.plans import warehouse  # noqa: E402,F401
from songs_etl_spark.plans import subqueries  # noqa: E402,F401
from songs_etl_spark.plans import tpch_classic  # noqa: E402,F401
from songs_etl_spark.plans import sampling  # noqa: E402,F401
from songs_etl_spark.plans import clustering  # noqa: E402,F401
from songs_etl_spark.plans import pq  # noqa: E402,F401
from songs_etl_spark.plans import projection  # noqa: E402,F401
from songs_etl_spark.plans import formats  # noqa: E402,F401
from songs_etl_spark.plans import sketches  # noqa: E402,F401
from songs_etl_spark.plans import multimodal  # noqa: E402,F401
from songs_etl_spark.plans import streaming  # noqa: E402,F401
from songs_etl_spark.plans import training  # noqa: E402,F401
from songs_etl_spark.plans import analytics  # noqa: E402,F401
from songs_etl_spark.plans import graphs  # noqa: E402,F401
from songs_etl_spark.plans import python_api  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
