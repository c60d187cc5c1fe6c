"""songs_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL (Felyppe1/songs-etl), built
Spark-first: DataFrame/SQL logical plans over partitioned Parquet, Catalyst/AQE
physical planning, broadcast-hash star joins, and Arrow-vectorized Python only
where built-ins cannot express the semantics.

Layout
------
- ``session``    SparkSession builder tuned for local[N] dev and cluster scale.
- ``schemas``    Explicit StructTypes: landing JSON documents + warehouse star schema.
- ``sources``    Readers/writers (Parquet, schema'd JSON, warehouse overwrite loads).
- ``functions``  Column-level helpers (surrogate keys, safe casts, text, vectors).
- ``operators``  Relational + pipeline operators (star build, dedup, similarity,
                 text analysis, multimodal column plumbing).
- ``plans``      The query registry: every supported query as a (Spark callable,
                 DuckDB oracle SQL) pair — the correctness contract.
- ``streaming``  Structured Streaming ingest and stateful operators.
"""

__version__ = "0.1.0"
