"""Clustering query surface: distributed k-means over the embeddings table.

The oracle is the SAME fixed-iteration Lloyd's algorithm unrolled into
DuckDB SQL (list_zip/list_reduce fold distances in array order, struct-min
argmin, exact integer-double means — see operators/clustering.py for the
micro-unit quantization that makes the computation bit-identical across
engines). A full value-level oracle for an iterative algorithm, not a
rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.operators.clustering import kmeans_assign
from songs_etl_spark.plans._util import t
from songs_etl_spark.plans.registry import register

_K = 8
_N_ITER = 3


def _duckdb_kmeans_sql(k: int = _K, n_iter: int = _N_ITER) -> str:
    dist = (
        "list_reduce(list_transform(list_zip(v.emb, c.centroid),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])),"
        " (acc, x) -> acc + x)"
    )
    parts = [
        f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS DOUBLE)) AS emb
            FROM embeddings
        ),
        cent0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) AS cluster, emb AS centroid
            FROM (SELECT * FROM v ORDER BY vec_id LIMIT {k})
        )"""
    ]
    for i in range(n_iter):
        parts.append(
            f"""
        , assign{i} AS (
            SELECT vec_id,
                   struct_extract(min({{'dist': dist, 'cluster': cluster}}), 'cluster') AS cluster
            FROM (
                SELECT v.vec_id, c.cluster, {dist} AS dist
                FROM v CROSS JOIN cent{i} c
            ) GROUP BY vec_id
        ),
        comp{i} AS (
            SELECT cluster, u['dim'] AS dim, SUM(u['v']) / COUNT(*) AS m
            FROM (
                SELECT a.cluster,
                       unnest(list_transform(range(1, len(v.emb) + 1),
                              j -> {{'dim': j, 'v': v.emb[j]}})) AS u
                FROM assign{i} a JOIN v ON a.vec_id = v.vec_id
            ) GROUP BY cluster, dim
        ),
        cent{i + 1} AS (
            SELECT cluster, list(m ORDER BY dim) AS centroid FROM comp{i} GROUP BY cluster
        )"""
        )
    parts.append(
        f"""
        SELECT vec_id,
               CAST(struct_extract(best, 'cluster') AS INTEGER) AS cluster,
               struct_extract(best, 'dist') AS dist
        FROM (
            SELECT vec_id, min({{'dist': dist, 'cluster': cluster}}) AS best
            FROM (
                SELECT v.vec_id, c.cluster, {dist} AS dist
                FROM v CROSS JOIN cent{n_iter} c
            ) GROUP BY vec_id
        )"""
    )
    return "".join(parts)


@register(
    "kmeans_embeddings",
    doc="iterative algorithm: distributed Lloyd's k-means (broadcast centroids, exact means)",
    oracle=_duckdb_kmeans_sql(),
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 clusters, 3 fixed Lloyd rounds, deterministic smallest-id seeds.
    Per round: one broadcast crossJoin (8 centroid rows shipped everywhere —
    the big side never shuffles for assignment) + two key-partitioned
    aggregations for the centroid update. The same plan at 100 TB: centroids
    stay k×d rows regardless of corpus size, so every round is a map-side
    assignment plus one (cluster, dim)-keyed shuffle."""
    return kmeans_assign(
        t(spark, sf_dir, "embeddings"), id_col="vec_id", vec_col="embedding",
        k=_K, n_iter=_N_ITER,
    )


@register(
    "embedding_standardize",
    doc="feature prep: per-dimension z-standardization of the embedding "
    "space (exact integer micro-unit sums -> deterministic mean/std)",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS DOUBLE)) AS emb
            FROM embeddings
        ),
        flat AS (
            SELECT vec_id, u['dim'] AS dim, u['v'] AS q
            FROM (
                SELECT vec_id,
                       unnest(list_transform(range(1, len(emb) + 1),
                              j -> {'dim': j, 'v': emb[j]})) AS u
                FROM v
            )
        ),
        stats AS (
            SELECT dim,
                   SUM(q) / COUNT(*) AS mu,
                   sqrt(SUM(q * q) / COUNT(*) - (SUM(q) / COUNT(*)) * (SUM(q) / COUNT(*))) AS sigma
            FROM flat GROUP BY dim
        )
        SELECT f.vec_id, CAST(f.dim AS INTEGER) AS dim, (f.q - s.mu) / s.sigma AS z
        FROM flat f JOIN stats s ON f.dim = s.dim
    """,
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding corpus — the
    feature-scaling pass run before distance-based indexing (IVF/k-means)
    when dimensions have uneven variance.

    Exactness: components are micro-unit integers (the module's quantization
    discipline), so SUM(q) and SUM(q·q) are exact in any partition order
    (|q| ≤ ~10⁶ ⇒ q² ≤ 10¹², ×N far below 2⁵³); mean, variance
    (E[q²] − E[q]², written in the identical op order in both engines), σ,
    and each z-score are then fixed chains of single IEEE ops. One
    posexplode + one (dim)-keyed aggregation + one broadcast join back —
    the d-row stats relation ships to executors, the N×d flat relation
    never reshuffles."""
    from songs_etl_spark.operators.clustering import quantize_micro

    emb = t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode(quantize_micro("embedding")).alias("dim0", "q")
    ).select("vec_id", (F.col("dim0") + 1).alias("dim"), "q")
    stats = flat.groupBy("dim").agg(
        (F.sum("q") / F.count("*")).alias("mu"),
        F.sqrt(
            F.sum(F.col("q") * F.col("q")) / F.count("*")
            - (F.sum("q") / F.count("*")) * (F.sum("q") / F.count("*"))
        ).alias("sigma"),
    )
    return flat.join(F.broadcast(stats), "dim").select(
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        ((F.col("q") - F.col("mu")) / F.col("sigma")).alias("z"),
    )
