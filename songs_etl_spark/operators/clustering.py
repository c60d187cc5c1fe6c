"""Distributed Lloyd's k-means over an embedding column — the clustering
primitive behind IVF index builds (plans/similarity.py ann_ivf_probe is a
coarse quantizer of this shape) and corpus organization (topic bucketing,
stratified eval splits).

Spark-first design — per iteration:

1. **Assign**: crossJoin each vector with the k centroids via a BROADCAST of
   the k×d centroid relation (k rows — tiny), compute squared-L2 with
   ``zip_with`` + ``aggregate`` (JVM codegen, ordered fold, no Python),
   argmin via ``min(struct(dist, cluster))`` in one hash aggregation keyed
   by vector id (lexicographic struct min — deterministic tie-break on
   cluster id).
2. **Update**: ``posexplode`` assigned vectors to (cluster, dim, value)
   triples and take per-(cluster, dim) means in one shuffle keyed by
   (cluster, dim) — k×d result rows, re-assembled into centroid arrays.

No driver-side data beyond loop control; both stages are key-partitioned and
scale with the vector count.

Reproducibility design (what makes a distributed iterative float algorithm a
pure function of its input): components are quantized to integer MICRO-UNITS
(``floor(x · 10⁶)``) up front. Integers of this size are exactly
representable in doubles, so every partial sum in the centroid means is
exact and therefore independent of partition order — the one place float
addition order could leak in. Distances fold in array order (deterministic
IEEE sequence), seeds are the k smallest vector ids, and the iteration count
is fixed, so results are bit-identical across runs, partitionings, and
engines. (A fixed 1e-6 input quantization is far below any embedding's
meaningful precision.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quantize_micro(vec_col: str) -> F.Column:
    """float array → exact integer-valued double array in micro-units."""
    return F.transform(vec_col, lambda x: F.floor(x.cast("double") * 1e6).cast("double"))


def _sq_l2(vec_col: str, cent_col: str) -> F.Column:
    """Ordered-fold squared L2 — explicit multiply (not pow) so the IEEE op
    sequence is reproducible on any engine."""
    diff2 = F.zip_with(
        F.col(vec_col),
        F.col(cent_col),
        lambda x, y: (x - y) * (x - y),
    )
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


def _assign(vecs: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    scored = vecs.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", _sq_l2("emb", "centroid")
    )
    return (
        scored.groupBy(id_col)
        .agg(F.min(F.struct("dist", "cluster")).alias("best"))
        .select(
            id_col,
            F.col("best.cluster").cast("int").alias("cluster"),
            F.col("best.dist").alias("dist"),
        )
    )


def kmeans_assign(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
) -> DataFrame:
    """Run ``n_iter`` Lloyd update rounds from deterministic seeds (the k
    vectors with the smallest ids) and return (id_col, cluster, dist): each
    vector's final cluster and squared-L2 distance (micro-units²) to its
    centroid. Clusters that lose all members simply drop out (k shrinks) —
    same behavior on any engine."""
    vecs = vectors.select(id_col, quantize_micro(vec_col).alias("emb")).persist()
    centroids = (
        vecs.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cluster"),
            F.col("emb").alias("centroid"),
        )
        .persist()
    )
    for _ in range(n_iter):
        assigned = _assign(vecs, centroids, id_col)
        components = (
            assigned.join(vecs, id_col)
            .select("cluster", F.posexplode("emb").alias("dim", "v"))
            .groupBy("cluster", "dim")
            # exact: integer-valued doubles sum without rounding, so the
            # mean is partition-order-independent
            .agg((F.sum("v") / F.count("*")).alias("m"))
        )
        new_centroids = (
            components.select("cluster", F.struct("dim", "m").alias("dm"))
            .groupBy("cluster")
            .agg(
                F.transform(F.array_sort(F.collect_list("dm")), lambda x: x["m"]).alias(
                    "centroid"
                )
            )
            .persist()
        )
        new_centroids.count()  # materialize before dropping the old frame
        centroids.unpersist()
        centroids = new_centroids
    return _assign(vecs, centroids, id_col)
