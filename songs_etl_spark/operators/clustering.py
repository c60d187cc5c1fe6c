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


def _lloyd_numpy(pts, k: int, n_iter: int):
    """Single-cell Lloyd on a (n, d) float64 array of micro-quantized
    integers, seeds = first k rows (caller sorts by id). Pure numpy on a
    fixed-order array — bit-deterministic. Returns (k', d) centroids
    (empty clusters dropped, survivors keep their seed order, renumbered
    compactly each iteration).

    Distances accumulate dimension-by-dimension (the j-loop), NOT via the
    expanded-form matmul: ``acc + (p_j − c_j)²`` left-to-right is the exact
    IEEE op sequence of the SQL ``list_reduce`` fold and Spark's
    ``F.aggregate`` — so the two-level assignment is value-oracle-checkable
    (plans/clustering._duckdb_twolevel_sql), not just self-consistent. A
    BLAS matmul's summation order would diverge by ulps once centroids stop
    being integers (iteration ≥ 2) and could flip near-tie argmins."""
    import numpy as np

    cents = pts[:k].copy()
    for _ in range(n_iter):
        d2 = np.zeros((pts.shape[0], cents.shape[0]))
        for j in range(pts.shape[1]):
            diff = pts[:, j, None] - cents[None, :, j]
            d2 = d2 + diff * diff
        lab = d2.argmin(axis=1)  # first-minimum: matches min-struct (d, sub)
        new = []
        for c in range(cents.shape[0]):
            members = pts[lab == c]
            if len(members):
                # exact: integer-valued doubles sum without rounding
                new.append(members.sum(axis=0) / len(members))
        cents = np.stack(new) if new else cents[:1]
    return cents


def kmeans_assign_twolevel(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 64,
    n_iter: int = 3,
    sample_mult: int = 8,
) -> DataFrame:
    """IVF-style two-level k-means assignment: the scale path for k ∝ N.

    Flat Lloyd's assignment step costs N·k distance evaluations per round;
    with SemDeDup's k = N/target_cluster_size that term is N²/size — the
    known asymptotic wall of flat k-means (BASELINE.md scale-stress notes).
    The standard fix is the IVF structure (coarse-then-fine quantization,
    as in IVF ANN indexes — same shape as plans/similarity.ann_ivf_probe):

    1. **Sample** ~``sample_mult·k`` training points by deterministic hash
       coin on the id (``xxhash64(id) % denom == 0`` — reproducible, no
       RNG, same discipline as plans/sampling.py).
    2. **Coarse train**: flat Lloyd (``kmeans_assign``) with k_c = ceil(√k)
       centroids ON THE SAMPLE ONLY — cost |S|·√k, independent of N's
       quadratic term.
    3. **Fine train**: group the sample by coarse cell; per cell, a numpy
       Lloyd (Arrow ``applyInPandas``, rows sorted by id, seeds = lowest
       ids) produces ~k/k_c sub-centroids — per-cell cost |cell|·k_f with
       |cell| ≈ |S|/k_c, so the whole stage is ~|S|·k_f.
    4. **Assign**: every vector picks its coarse cell against the
       BROADCAST k_c-row coarse relation (N·√k evals, map-side), then its
       fine sub-centroid via a BROADCAST hash join on the cell key — each
       vector only ever meets its own cell's ~√k fine centroids (N·√k
       evals, map-side). The N-row relation is never shuffled; cells with
       no fine centroids (possible when the final coarse re-assign moves
       full-data vectors into a cell no sample point landed in) fall back
       to the coarse centroid as their single sub-centroid.

    Total assignment work is N·2√k instead of N·k — for k ∝ N that turns
    the quadratic term into N^1.5, and tools/scale_stress.py measures the
    resulting curve (semantic_dedup_twolevel row in BASELINE.md).

    Output contract matches ``kmeans_assign``: (id_col, cluster, dist) with
    ``dist`` the squared L2 (micro-units²) to the chosen fine centroid.
    Cluster ids are ``cell · k_f_max + sub`` — stable, disjoint across
    cells. Deterministic end-to-end: hash-coin sample, seed-by-lowest-id at
    both levels, fixed iteration counts, exact integer micro-unit sums.
    """
    import math

    import numpy as np
    import pandas as pd

    k_c = max(2, math.isqrt(k - 1) + 1)
    k_f = max(1, (k + k_c - 1) // k_c)

    from songs_etl_spark.plans._util import track_persist

    vecs = track_persist(vectors.select(id_col, quantize_micro(vec_col).alias("emb")))
    n = vecs.count()
    target = min(n, max(sample_mult * k, 4 * k_c))
    denom = max(1, n // max(1, target))
    # Deterministic hash coin on the id: low 32 bits of md5 mod denom — the
    # cross-engine sampling discipline of plans/sampling.py (Spark conv(
    # substr(md5,25,8)) ≡ DuckDB CAST('0x'||substr(md5,25,8) AS BIGINT)),
    # so the two-level assignment is value-oracle-checkable end to end.
    coin = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 25, 8), 16, 10).cast("bigint")
        % F.lit(denom)
        == 0
    )
    sample = vecs.filter(coin)

    # Coarse training sees the RAW vectors: kmeans_assign quantizes
    # internally, and feeding it the already-quantized relation would
    # re-scale components to ~1e12, collapsing the exact-integer-sum
    # headroom its determinism contract relies on.
    sample_raw = vectors.filter(coin).select(
        F.col(id_col), F.col(vec_col).alias("e")
    )
    coarse = (
        kmeans_assign(sample_raw, id_col=id_col, vec_col="e", k=k_c, n_iter=n_iter)
        .select(id_col, F.col("cluster").alias("cell"))
        .join(sample, id_col)
    )
    # Persisted: coarse feeds BOTH coarse_cents and the Arrow fine-training
    # branch — unpersisted, the whole sample+coarse-Lloyd DAG re-executes
    # per branch (the multi-branch recompute class semdedup also hit).
    coarse = track_persist(coarse)
    # Re-derive the trained coarse centroids as per-cell means of the sample
    # members (identical to the last Lloyd update the training run produced).
    coarse_cents = (
        coarse.select("cell", F.posexplode("emb").alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg((F.sum("v") / F.count("*")).alias("m"))
        .select("cell", F.struct("dim", "m").alias("dm"))
        .groupBy("cell")
        .agg(F.transform(F.array_sort(F.collect_list("dm")), lambda x: x["m"]).alias("centroid"))
    )
    coarse_cents = track_persist(coarse_cents)

    fine_schema = "cell int, sub int, centroid array<double>"

    def train_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        cell = int(pdf["cell"].iloc[0])
        pdf = pdf.sort_values("__id")
        pts = np.array([np.asarray(e, dtype=np.float64) for e in pdf["emb"]])
        cents = _lloyd_numpy(pts, min(k_f, len(pts)), n_iter)
        return pd.DataFrame(
            {"cell": cell, "sub": range(len(cents)), "centroid": [list(c) for c in cents]}
        )

    fine_cents = (
        coarse.select(F.col("cell"), F.col(id_col).alias("__id"), "emb")
        .groupBy("cell")
        .applyInPandas(train_cell, schema=fine_schema)
    )
    # Fallback rows ONLY for cells with no fine centroids (anti-join).
    # Every assignable cell comes from coarse_cents, and every trained
    # coarse cell has ≥1 sample member, so this is normally empty — it is
    # a guard, and it must not compete with the fine centroids in covered
    # cells (an unconditional union would let the cell mean beat them and
    # silently deviate from the IVF fine assignment).
    fine_all = track_persist(
        fine_cents.unionByName(
            coarse_cents.join(
                fine_cents.select("cell").distinct(), "cell", "left_anti"
            ).select("cell", F.lit(k_f).alias("sub"), "centroid")
        )
    )
    fine_all.count()

    cell_assign = _assign(
        vecs, coarse_cents.select(F.col("cell").alias("cluster"), "centroid"), id_col
    ).select(id_col, F.col("cluster").alias("cell"))

    scored = (
        vecs.join(cell_assign, id_col)
        .join(F.broadcast(fine_all), "cell")
        .withColumn("d", _sq_l2("emb", "centroid"))
        .withColumn("pref", F.struct(F.col("d"), F.col("sub")))
    )
    best = (
        scored.groupBy(id_col)
        .agg(F.min("pref").alias("best"), F.first("cell").alias("cell"))
        .select(
            id_col,
            (F.col("cell") * (k_f + 1) + F.col("best.sub")).cast("int").alias("cluster"),
            F.col("best.d").alias("dist"),
        )
    )
    return best
