"""Clustering query surface: distributed k-means over the embeddings table.

The oracle is the SAME fixed-iteration Lloyd's algorithm unrolled into
DuckDB SQL (list_zip/list_reduce fold distances in array order, struct-min
argmin, exact integer-double means — see operators/clustering.py for the
micro-unit quantization that makes the computation bit-identical across
engines). A full value-level oracle for an iterative algorithm, not a
rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from songs_etl_spark.operators.clustering import kmeans_assign, kmeans_assign_twolevel
from songs_etl_spark.plans._util import t
from songs_etl_spark.plans.registry import register

_K = 8
_N_ITER = 3

#: Registered two-level (IVF) parameters: k=16 → k_c=4 coarse cells ×
#: k_f=4 fine sub-centroids. Small enough that the fixed-unroll oracle
#: stays readable, large enough that every stage (hash-coin sample, coarse
#: Lloyd, per-cell fine Lloyd with survivor renumbering, two-stage
#: assignment) is exercised with real multi-member cells at every SF.
_TL_K = 16


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


def _duckdb_twolevel_sql(k: int = _TL_K, n_iter: int = _N_ITER, sample_mult: int = 8) -> str:
    """Fixed-unroll DuckDB twin of ``kmeans_assign_twolevel`` — every stage
    of the IVF scale path reproduced op-for-op:

    1. ``samp``: the md5-low-32-bits hash-coin sample (denom derived from
       COUNT(*) exactly as the Spark driver computes it);
    2. ``ccent*``: flat Lloyd on the sample, k_c = ⌈√k⌉, same unroll shape
       as ``_duckdb_kmeans_sql``;
    3. ``ccent``: trained coarse centroids re-derived as per-cell means of
       the finally-assigned sample members (exact integer micro-unit sums);
    4. ``fcent*``: per-cell fine Lloyd — seeds = lowest-id members, argmin
       by (dist, sub) struct-min, empty sub-clusters dropped and survivors
       RENUMBERED compactly each iteration (the numpy ``_lloyd_numpy``
       re-pack), distances folded dimension-by-dimension in the same IEEE
       order as the numpy j-loop and Spark's ``F.aggregate``;
    5. ``fall``: fallback single sub-centroid (= the coarse mean, sub=k_f)
       for any cell no fine centroid landed in;
    6. assignment: every vector → nearest coarse cell → nearest fine sub
       within that cell only; cluster id = cell·(k_f+1)+sub.
    """
    import math

    k_c = max(2, math.isqrt(k - 1) + 1)
    k_f = max(1, (k + k_c - 1) // k_c)
    m_target = max(sample_mult * k, 4 * k_c)

    def dist(vec: str, cent: str) -> str:
        return (
            f"list_reduce(list_transform(list_zip({vec}, {cent}),"
            " p -> (p[1] - p[2]) * (p[1] - p[2])),"
            " (acc, x) -> acc + x)"
        )

    unnest_dims = (
        "unnest(list_transform(range(1, len({src}.emb) + 1),"
        " j -> {{'dim': j, 'v': {src}.emb[j]}})) AS u"
    )
    parts = [
        f"""
        WITH v AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS DOUBLE)) AS emb
            FROM embeddings
        ),
        par AS MATERIALIZED (
            SELECT GREATEST(1, COUNT(*) // LEAST(COUNT(*), {m_target})) AS denom FROM v
        ),
        samp AS MATERIALIZED (
            SELECT v.vec_id, v.emb FROM v, par
            WHERE CAST(('0x' || substr(md5(CAST(v.vec_id AS VARCHAR)), 25, 8)) AS BIGINT)
                      % par.denom = 0
        ),
        ccent0 AS MATERIALIZED (
            SELECT row_number() OVER (ORDER BY vec_id) AS cluster, emb AS centroid
            FROM (SELECT * FROM samp ORDER BY vec_id LIMIT {k_c})
        )"""
    ]
    for i in range(n_iter):
        parts.append(
            f"""
        , cassign{i} AS MATERIALIZED (
            SELECT vec_id,
                   struct_extract(min({{'dist': d, 'cluster': cluster}}), 'cluster') AS cluster
            FROM (
                SELECT s.vec_id, c.cluster, {dist('s.emb', 'c.centroid')} AS d
                FROM samp s CROSS JOIN ccent{i} c
            ) GROUP BY vec_id
        ),
        ccomp{i} AS MATERIALIZED (
            SELECT cluster, u['dim'] AS dim, SUM(u['v']) / COUNT(*) AS m
            FROM (
                SELECT a.cluster, {unnest_dims.format(src='s')}
                FROM cassign{i} a JOIN samp s ON a.vec_id = s.vec_id
            ) GROUP BY cluster, dim
        ),
        ccent{i + 1} AS MATERIALIZED (
            SELECT cluster, list(m ORDER BY dim) AS centroid FROM ccomp{i} GROUP BY cluster
        )"""
        )
    parts.append(
        f"""
        , cfin AS MATERIALIZED (
            SELECT vec_id,
                   struct_extract(min({{'dist': d, 'cluster': cluster}}), 'cluster') AS cell
            FROM (
                SELECT s.vec_id, c.cluster, {dist('s.emb', 'c.centroid')} AS d
                FROM samp s CROSS JOIN ccent{n_iter} c
            ) GROUP BY vec_id
        ),
        coarse AS MATERIALIZED (
            SELECT s.vec_id, s.emb, f.cell FROM samp s JOIN cfin f ON s.vec_id = f.vec_id
        ),
        ccent AS MATERIALIZED (
            SELECT cell, list(m ORDER BY dim) AS centroid FROM (
                SELECT cell, u['dim'] AS dim, SUM(u['v']) / COUNT(*) AS m
                FROM (SELECT m.cell, {unnest_dims.format(src='m')} FROM coarse m)
                GROUP BY cell, dim
            ) GROUP BY cell
        ),
        fcent0 AS MATERIALIZED (
            SELECT cell, sub, centroid FROM (
                SELECT cell,
                       row_number() OVER (PARTITION BY cell ORDER BY vec_id) - 1 AS sub,
                       emb AS centroid
                FROM coarse
            ) WHERE sub < {k_f}
        )"""
    )
    for i in range(n_iter):
        parts.append(
            f"""
        , flab{i} AS MATERIALIZED (
            SELECT cell, vec_id,
                   struct_extract(min({{'d': d, 'sub': sub}}), 'sub') AS sub
            FROM (
                SELECT m.cell, m.vec_id, c.sub, {dist('m.emb', 'c.centroid')} AS d
                FROM coarse m JOIN fcent{i} c ON m.cell = c.cell
            ) GROUP BY cell, vec_id
        ),
        fcomp{i} AS MATERIALIZED (
            SELECT cell, sub, u['dim'] AS dim, SUM(u['v']) / COUNT(*) AS m
            FROM (
                SELECT l.cell, l.sub, {unnest_dims.format(src='m')}
                FROM flab{i} l JOIN coarse m ON l.cell = m.cell AND l.vec_id = m.vec_id
            ) GROUP BY cell, sub, dim
        ),
        fcent{i + 1} AS MATERIALIZED (
            SELECT cell,
                   row_number() OVER (PARTITION BY cell ORDER BY sub) - 1 AS sub,
                   centroid
            FROM (
                SELECT cell, sub, list(m ORDER BY dim) AS centroid
                FROM fcomp{i} GROUP BY cell, sub
            )
        )"""
        )
    parts.append(
        f"""
        , fall AS MATERIALIZED (
            SELECT cell, sub, centroid FROM fcent{n_iter}
            UNION ALL
            SELECT c.cell, {k_f} AS sub, c.centroid FROM ccent c
            WHERE c.cell NOT IN (SELECT cell FROM fcent{n_iter})
        ),
        vassign AS MATERIALIZED (
            SELECT vec_id,
                   struct_extract(min({{'dist': d, 'cluster': cell}}), 'cluster') AS cell
            FROM (
                SELECT v.vec_id, c.cell, {dist('v.emb', 'c.centroid')} AS d
                FROM v CROSS JOIN ccent c
            ) GROUP BY vec_id
        ),
        tl_best AS MATERIALIZED (
            SELECT vec_id, cell, min({{'d': d, 'sub': sub}}) AS b
            FROM (
                SELECT v.vec_id, a.cell, f.sub, {dist('v.emb', 'f.centroid')} AS d
                FROM v JOIN vassign a ON v.vec_id = a.vec_id
                       JOIN fall f ON f.cell = a.cell
            ) GROUP BY vec_id, cell
        )
        SELECT vec_id,
               CAST(cell * {k_f + 1} + struct_extract(b, 'sub') AS INTEGER) AS cluster,
               struct_extract(b, 'd') AS dist
        FROM tl_best"""
    )
    return "".join(parts)


@register(
    "kmeans_twolevel_assign",
    doc="iterative algorithm, scale path: two-level (IVF) k-means assignment "
    "— hash-coin sample, coarse Lloyd, per-cell Arrow fine Lloyd, "
    "single-pass Arrow two-stage assignment; full value-level unrolled oracle",
    oracle=_duckdb_twolevel_sql(),
)
def kmeans_twolevel_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k ∝ N clustering path (operators/clustering.py
    kmeans_assign_twolevel) as a first-class oracle-checked query: N·2√k
    assignment work instead of flat Lloyd's N·k, with every float decision
    reproduced bit-exactly by the fixed-unroll DuckDB twin — sampling coin,
    both Lloyd levels (including the numpy fine trainer's survivor
    renumbering), and the final two-stage argmin."""
    return kmeans_assign_twolevel(
        t(spark, sf_dir, "embeddings"), id_col="vec_id", vec_col="embedding",
        k=_TL_K, n_iter=_N_ITER,
    )


@register(
    "kmeans_embeddings",
    doc="iterative algorithm: distributed Lloyd's k-means (closure-model Arrow assignment, exact means)",
    oracle=_duckdb_kmeans_sql(),
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 clusters, 3 fixed Lloyd rounds, deterministic smallest-id seeds.
    Per round: one Arrow map pass for assignment (the k-row centroid model
    rides the task closure — the big side never shuffles) + one
    (cluster, dim)-keyed aggregation whose k×d means are collected as the
    next round's model. The same plan at 100 TB: model state stays k×d
    regardless of corpus size, so every round is a map-side assignment
    plus one key-partitioned shuffle."""
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


#: Outliers flagged per label by distance-to-own-centroid rank.
_OUTLIER_TOPK = 5


@register(
    "embedding_centroid_outliers",
    doc="embedding-space quality pruning: top-5 farthest vectors from their "
    "own label centroid, exact integer-quantized centroids",
    oracle=f"""
        WITH comp AS (
            SELECT label,
                   generate_subscripts(embedding, 1) AS dim,
                   CAST(FLOOR(unnest(CAST(embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS q
            FROM embeddings
        ),
        means AS (
            SELECT label, dim, CAST(SUM(q) AS DOUBLE) / COUNT(*) AS m
            FROM comp GROUP BY label, dim
        ),
        cents AS (
            SELECT label, list(m ORDER BY dim) AS cent FROM means GROUP BY label
        ),
        dists AS (
            SELECT e.vec_id, e.label,
                   list_reduce(
                       list_transform(
                           list_zip(
                               list_transform(CAST(e.embedding AS DOUBLE[]),
                                              x -> CAST(FLOOR(x * 1e6) AS DOUBLE)),
                               c.cent),
                           p -> (p[1] - p[2]) * (p[1] - p[2])),
                       (acc, t) -> acc + t) AS d2
            FROM embeddings e JOIN cents c USING (label)
        )
        SELECT label, vec_id, CAST(rnk AS INT) AS rank,
               ROUND(SQRT(d2) / 1e6, 6) AS dist
        FROM (
            SELECT label, vec_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY label
                                      ORDER BY d2 DESC, vec_id) AS rnk
            FROM dists
        ) WHERE rnk <= {_OUTLIER_TOPK}
    """,
)
def embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space data pruning — flag the vectors farthest from their
    own label's centroid (mislabeled examples, decode corruption, and
    encoder failures all surface here first; SemDeDup's sibling heuristic
    for QUALITY rather than redundancy). Centroids follow the
    embedding_label_centroids discipline: micro-unit integer quantization
    makes the per-(label, dim) sums exact and partition-order-independent,
    and the mean is one exact-int division. Distances run as a per-dim
    left-assoc fold over the quantized vector vs the broadcast centroid
    array (label-count × dim rows — model-sized), identical to the SQL
    list_reduce chain; ranking is fully tie-broken. One keyed shuffle for
    the centroid sums, a broadcast join back, and a per-label top-k window
    over a relation with only label-partitions — no all-pairs stage at any
    scale."""
    emb = t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        F.posexplode(
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.floor(x * 1e6).cast("bigint"),
            )
        ).alias("dim", "q"),
    )
    means = comp.groupBy("label", "dim").agg(
        (F.sum("q").cast("double") / F.count("*")).alias("m")
    )
    cents = means.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("cent")
    )
    qvec = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * 1e6).cast("double"),
    )
    d2 = F.aggregate(
        F.zip_with(qvec, F.col("cent"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.join(F.broadcast(cents), "label").select(
        "vec_id", "label", d2.alias("d2")
    )
    w = Window.partitionBy("label").orderBy(F.col("d2").desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _OUTLIER_TOPK)
        .select(
            "label",
            "vec_id",
            F.col("rnk").cast("int").alias("rank"),
            F.round(F.sqrt("d2") / F.lit(1e6), 6).alias("dist"),
        )
    )


def _duckdb_spherical_sql(k: int = _K, n_iter: int = _N_ITER) -> str:
    """Unrolled spherical k-means twin: assignment by argmax of
    dot(v, centroid)/||centroid|| (ties → smaller cluster id), means update
    identical to the Euclidean trainer. The dot and norm are the standard
    left-to-right list_reduce folds; the division is one chain — the same
    cross-engine discipline as _duckdb_kmeans_sql's squared distance."""
    dot = (
        "list_reduce(list_transform(list_zip(v.emb, c.centroid),"
        " p -> p[1] * p[2]), (acc, x) -> acc + x)"
    )
    cn = (
        "sqrt(list_reduce(list_transform(list_zip(c.centroid, c.centroid),"
        " p -> p[1] * p[2]), (acc, x) -> acc + x))"
    )
    sim = f"(({dot}) / ({cn}))"
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
                   struct_extract(min({{'s': s, 'cluster': cluster}}), 'cluster') AS cluster
            FROM (
                SELECT v.vec_id, c.cluster, -{sim} AS s
                FROM v CROSS JOIN cent{i} c
            ) GROUP BY vec_id
        )"""
        )
        parts.append(
            f"""
        , comp{i} AS (
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
               -struct_extract(best, 's') AS sim
        FROM (
            SELECT vec_id, min({{'s': s, 'cluster': cluster}}) AS best
            FROM (
                SELECT v.vec_id, c.cluster, -{sim} AS s
                FROM v CROSS JOIN cent{n_iter} c
            ) GROUP BY vec_id
        )"""
    )
    return "".join(parts)


def _spherical_assign_arrow(
    vecs: DataFrame, cent_pairs: list[tuple[int, list[float]]]
) -> DataFrame:
    """Spherical assignment as one Arrow map pass (assign_arrow's cosine
    twin): sim matrix accumulated dimension-by-dimension as
    ``acc + p_j·c_j`` (the list_reduce fold's IEEE chain), divided by each
    centroid's fold-order norm, argmax with numpy's first-maximum tie rule
    — which over ascending cluster ids IS the oracle's (−sim, cluster)
    struct-min. Emits (vec_id, cluster, sim)."""
    import numpy as np
    import pandas as pd

    ids = np.array([int(c) for c, _ in cent_pairs], dtype=np.int64)
    cmat = np.array([v for _, v in cent_pairs], dtype=np.float64)
    k, d = cmat.shape
    cnorm = np.zeros(k)
    for j in range(d):
        cnorm += cmat[:, j] * cmat[:, j]
    cnorm = np.sqrt(cnorm)

    def run(batches):
        for batch in batches:
            if not len(batch):
                continue
            pts = np.array([np.asarray(e, dtype=np.float64) for e in batch["emb"]])
            dot = np.zeros((pts.shape[0], k))
            tmp = np.empty_like(dot)
            for j in range(d):
                np.multiply(pts[:, j, None], cmat[None, :, j], out=tmp)
                np.add(dot, tmp, out=dot)
            sim = dot / cnorm[None, :]
            lab = sim.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": batch["vec_id"].astype("int64"),
                    "cluster": ids[lab].astype("int32"),
                    "sim": sim[np.arange(len(lab)), lab],
                }
            )

    return vecs.select("vec_id", "emb").mapInPandas(
        run, "vec_id long, cluster int, sim double"
    )


@register(
    "spherical_kmeans_assign",
    doc="iterative algorithm: spherical k-means (Dhillon-Modha) — Lloyd "
    "rounds with argmax cosine-to-centroid assignment instead of "
    "min-L2, the clustering geometry text/embedding pipelines actually "
    "use; fully-unrolled exact oracle",
    oracle=_duckdb_spherical_sql(),
)
def spherical_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means: assignment maximizes dot(v, μ_c)/||μ_c|| (cosine
    up to the vector's own norm, which is constant per row and cannot
    change its argmax), update is the plain coordinate mean — the
    direction-clustering geometry for unit-normalized text embeddings,
    where Euclidean k-means conflates angle with magnitude. k = 8, 3
    rounds, deterministic smallest-id seeds; output (vec_id, cluster,
    sim).

    Scale shape identical to kmeans_embeddings: the k×d centroid model
    rides the Arrow task closure (map-side assignment, no shuffle of the
    corpus), one (cluster, dim)-keyed exact-integer aggregation per round,
    k×d driver state. Exactness: micro-quantized components, fold-order
    dot/norm chains, first-maximum tie rule — bit-equal to the unrolled
    oracle at every round."""
    from songs_etl_spark.operators.clustering import quantize_micro
    from songs_etl_spark.plans._util import spread, track_persist

    emb = t(spark, sf_dir, "embeddings")
    v = track_persist(
        spread(emb.select("vec_id", quantize_micro("embedding").alias("emb")), key="vec_id")
    )
    seed_rows = sorted(
        v.orderBy("vec_id").limit(_K).collect(), key=lambda r: r["vec_id"]
    )
    cents = [(i + 1, list(r["emb"])) for i, r in enumerate(seed_rows)]
    for _ in range(_N_ITER):
        assign = _spherical_assign_arrow(v, cents).select("vec_id", "cluster")
        comp = (
            assign.join(v, "vec_id")
            .select("cluster", F.posexplode("emb").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg((F.sum("val") / F.count("*")).alias("m"))
        )
        rows = comp.groupBy("cluster").agg(
            F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("ms")
        ).collect()
        cents = sorted(
            (int(r["cluster"]), [p["m"] for p in r["ms"]]) for r in rows
        )
    return _spherical_assign_arrow(v, cents)


#: k-center coreset geometry: greedy-farthest-point (Gonzalez) picks after
#: the deterministic min-id seed. 2-approximation of the k-center optimum —
#: the classic diversity/coreset selection for data curation.
_KC_PICKS = 4


def _duckdb_kcenter_sql(picks: int = _KC_PICKS) -> str:
    dist = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])),"
        " (acc, x) -> acc + x)"
    )
    parts = [
        """
        WITH v AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS DOUBLE)) AS emb
            FROM embeddings
        ),
        p0 AS MATERIALIZED (
            SELECT vec_id, emb FROM v ORDER BY vec_id LIMIT 1
        ),
        d0 AS MATERIALIZED (
            SELECT v.vec_id, v.emb, """
        + dist.format(a="v.emb", b="p.emb")
        + """ AS d
            FROM v CROSS JOIN p0 p
        )"""
    ]
    for r in range(1, picks + 1):
        parts.append(
            f"""
        , p{r} AS MATERIALIZED (
            SELECT vec_id, emb, d FROM d{r - 1}
            ORDER BY d DESC, vec_id LIMIT 1
        ),
        d{r} AS MATERIALIZED (
            SELECT a.vec_id, a.emb,
                   LEAST(a.d, {dist.format(a='a.emb', b='p.emb')}) AS d
            FROM d{r - 1} a CROSS JOIN p{r} p
        )"""
        )
    finals = ["SELECT 0 AS pick_round, vec_id, CAST(0.0 AS DOUBLE) AS d2_to_set FROM p0"]
    finals += [
        f"SELECT {r} AS pick_round, vec_id, d AS d2_to_set FROM p{r}"
        for r in range(1, picks + 1)
    ]
    parts.append("\n        " + "\n        UNION ALL\n        ".join(finals))
    return "".join(parts)


@register(
    "kcenter_coreset_select",
    tags=("bcast-const",),
    doc="coreset / diversity selection: greedy-farthest-point k-center "
    "(Gonzalez 2-approximation) — the pick sequence and each pick's "
    "squared distance to the already-selected set; the data-curation "
    "subset selector beside SemDeDup's near-dup dropper",
    oracle=_duckdb_kcenter_sql(),
)
def kcenter_coreset_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point traversal): seed with the smallest
    vec_id, then repeatedly pick the vector MAXIMIZING its distance to the
    selected set (ties → smaller id), maintaining each vector's running
    min-distance-to-set. The classic coreset/diversity selector — picks
    cover the embedding space's extremes, exactly what a curation pipeline
    samples when it wants coverage rather than density (and the 2-approx
    backbone k-center/k-means++ seeding builds on).

    Scale shape (Lloyd discipline): per pick, ONE map-side distance update
    against the 1-vector broadcast pick (bcast-const) plus ONE global
    argmax — the running min-distance column rides a persisted relation,
    so pick r costs one pass regardless of r; driver state is the pick
    list. Exactness: micro-int fold distances are exact integers, LEAST
    and the (d DESC, vec_id) argmax are integer comparisons — bit-equal to
    the unrolled oracle at every pick."""
    from songs_etl_spark.operators.clustering import quantize_micro
    from songs_etl_spark.plans._util import spread, track_persist

    emb = t(spark, sf_dir, "embeddings")
    v = spread(emb.select("vec_id", quantize_micro("embedding").alias("emb")), key="vec_id")
    seed = v.orderBy("vec_id").limit(1).collect()[0]
    out = [(0, int(seed["vec_id"]), 0.0)]

    def d2_to(vec: list[float]) -> F.Column:
        arr = F.array(*[F.lit(float(x)) for x in vec])
        return F.aggregate(
            F.zip_with("emb", arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cur = track_persist(v.select("vec_id", "emb", d2_to(list(seed["emb"])).alias("d")))
    cur.count()
    for r in range(1, _KC_PICKS + 1):
        pick = cur.orderBy(F.col("d").desc(), "vec_id").limit(1).collect()[0]
        out.append((r, int(pick["vec_id"]), float(pick["d"])))
        nxt = track_persist(
            cur.select(
                "vec_id", "emb", F.least(F.col("d"), d2_to(list(pick["emb"]))).alias("d")
            )
        )
        nxt.count()
        cur.unpersist()
        cur = nxt
    return spark.createDataFrame(out, "pick_round int, vec_id bigint, d2_to_set double")


# ---------------------------------------------------------------------------
# k-means‖ scalable seeding (Bahmani et al. 2012), deterministic
# ---------------------------------------------------------------------------

#: Oversampling factor ℓ and fixed sampling rounds of the k-means‖ pass.
#: Expected candidates ≈ 1 + R·ℓ ≈ 33 for k = 8 — the paper's ℓ ∈ [k, 2k],
#: R = O(log φ) regime collapsed to 2 rounds (φ drops geometrically and the
#: testdata potentials converge by round 2; more rounds = more CTE unroll,
#: same plan shape).
_KMPP_L = 16
_KMPP_R = 2

_DUCK_D2 = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])),"
    " (acc, x) -> acc + x)"
)


def _kmpp_coin_sql(r: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST(d.vec_id AS VARCHAR) || ':{r}'), 25, 8))"
        " AS BIGINT)"
    )


def _kmpp_oracle(k: int = _K, ell: int = _KMPP_L, rounds: int = _KMPP_R) -> str:
    """Fixed-unroll DuckDB twin of ``kmeans_scalable_seeding``: the same
    md5-coin inclusion (exact cross-multiplied HUGEINT comparison — no
    division anywhere), the same micro-unit integer D² potentials, the
    same weighted farthest-point reduction."""
    d2_vc = _DUCK_D2.format(a="v.emb", b="c.cvec")
    ctes = [
        """v AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> floor(x * 1000000)) AS emb
            FROM embeddings
        )""",
        "c0 AS (SELECT vec_id AS cid, emb AS cvec FROM v ORDER BY vec_id LIMIT 1)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""d{r} AS MATERIALIZED (
            SELECT v.vec_id, MIN({d2_vc}) AS d2
            FROM v, c{r - 1} c GROUP BY v.vec_id
        )"""
        )
        ctes.append(
            f"p{r} AS (SELECT SUM(CAST(d2 AS HUGEINT)) AS phi FROM d{r})"
        )
        ctes.append(
            f"""s{r} AS (
            SELECT v.vec_id AS cid, v.emb AS cvec
            FROM d{r} d JOIN v ON v.vec_id = d.vec_id, p{r} p
            WHERE CAST({_kmpp_coin_sql(r)} AS HUGEINT) * p.phi
                  < CAST(4294967296 AS HUGEINT) * {ell} * CAST(d.d2 AS HUGEINT)
        )"""
        )
        ctes.append(
            f"c{r} AS MATERIALIZED (SELECT * FROM c{r - 1} UNION ALL SELECT * FROM s{r})"
        )
    ctes.append(
        f"""wts AS (
            SELECT struct_extract(m, 'cid') AS cid, CAST(COUNT(*) AS BIGINT) AS w
            FROM (
                SELECT v.vec_id,
                       MIN({{'d2': {d2_vc}, 'cid': c.cid}}) AS m
                FROM v, c{rounds} c GROUP BY v.vec_id
            ) GROUP BY 1
        )"""
    )
    ctes.append(
        f"""cw AS MATERIALIZED (
            SELECT c.cid, c.cvec, w.w FROM c{rounds} c JOIN wts w ON w.cid = c.cid
        )"""
    )
    ctes.append("f1 AS (SELECT cid, cvec, w FROM cw ORDER BY w DESC, cid LIMIT 1)")
    ctes.append("ch1 AS (SELECT * FROM f1)")
    d2_cs = _DUCK_D2.format(a="c.cvec", b="s.cvec")
    for j in range(2, k + 1):
        ctes.append(
            f"""f{j} AS (
            SELECT cw.cid, cw.cvec, cw.w
            FROM cw
            JOIN (
                SELECT cid FROM (
                    SELECT c.cid, MIN({d2_cs}) AS md, MIN(c.w) AS w
                    FROM cw c, ch{j - 1} s
                    WHERE c.cid NOT IN (SELECT cid FROM ch{j - 1})
                    GROUP BY c.cid
                ) ORDER BY md DESC, w DESC, cid LIMIT 1
            ) p ON p.cid = cw.cid
        )"""
        )
        ctes.append(
            f"ch{j} AS MATERIALIZED (SELECT * FROM ch{j - 1} UNION ALL SELECT * FROM f{j})"
        )
    body = ",\n        ".join(ctes)
    finals = "\n        UNION ALL\n".join(
        f"        SELECT {j} AS seed_order, cid AS vec_id, w AS weight FROM f{j}"
        for j in range(1, k + 1)
    )
    return f"""
        WITH {body}
{finals}
    """


@register(
    "kmeans_scalable_seeding",
    tags=("bcast-const",),
    doc="k-means|| scalable seeding (Bahmani et al. 2012), deterministic: "
    "md5-coin oversampling rounds with exact cross-multiplied integer "
    "inclusion (coin*phi < 2^32*ell*d2), micro-unit D2 potentials, "
    "weighted farthest-point reduction to k seeds",
    oracle=_kmpp_oracle(),
)
def kmeans_scalable_seeding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means‖ seeding over the embeddings table — the scale-grade
    replacement for the ``train_centroids`` first-k-by-id policy (good for
    oracle determinism, poor centroids at production k).

    Bahmani's algorithm, made bit-deterministic:

    1. **Init**: the min-id vector is the first candidate.
    2. **R oversampling rounds**: each point's exact micro-unit² distance
       D²(x, C) to the candidate set (integer-valued double fold, cast
       exact), the potential φ = ΣD² as one exact integer sum, and an
       inclusion coin per point — the low-32-md5 uniform
       (plans/sampling.py's verified cross-engine identity). A point is
       sampled iff ``coin · φ < 2³²·ℓ·D²(x)`` — the k-means‖ probability
       min(1, ℓ·D²/φ) evaluated as ONE cross-multiplied 128-bit integer
       comparison: no division, no float, no rounding anywhere, so both
       engines flip exactly the same coins. (Candidates re-sample
       themselves with D² = 0 — never.)
    3. **Weights**: every point votes for its nearest candidate
       (struct-min argmin, ties to smallest id) — the paper's w(c).
    4. **Reduction to k**: the paper runs weighted k-means++ on the ~Rℓ
       candidates; the deterministic stand-in is weighted farthest-point
       traversal (start at the max-weight candidate, then repeatedly take
       the candidate with max min-D² to the chosen set, ties by weight
       then id) — the same 2-approximation family, unrolled as k−1
       relational argmax steps (the MMR precedent).

    Scale: each round is one broadcast-candidate × corpus pass (the
    candidate set is model-sized, ≤ 1+Rℓ rows) plus one global integer
    sum; at 100 TB that is R map-side passes — exactly why Bahmani
    replaced k-means++'s k sequential passes. φ is summed in decimal(38)
    (int64 would overflow at ~3·10¹⁸ µ-units², reachable at billions of
    rows). Output: (seed_order, vec_id, weight) — feed the ids to
    ``train_centroids(seed_ids=...)`` / ``kmeans_assign(seed_ids=...)``.

    Reference analog: none (the reference has no ML surface) — this is
    the LLM-pipeline mandate's clustering rung, closing round-9 verdict
    item #5."""
    from songs_etl_spark.operators.clustering import quantize_micro

    k, ell, rounds = _K, _KMPP_L, _KMPP_R
    emb = t(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", quantize_micro("embedding").alias("emb"))

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    dec = "decimal(38,0)"
    cand = (
        vecs.orderBy("vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cvec"))
    )
    for r in range(1, rounds + 1):
        dmin = (
            vecs.crossJoin(F.broadcast(cand))
            .select("vec_id", d2(F.col("emb"), F.col("cvec")).alias("dd"))
            .groupBy("vec_id")
            .agg(F.min("dd").cast("bigint").alias("d2"))
        )
        phi = dmin.agg(F.sum(F.col("d2").cast(dec)).alias("phi"))
        # decimal(38,0) headroom for the cross-multiplied comparison below:
        # the left side is coin·φ (coin < 2³²) and the right side is
        # 2³²·ℓ·d2 with d2 ≤ φ, so BOTH sides fit decimal(38) iff
        # φ < 10³⁸/(2³²·ℓ) ≈ 1.46e27 µ-units². Past that Spark (ANSI off)
        # would overflow to NULL and silently DROP rows from the filter
        # where the DuckDB oracle's HUGEINT twin errors loudly — make the
        # failure mode loud and symmetric by raising here instead. The
        # guard is one comparison on a 1-row aggregate.
        phi_cap = str(10**38 // (2**32 * ell))  # > int64: travels as string
        phi = phi.select(
            F.when(
                F.col("phi") >= F.lit(phi_cap).cast(dec),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "kmeans_scalable_seeding: phi exceeds the "
                            "decimal(38,0) cross-multiply headroom "
                            "10^38/(2^32*ell); re-quantize or raise the "
                            "decimal width: phi="
                        ),
                        F.col("phi").cast("string"),
                    )
                ).cast(dec),
            )
            .otherwise(F.col("phi"))
            .alias("phi")
        )
        coin = F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f":{r}"))),
                25,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        sampled = (
            dmin.crossJoin(F.broadcast(phi))
            .filter(
                coin.cast(dec) * F.col("phi")
                < F.lit(4294967296).cast(dec)
                * F.lit(ell).cast(dec)
                * F.col("d2").cast(dec)
            )
            .join(vecs, "vec_id")
            .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cvec"))
        )
        cand = cand.unionByName(sampled)
    from songs_etl_spark.plans._util import track_persist

    cand = track_persist(cand)
    votes = (
        vecs.crossJoin(F.broadcast(cand))
        .select(
            "vec_id",
            F.struct(d2(F.col("emb"), F.col("cvec")).alias("d2"), F.col("cid").alias("cid")).alias("s"),
        )
        .groupBy("vec_id")
        .agg(F.min("s").alias("m"))
        .groupBy(F.col("m.cid").alias("cid"))
        .agg(F.count("*").cast("bigint").alias("w"))
    )
    cw = cand.join(votes, "cid")
    # The weighted farthest-point reduction runs on the COLLECTED candidate
    # relation: ≤ 1+R·ℓ model-sized rows (the candidate set IS the model —
    # same driver-state contract as the Lloyd k×d collect and the BPE
    # top-(k+1) merge candidates; never data-sized). All arithmetic is
    # integer micro-units² in exact doubles, so the Python fold is
    # bit-identical to the oracle's list_reduce by integer exactness, not
    # by IEEE-order luck. (A fully-relational k−1-step unroll is
    # expressible but k nested argmax limits made Catalyst analysis
    # quadratic — the collect is both faster and simpler.)
    rows = cw.collect()
    model = {r["cid"]: (list(r["cvec"]), int(r["w"])) for r in rows}

    def pd2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    first = min(model.items(), key=lambda kv: (-kv[1][1], kv[0]))[0]
    order = [first]
    while len(order) < k and len(order) < len(model):
        best = None
        for cid, (vec, w) in model.items():
            if cid in order:
                continue
            md = min(pd2(vec, model[s][0]) for s in order)
            key = (-md, -w, cid)
            if best is None or key < best[0]:
                best = (key, cid)
        order.append(best[1])
    out_rows = [
        (j + 1, int(cid), model[cid][1]) for j, cid in enumerate(order)
    ]
    return spark.createDataFrame(
        out_rows, "seed_order int, vec_id bigint, weight bigint"
    )
