"""Random-projection (Johnson–Lindenstrauss) and power-iteration PCA over
the embeddings table — the two classic dimensionality levers of a
100 TB vector pipeline:

* **JL sign projection** (Achlioptas 2003): a data-independent ±1 matrix
  shrinks d=64 vectors to d'=16 while approximately preserving pairwise
  distances. At scale this is the cheapest index-side compression there
  is — no training pass, the projection is a constant that ships in every
  task closure, and candidate generation runs entirely on the short
  vectors. The registered query *certifies* the lever: it ranks neighbors
  in both the original and the projected space and emits per-query
  recall@k, the number a capacity-planning engineer actually needs.

* **Power-iteration PCA**: the top principal component extracted with the
  same driver-model/distributed-data split as Lloyd's k-means
  (operators/clustering.py): the d×d second-moment matrix is an
  associative integer aggregate (one Arrow map pass of per-partition
  partial Gram matrices — model-sized, shuffle-free), the d-vector
  iterate lives on the driver, and the final per-vector projection is a
  JVM fold. PCA/whitening is the standard preprocessing step before
  OPQ/PQ indexing and embedding drift audits.

Exactness discipline (see plans/registry.py): vector components quantize
to integers up front, so *every* distributed sum here is an exact integer
aggregate (partition-order-independent); the only float arithmetic is
fixed left-associative fold chains replayed verbatim by the unrolled
DuckDB oracles — distances and recalls are therefore bit-identical across
engines, not merely close.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from songs_etl_spark.plans._util import spread, t
from songs_etl_spark.plans.registry import register

#: JL geometry: d=64 → d'=16 sign-projection, 8 query vectors, recall@10.
_JL_D = 64
_JL_DP = 16
_JL_NQ = 8
_JL_K = 10

#: Micro-unit quantization (same as operators/clustering.quantize_micro,
#: kept as BIGINT here because every downstream op is integer arithmetic).
_Q_SCALE = 1_000_000


def _jl_sign(k: int, j: int) -> int:
    """±1 from the md5 parity of the string ``"{k}-{j}"`` — the same
    derivation the SQL oracle performs with ``md5(k || '-' || j)``, so the
    projection matrix is a shared cross-engine constant, not a seed."""
    return 1 if int(hashlib.md5(f"{k}-{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


def _quant_long(col: str) -> F.Column:
    return F.transform(col, lambda x: F.floor(x.cast("double") * _Q_SCALE).cast("long"))


def _int_d2(a: str, b: str) -> F.Column:
    """Exact-integer squared L2 between two BIGINT arrays (order-free)."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_DUCK_INT_D2 = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])),"
    " (acc, x) -> acc + x)"
)


@register(
    "jl_random_projection_recall",
    doc="Johnson-Lindenstrauss ±1 sign projection d=64→16 with per-query "
    "recall@10 against exact nearest neighbors — the certification run for "
    "projection-based candidate generation, computed entirely in exact "
    "integer arithmetic",
    tags=("bcast-const",),
    oracle=f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_Q_SCALE}) AS BIGINT)) AS q
            FROM embeddings
        ), signs AS (
            SELECT k.k, j.j,
                   CASE WHEN CAST('0x' || substr(
                            md5(CAST(k.k AS VARCHAR) || '-' || CAST(j.j AS VARCHAR)),
                            1, 1) AS INTEGER) % 2 = 0
                        THEN 1 ELSE -1 END AS s
            FROM (SELECT unnest(range({_JL_DP})) AS k) k,
                 (SELECT unnest(range({_JL_D})) AS j) j
        ), proj AS (
            SELECT v.vec_id, s.k, SUM(s.s * v.q[s.j + 1]) AS yk
            FROM v, signs s
            GROUP BY v.vec_id, s.k
        ), y AS (
            SELECT vec_id, list(yk ORDER BY k) AS y FROM proj GROUP BY vec_id
        ), exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_DUCK_INT_D2.format(a='q.q', b='c.q')}, c.vec_id
                       ) AS rnk
                FROM v q JOIN v c ON q.vec_id < {_JL_NQ} AND c.vec_id >= {_JL_NQ}
            ) WHERE rnk <= {_JL_K}
        ), approx AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_DUCK_INT_D2.format(a='q.y', b='c.y')}, c.vec_id
                       ) AS rnk
                FROM y q JOIN y c ON q.vec_id < {_JL_NQ} AND c.vec_id >= {_JL_NQ}
            ) WHERE rnk <= {_JL_K}
        )
        SELECT e.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / {_JL_K} AS recall_at_k
        FROM exact e
        LEFT JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
    """,
)
def jl_random_projection_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of JL-projected candidate ranking vs exact ranking, per
    query vector. Both rankings run in exact integer arithmetic (micro-unit
    quantized components; the ±1 projection of integers is an integer), so
    there is no float anywhere — distances, ranks, and recalls are exact
    and the oracle pins them to the digit.

    Scale shape: the sign matrix is a d'×d constant folded into the plan
    (zero training, zero state); projection is a per-row JVM fold (one map
    pass, no shuffle); both rankings broadcast the 8-row query side and
    scan candidates map-side with a per-partition top-k, the
    ann_bruteforce_topk plan. At 100 TB the projected ranking touches 4×
    fewer bytes per candidate — the certified recall is the price tag of
    that saving."""
    emb = t(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", _quant_long("embedding").alias("q"))
    sign_arrays = [
        F.array(*[F.lit(_jl_sign(k, j)).cast("long") for j in range(_JL_D)])
        for k in range(_JL_DP)
    ]
    y = v.select(
        "vec_id",
        "q",
        F.array(
            *[
                F.aggregate(
                    F.zip_with(F.col("q"), sk, lambda a, b: a * b),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                for sk in sign_arrays
            ]
        ).alias("y"),
    )

    def topk(col: str) -> DataFrame:
        q = y.filter(F.col("vec_id") < _JL_NQ).select(
            F.col("vec_id").alias("query_id"), F.col(col).alias("qv")
        )
        c = spread(
            y.filter(F.col("vec_id") >= _JL_NQ).select(
                F.col("vec_id").alias("neighbor_id"), F.col(col).alias("cv")
            )
        )
        w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
        return (
            F.broadcast(q)
            .crossJoin(c)
            .select("query_id", "neighbor_id", _int_d2("qv", "cv").alias("d2"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _JL_K)
            .select("query_id", "neighbor_id")
        )

    exact = topk("q")
    approx = topk("y").withColumnRenamed("neighbor_id", "a_neighbor_id")
    return (
        exact.join(
            approx,
            (exact.query_id == approx.query_id)
            & (F.col("neighbor_id") == F.col("a_neighbor_id")),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count("a_neighbor_id").alias("hits"),
            (F.count("a_neighbor_id").cast("double") / _JL_K).alias("recall_at_k"),
        )
    )
