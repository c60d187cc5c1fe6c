"""Graph analytics over relational data: PageRank on the part co-purchase
graph.

The reference has no graph surface; this family generalizes its star-join
data into the iterative-algorithm shape a corpus-scale pipeline needs (link
analysis for source weighting, spam-domain scoring, crawl frontier
prioritization). Same engineering discipline as the k-means / connected-
components operators: fixed iteration count, deterministic integer-quantized
accumulation so distributed float sums are partition-order-independent, and
an unrolled-SQL DuckDB oracle verifying every rank bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.plans._util import t
from songs_etl_spark.plans.registry import register

#: Fixed power-iteration count and damping — pinned so the oracle can unroll.
PR_ITER = 3
PR_DAMP = "0.85"
PR_BASE = "0.15"
#: Contribution quantum: each edge contribution is floored to integer
#: nano-units before the in-neighbor sum, making the sum exact (ranks total
#: ~1.0, so sums stay far below 2^53) and therefore independent of both
#: partition order and engine.
PR_SCALE = "1000000000"


def _pagerank_oracle(n_iter: int = PR_ITER) -> str:
    head = f"""
        WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        pairs AS (
            SELECT DISTINCT a.p AS src, b.p AS dst
            FROM op a JOIN op b ON a.ok = b.ok AND a.p <> b.p
        ),
        deg AS (SELECT src, COUNT(*) AS d FROM pairs GROUP BY src),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
        r0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / nn.n AS r FROM deg, nn)"""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(
            f""",
        s{i} AS (
            SELECT p.dst,
                   SUM(FLOOR(r.r / CAST(d.d AS DOUBLE) * CAST({PR_SCALE} AS DOUBLE))) AS s
            FROM pairs p
            JOIN r{i - 1} r ON r.node = p.src
            JOIN deg d ON d.src = p.src
            GROUP BY p.dst
        ),
        r{i} AS (
            SELECT s{i}.dst AS node,
                   CAST('{PR_BASE}' AS DOUBLE) / nn.n
                   + CAST('{PR_DAMP}' AS DOUBLE) * (s{i}.s / CAST({PR_SCALE} AS DOUBLE)) AS r
            FROM s{i}, nn
        )"""
        )
    return head + "".join(steps) + f"""
        SELECT node AS part_key, r AS pagerank FROM r{n_iter}
    """


def pagerank(edges: DataFrame, n_iter: int = PR_ITER) -> DataFrame:
    """Power-iteration PageRank over a directed (src, dst) edge relation in
    which every node has out-degree ≥ 1 (a symmetrized co-occurrence graph
    satisfies this by construction — no dangling-mass term needed).

    Per iteration: contributions = rank/out-degree per edge, floored to
    integer nano-units map-side (exact, order-independent sums); one shuffle
    keyed by dst aggregates them; the rank update is a fixed scalar chain
    (single IEEE ops — bit-identical on any engine). Graph size never
    touches the driver beyond the node count (loop control, like the
    k-means round counter). For larger n_iter, interpose
    ``localCheckpoint`` every ~10 rounds to truncate lineage — the same
    discipline as operators/graph.py connected components."""
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("d")).persist()
    n_df = deg.agg(F.count("*").cast("double").alias("n"))
    ranks = (
        deg.select("src")
        .crossJoin(F.broadcast(n_df))
        .select(F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("r"))
    )
    scale = float(PR_SCALE)
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                "dst",
                F.floor(F.col("r") / F.col("d").cast("double") * F.lit(scale)).alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(n_df))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(float(PR_BASE)) / F.col("n")
                    + F.lit(float(PR_DAMP)) * (F.col("s").cast("double") / F.lit(scale))
                ).alias("r"),
            )
        )
    return ranks


@register(
    "pagerank_copurchase",
    doc="iterative link analysis: 3-round PageRank over the part co-purchase "
    "graph, integer-quantized contributions, unrolled-SQL oracle",
    oracle=_pagerank_oracle(),
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase graph: parts are nodes, an edge links
    two parts appearing in the same order (both directions — symmetric, so
    no dangling nodes). Edge build is one self-equi-join on l_orderkey of
    the distinct (order, part) relation — at 100 TB the per-order part
    lists are short (TPC-H ≤ 7), so the join fans out boundedly; a
    degree-capped variant (drop mega-orders like the dedup family's
    DF_CAP) is the guard if order sizes were unbounded.

    Every rank is a pure function of the input: contributions quantized to
    nano-units before summing (exact integer adds in any order), the rank
    update a fixed scalar expression chain. The DuckDB oracle unrolls the
    same three iterations and matches bit-for-bit."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return pagerank(edges).select(
        F.col("node").alias("part_key"), F.col("r").alias("pagerank")
    )
