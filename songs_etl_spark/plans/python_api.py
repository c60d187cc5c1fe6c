"""Python extension-point families (SURVEY.md §2.7 names UDAF/UDTF as absent
from the reference): a Spark 4 Python UDTF (lateral table function) and a
grouped pandas UDAF (applyInPandas), each with an exact DuckDB oracle.

These are deliberately the ONLY row-at-a-time/Python-aggregate query
surfaces in the registry — the extension points themselves are what is being
covered; every operator that CAN be a JVM expression elsewhere is one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.plans._util import t
from songs_etl_spark.plans.registry import register

#: Tokens per UDTF chunk.
_CHUNK = 32


@register(
    "udtf_token_chunks",
    doc="Python UDTF (Spark 4): lateral 1→N token chunking with per-chunk digest",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS tok
            FROM documents
        ), sized AS (
            SELECT doc_id, tok,
                   CAST(CEIL(len(tok) / {_CHUNK}.0) AS BIGINT) AS n_chunks
            FROM toks WHERE len(tok) > 0
        ), chunks AS (
            SELECT doc_id, tok, CAST(unnest(range(n_chunks)) AS BIGINT) AS chunk_idx
            FROM sized
        )
        SELECT doc_id, chunk_idx,
               CAST(len(tok[chunk_idx * {_CHUNK} + 1 : LEAST(len(tok), (chunk_idx + 1) * {_CHUNK})]) AS BIGINT)
                   AS n_tokens,
               md5(array_to_string(
                   tok[chunk_idx * {_CHUNK} + 1 : LEAST(len(tok), (chunk_idx + 1) * {_CHUNK})],
                   ' ')) AS chunk_md5
        FROM chunks
    """,
)
def udtf_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk each document into {_CHUNK}-token windows via a registered
    Python UDTF invoked as a correlated LATERAL table function — the
    SQL-visible 1→N extension point (vs mapInPandas, the DataFrame-API one:
    plans/multimodal.py). The UDTF tokenizes with the SAME regex as
    functions/text.py, and the oracle reproduces chunk boundaries and md5s
    exactly, so the Python row fan-out is value-hash-checked end to end.

    Scale note: a UDTF is row-at-a-time Python — the right tool ONLY when
    the fan-out logic genuinely needs imperative Python visible from SQL;
    per-partition it streams (no materialized row list), parallelism
    inherits the scan, and no shuffle is introduced."""
    import hashlib
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, n_tokens: bigint, chunk_md5: string")
    class ChunkTokens:
        def eval(self, text: str):
            toks = [w for w in re.split(r"[^a-z0-9]+", (text or "").lower()) if w]
            for i in range(0, len(toks), _CHUNK):
                chunk = toks[i : i + _CHUNK]
                yield (
                    i // _CHUNK,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    spark.udtf.register("se_chunk_tokens", ChunkTokens)
    t(spark, sf_dir, "documents").createOrReplaceTempView("se_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_md5 "
        "FROM se_udtf_docs d, LATERAL se_chunk_tokens(d.text) c"
    )


@register(
    "udaf_price_trend_by_priority",
    doc="grouped pandas UDAF (applyInPandas): exact-integer OLS trend per order priority",
    oracle="""
        WITH pts AS (
            SELECT o_orderpriority,
                   date_diff('day', TIMESTAMP '1996-01-01', o_orderdate) AS x,
                   CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)) * 100) AS BIGINT) AS y
            FROM orders
        ), sums AS (
            -- HUGEINT accumulators: n*sxy at sf >= 0.1 exceeds BIGINT; the
            -- Spark side uses Python ints (arbitrary precision), so the
            -- oracle must stay exact too.
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS sx,
                   CAST(SUM(y) AS HUGEINT) AS sy,
                   CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                   CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
            FROM pts GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
               CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
                   AS slope_cents_per_day,
               (CAST(sy AS DOUBLE)
                - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_cents
        FROM sums
    """,
)
def udaf_price_trend_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority OLS of order value (cents) against order date (days) —
    a custom grouped aggregate that genuinely needs Python (closed-form
    linear algebra per group), expressed as applyInPandas: Spark computes
    the integer (x, y) features JVM-side, groups shuffle once on the key,
    and each group's pandas frame reduces to one row.

    Reproducibility discipline (matches clustering.py): all sums are exact
    64-bit integer arithmetic — Python ints, immune to partition order —
    and only the final slope/intercept arithmetic runs in doubles, mirrored
    operation-for-operation by the oracle SQL, so the comparison is exact
    with no rounding tolerance at all."""
    import pandas as pd

    o = t(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderpriority",
        F.datediff("o_orderdate", F.lit("1996-01-01").cast("timestamp_ntz")).alias("x"),
        F.round(F.col("o_totalprice").cast("decimal(18,4)") * 100)
        .cast("bigint")
        .alias("y"),
    )

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        n, sx, sy = len(xs), sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "n": [n],
                "slope_cents_per_day": [slope],
                "intercept_cents": [intercept],
            }
        )

    return pts.groupBy("o_orderpriority").applyInPandas(
        ols,
        schema="o_orderpriority string, n bigint, "
        "slope_cents_per_day double, intercept_cents double",
    )
