"""Multimodal query surface: the Arrow-batched mapInPandas feature-extraction
path (operators/multimodal.py) in the graded registry.

The oracle fully checks the Python-side computation: the stubbed decode is a
sha256-digest-derived vector, and DuckDB can reproduce it exactly (hex-pair →
int → /255.0 is bit-exact in both engines), so even the mapInPandas plumbing
gets a value-hash check rather than a rows-only pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.operators.multimodal import IMAGE_FEATURE_DIM, image_features
from songs_etl_spark.plans._util import spread, t
from songs_etl_spark.plans.registry import register

_FEATURE_COLS = ",\n               ".join(
    f"CAST('0x' || substr(sha256(text), {2 * i + 1}, 2) AS INT) / 255.0 AS f{i}"
    for i in range(IMAGE_FEATURE_DIM)
)


@register(
    "multimodal_image_features",
    doc="binary asset columns → mapInPandas (Arrow) feature extraction, stubbed decode",
    oracle=f"""
        SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS content_sha,
               {_FEATURE_COLS}
        FROM documents
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents dressed as binary assets (payload = utf-8 bytes), run through
    the real mapInPandas operator; the digest-derived fake features stand in
    for a decoder with identical schema/batch shape."""
    docs = spread(t(spark, sf_dir, "documents"))
    assets = docs.select(
        F.struct(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("uri"),
            F.lit("text/plain").alias("media_type"),
            F.lit(None).cast("bigint").alias("height"),
            F.lit(None).cast("bigint").alias("width"),
            F.encode("text", "UTF-8").alias("payload"),
        ).alias("asset")
    )
    feats = image_features(assets, fake_decode=True)
    return feats.select(
        "uri",
        "n_bytes",
        "content_sha",
        *[F.col("features")[i].alias(f"f{i}") for i in range(IMAGE_FEATURE_DIM)],
    )
