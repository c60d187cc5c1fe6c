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

from songs_etl_spark.operators.multimodal import (
    IMAGE_FEATURE_DIM,
    audio_features,
    frame_sample,
    image_features,
)
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


@register(
    "multimodal_frame_sample",
    doc="video-style frame sampling: mapInPandas 1->N fan-out over binary payloads",
    oracle="""
        WITH b AS (
            SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
                   encode(text) AS data
            FROM documents
        ), sized AS (
            SELECT uri, data,
                   LEAST(8, GREATEST(1, octet_length(data) // 1024)) AS n_frames
            FROM b WHERE octet_length(data) > 0
        ), frames AS (
            SELECT uri, data, CAST(unnest(range(n_frames)) AS BIGINT) AS i FROM sized
        )
        SELECT uri,
               i AS frame_index,
               i * 1024 AS frame_offset,
               substr(hex(data), i * 2048 + 1, 128) AS frame_hex
        FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents dressed as video-like binary assets, run through the 1->N
    frame sampler (operators/multimodal.py frame_sample): every sampled
    offset becomes a row carrying a fixed-size byte window. The stub decode
    is offset-deterministic, so DuckDB reproduces the exact frame bytes —
    compared in hex-string space because DuckDB can't substring BLOBs — and
    the whole Arrow fan-out path gets a value-hash check. At scale the
    sampler is the canonical shape for video: rows fan out inside the
    executor batch, no shuffle, output partitioning inherits the scan."""
    docs = spread(t(spark, sf_dir, "documents"))
    assets = docs.select(
        F.struct(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("uri"),
            F.lit("video/fake").alias("media_type"),
            F.lit(None).cast("bigint").alias("height"),
            F.lit(None).cast("bigint").alias("width"),
            F.encode("text", "UTF-8").alias("payload"),
        ).alias("asset")
    )
    frames = frame_sample(assets, every_n_bytes=1024, max_frames=8)
    return frames.select(
        "uri", "frame_index", "frame_offset", F.hex("frame_bytes").alias("frame_hex")
    )


_SAMPLE_EXPRS = ",\n               ".join(
    f"(CAST('0x' || substr(sha256(text), {2 * i + 1}, 2) AS INT) - 128) / 128.0 AS s{i}"
    for i in range(16)
)
_RMS_SUM = " + ".join(f"(s{i} * s{i})" for i in range(16))


@register(
    "multimodal_audio_features",
    doc="audio asset columns -> mapInPandas sample window + RMS energy, stubbed decode",
    oracle=f"""
        WITH decoded AS (
            SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
                   octet_length(encode(text)) AS n_bytes,
                   {_SAMPLE_EXPRS}
            FROM documents
        )
        SELECT uri, n_bytes,
               {", ".join(f"s{i}" for i in range(16))},
               SQRT(({_RMS_SUM}) / 16) AS rms
        FROM decoded
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents dressed as audio assets run through the mapInPandas sample
    extractor (operators/multimodal.py audio_features). The digest-derived
    fake samples are reproduced exactly by DuckDB (hex-pair -> int -> affine
    map), and the RMS is an explicit left-to-right sum on both engines, so
    the whole Python-side computation value-hashes — not just row counts."""
    docs = spread(t(spark, sf_dir, "documents"))
    assets = docs.select(
        F.struct(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("uri"),
            F.lit("audio/fake").alias("media_type"),
            F.lit(None).cast("bigint").alias("height"),
            F.lit(None).cast("bigint").alias("width"),
            F.encode("text", "UTF-8").alias("payload"),
        ).alias("asset")
    )
    feats = audio_features(assets, fake_decode=True)
    return feats.select(
        "uri",
        "n_bytes",
        *[F.col("samples")[i].alias(f"s{i}") for i in range(16)],
        "rms",
    )
