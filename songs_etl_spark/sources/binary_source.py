"""Binary-file source: directories of media files → asset-struct DataFrames.

The reference never stores media bytes (its multimodal surface is the
pass-through album-art URL metadata, `cf_extract/main.py:270`); a training
pipeline does — and the idiomatic Spark ingest for a bucket of WAV/BMP/JPEG
objects is the built-in ``binaryFile`` format: a distributed file scan that
yields (path, modificationTime, length, content) without any Python in the
read path, supports path glob filters and partitioned directory layouts, and
parallelizes by file across executors.

``read_binary_assets`` normalizes that scan to the ASSET_SCHEMA struct the
multimodal operators consume (operators/multimodal.py), so
``files → decode → features`` is: read_binary_assets → audio_features /
image_features. Large-object caveat at scale: each file becomes one row;
keep per-file size under the Arrow batch budget (tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for multi-MB media)
and prefer many medium files over few giant ones — the scan's parallelism
is bounded by file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: file-extension → media type for the asset struct.
_MEDIA_TYPES = {
    "wav": "audio/wav",
    "bmp": "image/bmp",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "mp4": "video/mp4",
}


def read_binary_assets(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Scan a directory (or object-store prefix) of media files into asset
    structs: ``asset = {uri, media_type, height, width, payload}`` with
    media_type inferred from the file extension (NULL when unknown) and
    dimensions NULL until a decoder fills them.

    ``glob`` maps to the binaryFile ``pathGlobFilter`` option (e.g.
    ``*.wav``) — filtering happens at file-listing time, before any bytes
    are read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    media = F.create_map(
        *[F.lit(x) for kv in _MEDIA_TYPES.items() for x in kv]
    )[ext]
    return files.select(
        F.struct(
            F.col("path").alias("uri"),
            media.alias("media_type"),
            F.lit(None).cast("bigint").alias("height"),
            F.lit(None).cast("bigint").alias("width"),
            F.col("content").alias("payload"),
        ).alias("asset")
    )
