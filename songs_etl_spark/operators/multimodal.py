"""Multimodal (image/audio/video) column operators.

The reference's only multimodal surface is the pass-through Spotify album-art
metadata (`cf_extract/main.py:270` — ``album.images: [{url, height, width}]``).
This module generalizes that to the shape a 100 TB training-data pipeline
needs: assets as **opaque binary columns with typed metadata**, processed by
Arrow-batched ``mapInPandas`` operators.

Decode stubs
------------
The real decoders (PIL/ffmpeg/torchaudio) are not available in this
environment, so the byte→pixels/samples step is isolated behind
``decode_image`` / ``decode_audio``, which raise ``NotImplementedError``
unless ``fake=True`` substitutes a deterministic stand-in (a seeded digest of
the payload bytes). Everything Spark-side — schemas, Arrow batch iteration,
partition behavior, output contracts — is real and tested; swapping the stub
for a real decoder changes no plumbing.

Scale design: ``mapInPandas`` streams Arrow record batches, so a partition of
large binaries never materializes as one Python list; per-asset work is
embarrassingly parallel and the operator adds no shuffle. Batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it for
multi-MB payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: An asset column: opaque payload + typed metadata (the album-image struct
#: of cf_extract/main.py:270, generalized with the payload itself).
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image/jpeg, audio/wav, ...
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

IMAGE_FEATURE_DIM = 8

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Byte→feature decode. STUB: the container has no image codec libraries;
    ``fake=True`` returns a deterministic digest-derived vector with the same
    shape/dtype a real embedding would have."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(IMAGE_FEATURE_DIM)]


def image_features(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-asset feature extraction over Arrow batches (mapInPandas).

    Input: DataFrame with an ``asset`` struct column (ASSET_SCHEMA). Output:
    IMAGE_FEATURES_SCHEMA, one row per input row, order-independent."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            payloads = [bytes(p) if p is not None else b"" for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "uri": batch["uri"],
                    "n_bytes": [len(p) for p in payloads],
                    "content_sha": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "features": [decode_image(p, fake=fake_decode) for p in payloads],
                }
            )

    flat = assets.select(
        F.col("asset.uri").alias("uri"), F.col("asset.payload").alias("payload")
    )
    return flat.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_SAMPLE_DIM = 16

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("samples", T.ArrayType(T.DoubleType())),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio(payload: bytes, fake: bool = False) -> list[float]:
    """Byte→samples decode. STUB: no audio codec libraries in this
    environment; ``fake=True`` yields a deterministic digest-derived sample
    window with a real decoder's shape/dtype."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires a codec library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return [(digest[i] - 128) / 128.0 for i in range(AUDIO_SAMPLE_DIM)]


def audio_features(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-asset audio feature extraction (mapInPandas, 1→1): decoded sample
    window plus its RMS energy — the canonical first feature any audio
    pipeline derives. Same Arrow-batch contract as ``image_features``; a real
    torchaudio decoder drops in by replacing ``decode_audio`` only."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for batch in batches:
            payloads = [bytes(p) if p is not None else b"" for p in batch["payload"]]
            samples = [decode_audio(p, fake=fake_decode) for p in payloads]
            yield pd.DataFrame(
                {
                    "uri": batch["uri"],
                    "n_bytes": [len(p) for p in payloads],
                    "samples": samples,
                    "rms": [
                        math.sqrt(sum(x * x for x in s) / len(s)) for s in samples
                    ],
                }
            )

    flat = assets.select(
        F.col("asset.uri").alias("uri"), F.col("asset.payload").alias("payload")
    )
    return flat.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(assets: DataFrame, height: int = 64, width: int = 64) -> DataFrame:
    """Resize each image asset to ``height×width`` (mapInPandas, 1→1 rows).

    STUB decode: without a codec the 'resized payload' is a deterministic
    truncation/padding of the source bytes to h*w — the metadata handling,
    Arrow batch path, and output schema are exactly a real resizer's; a PIL
    ``Image.resize`` drops in by replacing the inner function only."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        size = height * width

        def fake_resize(data: bytes) -> bytes:
            return data[:size].ljust(size, b"\0")

        for batch in batches:
            payloads = [bytes(p) if p is not None else b"" for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "uri": batch["uri"],
                    "height": [height] * len(payloads),
                    "width": [width] * len(payloads),
                    "payload": [fake_resize(p) for p in payloads],
                }
            )

    flat = assets.select(
        F.col("asset.uri").alias("uri"), F.col("asset.payload").alias("payload")
    )
    return flat.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample(
    assets: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Deterministic frame sampling over binary payloads (mapInPandas, 1→N
    rows). Real video decoding is stubbed: a 'frame' is the fixed-size byte
    window at each sampled offset — the partitioning, fan-out shape, and
    batch contract are exactly those of a real ffmpeg-backed sampler."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            rows: dict[str, list] = {"uri": [], "frame_index": [], "frame_offset": [], "frame_bytes": []}
            for uri, payload in zip(batch["uri"], batch["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(1, len(data) // every_n_bytes) if data else 0)
                for i in range(n):
                    off = i * every_n_bytes
                    rows["uri"].append(uri)
                    rows["frame_index"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_bytes"].append(data[off : off + 64])
            yield pd.DataFrame(rows)

    flat = assets.select(
        F.col("asset.uri").alias("uri"), F.col("asset.payload").alias("payload")
    )
    return flat.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
