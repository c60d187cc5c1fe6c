"""Multimodal (image/audio/video) column operators.

The reference's only multimodal surface is the pass-through Spotify album-art
metadata (`cf_extract/main.py:270` — ``album.images: [{url, height, width}]``).
This module generalizes that to the shape a 100 TB training-data pipeline
needs: assets as **opaque binary columns with typed metadata**, processed by
Arrow-batched ``mapInPandas`` operators.

Decode paths
------------
The byte→pixels/samples step is isolated behind ``decode_image`` /
``decode_audio`` with two modes:

- **real** (default, ``fake=False``): dependency-free codecs from
  ``operators/codecs.py`` — stdlib ``wave`` for 16-bit PCM WAV, a
  hand-written 24-bit BMP parser. Actual container parsing runs inside the
  Arrow batches; a malformed payload becomes an ``error`` column value on
  that row (nulls elsewhere), never a task failure.
- **fake** (``fake=True``): a deterministic digest-derived stand-in kept for
  payloads with no container format (e.g. raw text dressed as an asset) and
  as the drop-in seam for heavy codecs (PIL/ffmpeg/torchaudio) not present
  in this environment — swapping those in changes no plumbing.

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

from songs_etl_spark.operators.codecs import decode_bmp, decode_wav

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
        T.StructField("error", T.StringType()),
    ]
)


def decode_pixels(payload: bytes) -> dict:
    """Container dispatch by magic bytes — BMP, PNG, and JPEG share the same
    decoded-pixel contract ``{width, height, pixels: [(r, g, b), ...]}``
    (row-major), so everything downstream is format-agnostic. Raises
    ``ValueError`` on bytes that aren't a supported container."""
    from songs_etl_spark.operators.codecs import _PNG_SIG

    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        from songs_etl_spark.operators.codecs import decode_png

        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from songs_etl_spark.operators.codecs import decode_jpeg

        return decode_jpeg(payload)
    return decode_bmp(payload)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Byte→feature decode, IMAGE_FEATURE_DIM floats.

    Real path: parse the payload as 24-bit BMP (``operators/codecs.py``) and
    return the canonical first image features — ``[width, height, n_pixels,
    mean_r, mean_g, mean_b, mean_rgb, aspect]``. Every float is an exact
    integer (or one exact-integer-sum divided once), so a SQL oracle
    reproduces the vector bit-for-bit. Raises ``ValueError`` on a payload
    that isn't valid BMP.

    Fake path: deterministic sha256-digest-derived vector with the same
    shape/dtype — for format-less payloads and as the seam where a heavy
    codec (PIL/JPEG) would drop in."""
    if fake:
        digest = hashlib.sha256(payload or b"").digest()
        return [digest[i] / 255.0 for i in range(IMAGE_FEATURE_DIM)]
    img = decode_pixels(payload)
    w, h, pixels = img["width"], img["height"], img["pixels"]
    n = w * h
    sum_r = sum(p[0] for p in pixels)
    sum_g = sum(p[1] for p in pixels)
    sum_b = sum(p[2] for p in pixels)
    return [
        float(w),
        float(h),
        float(n),
        sum_r / n,
        sum_g / n,
        sum_b / n,
        (sum_r + sum_g + sum_b) / (3 * n),
        w / h,
    ]


def image_features(assets: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Per-asset feature extraction over Arrow batches (mapInPandas).

    Input: DataFrame with an ``asset`` struct column (ASSET_SCHEMA). Output:
    IMAGE_FEATURES_SCHEMA, one row per input row, order-independent. A row
    whose payload fails to decode carries the failure in ``error`` (features
    null) — bad bytes are data, not task failures."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            payloads = [bytes(p) if p is not None else b"" for p in batch["payload"]]
            feats: list[list[float] | None] = []
            errors: list[str | None] = []
            for p in payloads:
                try:
                    feats.append(decode_image(p, fake=fake_decode))
                    errors.append(None)
                except ValueError as exc:
                    feats.append(None)
                    errors.append(str(exc))
            yield pd.DataFrame(
                {
                    "uri": batch["uri"],
                    "n_bytes": [len(p) for p in payloads],
                    "content_sha": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "features": feats,
                    "error": errors,
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
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("samples", T.ArrayType(T.DoubleType())),
        T.StructField("rms", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def decode_audio(payload: bytes, fake: bool = False) -> dict:
    """Byte→samples decode, returning ``{n_channels, sample_rate, samples}``
    with samples normalized to [-1, 1).

    Real path: stdlib ``wave`` parsing of 16-bit PCM RIFF/WAVE
    (``operators/codecs.py``); each sample is ``raw/32768.0`` — a dyadic
    rational a SQL oracle reproduces exactly from the raw int. Raises
    ``ValueError`` on non-WAV payloads.

    Fake path: digest-derived AUDIO_SAMPLE_DIM window, the seam where a
    heavy codec (mp3/flac via torchaudio/ffmpeg) would drop in."""
    if fake:
        digest = hashlib.sha256(payload or b"").digest()
        return {
            "n_channels": 1,
            "sample_rate": 0,
            "samples": [(digest[i] - 128) / 128.0 for i in range(AUDIO_SAMPLE_DIM)],
        }
    wav = decode_wav(payload)
    return {
        "n_channels": wav["n_channels"],
        "sample_rate": wav["sample_rate"],
        "samples": [s / 32768.0 for s in wav["samples"]],
    }


def audio_features(assets: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Per-asset audio feature extraction (mapInPandas, 1→1): decoded sample
    window plus its RMS energy — the canonical first feature any audio
    pipeline derives. Same Arrow-batch contract (and same error-column
    discipline) as ``image_features``.

    Determinism: int16 samples normalized by 2¹⁵ are exact dyadic floats, so
    the Python ``sum(x*x)`` is exact (every partial sum < 2⁵³ in scaled
    integer space) and the RMS is bit-identical to the oracle's
    ``sqrt(sum(raw²)/n/2³⁰)`` integer formulation regardless of summation
    order."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for batch in batches:
            payloads = [bytes(p) if p is not None else b"" for p in batch["payload"]]
            rows: dict[str, list] = {
                "uri": list(batch["uri"]),
                "n_bytes": [len(p) for p in payloads],
                "n_channels": [],
                "sample_rate": [],
                "samples": [],
                "rms": [],
                "error": [],
            }
            for p in payloads:
                try:
                    d = decode_audio(p, fake=fake_decode)
                    s = d["samples"]
                    rows["n_channels"].append(d["n_channels"])
                    rows["sample_rate"].append(d["sample_rate"])
                    rows["samples"].append(s)
                    rows["rms"].append(
                        math.sqrt(sum(x * x for x in s) / len(s)) if s else None
                    )
                    rows["error"].append(None)
                except ValueError as exc:
                    rows["n_channels"].append(None)
                    rows["sample_rate"].append(None)
                    rows["samples"].append(None)
                    rows["rms"].append(None)
                    rows["error"].append(str(exc))
            yield pd.DataFrame(rows)

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
        T.StructField("error", T.StringType()),
    ]
)


def resize_images(
    assets: DataFrame, height: int = 64, width: int = 64, fake_decode: bool = False
) -> DataFrame:
    """Resize each image asset to ``height×width`` (mapInPandas, 1→1 rows).

    Real path: decode the BMP payload, nearest-neighbor resample the pixel
    grid, re-encode as BMP — the output payload is itself a valid container
    a downstream ``image_features`` can decode. Rows whose payload isn't BMP
    carry the failure in ``error`` (payload null).

    Fake path (``fake_decode=True``): deterministic truncation/padding of
    the source bytes to h*w for format-less payloads — the seam where a PIL
    ``Image.resize`` would drop in for JPEG/PNG."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from songs_etl_spark.operators.codecs import decode_bmp, encode_bmp

        size = height * width

        def real_resize(data: bytes) -> bytes:
            img = decode_bmp(data)
            sw, sh, px = img["width"], img["height"], img["pixels"]
            out = [
                px[(y * sh // height) * sw + (x * sw // width)]
                for y in range(height)
                for x in range(width)
            ]
            return encode_bmp(width, height, out)

        for batch in batches:
            payloads = [bytes(p) if p is not None else b"" for p in batch["payload"]]
            resized: list[bytes | None] = []
            errors: list[str | None] = []
            for p in payloads:
                try:
                    resized.append(
                        p[:size].ljust(size, b"\0") if fake_decode else real_resize(p)
                    )
                    errors.append(None)
                except ValueError as exc:
                    resized.append(None)
                    errors.append(str(exc))
            yield pd.DataFrame(
                {
                    "uri": batch["uri"],
                    "height": [height] * len(payloads),
                    "width": [width] * len(payloads),
                    "payload": resized,
                    "error": errors,
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
