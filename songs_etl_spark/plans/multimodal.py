"""Multimodal query surface: the Arrow-batched mapInPandas feature-extraction
path (operators/multimodal.py) in the graded registry.

Two decode tiers, both value-hash-checked end to end:

- **Real decode** (``multimodal_wav_decode`` / ``multimodal_bmp_decode`` /
  ``multimodal_png_decode`` / ``multimodal_jpeg_decode``): payloads are
  genuine RIFF/WAVE, BMP, zlib-PNG, and baseline-JFIF JPEG containers
  synthesized deterministically from ``doc_id`` (operators/codecs.py
  encoders), decoded inside the Arrow batches by stdlib ``wave`` / the
  hand-written parsers. Because the synthesized sample/pixel values are
  pure integer arithmetic on ``doc_id`` (JPEG: the provably-exact
  block-constant class), DuckDB recomputes every decoded feature exactly —
  the oracle verifies real container round-trips, not a stand-in.
- **Digest stand-in** (the ``*_features`` / ``frame_sample`` queries):
  format-less payloads (utf-8 text dressed as assets) through the same
  operators with ``fake_decode=True``; sha256 hex-pair arithmetic is
  bit-exact in both engines, so the mapInPandas plumbing value-hashes too.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from songs_etl_spark.operators.multimodal import (
    IMAGE_FEATURE_DIM,
    audio_features,
    frame_sample,
    image_features,
    resize_images,
)
from songs_etl_spark.plans._util import spread, t
from songs_etl_spark.plans.registry import register

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

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
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
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
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
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
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
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


# ---------------------------------------------------------------------------
# Real container decode: WAV / BMP payloads synthesized from doc_id
# ---------------------------------------------------------------------------

#: Deterministic payload formulas — shared (by construction, not import)
#: with the DuckDB oracles below, which recompute the same integers in SQL.
WAV_N_SAMPLES = 64
WAV_SAMPLE_RATE = 8000


def wav_samples_for(doc_id: int) -> list[int]:
    """Raw int16 samples for a doc: ((doc_id*31 + i*17) % 65536) - 32768."""
    return [((doc_id * 31 + i * 17) % 65536) - 32768 for i in range(WAV_N_SAMPLES)]


def bmp_spec_for(doc_id: int) -> tuple[int, int, list[tuple[int, int, int]]]:
    """(width, height, row-major RGB pixels) for a doc — small per-doc
    dimensions, channel values pure modular arithmetic on (doc_id, x, y)."""
    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    pixels = [
        (
            (doc_id + 7 * x + 13 * y) % 256,
            (3 * doc_id + 11 * x + 5 * y) % 256,
            (7 * doc_id + 3 * x + 17 * y) % 256,
        )
        for y in range(h)
        for x in range(w)
    ]
    return w, h, pixels


def synth_wav_assets(docs: DataFrame) -> DataFrame:
    """(uri, payload) with payload a real RIFF/WAVE file per doc — the
    encode half of the round-trip, mapInPandas like the decode half."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from songs_etl_spark.operators.codecs import encode_wav

        for batch in batches:
            ids = [int(i) for i in batch["doc_id"]]
            yield pd.DataFrame(
                {
                    "uri": [f"doc://{i}" for i in ids],
                    "payload": [
                        encode_wav(wav_samples_for(i), WAV_SAMPLE_RATE) for i in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(run, "uri string, payload binary")


def synth_bmp_assets(docs: DataFrame) -> DataFrame:
    """(uri, payload) with payload a real 24-bit BMP file per doc."""
    from songs_etl_spark.operators.codecs import encode_bmp

    return _synth_image_assets(docs, lambda i, w, h, px: encode_bmp(w, h, px))


def _as_assets(flat: DataFrame, media_type: str) -> DataFrame:
    return flat.select(
        F.struct(
            F.col("uri"),
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("bigint").alias("height"),
            F.lit(None).cast("bigint").alias("width"),
            F.col("payload"),
        ).alias("asset")
    )


@register(
    "multimodal_wav_decode",
    doc="REAL audio decode: synthesized RIFF/WAVE payloads parsed by stdlib wave "
    "inside mapInPandas; oracle recomputes every decoded sample from doc_id",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, CAST(u.i AS BIGINT) AS i,
                   ((doc_id * 31 + CAST(u.i AS BIGINT) * 17) % 65536) - 32768 AS v
            FROM documents, LATERAL (SELECT unnest(range({WAV_N_SAMPLES})) AS i) u
        ), agg AS (
            SELECT doc_id, SUM(v * v) AS ssq FROM raw GROUP BY doc_id
        )
        SELECT 'doc://' || CAST(d.doc_id AS VARCHAR) AS uri,
               CAST(44 + 2 * {WAV_N_SAMPLES} AS BIGINT) AS n_bytes,
               CAST(1 AS BIGINT) AS n_channels,
               CAST({WAV_SAMPLE_RATE} AS BIGINT) AS sample_rate,
               CAST({WAV_N_SAMPLES} AS BIGINT) AS n_samples,
               (((d.doc_id * 31 + 0 * 17) % 65536) - 32768) / 32768.0 AS s0,
               (((d.doc_id * 31 + 1 * 17) % 65536) - 32768) / 32768.0 AS s1,
               (((d.doc_id * 31 + 2 * 17) % 65536) - 32768) / 32768.0 AS s2,
               (((d.doc_id * 31 + 3 * 17) % 65536) - 32768) / 32768.0 AS s3,
               SQRT(CAST(a.ssq AS DOUBLE) / {WAV_N_SAMPLES} / 1073741824.0) AS rms,
               CAST(NULL AS VARCHAR) AS error
        FROM documents d JOIN agg a USING (doc_id)
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through a REAL audio container: per-doc int16 samples →
    stdlib-``wave``-encoded RIFF/WAVE payload → ``audio_features`` with the
    real decoder (no stub branch). The oracle recomputes header-derived
    metadata (n_bytes from the 44-byte canonical header, channel count,
    rate), the first four decoded samples, and the RMS — any parsing or
    normalization error on either side fails the value hash. RMS matches
    bit-for-bit because int16/2¹⁵ samples make every float step exact
    (see audio_features docstring)."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
    feats = audio_features(_as_assets(synth_wav_assets(docs), "audio/wav"), fake_decode=False)
    return feats.select(
        "uri",
        "n_bytes",
        "n_channels",
        "sample_rate",
        F.size("samples").cast("bigint").alias("n_samples"),
        *[F.col("samples")[i].alias(f"s{i}") for i in range(4)],
        "rms",
        "error",
    )


@register(
    "multimodal_bmp_decode",
    doc="REAL image decode: synthesized 24-bit BMP payloads parsed by the "
    "hand-written decoder inside mapInPandas; oracle recomputes dimensions and "
    "channel means from doc_id",
    oracle="""
        WITH dims AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
        ), px AS (
            SELECT doc_id, w, h, CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
            FROM dims,
                 LATERAL (SELECT unnest(range(w)) AS x) xs,
                 LATERAL (SELECT unnest(range(h)) AS y) ys
        ), agg AS (
            SELECT doc_id, ANY_VALUE(w) AS w, ANY_VALUE(h) AS h, COUNT(*) AS n,
                   SUM((doc_id + 7 * x + 13 * y) % 256) AS sr,
                   SUM((3 * doc_id + 11 * x + 5 * y) % 256) AS sg,
                   SUM((7 * doc_id + 3 * x + 17 * y) % 256) AS sb
            FROM px GROUP BY doc_id
        )
        SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
               CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
               CAST(w AS DOUBLE) AS width,
               CAST(h AS DOUBLE) AS height,
               CAST(n AS DOUBLE) AS n_pixels,
               CAST(sr AS DOUBLE) / n AS mean_r,
               CAST(sg AS DOUBLE) / n AS mean_g,
               CAST(sb AS DOUBLE) / n AS mean_b,
               CAST(sr + sg + sb AS DOUBLE) / (3 * n) AS mean_rgb,
               CAST(w AS DOUBLE) / CAST(h AS DOUBLE) AS aspect,
               CAST(NULL AS VARCHAR) AS error
        FROM agg
    """,
)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through a REAL image container: per-doc RGB grid →
    hand-encoded 24-bit BMP payload (bottom-up rows, 4-byte padding) →
    ``image_features`` with the real decoder (no stub branch). n_bytes checks
    the encoder's header+stride math; width/height/means check the decoder's
    row-order and BGR→RGB handling — a transposed row order or swapped
    channel would flip the means and fail the hash. Means are exact-int-sum ÷
    count, bit-identical across engines."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
    feats = image_features(_as_assets(synth_bmp_assets(docs), "image/bmp"), fake_decode=False)
    names = ("width", "height", "n_pixels", "mean_r", "mean_g", "mean_b", "mean_rgb", "aspect")
    return feats.select(
        "uri",
        "n_bytes",
        *[F.col("features")[i].alias(names[i]) for i in range(IMAGE_FEATURE_DIM)],
        "error",
    )


def _synth_image_assets(docs: DataFrame, encode_for_doc) -> DataFrame:
    """(uri, payload) frame shared by the image-container synthesizers:
    ``encode_for_doc(doc_id, w, h, pixels) -> bytes`` supplies the format."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            ids = [int(i) for i in batch["doc_id"]]
            payloads = []
            for i in ids:
                w, h, px = bmp_spec_for(i)
                payloads.append(encode_for_doc(i, w, h, px))
            yield pd.DataFrame({"uri": [f"doc://{i}" for i in ids], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, "uri string, payload binary")


def synth_png_assets(docs: DataFrame) -> DataFrame:
    """Real zlib PNG per doc; the scanline filter type cycles doc_id % 5 so
    the corpus exercises every PNG unfilter path (None/Sub/Up/Average/
    Paeth)."""
    from songs_etl_spark.operators.codecs import encode_png

    return _synth_image_assets(
        docs, lambda i, w, h, px: encode_png(w, h, px, filter_type=i % 5)
    )


def jpeg_spec_for(doc_id: int) -> tuple[int, int, list[int]]:
    """(width, height, row-major grayscale pixels) for a doc's JPEG fixture:
    8×8-BLOCK-constant values — the one image class whose lossy-codec
    round-trip is provably bit-exact (a constant block has only a DC
    coefficient; with the quality-100 all-ones quant table the whole
    encode→decode chain is powers-of-two scaling of integers, so the
    decoder returns the input exactly and a SQL oracle can recompute every
    channel mean from doc_id). Block (bx, by) = (doc_id + 11·bx + 23·by)
    % 256."""
    w, h = 8 * (1 + doc_id % 3), 8 * (1 + doc_id % 2)
    gray = [
        (doc_id + 11 * (x // 8) + 23 * (y // 8)) % 256
        for y in range(h)
        for x in range(w)
    ]
    return w, h, gray


def synth_jpeg_assets(docs: DataFrame) -> DataFrame:
    """(uri, payload) with payload a real baseline-JFIF JPEG per doc."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from songs_etl_spark.operators.codecs import encode_jpeg_gray

        for batch in batches:
            ids = [int(i) for i in batch["doc_id"]]
            payloads = []
            for i in ids:
                w, h, gray = jpeg_spec_for(i)
                payloads.append(encode_jpeg_gray(w, h, gray, quality=100))
            yield pd.DataFrame({"uri": [f"doc://{i}" for i in ids], "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, "uri string, payload binary")


@register(
    "multimodal_jpeg_decode",
    doc="REAL lossy-codec decode: baseline JFIF JPEG payloads (DCT + "
    "quantization + huffman entropy coding, public T.81 spec) parsed by "
    "the hand-written decoder inside mapInPandas; block-constant fixtures "
    "make the round-trip bit-exact so the oracle recomputes every channel "
    "mean from doc_id",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
            FROM documents
        ), blocks AS (
            SELECT doc_id, bw, bh, CAST(xs.bx AS BIGINT) AS bx, CAST(ys.by AS BIGINT) AS by
            FROM dims,
                 LATERAL (SELECT unnest(range(bw)) AS bx) xs,
                 LATERAL (SELECT unnest(range(bh)) AS by) ys
        ), agg AS (
            SELECT doc_id, ANY_VALUE(bw) AS bw, ANY_VALUE(bh) AS bh,
                   COUNT(*) AS nb,
                   SUM((doc_id + 11 * bx + 23 * by) % 256) * 64 AS sv
            FROM blocks GROUP BY doc_id
        )
        SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
               CAST(8 * bw AS DOUBLE) AS width,
               CAST(8 * bh AS DOUBLE) AS height,
               CAST(64 * nb AS DOUBLE) AS n_pixels,
               CAST(sv AS DOUBLE) / (64 * nb) AS mean_r,
               CAST(sv AS DOUBLE) / (64 * nb) AS mean_g,
               CAST(sv AS DOUBLE) / (64 * nb) AS mean_b,
               CAST(sv + sv + sv AS DOUBLE) / (3 * 64 * nb) AS mean_rgb,
               CAST(8 * bw AS DOUBLE) / CAST(8 * bh AS DOUBLE) AS aspect,
               CAST(NULL AS VARCHAR) AS error
        FROM agg
    """,
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through a real LOSSY codec: per-doc block-constant
    grayscale grid → hand-written baseline-JFIF encoder (float 2D DCT,
    quality-100 Annex K quantization, DC-diff/AC-runlength huffman with
    byte stuffing) → ``image_features`` with the general baseline decoder
    (marker parse, huffman entropy decode, dequant, de-zigzag, float IDCT).
    The fixtures are the provably-exact class for a lossy codec (DC-only
    blocks, all-ones quant — see jpeg_spec_for), so decoded dimensions and
    exact-integer channel means value-hash against the oracle; entropy
    stream length (n_bytes) is deliberately not part of the contract.
    Closes the ``image/jpeg`` claim of sources/binary_source.py's media
    map with a real decode path."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
    feats = image_features(_as_assets(synth_jpeg_assets(docs), "image/jpeg"), fake_decode=False)
    names = ("width", "height", "n_pixels", "mean_r", "mean_g", "mean_b", "mean_rgb", "aspect")
    return feats.select(
        "uri",
        *[F.col("features")[i].alias(names[i]) for i in range(IMAGE_FEATURE_DIM)],
        "error",
    )


@register(
    "multimodal_png_decode",
    doc="REAL compressed-image decode: zlib PNG payloads (filter type "
    "cycling over all five per doc_id%5) parsed by the hand-written "
    "decoder inside mapInPandas; oracle recomputes every channel mean "
    "from doc_id",
    oracle="""
        WITH dims AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
        ), px AS (
            SELECT doc_id, w, h, CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
            FROM dims,
                 LATERAL (SELECT unnest(range(w)) AS x) xs,
                 LATERAL (SELECT unnest(range(h)) AS y) ys
        ), agg AS (
            SELECT doc_id, ANY_VALUE(w) AS w, ANY_VALUE(h) AS h, COUNT(*) AS n,
                   SUM((doc_id + 7 * x + 13 * y) % 256) AS sr,
                   SUM((3 * doc_id + 11 * x + 5 * y) % 256) AS sg,
                   SUM((7 * doc_id + 3 * x + 17 * y) % 256) AS sb
            FROM px GROUP BY doc_id
        )
        SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
               CAST(w AS DOUBLE) AS width,
               CAST(h AS DOUBLE) AS height,
               CAST(n AS DOUBLE) AS n_pixels,
               CAST(sr AS DOUBLE) / n AS mean_r,
               CAST(sg AS DOUBLE) / n AS mean_g,
               CAST(sb AS DOUBLE) / n AS mean_b,
               CAST(sr + sg + sb AS DOUBLE) / (3 * n) AS mean_rgb,
               CAST(w AS DOUBLE) / CAST(h AS DOUBLE) AS aspect,
               CAST(NULL AS VARCHAR) AS error
        FROM agg
    """,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through a COMPRESSED real image container: the same per-doc
    RGB grid as the BMP twin, but encoded as a zlib PNG whose scanline
    filter cycles through all five spec filters across the corpus — decode
    must undo DEFLATE and every unfilter (Sub/Up/Average/Paeth reference
    earlier bytes and the previous scanline, so a single off-by-one row or
    byte order corrupts every downstream mean and fails the hash). n_bytes
    is zlib-stream-dependent and deliberately not part of the contract;
    decoded dimensions and exact-integer channel means are."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
    feats = image_features(_as_assets(synth_png_assets(docs), "image/png"), fake_decode=False)
    names = ("width", "height", "n_pixels", "mean_r", "mean_g", "mean_b", "mean_rgb", "aspect")
    return feats.select(
        "uri",
        *[F.col("features")[i].alias(names[i]) for i in range(IMAGE_FEATURE_DIM)],
        "error",
    )


@register(
    "multimodal_image_resize",
    doc="REAL image resize round-trip: BMP decode -> nearest-neighbor "
    "resample -> BMP re-encode -> re-decode, channel means value-checked; "
    "oracle recomputes the resample's source-index mapping from doc_id",
    oracle="""
        WITH dims AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
        ), px AS (
            SELECT doc_id,
                   (CAST(xs.x AS BIGINT) * w) // 8 AS sx,
                   (CAST(ys.y AS BIGINT) * h) // 6 AS sy
            FROM dims,
                 LATERAL (SELECT unnest(range(8)) AS x) xs,
                 LATERAL (SELECT unnest(range(6)) AS y) ys
        ), agg AS (
            SELECT doc_id, COUNT(*) AS n,
                   SUM((doc_id + 7 * sx + 13 * sy) % 256) AS sr,
                   SUM((3 * doc_id + 11 * sx + 5 * sy) % 256) AS sg,
                   SUM((7 * doc_id + 3 * sx + 17 * sy) % 256) AS sb
            FROM px GROUP BY doc_id
        )
        SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
               CAST(8 AS BIGINT) AS out_w,
               CAST(6 AS BIGINT) AS out_h,
               CAST(sr AS DOUBLE) / n AS mean_r,
               CAST(sg AS DOUBLE) / n AS mean_g,
               CAST(sb AS DOUBLE) / n AS mean_b,
               CAST(NULL AS VARCHAR) AS error
        FROM agg
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The preprocessing step every vision-language pipeline runs at corpus
    scale, value-checked end to end THROUGH the container format: per-doc
    synthetic 24-bit BMP → ``resize_images`` (real decode, nearest-neighbor
    resample to 8×6, real re-encode — one Arrow map pass) → the resized
    payload is itself decoded again by ``image_features`` and its channel
    means hashed against the oracle, which replays the resampler's exact
    source-index mapping (src = (dst · src_dim) // dst_dim, pure integer
    arithmetic) over the fixture pixel formulas. A transposed row order,
    off-by-one index map, stride bug, or channel swap in EITHER codec pass
    flips a mean and fails the hash. Means are exact-int sums ÷ 48 — bit
    identical across engines. Two chained map-side Arrow passes, no
    shuffle: the 100 TB shape for bulk media preprocessing."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
    resized = resize_images(
        _as_assets(synth_bmp_assets(docs), "image/bmp"), height=6, width=8
    )
    feats = image_features(
        _as_assets(resized.select("uri", "payload"), "image/bmp"),
        fake_decode=False,
    )
    return feats.select(
        "uri",
        F.col("features")[0].cast("bigint").alias("out_w"),
        F.col("features")[1].cast("bigint").alias("out_h"),
        F.col("features")[3].alias("mean_r"),
        F.col("features")[4].alias("mean_g"),
        F.col("features")[5].alias("mean_b"),
        "error",
    )


# --- 8-point DFT spectral features over REAL decoded audio ------------------

#: 8-point DFT geometry: every twiddle cos(π·j/4) / sin(π·j/4) lies in
#: {0, ±1, ±√2/2} — five exact double literals shared VERBATIM between the
#: Spark expression tree and the SQL oracle, so both engines run the same
#: product/left-assoc-sum chain on the same exact dyadic samples
#: (int16 / 2¹⁵) and agree bit-for-bit with no rounding step.
_DFT_N = 8
_DFT_R = 0.7071067811865476  # repr(math.sqrt(0.5)) — nearest double to √2/2
_DFT_COS = (1.0, _DFT_R, 0.0, -_DFT_R, -1.0, -_DFT_R, 0.0, _DFT_R)
_DFT_SIN = (0.0, _DFT_R, 1.0, _DFT_R, 0.0, -_DFT_R, -1.0, -_DFT_R)
#: Power bins kept: k = 0..4 (a real signal's spectrum is conjugate-
#: symmetric, so bins 5..7 mirror 3..1).
_DFT_BINS = 5


def _dft_sql() -> str:
    def s(i: int) -> str:
        return f"((((doc_id * 31 + {i} * 17) % 65536) - 32768) / 32768.0)"

    def fold(table) -> dict[int, str]:
        out = {}
        for k in range(_DFT_BINS):
            expr = f"({s(0)} * {table[0]!r})"
            for i in range(1, _DFT_N):
                expr = f"({expr} + ({s(i)} * {table[(k * i) % _DFT_N]!r}))"
            out[k] = expr
        return out

    re, im = fold(_DFT_COS), fold(_DFT_SIN)
    p = {k: f"(({re[k]} * {re[k]}) + ({im[k]} * {im[k]}))" for k in range(_DFT_BINS)}
    num = f"((((1.0 * p1) + (2.0 * p2)) + (3.0 * p3)) + (4.0 * p4))"
    den = "(((p1 + p2) + p3) + p4)"
    cols = ", ".join(f"{p[k]} AS p{k}" for k in range(_DFT_BINS))
    return f"""
        WITH spec AS (
            SELECT doc_id, {cols} FROM documents
        )
        SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
               p0, p1, p2, p3, p4,
               CASE WHEN {den} = 0 THEN NULL
                    ELSE {num} / {den} END AS spectral_centroid
        FROM spec
    """


@register(
    "multimodal_audio_dft",
    doc="REAL signal processing over decoded audio: 8-point DFT power "
    "spectrum + spectral centroid, exact-twiddle expression chain "
    "bit-matched between engines",
    oracle=_dft_sql(),
)
def multimodal_audio_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral feature extraction — the step after decode in any audio
    curation pipeline (voice-activity gating, music/speech routing,
    dataset spectral statistics): an 8-point DFT over the first frame of
    each REAL RIFF/WAVE payload, emitting the 5 non-redundant power bins
    and the spectral centroid Σk·Pk / ΣPk.

    The decode is the same stdlib-``wave`` mapInPandas pass as
    multimodal_wav_decode (Arrow batches, error-column discipline); the
    DFT itself runs JVM-side as a whole-stage-codegen expression tree over
    ``samples[i]`` — for N = 8 every twiddle factor is one of five exact
    double literals (0, ±1, ±√2/2), so the transform is 80 multiplies +
    70 adds per row, embarrassingly parallel, no shuffle at any corpus
    size. The oracle re-derives the samples from doc_id (the WAV synth is
    pure integer arithmetic) and runs the IDENTICAL literal chain — both
    engines produce bit-equal doubles, no rounding needed (the one
    guarded edge: an all-zero AC spectrum yields NULL centroid on both
    sides)."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
    feats = audio_features(
        _as_assets(synth_wav_assets(docs), "audio/wav"), fake_decode=False
    )

    def fold(table, k: int) -> F.Column:
        expr = F.col("samples")[0] * F.lit(table[0])
        for i in range(1, _DFT_N):
            expr = expr + (F.col("samples")[i] * F.lit(table[(k * i) % _DFT_N]))
        return expr

    spec = feats.select(
        "uri",
        *[
            (
                (fold(_DFT_COS, k) * fold(_DFT_COS, k))
                + (fold(_DFT_SIN, k) * fold(_DFT_SIN, k))
            ).alias(f"p{k}")
            for k in range(_DFT_BINS)
        ],
    )
    num = (
        (F.lit(1.0) * F.col("p1") + F.lit(2.0) * F.col("p2"))
        + F.lit(3.0) * F.col("p3")
    ) + F.lit(4.0) * F.col("p4")
    den = ((F.col("p1") + F.col("p2")) + F.col("p3")) + F.col("p4")
    return spec.select(
        "uri",
        "p0", "p1", "p2", "p3", "p4",
        F.when(den == F.lit(0.0), F.lit(None).cast("double"))
        .otherwise(num / den)
        .alias("spectral_centroid"),
    )


# --- Perceptual-hash (aHash) image near-duplicate detection ------------------

#: Hamming tolerance and band geometry for the aHash near-dup join: a pair
#: differing in ≤ _PHASH_T bits cannot differ in all _PHASH_BANDS bands
#: (pigeonhole, T < bands), so the banded equi-join is LOSSLESS for the
#: verified predicate — the exact popcount check on candidates reproduces
#: the all-pairs oracle bit-for-bit. Hashes carry ≤ 48 bits (max 8×6 image),
#: banded as 5 × 10-bit slices.
_PHASH_T = 4
_PHASH_BANDS = 5
_PHASH_BAND_BITS = 10


def _image_ahash(docs: DataFrame) -> DataFrame:
    """(doc_id, w, h, ahash) via a REAL encode→decode round-trip: synthesize
    the BMP payload, parse it back with the hand-written decoder, then fold
    the decoded grayscale grid into an average-hash — bit p (= y·w + x) set
    iff gray·n > Σgray (integer cross-multiplication; no division, no
    floats anywhere)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from songs_etl_spark.operators.codecs import decode_bmp, encode_bmp

        for batch in batches:
            out = {"doc_id": [], "w": [], "h": [], "ahash": []}
            for i in batch["doc_id"]:
                doc_id = int(i)
                w, h, px = bmp_spec_for(doc_id)
                d = decode_bmp(encode_bmp(w, h, px))
                grays = [r + g + b for (r, g, b) in d["pixels"]]
                n, s = len(grays), sum(grays)
                hash_val = 0
                for p, gray in enumerate(grays):
                    if gray * n > s:
                        hash_val |= 1 << p
                out["doc_id"].append(doc_id)
                out["w"].append(d["width"])
                out["h"].append(d["height"])
                out["ahash"].append(hash_val)
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(run, "doc_id long, w int, h int, ahash long")


@register(
    "multimodal_image_phash_neardup",
    doc="image near-dup at scale: average-hash over REAL decoded BMP grids, "
    "lossless Hamming banding (5×10-bit), exact popcount verify",
    oracle=f"""
        WITH dims AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
        ),
        px AS (
            SELECT doc_id, w, h, CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y,
                   ((doc_id + 7 * xs.x + 13 * ys.y) % 256)
                   + ((3 * doc_id + 11 * xs.x + 5 * ys.y) % 256)
                   + ((7 * doc_id + 3 * xs.x + 17 * ys.y) % 256) AS gray
            FROM dims,
                 LATERAL (SELECT unnest(range(w)) AS x) xs,
                 LATERAL (SELECT unnest(range(h)) AS y) ys
        ),
        tot AS (
            SELECT doc_id, COUNT(*) AS n, SUM(gray) AS sg FROM px GROUP BY doc_id
        ),
        hashes AS (
            SELECT p.doc_id, ANY_VALUE(p.w) AS w, ANY_VALUE(p.h) AS h,
                   CAST(SUM(CASE WHEN p.gray * t.n > t.sg
                            THEN CAST(1 AS BIGINT) << CAST(p.y * p.w + p.x AS INT)
                            ELSE 0 END) AS BIGINT) AS ahash
            FROM px p JOIN tot t USING (doc_id)
            GROUP BY p.doc_id
        )
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
        FROM hashes a JOIN hashes b
          ON a.w = b.w AND a.h = b.h AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.ahash, b.ahash)) <= {_PHASH_T}
    """,
)
def multimodal_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection over image columns — the
    multimodal twin of the text near-dup family (LAION-style pipelines
    dedup billions of images this way before training): every image is
    folded to a perceptual average-hash (aHash: bit per pixel, set iff
    the pixel's grayscale exceeds the image mean), and near-dups are
    pairs of same-shape images within Hamming distance _PHASH_T.

    Scale shape — the same discipline as dedup_simhash_hamming: the hash
    is computed in one Arrow map pass over REAL decoded payloads
    (encode→decode round-trip through the BMP codec, so a parser
    regression upstream breaks this hash too); candidate pairs come from
    a banded equi-join on (w, h, band, 10-bit slice) — pigeonhole-lossless
    for T < bands, so the exact popcount verify emits EXACTLY the
    all-pairs oracle's rows without ever enumerating non-colliding pairs.
    Everything after decode is integer arithmetic (cross-multiplied mean
    compare, shifts, xor/popcount) — bit-identical across engines by
    construction."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
    from songs_etl_spark.plans._util import track_persist

    hashes = track_persist(_image_ahash(docs))
    bands = hashes.select(
        "doc_id", "w", "h", "ahash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.shiftright("ahash", j * _PHASH_BAND_BITS)
                    .bitwiseAND(F.lit((1 << _PHASH_BAND_BITS) - 1))
                    .alias("bval"),
                )
                for j in range(_PHASH_BANDS)
            ])
        ).alias("bb"),
    ).select("doc_id", "w", "h", "ahash", "bb.band", "bb.bval")
    left = bands.select(
        F.col("doc_id").alias("da"), "w", "h", F.col("ahash").alias("ha"),
        "band", "bval",
    )
    right = bands.select(
        F.col("doc_id").alias("db"), "w", "h", F.col("ahash").alias("hb"),
        "band", "bval",
    )
    cand = (
        left.join(right, ["w", "h", "band", "bval"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.filter(ham <= _PHASH_T).select(
        "da", "db", ham.cast("int").alias("hamming")
    )


def _sobel_gray_sql(xe: str, ye: str) -> str:
    """The synthesized grayscale value g(x, y) = r+g+b as a SQL expression
    (the bmp_spec_for pixel formulas, summed)."""
    return (
        f"(((doc_id + 7 * ({xe}) + 13 * ({ye})) % 256)"
        f" + ((3 * doc_id + 11 * ({xe}) + 5 * ({ye})) % 256)"
        f" + ((7 * doc_id + 3 * ({xe}) + 17 * ({ye})) % 256))"
    )


def _sobel_oracle() -> str:
    g = _sobel_gray_sql
    gx = (
        f"({g('x + 1', 'y - 1')} + 2 * {g('x + 1', 'y')} + {g('x + 1', 'y + 1')})"
        f" - ({g('x - 1', 'y - 1')} + 2 * {g('x - 1', 'y')} + {g('x - 1', 'y + 1')})"
    )
    gy = (
        f"({g('x - 1', 'y + 1')} + 2 * {g('x', 'y + 1')} + {g('x + 1', 'y + 1')})"
        f" - ({g('x - 1', 'y - 1')} + 2 * {g('x', 'y - 1')} + {g('x + 1', 'y - 1')})"
    )
    return f"""
        WITH dims AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
        ),
        interior AS (
            SELECT doc_id, w, h,
                   CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
            FROM dims,
                 LATERAL (SELECT unnest(range(1, w - 1)) AS x) xs,
                 LATERAL (SELECT unnest(range(1, h - 1)) AS y) ys
        )
        SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
               CAST(ANY_VALUE(w) AS INT) AS width,
               CAST(ANY_VALUE(h) AS INT) AS height,
               CAST(COUNT(*) AS BIGINT) AS n_interior,
               CAST(SUM(ABS({gx}) + ABS({gy})) AS BIGINT) AS sobel_l1,
               CAST(SUM(ABS({gx}) + ABS({gy})) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS edge_density
        FROM interior GROUP BY doc_id
    """


@register(
    "multimodal_image_sobel",
    doc="image feature extraction: Sobel L1 edge energy over REAL decoded "
    "BMP grids in pure integer convolution, analytic oracle over the "
    "fixture pixel formulas",
    oracle=_sobel_oracle(),
)
def multimodal_image_sobel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-energy scoring — the first real convolution of any vision
    preprocessing stack (blur detection, quality gating, saliency
    pre-filters all start here). Each document's synthesized 24-bit BMP
    is round-tripped through the real encoder+decoder inside one Arrow
    mapInPandas pass, the decoded RGB grid folds to integer grayscale
    (r+g+b), and the 3×3 Sobel kernels accumulate |Gx|+|Gy| over interior
    pixels — all integer arithmetic, so the per-image energy is exact and
    the DuckDB oracle can recompute it ANALYTICALLY from the fixture's
    modular pixel formulas (a transposed decode or off-by-one border
    would shift every energy).

    Scale shape: zero shuffles — synthesize/decode/convolve is map-only;
    per-image cost is O(w·h), Arrow-batched. The final density is one
    exact-int division (registry rule 2)."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from songs_etl_spark.operators.codecs import decode_bmp, encode_bmp

        for batch in batches:
            out = {
                "uri": [],
                "width": [],
                "height": [],
                "n_interior": [],
                "sobel_l1": [],
            }
            for i in batch["doc_id"]:
                doc_id = int(i)
                w, h, px = bmp_spec_for(doc_id)
                d = decode_bmp(encode_bmp(w, h, px))
                gw, gh = d["width"], d["height"]
                gray = [r + g + b for (r, g, b) in d["pixels"]]

                def gval(x: int, y: int) -> int:
                    return gray[y * gw + x]

                energy = 0
                for y in range(1, gh - 1):
                    for x in range(1, gw - 1):
                        gx = (
                            gval(x + 1, y - 1) + 2 * gval(x + 1, y) + gval(x + 1, y + 1)
                        ) - (
                            gval(x - 1, y - 1) + 2 * gval(x - 1, y) + gval(x - 1, y + 1)
                        )
                        gy = (
                            gval(x - 1, y + 1) + 2 * gval(x, y + 1) + gval(x + 1, y + 1)
                        ) - (
                            gval(x - 1, y - 1) + 2 * gval(x, y - 1) + gval(x + 1, y - 1)
                        )
                        energy += abs(gx) + abs(gy)
                out["uri"].append(f"doc://{doc_id}")
                out["width"].append(gw)
                out["height"].append(gh)
                out["n_interior"].append((gw - 2) * (gh - 2))
                out["sobel_l1"].append(energy)
            yield pd.DataFrame(out)

    feats = docs.select("doc_id").mapInPandas(
        run, "uri string, width int, height int, n_interior long, sobel_l1 long"
    )
    return feats.select(
        "uri",
        "width",
        "height",
        "n_interior",
        "sobel_l1",
        (
            F.col("sobel_l1").cast("double") / F.col("n_interior").cast("double")
        ).alias("edge_density"),
    )


#: Silence gate: an 8-sample analysis window is "quiet" when its raw int16
#: energy Σv² stays under this integer threshold (≈84% of the ~2.86e9
#: expectation for the synthesized uniform samples — chosen so the testdata
#: yields a real mix of quiet/loud windows). Pure integer compare: the
#: decision never touches a float, so both engines agree by construction.
AUDIO_SILENCE_SSQ = 2_400_000_000
AUDIO_WINDOW = 8


@register(
    "multimodal_audio_silence",
    doc="REAL audio decode → fixed-window energy → silence-run analysis "
    "(gaps-and-islands over quiet windows): the silence/VAD trim step an "
    "audio training pipeline runs before transcription",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, CAST(u.i AS BIGINT) AS i,
                   ((doc_id * 31 + CAST(u.i AS BIGINT) * 17) % 65536) - 32768 AS v
            FROM documents, LATERAL (SELECT unnest(range({WAV_N_SAMPLES})) AS i) u
        ), win AS (
            SELECT doc_id, i // {AUDIO_WINDOW} AS widx, SUM(v * v) AS ssq
            FROM raw GROUP BY doc_id, i // {AUDIO_WINDOW}
        ), quiet AS (
            SELECT doc_id, widx,
                   widx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY widx) AS grp
            FROM win WHERE ssq < {AUDIO_SILENCE_SSQ}
        ), runs AS (
            SELECT doc_id, COUNT(*) AS run_len FROM quiet GROUP BY doc_id, grp
        ), per_doc AS (
            SELECT doc_id, CAST(SUM(run_len) AS BIGINT) AS n_quiet,
                   CAST(MAX(run_len) AS BIGINT) AS longest_quiet_run
            FROM runs GROUP BY doc_id
        )
        SELECT 'doc://' || CAST(d.doc_id AS VARCHAR) AS uri,
               CAST({WAV_N_SAMPLES // AUDIO_WINDOW} AS BIGINT) AS n_windows,
               COALESCE(p.n_quiet, 0) AS n_quiet,
               COALESCE(p.longest_quiet_run, 0) AS longest_quiet_run,
               CAST(COALESCE(p.n_quiet, 0) AS DOUBLE)
                   / {WAV_N_SAMPLES // AUDIO_WINDOW} AS quiet_ratio
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def multimodal_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style silence analysis over REAL decoded audio: the
    RIFF/WAVE payloads round-trip through the stdlib decoder (same path as
    ``multimodal_wav_decode``), samples regroup into fixed 8-sample analysis
    windows, and each window's raw int16 energy Σv² gates it quiet/loud.
    Per clip: quiet-window count, the LONGEST consecutive quiet run
    (gaps-and-islands: window_idx − row_number over quiet windows is
    constant within a run), and the quiet ratio (dyadic n/8 — exact).

    Exactness: decoded samples are v/2¹⁵ (dyadic), so s·32768 recovers the
    integer sample exactly; Σv² per window is an exact bigint (≤ 8·2³⁰ ≪
    2⁵³) and the silence decision is an integer compare — no float crosses
    an engine boundary anywhere.

    Scale shape: decode + explode fan out inside Arrow batches; the window
    regroup keys on (uri, widx) and the island detection is one window pass
    per clip partition — at 100 TB each clip's frames co-locate by uri hash,
    the standard audio-pipeline layout (clips ≪ frames)."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
    feats = audio_features(_as_assets(synth_wav_assets(docs), "audio/wav"), fake_decode=False)
    base = feats.select("uri", F.posexplode("samples").alias("i", "s"))
    # The all-docs left side of the final join needs only the URIs, which
    # are 'doc://' || doc_id by construction (synth emits one asset per doc,
    # the decode is 1→1) — a scan-side projection, NOT a second run of the
    # whole synth+decode Python pipeline (feats was referenced twice and is
    # unpersisted: the mapInPandas chain executed twice, measured ~2× the
    # sibling decode queries). Mirrors the oracle's FROM documents LEFT JOIN.
    uris = t(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("uri")
    )
    vi = (F.col("s") * 32768).cast("bigint")
    win = base.select(
        "uri", (F.col("i") / AUDIO_WINDOW).cast("bigint").alias("widx"), vi.alias("v")
    ).groupBy("uri", "widx").agg(F.sum(F.col("v") * F.col("v")).alias("ssq"))
    quiet = win.filter(F.col("ssq") < AUDIO_SILENCE_SSQ).select(
        "uri",
        "widx",
        (
            F.col("widx")
            - F.row_number().over(Window.partitionBy("uri").orderBy("widx"))
        ).alias("grp"),
    )
    runs = quiet.groupBy("uri", "grp").agg(F.count("*").alias("run_len"))
    per_doc = runs.groupBy("uri").agg(
        F.sum("run_len").cast("bigint").alias("n_quiet"),
        F.max("run_len").cast("bigint").alias("longest_quiet_run"),
    )
    n_win = WAV_N_SAMPLES // AUDIO_WINDOW
    return (
        uris
        .join(per_doc, "uri", "left")
        .select(
            "uri",
            F.lit(n_win).cast("bigint").alias("n_windows"),
            F.coalesce(F.col("n_quiet"), F.lit(0)).cast("bigint").alias("n_quiet"),
            F.coalesce(F.col("longest_quiet_run"), F.lit(0))
            .cast("bigint")
            .alias("longest_quiet_run"),
            (F.coalesce(F.col("n_quiet"), F.lit(0)).cast("double") / n_win).alias(
                "quiet_ratio"
            ),
        )
    )


def _entropy_oracle() -> str:
    lum = "((doc_id + 7 * x + 13 * y) % 256 + (3 * doc_id + 11 * x + 5 * y) % 256 + (7 * doc_id + 3 * x + 17 * y) % 256) // 3"
    return f"""
        WITH dims AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
        ), px AS (
            SELECT doc_id, w, h, CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
            FROM dims,
                 LATERAL (SELECT unnest(range(w)) AS x) xs,
                 LATERAL (SELECT unnest(range(h)) AS y) ys
        ), bins AS (
            SELECT doc_id, ({lum}) // 32 AS bin, COUNT(*) AS c,
                   ANY_VALUE(w * h) AS n
            FROM px GROUP BY doc_id, ({lum}) // 32
        )
        SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
               CAST(n AS BIGINT) AS n_pixels,
               COUNT(*) AS n_bins_used,
               ROUND(-SUM(ROUND((c / CAST(n AS DOUBLE))
                                * LN(c / CAST(n AS DOUBLE)), 12)), 9)
                   AS entropy_nats
        FROM bins GROUP BY doc_id, n
    """


@register(
    "multimodal_image_entropy",
    doc="image quality signal: Shannon entropy of the 8-bin luminance "
    "histogram over REAL decoded BMP pixels — the flat/low-information "
    "image gate (blank thumbnails, solid fills) a vision-data curation "
    "pass runs next to the Sobel edge gate",
    oracle=_entropy_oracle(),
)
def multimodal_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luminance-histogram entropy per image: the synthesized 24-bit BMP
    round-trips through the real encoder+decoder inside one Arrow
    mapInPandas pass, decoded RGB folds to integer luminance (r+g+b)//3,
    bins at width 32 (8 bins), and the histogram's Shannon entropy (nats)
    scores information content — near-0 for flat fills, ln 8 max.

    Exactness: bins and counts are pure integer arithmetic (the oracle
    recomputes them analytically from the fixture pixel formulas, so a
    decode/channel/row-order bug shifts a histogram somewhere); entropy
    follows the source_token_entropy discipline — each p·ln p term rounds
    to 12 decimals before the sum (ulp-proof across engines' LN), result
    rounds to 9.

    Scale shape: map-only (synthesize/decode/bin/score inside the Arrow
    batch, one row out per image) — zero shuffles at any corpus size."""
    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        from songs_etl_spark.operators.codecs import decode_bmp, encode_bmp

        for batch in batches:
            out = {"uri": [], "n_pixels": [], "n_bins_used": [], "entropy_nats": []}
            for i in batch["doc_id"]:
                doc_id = int(i)
                w, h, px = bmp_spec_for(doc_id)
                d = decode_bmp(encode_bmp(w, h, px))
                counts: dict[int, int] = {}
                for r, g, b in d["pixels"]:
                    bin_ = ((r + g + b) // 3) // 32
                    counts[bin_] = counts.get(bin_, 0) + 1
                n = d["width"] * d["height"]
                ent = round(
                    -sum(
                        round((c / n) * math.log(c / n), 12)
                        for _, c in sorted(counts.items())
                    ),
                    9,
                )
                out["uri"].append(f"doc://{doc_id}")
                out["n_pixels"].append(n)
                out["n_bins_used"].append(len(counts))
                out["entropy_nats"].append(ent)
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        run, "uri string, n_pixels long, n_bins_used long, entropy_nats double"
    )


#: Histogram bins per channel (256/_HIST_BINS-wide value buckets).
_HIST_BINS = 4


@register(
    "multimodal_image_histogram",
    tags=("bcast-const",),
    doc="REAL image decode → per-channel 4-bin color histograms: BMP "
    "payloads parsed in Arrow batches, per-pixel rows aggregated per "
    "(image, bin); oracle recomputes every bin count from doc_id",
    oracle="""
        WITH dims AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
        ), px AS (
            SELECT doc_id, CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
            FROM dims,
                 LATERAL (SELECT unnest(range(w)) AS x) xs,
                 LATERAL (SELECT unnest(range(h)) AS y) ys
        ), vals AS (
            SELECT doc_id,
                   (doc_id + 7 * x + 13 * y) % 256 AS r,
                   (3 * doc_id + 11 * x + 5 * y) % 256 AS g,
                   (7 * doc_id + 3 * x + 17 * y) % 256 AS b
            FROM px
        ), bins AS (SELECT unnest(range(4)) AS bin)
        SELECT 'doc://' || CAST(v.doc_id AS VARCHAR) AS uri,
               CAST(b.bin AS INT) AS bin,
               COUNT(*) FILTER (WHERE v.r // 64 = b.bin) AS r_count,
               COUNT(*) FILTER (WHERE v.g // 64 = b.bin) AS g_count,
               COUNT(*) FILTER (WHERE v.b // 64 = b.bin) AS b_count
        FROM vals v CROSS JOIN bins b
        GROUP BY v.doc_id, b.bin
    """,
)
def multimodal_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Color histograms through a REAL container round-trip: per-doc RGB
    grid → hand-encoded 24-bit BMP → hand-written decoder inside
    mapInPandas → per-pixel rows → per-(image, bin) exact counts, 4 bins
    of width 64 per channel. The histogram is the first feature any
    image-dedup / quality / NSFW-prefilter stage computes, and unlike the
    channel MEANS (multimodal_bmp_decode) it checks the decoder's full
    value DISTRIBUTION — a bit-depth or padding slip that happens to
    preserve means fails the bin counts.

    Scale shape: decode is a map-only Arrow pass emitting pixel rows
    (bounded per image), the aggregation is (uri, bin)-keyed with map-side
    combine, and the 4-row bin relation is a broadcast constant
    (bcast-const). All outputs are exact integers."""
    from songs_etl_spark.operators.codecs import decode_bmp

    docs = spread(t(spark, sf_dir, "documents"), key="doc_id")
    assets = synth_bmp_assets(docs)

    def pixel_rows(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            uris, rs, gs, bs = [], [], [], []
            for uri, payload in zip(batch["uri"], batch["payload"]):
                img = decode_bmp(bytes(payload))
                for r, g, b in img["pixels"]:
                    uris.append(uri)
                    rs.append(r)
                    gs.append(g)
                    bs.append(b)
            yield pd.DataFrame({"uri": uris, "r": rs, "g": gs, "b": bs})

    pix = assets.mapInPandas(pixel_rows, "uri string, r int, g int, b int")
    bins = spark.range(_HIST_BINS).select(F.col("id").cast("int").alias("bin"))

    def cnt(ch: str) -> F.Column:
        return F.count(F.when(F.floor(F.col(ch) / 64) == F.col("bin"), 1))

    return (
        pix.crossJoin(F.broadcast(bins))
        .groupBy("uri", "bin")
        .agg(
            cnt("r").alias("r_count"),
            cnt("g").alias("g_count"),
            cnt("b").alias("b_count"),
        )
    )
