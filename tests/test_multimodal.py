"""Tests for the multimodal binary-column operators: the mapInPandas batch
contract, schema shape, 1→N fan-out, REAL WAV/BMP container decode (stdlib
wave + hand-written BMP parser), malformed-payload error-column discipline,
and the digest stand-in path for format-less payloads."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.operators import multimodal as mm
from songs_etl_spark.operators.codecs import decode_bmp, decode_wav, encode_bmp, encode_wav

ASSET_DDL = "asset struct<uri:string,media_type:string,height:bigint,width:bigint,payload:binary>"


def as_assets(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], schema=ASSET_DDL)


@pytest.fixture(scope="module")
def assets(spark):
    return as_assets(
        spark,
        [
            ("img://a", "image/jpeg", 640, 640, b"\x01\x02\x03" * 500),
            ("img://b", "image/png", 100, 100, b"\xff"),
            ("img://empty", "image/jpeg", 0, 0, None),
        ],
    )


# ---------------------------------------------------------------------------
# Codecs: real container round-trips
# ---------------------------------------------------------------------------


def test_wav_roundtrip():
    samples = [((7 * i * i - 3 * i) % 65536) - 32768 for i in range(128)]
    payload = encode_wav(samples, sample_rate=16_000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    d = decode_wav(payload)
    assert d == {
        "n_channels": 1,
        "sample_rate": 16_000,
        "n_samples": 128,
        "samples": samples,
    }


def test_bmp_roundtrip_odd_width():
    # width 5 → row stride 16 (padding exercised); asymmetric pixels catch
    # any row-order or channel-order flip.
    px = [(x * 40 % 256, y * 90 % 256, (x + y) % 256) for y in range(3) for x in range(5)]
    payload = encode_bmp(5, 3, px)
    assert payload[:2] == b"BM"
    d = decode_bmp(payload)
    assert (d["width"], d["height"]) == (5, 3)
    assert d["pixels"] == px


def test_wav_stereo_decodes_channel_zero():
    import io
    import struct
    import wave as wave_mod

    left = [100, -200, 300, -400]
    right = [7, 8, 9, 10]
    interleaved = [s for pair in zip(left, right) for s in pair]
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22_050)
        w.writeframes(struct.pack(f"<{len(interleaved)}h", *interleaved))
    d = decode_wav(buf.getvalue())
    assert d["n_channels"] == 2 and d["sample_rate"] == 22_050
    assert d["n_samples"] == 4
    assert d["samples"] == left  # channel 0 of the interleaved stream


def test_codecs_reject_malformed():
    with pytest.raises(ValueError):
        decode_wav(b"not a riff container at all....")
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\0" * 60)
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(2, 2, [(0, 0, 0)] * 4)[:40])  # truncated


def test_decode_image_real_features():
    # 2×2 with known channel sums: means must be exact.
    px = [(10, 20, 30), (20, 40, 60), (30, 60, 90), (40, 80, 120)]
    feats = mm.decode_image(encode_bmp(2, 2, px))
    assert feats == [2.0, 2.0, 4.0, 25.0, 50.0, 75.0, 50.0, 1.0]


def test_decode_audio_real_samples():
    payload = encode_wav([0, 16384, -32768, 32767])
    d = mm.decode_audio(payload)
    assert d["n_channels"] == 1 and d["sample_rate"] == 8000
    assert d["samples"] == [0.0, 0.5, -1.0, 32767 / 32768.0]


def test_decode_real_raises_on_garbage():
    with pytest.raises(ValueError):
        mm.decode_image(b"bytes")
    with pytest.raises(ValueError):
        mm.decode_audio(b"bytes")


# ---------------------------------------------------------------------------
# Operators: real decode through Arrow, errors as data
# ---------------------------------------------------------------------------


def test_image_features_real_decode_and_error_column(spark):
    good = encode_bmp(3, 2, [(1, 2, 3)] * 6)
    rows = as_assets(
        spark,
        [
            ("bmp://good", "image/bmp", None, None, good),
            ("bmp://bad", "image/bmp", None, None, b"JUNKJUNK" * 10),
            ("bmp://null", "image/bmp", None, None, None),
        ],
    )
    out = {r.uri: r for r in mm.image_features(rows).collect()}  # real decode default
    ok = out["bmp://good"]
    assert ok.error is None
    assert ok.features == [3.0, 2.0, 6.0, 1.0, 2.0, 3.0, 2.0, 1.5]
    assert ok.n_bytes == len(good)
    # Malformed and empty payloads: error populated, features null, no task
    # failure — bad bytes are data.
    for uri in ("bmp://bad", "bmp://null"):
        assert out[uri].features is None and out[uri].error


def test_audio_features_real_decode_and_error_column(spark):
    samples = [1000 * i - 4000 for i in range(16)]
    rows = as_assets(
        spark,
        [
            ("wav://good", "audio/wav", None, None, encode_wav(samples)),
            ("wav://bad", "audio/wav", None, None, b"\x00" * 100),
        ],
    )
    out = {r.uri: r for r in mm.audio_features(rows).collect()}
    ok = out["wav://good"]
    assert ok.error is None and ok.n_channels == 1 and ok.sample_rate == 8000
    norm = [s / 32768.0 for s in samples]
    assert ok.samples == norm
    assert math.isclose(ok.rms, math.sqrt(sum(x * x for x in norm) / 16), rel_tol=0)
    bad = out["wav://bad"]
    assert bad.samples is None and bad.rms is None and bad.error


def test_resize_images_real_bmp(spark):
    # 4×4 checkerboard → 2×2 nearest-neighbor picks the top-left of each
    # quadrant; output payload is itself a decodable BMP.
    px = [((x // 2) * 255, (y // 2) * 255, 7) for y in range(4) for x in range(4)]
    rows = as_assets(
        spark,
        [
            ("bmp://cb", "image/bmp", None, None, encode_bmp(4, 4, px)),
            ("bmp://bad", "image/bmp", None, None, b"nope"),
        ],
    )
    out = {r.uri: r for r in mm.resize_images(rows, height=2, width=2).collect()}
    ok = out["bmp://cb"]
    assert ok.error is None
    resized = decode_bmp(bytes(ok.payload))
    assert (resized["width"], resized["height"]) == (2, 2)
    assert resized["pixels"] == [(0, 0, 7), (255, 0, 7), (0, 255, 7), (255, 255, 7)]
    assert out["bmp://bad"].payload is None and out["bmp://bad"].error


# ---------------------------------------------------------------------------
# Digest stand-in path (format-less payloads) — unchanged contracts
# ---------------------------------------------------------------------------


def test_image_features_fake_contract(spark, assets):
    out = mm.image_features(assets, fake_decode=True).collect()
    assert {r.uri for r in out} == {"img://a", "img://b", "img://empty"}
    by_uri = {r.uri: r for r in out}
    a = by_uri["img://a"]
    assert a.n_bytes == 1500
    assert a.content_sha == hashlib.sha256(b"\x01\x02\x03" * 500).hexdigest()
    assert len(a.features) == mm.IMAGE_FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in a.features)
    assert a.error is None
    # Deterministic: same payload → same features on rerun.
    again = {r.uri: r.features for r in mm.image_features(assets, fake_decode=True).collect()}
    assert again == {r.uri: r.features for r in out}
    # NULL payload handled as empty, not a crash.
    assert by_uri["img://empty"].n_bytes == 0


def test_frame_sample_fanout(spark, assets):
    out = mm.frame_sample(assets, every_n_bytes=256, max_frames=4).collect()
    frames_a = sorted(
        (r for r in out if r.uri == "img://a"), key=lambda r: r.frame_index
    )
    # 1500 bytes / 256 = 5 windows, capped at max_frames=4.
    assert [r.frame_index for r in frames_a] == [0, 1, 2, 3]
    assert [r.frame_offset for r in frames_a] == [0, 256, 512, 768]
    assert all(len(r.frame_bytes) == 64 for r in frames_a)
    # Tiny payload still yields one frame; empty payload yields none.
    assert sum(1 for r in out if r.uri == "img://b") == 1
    assert sum(1 for r in out if r.uri == "img://empty") == 0


def test_partitioned_input_preserves_rows(spark, assets):
    # The operator is per-row; partitioning must not change the result set.
    out = mm.image_features(assets.repartition(5), fake_decode=True).collect()
    assert len(out) == 3


def test_audio_decode_fake_stub(spark):
    d = mm.decode_audio(b"bytes", fake=True)
    assert len(d["samples"]) == 16
    assert all(-1.0 <= v < 1.0 for v in d["samples"])
    assert d == mm.decode_audio(b"bytes", fake=True)  # deterministic


def test_resize_images_fake_contract(spark, assets):
    out = {
        r.uri: r
        for r in mm.resize_images(assets, height=8, width=8, fake_decode=True).collect()
    }
    assert set(out) == {"img://a", "img://b", "img://empty"}
    # Every output payload is exactly h*w bytes; metadata reflects the target.
    assert all(len(r.payload) == 64 and r.height == 8 and r.width == 8 for r in out.values())
    # Truncation of the long payload, zero-padding of the short/empty ones.
    assert bytes(out["img://a"].payload) == (b"\x01\x02\x03" * 500)[:64]
    assert bytes(out["img://b"].payload) == b"\xff" + b"\0" * 63
    assert bytes(out["img://empty"].payload) == b"\0" * 64


def test_audio_features_fake_operator(spark):
    assets = spark.createDataFrame(
        [("a://1", b"hello"), ("a://2", None)], "uri string, payload binary"
    ).select(
        F.struct(
            F.col("uri"),
            F.lit("audio/fake").alias("media_type"),
            F.lit(None).cast("bigint").alias("height"),
            F.lit(None).cast("bigint").alias("width"),
            F.col("payload"),
        ).alias("asset")
    )
    rows = {r.uri: r for r in mm.audio_features(assets, fake_decode=True).collect()}
    assert rows["a://1"].n_bytes == 5 and rows["a://2"].n_bytes == 0
    s = rows["a://1"].samples
    assert len(s) == mm.AUDIO_SAMPLE_DIM and all(-1.0 <= x < 1.0 for x in s)
    assert math.isclose(
        rows["a://1"].rms, math.sqrt(sum(x * x for x in s) / len(s)), rel_tol=1e-12
    )
    # Same payload -> same samples (digest-deterministic stub).
    assert s == mm.decode_audio(b"hello", fake=True)["samples"]


# ---------------------------------------------------------------------------
# Codec round-trip properties (pure Python — no Spark session needed)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=256),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    d = decode_wav(encode_wav(samples, rate))
    assert d["samples"] == samples
    assert d["sample_rate"] == rate
    assert d["n_channels"] == 1 and d["n_samples"] == len(samples)


@settings(max_examples=50, deadline=None)
@given(data=st.data(), w=st.integers(min_value=1, max_value=9), h=st.integers(min_value=1, max_value=7))
def test_bmp_roundtrip_property(data, w, h):
    px = data.draw(
        st.lists(
            st.tuples(*[st.integers(min_value=0, max_value=255)] * 3),
            min_size=w * h,
            max_size=w * h,
        )
    )
    d = decode_bmp(encode_bmp(w, h, px))
    assert (d["width"], d["height"], d["pixels"]) == (w, h, px)


@settings(max_examples=50, deadline=None)
@given(junk=st.binary(max_size=200))
def test_codecs_never_crash_on_junk(junk):
    # Arbitrary bytes either decode (if they happen to be valid) or raise
    # ValueError — never any other exception type (the operators' error
    # columns rely on this contract).
    for dec in (decode_wav, decode_bmp):
        try:
            dec(junk)
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# binaryFile source: files on disk → asset structs → real decode
# ---------------------------------------------------------------------------


def test_binary_file_source_end_to_end(spark, tmp_path):
    """Directory of real WAV + BMP files through the binaryFile scan into the
    real decoders: the full files→features path with no synthetic payload
    column anywhere."""
    from songs_etl_spark.operators.codecs import encode_bmp, encode_wav
    from songs_etl_spark.operators.multimodal import audio_features, image_features
    from songs_etl_spark.sources.binary_source import read_binary_assets

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.wav").write_bytes(encode_wav([100, -100, 32000, -32000], 8000))
    (d / "b.wav").write_bytes(encode_wav([0, 1, 2, 3], 16000))
    (d / "c.bmp").write_bytes(encode_bmp(2, 1, [(10, 20, 30), (40, 50, 60)]))
    (d / "junk.txt").write_bytes(b"not media")

    assets = read_binary_assets(spark, str(d))
    got = {r.asset.uri.rsplit("/", 1)[-1]: r.asset for r in assets.collect()}
    assert set(got) == {"a.wav", "b.wav", "c.bmp", "junk.txt"}
    assert got["a.wav"].media_type == "audio/wav"
    assert got["c.bmp"].media_type == "image/bmp"
    assert got["junk.txt"].media_type is None

    wavs = read_binary_assets(spark, str(d), glob="*.wav")
    feats = {
        r.uri.rsplit("/", 1)[-1]: r
        for r in audio_features(wavs, fake_decode=False).collect()
    }
    assert set(feats) == {"a.wav", "b.wav"}
    assert feats["a.wav"].sample_rate == 8000 and feats["a.wav"].error is None
    assert feats["a.wav"].samples == [
        100 / 32768, -100 / 32768, 32000 / 32768, -32000 / 32768
    ]
    assert feats["b.wav"].sample_rate == 16000

    bmps = read_binary_assets(spark, str(d), glob="*.bmp")
    img = image_features(bmps, fake_decode=False).collect()
    assert len(img) == 1 and img[0].error is None
    w, h, n, mr, mg, mb, _, aspect = img[0].features
    assert (w, h, n) == (2.0, 1.0, 2.0) and (mr, mg, mb) == (25.0, 35.0, 45.0)

    # Non-media bytes through the decoder: error column, not a task failure.
    any_file = read_binary_assets(spark, str(d), glob="*.txt")
    bad = audio_features(any_file, fake_decode=False).collect()
    assert len(bad) == 1 and bad[0].error is not None and bad[0].samples is None


class TestPngCodec:
    """Real compressed-container codec: zlib PNG with all five scanline
    filters; decode must undo DEFLATE + unfiltering exactly."""

    def _px(self, w, h, seed=0):
        return [
            ((seed + x * 7 + y * 13) % 256, (x * 3 + seed) % 256, (y * 11) % 256)
            for y in range(h)
            for x in range(w)
        ]

    def test_roundtrip_every_filter_type(self):
        from songs_etl_spark.operators.codecs import decode_png, encode_png

        px = self._px(6, 4, seed=9)
        for ft in range(5):
            out = decode_png(encode_png(6, 4, px, filter_type=ft))
            assert (out["width"], out["height"]) == (6, 4)
            assert out["pixels"] == px, f"filter {ft} corrupted pixels"

    def test_png_and_bmp_decode_identically(self):
        from songs_etl_spark.operators.codecs import (
            decode_bmp,
            decode_png,
            encode_bmp,
            encode_png,
        )

        px = self._px(5, 5, seed=3)
        assert decode_png(encode_png(5, 5, px, filter_type=4))["pixels"] == decode_bmp(
            encode_bmp(5, 5, px)
        )["pixels"]

    def test_junk_and_corruption_raise_valueerror_not_crash(self):
        import pytest

        from songs_etl_spark.operators.codecs import decode_png, encode_png

        with pytest.raises(ValueError):
            decode_png(b"not a png at all")
        good = bytearray(encode_png(4, 3, self._px(4, 3), filter_type=2))
        good[20] ^= 0xFF  # corrupt IHDR body -> CRC mismatch
        with pytest.raises(ValueError):
            decode_png(bytes(good))
        with pytest.raises(ValueError):
            decode_png(encode_png(4, 3, self._px(4, 3))[:-8])  # truncated


# ---------------------------------------------------------------------------
# JPEG codec (baseline JFIF, operators/codecs.py)
# ---------------------------------------------------------------------------


def test_jpeg_block_constant_roundtrip_exact():
    """The oracle-exact fixture class: block-constant grayscale at quality
    100 round-trips bit-for-bit (DC-only blocks, all-ones quant)."""
    from songs_etl_spark.operators.codecs import decode_jpeg, encode_jpeg_gray

    w, h = 24, 16
    gray = [(91 + 11 * (x // 8) + 23 * (y // 8)) % 256 for y in range(h) for x in range(w)]
    img = decode_jpeg(encode_jpeg_gray(w, h, gray, quality=100))
    assert (img["width"], img["height"]) == (w, h)
    assert [p[0] for p in img["pixels"]] == gray
    assert all(p[0] == p[1] == p[2] for p in img["pixels"])


def test_jpeg_nonaligned_dims_crop():
    """Dims not multiples of 8: encoder pads to MCU grid (edge replicate),
    decoder crops back to the declared WxH."""
    from songs_etl_spark.operators.codecs import decode_jpeg, encode_jpeg_gray

    w, h = 13, 9
    gray = [128] * (w * h)
    img = decode_jpeg(encode_jpeg_gray(w, h, gray))
    assert (img["width"], img["height"]) == (w, h)
    assert len(img["pixels"]) == w * h
    assert [p[0] for p in img["pixels"]] == gray


def test_jpeg_quality100_gradient_lossless_quality50_lossy():
    """General (non-block-constant) content: the full AC path. All-ones
    quantization keeps a linear gradient lossless; quality 50's coarse
    table must actually lose information (it IS a lossy codec)."""
    from songs_etl_spark.operators.codecs import decode_jpeg, encode_jpeg_gray

    w, h = 24, 17
    gray = [(3 * x + 5 * y) % 256 for y in range(h) for x in range(w)]
    hi = decode_jpeg(encode_jpeg_gray(w, h, gray, quality=100))
    assert [p[0] for p in hi["pixels"]] == gray
    lo = decode_jpeg(encode_jpeg_gray(w, h, gray, quality=50))
    errs = [abs(p[0] - g) for p, g in zip(lo["pixels"], gray)]
    assert 0 < max(errs) <= 16  # lossy but sane


def test_jpeg_extreme_values_and_byte_stuffing():
    """0/255 blocks produce 0xFF bytes in the entropy stream — the
    stuffing/unstuffing path — and still round-trip exactly."""
    from songs_etl_spark.operators.codecs import decode_jpeg, encode_jpeg_gray

    gray = [255] * 64 + [0] * 64
    img = decode_jpeg(encode_jpeg_gray(16, 8, gray))
    assert [p[0] for p in img["pixels"]] == gray


def test_jpeg_idct_matches_direct_formula():
    """The separable matrix IDCT equals the spec's direct O(n^4) definition
    (ITU T.81 A.3.3) within float tolerance on random coefficients."""
    import numpy as np

    from songs_etl_spark.operators.codecs import _dct_matrix

    rng = np.random.RandomState(7)
    coef = rng.randint(-512, 512, size=(8, 8)).astype(np.float64)
    m = _dct_matrix()
    fast = m.T @ coef @ m
    c = np.ones(8)
    c[0] = 1 / np.sqrt(2.0)
    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c[u] * c[v] * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[x, y] = s / 4.0
    assert np.max(np.abs(fast - direct)) < 1e-9


def test_jpeg_rejects_unsupported():
    from songs_etl_spark.operators.codecs import decode_jpeg, encode_jpeg_gray

    with pytest.raises(ValueError, match="magic"):
        decode_jpeg(b"nonsense")
    payload = bytearray(encode_jpeg_gray(8, 8, [1] * 64))
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_jpeg_decode_image_dispatch():
    """decode_image routes FFD8FF payloads to the JPEG decoder and emits the
    canonical feature vector."""
    from songs_etl_spark.operators.codecs import encode_jpeg_gray

    gray = [10] * 64
    feats = mm.decode_image(encode_jpeg_gray(8, 8, gray))
    assert feats == [8.0, 8.0, 64.0, 10.0, 10.0, 10.0, 10.0, 1.0]


def test_jpeg_sos_undeclared_component_is_valueerror():
    """An SOS that references a component id absent from SOF0 must raise
    ValueError (bad-bytes-are-data contract), not leak StopIteration out of
    the decoder and kill the Arrow task."""
    from songs_etl_spark.operators.codecs import decode_jpeg, encode_jpeg_gray

    payload = bytearray(encode_jpeg_gray(8, 8, [7] * 64))
    sos = payload.find(b"\xff\xda")
    assert sos > 0
    payload[sos + 5] = 0x42  # scan component id — SOF0 declared id 1
    with pytest.raises(ValueError, match="undeclared component"):
        decode_jpeg(bytes(payload))


def test_jpeg_encode_rejects_out_of_range_pixels():
    """Out-of-range / fractional / NaN samples raise a clear ValueError with
    the offending index, not an opaque KeyError in the huffman lookup."""
    from songs_etl_spark.operators.codecs import encode_jpeg_gray

    for bad in (300, -1, 3.5, float("nan")):
        pixels = [7] * 64
        pixels[5] = bad
        with pytest.raises(ValueError, match="pixel 5"):
            encode_jpeg_gray(8, 8, pixels)
    with pytest.raises(ValueError, match="numeric"):
        encode_jpeg_gray(8, 8, ["x"] * 64)
    # integral floats are fine (decode round-trips produce them)
    assert encode_jpeg_gray(8, 8, [7.0] * 64)


def test_jpeg_truncated_payload_is_valueerror_not_task_killer(spark):
    """Corrupt JPEG bytes must become an error ROW (the bad-bytes-are-data
    contract), which requires decode_jpeg to raise ValueError — not
    IndexError/struct.error — on truncation."""
    from songs_etl_spark.operators.codecs import decode_jpeg, encode_jpeg_gray

    full = encode_jpeg_gray(8, 8, [7] * 64)
    for cut in (5, 10, 30, len(full) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(full[:cut])
    # and through the Arrow operator: one good, one truncated
    rows = [("doc://ok", full), ("doc://bad", full[: len(full) - 3])]
    df = spark.createDataFrame(rows, "uri string, payload binary").select(
        F.struct(
            "uri",
            F.lit("image/jpeg").alias("media_type"),
            F.lit(None).cast("bigint").alias("height"),
            F.lit(None).cast("bigint").alias("width"),
            "payload",
        ).alias("asset")
    )
    got = {r["uri"]: r["error"] for r in mm.image_features(df).collect()}
    assert got["doc://ok"] is None
    assert got["doc://bad"] is not None
