"""Tests for the multimodal binary-column operators: the mapInPandas batch
contract, schema shape, 1→N fan-out, and the clearly-stubbed decode path."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (("img://a", "image/jpeg", 640, 640, b"\x01\x02\x03" * 500),),
        (("img://b", "image/png", 100, 100, b"\xff"),),
        (("img://empty", "image/jpeg", 0, 0, None),),
    ]
    return spark.createDataFrame(rows, schema=f"asset struct<uri:string,media_type:string,height:bigint,width:bigint,payload:binary>")


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"bytes")


def test_image_features_contract(spark, assets):
    out = mm.image_features(assets).collect()
    assert {r.uri for r in out} == {"img://a", "img://b", "img://empty"}
    by_uri = {r.uri: r for r in out}
    a = by_uri["img://a"]
    assert a.n_bytes == 1500
    assert a.content_sha == hashlib.sha256(b"\x01\x02\x03" * 500).hexdigest()
    assert len(a.features) == mm.IMAGE_FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in a.features)
    # Deterministic: same payload → same features on rerun.
    again = {r.uri: r.features for r in mm.image_features(assets).collect()}
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
    out = mm.image_features(assets.repartition(5)).collect()
    assert len(out) == 3


def test_audio_decode_stub(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"bytes")
    samples = mm.decode_audio(b"bytes", fake=True)
    assert len(samples) == 16
    assert all(-1.0 <= v <= 1.0 for v in samples)
    assert samples == mm.decode_audio(b"bytes", fake=True)  # deterministic


def test_resize_images_contract(spark, assets):
    out = {r.uri: r for r in mm.resize_images(assets, height=8, width=8).collect()}
    assert set(out) == {"img://a", "img://b", "img://empty"}
    # Every output payload is exactly h*w bytes; metadata reflects the target.
    assert all(len(r.payload) == 64 and r.height == 8 and r.width == 8 for r in out.values())
    # Truncation of the long payload, zero-padding of the short/empty ones.
    assert bytes(out["img://a"].payload) == (b"\x01\x02\x03" * 500)[:64]
    assert bytes(out["img://b"].payload) == b"\xff" + b"\0" * 63
    assert bytes(out["img://empty"].payload) == b"\0" * 64


def test_audio_features_operator(spark):
    import math

    from pyspark.sql import functions as F

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
    assert s == mm.decode_audio(b"hello", fake=True)
