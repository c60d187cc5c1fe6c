"""The REST ingest as a first-class Spark data source (Python DataSource
API): spark.read.format("rest_tracks") plans one input partition per
playlist, drains the pagination protocol per partition on the executor,
and lands rows in the landing RAW_TRACKS_SCHEMA."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from songs_etl_spark import schemas
from songs_etl_spark.sources import rest_datasource


@pytest.fixture(scope="module")
def ds(spark):
    rest_datasource.register(spark)
    return spark


def _load(spark, playlists: str, limit: int = 4):
    return (
        spark.read.format("rest_tracks")
        .option("playlists", playlists)
        .option("limit", str(limit))
        .load()
    )


def test_schema_matches_landing_contract(ds):
    df = _load(ds, "p1")
    assert df.schema == schemas.RAW_TRACKS_SCHEMA


def test_pagination_drains_all_pages(ds):
    # p5 has 17 tracks; limit 4 forces 5 pages through the next/offset loop
    df = _load(ds, "p5", limit=4)
    assert df.select(F.size("tracks")).first()[0] == 17


def test_one_partition_per_playlist(ds):
    df = _load(ds, "p1,p2,p3,p4")
    assert df.rdd.getNumPartitions() == 4
    got = {r["playlist_id"]: r["n"] for r in
           df.select("playlist_id", F.size("tracks").alias("n")).collect()}
    assert got == {"p1": 5, "p2": 8, "p3": 11, "p4": 14}


def test_total_tracks_default_applied(ds):
    # every 5th track's album omits total_tracks -> the reference's 9999
    t = _load(ds, "p2").select(F.explode("tracks").alias("t")).select("t.album.total_tracks")
    vals = [r[0] for r in t.collect()]
    assert 9999 in vals and any(v != 9999 for v in vals)


def test_missing_playlists_option_errors(ds):
    with pytest.raises(Exception, match="playlists"):
        ds.read.format("rest_tracks").load().collect()


def test_plain_secret_option_warns_once():
    """client_secret as a reader option rides in plan dumps / Spark UI; the
    parse path warns once per process and points at the env_client route."""
    opts = {
        "playlists": "p1",
        "api_base_url": "http://x",
        "token_url": "http://x/token",
        "client_id": "id",
        "client_secret": "hunter2",
    }
    rest_datasource._warned_plain_secret = False
    with pytest.warns(UserWarning, match="env_client"):
        rest_datasource._parse_options(opts)
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")  # second call must stay silent
        rest_datasource._parse_options(opts)


def test_streaming_source_one_playlist_per_microbatch(ds, tmp_path):
    import time
    import uuid

    name = f"strm_{uuid.uuid4().hex[:6]}"
    q = (
        ds.readStream.format("rest_tracks")
        .option("playlists", "p1,p2,p3")
        .option("limit", "4")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and ds.table(name).count() < 3:
            time.sleep(0.5)
    finally:
        q.stop()
    got = {r["playlist_id"]: r["n"] for r in
           ds.table(name).select("playlist_id", F.size("tracks").alias("n")).collect()}
    assert got == {"p1": 5, "p2": 8, "p3": 11}


def test_stream_offset_replay_is_deterministic():
    from songs_etl_spark.sources.rest_datasource import RestTracksStreamReader

    r = RestTracksStreamReader({"playlists": "p1,p2,p3", "limit": "4"})
    assert r.initialOffset() == {"n_done": 0}
    rows1, off1 = r.read({"n_done": 0})
    assert off1 == {"n_done": 1}
    # replaying the committed range yields identical rows (the contract a
    # recovering checkpoint depends on)
    assert list(r.readBetweenOffsets({"n_done": 0}, {"n_done": 1})) == list(rows1)
    # offsets saturate at the end of the playlist list
    _, off_end = r.read({"n_done": 3})
    assert off_end == {"n_done": 3}
