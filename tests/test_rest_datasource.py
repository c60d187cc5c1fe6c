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
