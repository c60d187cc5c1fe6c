"""Shared fixtures: one local SparkSession for the whole test run, plus tiny
landing-document fixtures shaped exactly like the reference's landing JSON
(FIXTURES.md §1-2; cf_extract/main.py:220-223,258-279,286-291)."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from songs_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("songs-etl-tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()


# ---------------------------------------------------------------------------
# Landing fixtures (the shapes the extractor writes)
# ---------------------------------------------------------------------------


def track(
    track_id,
    name="track",
    added_at="2024-05-01T10:00:00Z",
    is_local=False,
    artists=None,
    album=None,
    duration_ms=200_000,
    explicit=False,
):
    return {
        "added_at": added_at,
        "is_local": is_local,
        "id": track_id,
        "name": name,
        "duration_ms": duration_ms,
        "explicit": explicit,
        "album": album
        or {
            "id": f"alb-{track_id}",
            "name": f"album of {name}",
            "release_date": "2020-03-15",
            "total_tracks": 12,
            "images": [{"url": "https://img/1", "height": 640, "width": 640}],
        },
        "artists": artists
        if artists is not None
        else [{"id": f"art-{track_id}", "name": f"artist of {name}"}],
    }


#: users→playlists docs (cf_extract/main.py:220-223)
PLAYLISTS_DOCS = [
    {
        "spotify_id": "user1",
        "playlists": [
            {"id": "pl1", "name": "Road Trip"},
            {"id": "pl2", "name": "Focus"},
        ],
    },
    {"spotify_id": "user2", "playlists": [{"id": "pl3", "name": "Gym"}]},
    # pl_shared appears under two users → exercises J1 pick-first.
    {"spotify_id": "user3", "playlists": [{"id": "pl_shared", "name": "Shared A"}]},
    {"spotify_id": "user4", "playlists": [{"id": "pl_shared", "name": "Shared B"}]},
    {"spotify_id": "user5", "playlists": []},
]

#: playlists→tracks docs (cf_extract/main.py:286-291)
TRACKS_DOCS = [
    {
        "playlist_id": "pl1",
        "tracks": [
            track("t1", "Song One", artists=[{"id": "a1", "name": "Alpha"}]),
            track(
                "t2",
                "Song Two",
                artists=[{"id": "a1", "name": "Alpha"}, {"id": "a2", "name": "Beta"}],
            ),
        ],
    },
    {
        "playlist_id": "pl2",
        "tracks": [
            # Same track in a second playlist → dedup must keep both rows
            # (different playlist) but dims stay unique.
            track("t1", "Song One", artists=[{"id": "a1", "name": "Alpha"}]),
            # Local track: NULL id, artist with NULL id (P5 filter target),
            # malformed added_at (C1 must coerce to NULL).
            track(
                None,
                "Home Recording",
                added_at="not-a-date",
                is_local=True,
                artists=[{"id": None, "name": "Unknown"}],
            ),
        ],
    },
    {"playlist_id": "pl3", "tracks": [track("t3", "Song Three")]},
    # Playlist whose owner is ambiguous (two users claim pl_shared).
    {"playlist_id": "pl_shared", "tracks": [track("t4", "Song Four")]},
    # Playlist not present in any user doc → owner NULL (left-join path).
    {"playlist_id": "pl_orphan", "tracks": [track("t5", "Song Five")]},
]

#: The seed dimension the pipeline reads (cf_extract/main.py:101-110).
DIM_USER_ROWS = [
    ("u-0000000001", "User One", "user1"),
    ("u-0000000002", "User Two", "user2"),
    ("u-0000000003", "User Three", "user3"),
    ("u-0000000004", "User Four", "user4"),
    ("u-0000000005", "User Five", "user5"),
]


@pytest.fixture(scope="session")
def landing_dir(tmp_path_factory):
    """Landing JSON blobs on disk, one array-of-docs file per entity —
    byte-for-byte the layout the extractor uploads (S9)."""
    d = tmp_path_factory.mktemp("landing")
    (d / "playlists.json").write_text(json.dumps(PLAYLISTS_DOCS))
    (d / "tracks.json").write_text(json.dumps(TRACKS_DOCS))
    return d


@pytest.fixture(scope="session")
def dim_user(spark):
    from songs_etl_spark import schemas

    return spark.createDataFrame(DIM_USER_ROWS, schema=schemas.DIM_USER_SCHEMA)
