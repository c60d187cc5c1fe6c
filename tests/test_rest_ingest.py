"""REST ingest adapter (S1/S2) against a fake API client: pagination
protocol, nested projection, and the total_tracks=9999 default — the
reference extractor's semantics (cf_extract/main.py:228-300) without HTTP."""

from __future__ import annotations

import pytest

from songs_etl_spark import schemas
from songs_etl_spark.sources.rest import (
    TOTAL_TRACKS_DEFAULT,
    extract_playlists,
    extract_tracks,
    fetch_all_pages,
)
from tests.conftest import track


class FakeClient:
    """Pages a fixed per-playlist track list like the real API: ``next`` is
    non-None exactly while more items remain past offset+limit."""

    def __init__(self, playlists_by_user, tracks_by_playlist):
        self.playlists_by_user = playlists_by_user
        self.tracks_by_playlist = tracks_by_playlist
        self.calls = []

    def get_playlists_by_user_id(self, user_id):
        self.calls.append(("playlists", user_id))
        return {"items": self.playlists_by_user.get(user_id, [])}

    def get_tracks_by_playlist_id(self, playlist_id, limit, offset):
        self.calls.append(("tracks", playlist_id, limit, offset))
        all_items = self.tracks_by_playlist[playlist_id]
        page = all_items[offset : offset + limit]
        has_more = offset + limit < len(all_items)
        return {"items": page, "next": "https://api/next" if has_more else None}


def item(track_id, name="t", **kw):
    """API-shaped item: the landing ``track`` nested one level deeper than the
    projection output, as the real endpoint returns it."""
    projected = track(track_id, name, **kw)
    return {
        "added_at": projected.pop("added_at"),
        "is_local": projected.pop("is_local"),
        "track": projected,
    }


@pytest.fixture()
def client():
    return FakeClient(
        playlists_by_user={
            "user1": [{"id": "pl1", "name": "Road Trip", "extra_field": "dropped"}],
            "user2": [],
        },
        tracks_by_playlist={
            "pl1": [item(f"t{i}", f"Song {i}") for i in range(7)],
            "pl_empty": [],
        },
    )


def test_pagination_terminates_and_preserves_order(client):
    items = fetch_all_pages(client, "pl1", limit=3)
    assert [i["track"]["id"] for i in items] == [f"t{i}" for i in range(7)]
    # 3 pages: offsets 0,3,6 — the last has next=None and stops the loop.
    assert [c for c in client.calls if c[0] == "tracks"] == [
        ("tracks", "pl1", 3, 0),
        ("tracks", "pl1", 3, 3),
        ("tracks", "pl1", 3, 6),
    ]


def test_pagination_single_page_and_empty(client):
    assert len(fetch_all_pages(client, "pl1", limit=100)) == 7
    assert fetch_all_pages(client, "pl_empty", limit=100) == []


def test_extract_tracks_schema_and_projection(spark, client):
    df = extract_tracks(spark, client, ["pl1", "pl_empty"], limit=3)
    assert df.schema == schemas.RAW_TRACKS_SCHEMA
    rows = {r.playlist_id: r for r in df.collect()}
    assert len(rows["pl1"].tracks) == 7 and rows["pl_empty"].tracks == []
    first = rows["pl1"].tracks[0]
    assert first.id == "t0" and first.album.id == "alb-t0"
    assert first.artists[0].name == "artist of Song 0"


def test_total_tracks_defaults_to_9999(spark):
    sparse = item("tx")
    del sparse["track"]["album"]["total_tracks"]
    client = FakeClient({}, {"pl": [sparse]})
    df = extract_tracks(spark, client, ["pl"])
    assert df.collect()[0].tracks[0].album.total_tracks == TOTAL_TRACKS_DEFAULT


def test_extract_playlists_projects_id_name_only(spark, client):
    df = extract_playlists(spark, client, ["user1", "user2"])
    assert df.schema == schemas.RAW_PLAYLISTS_SCHEMA
    rows = {r.spotify_id: r for r in df.collect()}
    assert [p.asDict() for p in rows["user1"].playlists] == [
        {"id": "pl1", "name": "Road Trip"}
    ]
    assert rows["user2"].playlists == []


def test_ingested_frames_feed_the_star_pipeline(spark, client, dim_user):
    """End-to-end: adapter output drives the same dim build the landing JSON
    path does — the REST source is a drop-in front door, not a side car."""
    from songs_etl_spark.operators.star import build_dim_playlist

    playlists = extract_playlists(spark, client, ["user1", "user2"])
    dim = build_dim_playlist(playlists)
    names = {r["name"] for r in dim.collect()}
    assert names == {"Road Trip"}
