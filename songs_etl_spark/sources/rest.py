"""REST API ingest adapter (SURVEY.md §2 S1/S2): paginated-endpoint →
DataFrame, the engine restatement of the reference extractor
(`cloud-functions/cf_extract/main.py:202-226` playlists single-GET per user,
`:228-300` tracks with limit/offset pagination).

Semantics preserved from the reference:

- **Pagination protocol** (S1): fetch with ``limit``/``offset``, append
  ``items``, stop when the page's ``next`` is ``None``, else
  ``offset += limit`` (cf_extract/main.py:249-284).
- **Nested projection on the way in** (P1): only the track fields the
  pipeline consumes are kept, re-shaped to TRACK_SCHEMA
  (cf_extract/main.py:258-279).
- **`total_tracks` default 9999** (P2): absent album.total_tracks becomes
  9999 (cf_extract/main.py:269).
- **Re-nesting** (F4): one output document per playlist with its full track
  array (cf_extract/main.py:286-291).

Architecture: ingest is DRIVER-SIDE by design. The API surface is a
rate-limited, sequential-pagination protocol — there is no partitionable
work below one (user|playlist), so the fetch loop runs on the driver (or in
the caller's own fan-out across playlists) and hands Spark a DataFrame with
an explicit schema; everything downstream is distributed. At 100 TB the
landing zone, not the API, is the big input: these functions feed the same
`sources/json_source.py` landing path the batch pipeline reads.

The client is a duck-typed protocol so tests (and air-gapped runs) inject a
fake; no HTTP library is imported here.
"""

from __future__ import annotations

from typing import Any, Iterable, Protocol

from pyspark.sql import DataFrame, SparkSession

from songs_etl_spark import schemas

#: Page size the reference uses (cf_extract/main.py:233).
DEFAULT_PAGE_LIMIT = 100

#: The reference's stand-in for a missing album.total_tracks
#: (cf_extract/main.py:269).
TOTAL_TRACKS_DEFAULT = 9999


class PlaylistApiClient(Protocol):
    """What the adapter needs from an API client (duck-typed; the real
    implementation would wrap HTTP + auth, cf_extract/main.py:131-199)."""

    def get_playlists_by_user_id(self, user_id: str) -> dict[str, Any]:
        """Single-page GET: returns ``{"items": [...]}`` (S2)."""
        ...

    def get_tracks_by_playlist_id(
        self, playlist_id: str, limit: int, offset: int
    ) -> dict[str, Any]:
        """Paged GET: returns ``{"items": [...], "next": url-or-None}`` (S1)."""
        ...


def fetch_all_pages(
    client: PlaylistApiClient, playlist_id: str, limit: int = DEFAULT_PAGE_LIMIT
) -> list[dict[str, Any]]:
    """Drain one playlist's track pages: the reference's while-True loop —
    append ``items``, stop on ``next is None``, else ``offset += limit``."""
    items: list[dict[str, Any]] = []
    offset = 0
    while True:
        page = client.get_tracks_by_playlist_id(playlist_id, limit=limit, offset=offset)
        items.extend(page["items"])
        if page["next"] is None:
            return items
        offset += limit


def project_track(item: dict[str, Any]) -> dict[str, Any]:
    """The extractor's per-track nested projection (cf_extract/main.py:258-279),
    including the total_tracks=9999 default for albums that omit it."""
    track = item["track"]
    album = track["album"]
    return {
        "added_at": item["added_at"],
        "is_local": item["is_local"],
        "id": track["id"],
        "name": track["name"],
        "duration_ms": track["duration_ms"],
        "explicit": track["explicit"],
        "album": {
            "id": album["id"],
            "name": album["name"],
            "release_date": album["release_date"],
            "total_tracks": album.get("total_tracks", TOTAL_TRACKS_DEFAULT),
            "images": album["images"],
        },
        "artists": [{"id": a["id"], "name": a["name"]} for a in track["artists"]],
    }


def extract_playlists(
    spark: SparkSession, client: PlaylistApiClient, user_ids: Iterable[str]
) -> DataFrame:
    """S2: one document per user with the user's playlists, as a DataFrame in
    the landing RAW_PLAYLISTS_SCHEMA (cf_extract/main.py:206-226)."""
    docs = []
    for user_id in user_ids:
        playlists = client.get_playlists_by_user_id(user_id)
        docs.append(
            {
                "spotify_id": user_id,
                "playlists": [
                    {"id": p["id"], "name": p["name"]} for p in playlists["items"]
                ],
            }
        )
    return spark.createDataFrame(docs, schema=schemas.RAW_PLAYLISTS_SCHEMA)


def extract_tracks(
    spark: SparkSession,
    client: PlaylistApiClient,
    playlist_ids: Iterable[str],
    limit: int = DEFAULT_PAGE_LIMIT,
) -> DataFrame:
    """S1: one document per playlist with the full (paginated) projected
    track list, as a DataFrame in the landing RAW_TRACKS_SCHEMA
    (cf_extract/main.py:236-295)."""
    docs = []
    for playlist_id in playlist_ids:
        items = fetch_all_pages(client, playlist_id, limit=limit)
        docs.append(
            {
                "playlist_id": playlist_id,
                "tracks": [project_track(item) for item in items],
            }
        )
    return spark.createDataFrame(docs, schema=schemas.RAW_TRACKS_SCHEMA)
