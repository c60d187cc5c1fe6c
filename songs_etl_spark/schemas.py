"""Explicit schemas: landing-zone JSON documents and the warehouse star schema.

Landing shapes mirror what the reference extractor constructs
(`cloud-functions/cf_extract/main.py:220-223` for users→playlists,
`:258-279` for the track projection, `:286-291` for playlist→tracks nesting).
Warehouse tables mirror the Terraform-declared BigQuery schemas
(`terraform/bigquery.tf:14-52,73-181`), plus the natural-key columns the
reference commented out (intended semantics — see SURVEY.md §2.3): without
them the star join can never match.

Schema-on-read is deliberate: landing JSON is read with these StructTypes
(no inference pass — one less full scan at 100 TB), and nested-schema pruning
means a query touching only ``tracks.name`` reads only that leaf from Parquet.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Landing zone (schema-on-read JSON documents)
# ---------------------------------------------------------------------------

#: One document per user: the playlists the user owns.
#: Shape: cf_extract/main.py:220-223 (only `id` and `name` are ever read).
RAW_PLAYLISTS_SCHEMA = T.StructType(
    [
        T.StructField("spotify_id", T.StringType()),
        T.StructField(
            "playlists",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

#: Spotify image object, passed through untouched (cf_extract/main.py:270).
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
    ]
)

#: Track album struct (cf_extract/main.py:265-271). ``release_date`` arrives at
#: varying precision (YYYY | YYYY-MM | YYYY-MM-DD); ``total_tracks`` may be
#: absent (the extractor defaults it to 9999, cf_extract/main.py:269).
ALBUM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("total_tracks", T.LongType()),
        T.StructField("images", T.ArrayType(IMAGE_SCHEMA)),
    ]
)

#: Per-track projection the extractor keeps (cf_extract/main.py:258-279).
TRACK_SCHEMA = T.StructType(
    [
        T.StructField("added_at", T.StringType()),  # ISO-8601; cast with NULL-on-error
        T.StructField("is_local", T.BooleanType()),
        T.StructField("id", T.StringType()),  # nullable for local tracks
        T.StructField("name", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("explicit", T.BooleanType()),
        T.StructField("album", ALBUM_SCHEMA),
        T.StructField(
            "artists",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),  # nullable; filtered
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

#: One document per playlist: the playlist's tracks (cf_extract/main.py:286-291).
RAW_TRACKS_SCHEMA = T.StructType(
    [
        T.StructField("playlist_id", T.StringType()),
        T.StructField("tracks", T.ArrayType(TRACK_SCHEMA)),
    ]
)

# ---------------------------------------------------------------------------
# Warehouse star schema (terraform/bigquery.tf)
# ---------------------------------------------------------------------------

#: Seed dimension, pipeline *input* (cf_extract/main.py:101-110;
#: terraform/bigquery.tf:117-135).
DIM_USER_SCHEMA = T.StructType(
    [
        T.StructField("dim_user_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("spotify_id", T.StringType()),
    ]
)

#: terraform/bigquery.tf:73-85 — single static row ('spotify', 'Spotify').
DIM_PLATFORM_SCHEMA = T.StructType(
    [
        T.StructField("dim_platform_id", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)


def _dim_schema(surrogate: str, natural: str) -> T.StructType:
    """(surrogate, natural key, name) — the intended dim shape; the natural-key
    column is the one the reference commented out (e.g.
    cf_create_artists_dimension/main.py:81)."""
    return T.StructType(
        [
            T.StructField(surrogate, T.StringType()),
            T.StructField(natural, T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )


DIM_PLAYLIST_SCHEMA = _dim_schema("dim_playlist_id", "playlist_id")  # bigquery.tf:95-107
DIM_ARTIST_SCHEMA = _dim_schema("dim_artist_id", "artist_id")  # bigquery.tf:144-156
DIM_TRACK_SCHEMA = _dim_schema("dim_track_id", "track_id")  # bigquery.tf:166-178

#: terraform/bigquery.tf:14-52; clustering [dim_platform_id, dim_playlist_id,
#: dim_user_id] (bigquery.tf:13) maps to partition/sort at write time.
FACT_SONGS_SCHEMA = T.StructType(
    [
        T.StructField("dim_platform_id", T.StringType()),
        T.StructField("dim_playlist_id", T.StringType()),
        T.StructField("dim_artist_id", T.StringType()),
        T.StructField("dim_track_id", T.StringType()),
        T.StructField("dim_user_id", T.StringType()),
        T.StructField("added_at", T.TimestampType()),
        T.StructField("is_local", T.BooleanType()),
    ]
)

#: Columns of fact_songs in declared order (cf_transform/main.py:161-169).
FACT_SONGS_COLUMNS = [f.name for f in FACT_SONGS_SCHEMA.fields]
