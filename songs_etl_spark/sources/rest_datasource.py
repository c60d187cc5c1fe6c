"""The REST ingest as a first-class Spark data source (Python DataSource
V2 API, Spark 4): ``spark.read.format("rest_tracks").option(...)`` — the
engine-native spelling of the reference extractor's paginated track fetch
(`cf_extract/main.py:228-300`), with one INPUT PARTITION PER PLAYLIST so
independent playlists drain their pages in parallel across executors
(the reference's own `# TODO: paralelizar`, done).

The pagination protocol, nested projection, and ``total_tracks=9999``
default are the exact ``sources/rest.py`` functions — this module only
adds the DataSource plumbing: schema declaration, partition planning, a
per-partition reader, and client construction on the EXECUTOR (clients
are sockets/sessions — never serialized; a ``client_factory`` option
names an importable zero-arg factory, the standard dependency-injection
seam: tests and air-gapped runs point it at a deterministic fake,
production at a real HTTP client factory)."""

from __future__ import annotations

import importlib
import warnings
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from songs_etl_spark import schemas
from songs_etl_spark.sources.rest import (
    DEFAULT_PAGE_LIMIT,
    fetch_all_pages,
    project_track,
)

#: Default client factory: the deterministic in-module demo below.
DEMO_FACTORY = "songs_etl_spark.sources.rest_datasource:demo_client"


class _DemoClient:
    """Deterministic API emulation (no HTTP): playlist ``p<k>`` has
    ``3*k + 2`` tracks, paged like the real endpoint — ``next`` is set
    exactly while items remain past offset+limit."""

    def _items(self, playlist_id: str) -> list[dict[str, Any]]:
        k = int(playlist_id.lstrip("p") or 0)
        out = []
        for i in range(3 * k + 2):
            out.append(
                {
                    "added_at": f"2024-01-{(i % 28) + 1:02d}",
                    "is_local": False,
                    "track": {
                        "id": f"t{playlist_id}-{i}",
                        "name": f"track {i}",
                        "duration_ms": 60000 + 137 * i,
                        "explicit": i % 3 == 0,
                        "album": {
                            "id": f"al{playlist_id}-{i // 4}",
                            "name": f"album {i // 4}",
                            "release_date": "2020-01-01",
                            # every 5th album omits total_tracks -> 9999 default
                            **({} if i % 5 == 0 else {"total_tracks": 10 + i % 7}),
                            "images": [
                                {"url": f"http://img/{playlist_id}/{i}", "height": 64, "width": 64}
                            ],
                        },
                        "artists": [{"id": f"ar{i % 4}", "name": f"artist {i % 4}"}],
                    },
                }
            )
        return out

    def get_tracks_by_playlist_id(self, playlist_id: str, limit: int, offset: int) -> dict:
        items = self._items(playlist_id)
        page = items[offset : offset + limit]
        has_more = offset + limit < len(items)
        return {"items": page, "next": "demo://next" if has_more else None}


def demo_client() -> _DemoClient:
    return _DemoClient()


#: Trust boundary for ``client_factory``: the option names a zero-arg
#: callable that is imported AND CALLED on executors, and reader options
#: often flow in from config a job author didn't write — unrestricted, it
#: is an arbitrary-code-execution surface. Only factories under these
#: module prefixes load; deployments shipping their own client extend the
#: list via SONGS_ETL_CLIENT_FACTORY_PREFIXES (comma-separated module
#: prefixes, set on driver and executors).
_FACTORY_PREFIX_ENV = "SONGS_ETL_CLIENT_FACTORY_PREFIXES"
_FACTORY_PREFIXES = ("songs_etl_spark.", "tests.")


def _allowed_factory_prefixes() -> tuple[str, ...]:
    import os

    extra = os.environ.get(_FACTORY_PREFIX_ENV, "")
    return _FACTORY_PREFIXES + tuple(p.strip() for p in extra.split(",") if p.strip())


def _load_factory(path: str):
    if ":" not in path:
        raise ValueError(
            f"client_factory must be 'module:attr', got {path!r} "
            "(dotted spelling? use a colon before the factory name)"
        )
    mod, attr = path.split(":", 1)
    prefixes = _allowed_factory_prefixes()
    # Normalize every prefix to package form: 'mycorp' admits mycorp and
    # mycorp.*, NEVER the string-prefix sibling mycorp_evil.*.
    if not any(
        mod == p.rstrip(".") or mod.startswith(p if p.endswith(".") else p + ".")
        for p in prefixes
    ):
        raise ValueError(
            f"client_factory module {mod!r} is outside the allowed prefixes "
            f"{prefixes} — reader options are an untrusted surface; extend "
            f"{_FACTORY_PREFIX_ENV} to permit your client module"
        )
    return getattr(importlib.import_module(mod), attr)


_warned_plain_secret = False


def _warn_plain_secret_once() -> None:
    """One-time reminder that client_secret passed as a reader option rides
    in the DataFrame plan (plan dumps, Spark UI, event logs). Real
    deployments should prefer ``client_factory`` +
    ``http_client.env_client``, which keeps the secret in executor env."""
    global _warned_plain_secret
    if not _warned_plain_secret:
        _warned_plain_secret = True
        warnings.warn(
            "rest_tracks: client_secret supplied as a reader option is "
            "visible in plan dumps and the Spark UI; prefer "
            "client_factory=songs_etl_spark.sources.http_client:env_client "
            "with SONGS_ETL_* env vars for real deployments",
            stacklevel=3,
        )


def _parse_options(options: dict) -> tuple[list[str], int, dict]:
    """Shared batch/streaming option validation: playlist ids (stripped,
    required non-empty), page limit (> 0 — fetch_all_pages advances offset
    by limit, so 0 would spin forever), and a picklable client spec.

    Two client configurations:

    - ``api_base_url`` + ``token_url`` + ``client_id`` + ``client_secret``
      options → the real OAuth2 HTTP client (sources/http_client.py) built
      per partition from these plain-string options. This is the
      cluster-friendly shape: options travel with the plan, no executor
      import of caller code. (Secrets in reader options surface in plan
      dumps — prefer the factory + env route where that matters.)
    - else ``client_factory`` ("module:attr", allowlist-checked) → imported
      and called per partition; default is the in-module demo."""
    raw = options.get("playlists", "")
    ids = [p.strip() for p in raw.split(",") if p.strip()]
    if not ids:
        raise ValueError("rest_tracks: the 'playlists' option is required")
    limit = int(options.get("limit", DEFAULT_PAGE_LIMIT))
    if limit <= 0:
        raise ValueError(f"rest_tracks: limit must be positive, got {limit}")
    if options.get("api_base_url"):
        http_keys = ("api_base_url", "token_url", "client_id", "client_secret")
        missing = [k for k in http_keys if not options.get(k)]
        if missing:
            raise ValueError(f"rest_tracks: http client options missing: {missing}")
        _warn_plain_secret_once()
        spec = {"kind": "http", **{k: options[k] for k in http_keys}}
        # Optional transient-error knobs (plain strings, travel with the
        # plan like every other option); defaults come from the client.
        # Presence-checked with `is not None` so an explicit empty/garbage
        # value is REJECTED with the module's error prefix instead of
        # silently ignored (truthiness would skip "" entirely).
        for opt, conv in (("max_retries", int), ("backoff_base", float)):
            if options.get(opt) is not None:
                try:
                    spec[opt] = conv(options[opt])
                except ValueError:
                    raise ValueError(
                        f"rest_tracks: invalid {opt!r} option "
                        f"{options[opt]!r} (expected {conv.__name__})"
                    ) from None
    else:
        spec = {"kind": "factory", "path": options.get("client_factory", DEMO_FACTORY)}
    return ids, limit, spec


def _build_client(spec: dict):
    """Client spec (picklable, from _parse_options) → live client, on the
    executor that reads the partition."""
    if spec["kind"] == "http":
        from songs_etl_spark.sources.http_client import OAuth2HttpClient

        extra = {k: spec[k] for k in ("max_retries", "backoff_base") if k in spec}
        return OAuth2HttpClient(
            token_url=spec["token_url"],
            api_base_url=spec["api_base_url"],
            client_id=spec["client_id"],
            client_secret=spec["client_secret"],
            **extra,
        )
    return _load_factory(spec["path"])()


def _track_tuple(t: dict[str, Any]) -> tuple:
    """dict (projection output) → tuple in TRACK_SCHEMA field order."""
    album = t["album"]
    return (
        t["added_at"],
        t["is_local"],
        t["id"],
        t["name"],
        t["duration_ms"],
        t["explicit"],
        (
            album["id"],
            album["name"],
            album["release_date"],
            album["total_tracks"],
            [(im["url"], im["height"], im["width"]) for im in album["images"]],
        ),
        [(a["id"], a["name"]) for a in t["artists"]],
    )


class RestTracksReader(DataSourceReader):
    def __init__(self, options: dict):
        self.playlist_ids, self.limit, self.client_spec = _parse_options(options)

    def partitions(self) -> list[InputPartition]:
        # one partition per playlist: pages WITHIN a playlist are sequential
        # (the API protocol), playlists are independent — exactly the
        # parallelism boundary the reference left as a TODO
        return [InputPartition(pid) for pid in self.playlist_ids]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        client = _build_client(self.client_spec)
        items = fetch_all_pages(client, partition.value, limit=self.limit)
        yield (partition.value, [_track_tuple(project_track(i)) for i in items])


class RestTracksDataSource(DataSource):
    """``spark.read.format("rest_tracks")``: options ``playlists`` (comma-
    separated ids, required), ``limit`` (page size, default 100),
    ``client_factory`` ("module:attr" zero-arg factory, default the demo)."""

    @classmethod
    def name(cls) -> str:
        return "rest_tracks"

    def schema(self):
        return schemas.RAW_TRACKS_SCHEMA

    def reader(self, schema) -> RestTracksReader:
        return RestTracksReader(self.options)

    def simpleStreamReader(self, schema) -> "RestTracksStreamReader":
        return RestTracksStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(RestTracksDataSource)


class RestTracksStreamReader(SimpleDataSourceStreamReader):
    """Incremental polling of the playlist list: the offset is the count of
    playlists already ingested; each micro-batch drains the NEXT playlist's
    pages (one playlist per batch — the steady-state shape of an API
    poller feeding Structured Streaming). ``readBetweenOffsets`` replays a
    committed range deterministically (the demo client is a pure function
    of the playlist id), which is exactly the property a replayable
    streaming source must guarantee."""

    def __init__(self, options: dict):
        self.playlist_ids, self.limit, self.client_spec = _parse_options(options)

    def initialOffset(self) -> dict:
        return {"n_done": 0}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # a LIST, not a generator: the simple-reader protocol prefetches on
        # the driver and PICKLES the returned rows to ship them with the
        # planned batch — generators can't pickle
        client = _build_client(self.client_spec)
        out = []
        for pid in self.playlist_ids[lo:hi]:
            items = fetch_all_pages(client, pid, limit=self.limit)
            out.append((pid, [_track_tuple(project_track(i)) for i in items]))
        return out

    def read(self, start: dict):
        lo = start["n_done"]
        hi = min(lo + 1, len(self.playlist_ids))
        return iter(self._rows(lo, hi)), {"n_done": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["n_done"], end["n_done"]))
