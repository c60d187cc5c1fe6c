"""OAuth2 HTTP client (sources/http_client.py) against a real in-process
HTTP server — token fetch, bearer pagination, 401-refresh replay, 429/5xx
backoff, raise_for_status propagation — plus the same client driven through
the rest_tracks DataSource path via plain reader options (executors open
real sockets to the fixture server)."""

from __future__ import annotations

import json
import threading
import urllib.error
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from songs_etl_spark.sources.http_client import OAuth2HttpClient, env_client
from songs_etl_spark.sources.rest_datasource import _DemoClient

DATA = _DemoClient()  # payload source: same shapes the demo DataSource serves


class _ApiHandler(BaseHTTPRequestHandler):
    """Spotify-shaped endpoints with controllable failure injection.

    Server attributes (set by the fixture / tests):
    - token_serial: increments per token POST -> tokens "tok-<n>"
    - expire_after: valid GETs per token before a 401 (None = never)
    - fail_queue: list of (status, retry_after_or_None) served (and popped)
      before any successful GET response
    """

    def log_message(self, *a):  # silence test output
        pass

    def _json(self, code: int, payload: dict, headers: dict | None = None) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        srv = self.server
        if urlparse(self.path).path != "/api/token":
            return self._json(404, {"error": "not found"})
        length = int(self.headers.get("Content-Length", 0))
        form = parse_qs(self.rfile.read(length).decode())
        if form.get("grant_type") != ["client_credentials"] or form.get(
            "client_id"
        ) != ["cid"] or form.get("client_secret") != ["sec"]:
            return self._json(400, {"error": "invalid_client"})
        srv.token_serial += 1
        srv.token_uses = 0
        return self._json(200, {"access_token": f"tok-{srv.token_serial}"})

    def do_GET(self):
        srv = self.server
        if srv.fail_queue:
            status, retry_after = srv.fail_queue.pop(0)
            hdrs = {"Retry-After": str(retry_after)} if retry_after is not None else None
            return self._json(status, {"error": "injected"}, hdrs)
        expected = f"Bearer tok-{srv.token_serial}"
        if srv.token_serial == 0 or self.headers.get("Authorization") != expected:
            return self._json(401, {"error": "invalid token"})
        if srv.expire_after is not None and srv.token_uses >= srv.expire_after:
            return self._json(401, {"error": "token expired"})
        srv.token_uses += 1
        parsed = urlparse(self.path)
        parts = parsed.path.strip("/").split("/")
        if len(parts) == 3 and parts[0] == "users" and parts[2] == "playlists":
            return self._json(200, {"items": [{"id": f"{parts[1]}-pl0"}]})
        if len(parts) == 3 and parts[0] == "playlists" and parts[2] == "tracks":
            q = parse_qs(parsed.query)
            limit = int(q["limit"][0])
            offset = int(q["offset"][0])
            return self._json(
                200, DATA.get_tracks_by_playlist_id(parts[1], limit=limit, offset=offset)
            )
        return self._json(404, {"error": "not found"})


class _PatientHTTPServer(ThreadingHTTPServer):
    """Fixture server hardened against full-suite load: the stock accept
    backlog of 5 drops SYNs when Spark python workers burst connections
    while the host is busy (the recurring ``test_datasource_path_over_
    real_http`` full-suite flake) — a refused connection then has to win
    a timing race with the client's bounded backoff. A deep listen queue
    makes the kernel park the burst instead."""

    request_queue_size = 128


@pytest.fixture()
def api_server():
    srv = _PatientHTTPServer(("127.0.0.1", 0), _ApiHandler)
    srv.token_serial = 0
    srv.token_uses = 0
    srv.expire_after = None
    srv.fail_queue = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    # Readiness probe: don't hand the address out until a real round-trip
    # succeeds (the serve_forever thread can lag its start() under load).
    import time as _time
    import urllib.request as _rq

    for _ in range(100):
        try:
            _rq.urlopen(f"{base}/api/ready", timeout=2)
            break
        except urllib.error.HTTPError:
            break  # 404 from the handler IS readiness — socket round-trip worked
        except OSError:
            _time.sleep(0.05)
    yield srv, base
    srv.shutdown()
    srv.server_close()


def _client(base: str, **kw) -> OAuth2HttpClient:
    sleeps: list[float] = []
    c = OAuth2HttpClient(
        token_url=f"{base}/api/token",
        api_base_url=base,
        client_id="cid",
        client_secret="sec",
        sleep=sleeps.append,
        **kw,
    )
    c._test_sleeps = sleeps
    return c


def test_token_fetch_and_paginated_drain(api_server):
    srv, base = api_server
    from songs_etl_spark.sources.rest import fetch_all_pages

    c = _client(base)
    items = fetch_all_pages(c, "p5", limit=4)  # 17 tracks -> 5 pages
    assert len(items) == 17
    assert srv.token_serial == 1  # one token for all five pages
    assert c._test_sleeps == []


def test_single_get_playlists(api_server):
    _, base = api_server
    assert _client(base).get_playlists_by_user_id("user1") == {
        "items": [{"id": "user1-pl0"}]
    }


def test_expired_token_refreshes_once_and_replays(api_server):
    srv, base = api_server
    srv.expire_after = 3  # third page 401s -> refresh -> replay
    from songs_etl_spark.sources.rest import fetch_all_pages

    c = _client(base)
    assert len(fetch_all_pages(c, "p5", limit=4)) == 17
    assert srv.token_serial == 2
    assert c._test_sleeps == []


def test_429_backoff_honors_retry_after(api_server):
    srv, base = api_server
    srv.fail_queue = [(429, 7)]
    c = _client(base)
    page = c.get_tracks_by_playlist_id("p1", limit=10, offset=0)
    assert len(page["items"]) == 5
    assert c._test_sleeps == [7.0]


@pytest.mark.parametrize("hostile", ["-5", "1e9", "nan"])
def test_hostile_retry_after_falls_back_to_backoff(api_server, hostile):
    """A negative Retry-After would make time.sleep raise ValueError; a huge
    or NaN one would stall the partition. All fall back to the bounded
    exponential schedule."""
    srv, base = api_server
    srv.fail_queue = [(429, hostile)]
    c = _client(base)
    assert len(c.get_tracks_by_playlist_id("p1", limit=10, offset=0)["items"]) == 5
    assert c._test_sleeps == [0.5]


def test_5xx_exponential_backoff_then_success(api_server):
    srv, base = api_server
    srv.fail_queue = [(503, None), (500, None)]
    c = _client(base)
    assert c.get_tracks_by_playlist_id("p1", limit=10, offset=0)["next"] is None
    assert c._test_sleeps == [0.5, 1.0]


def test_persistent_5xx_raises_after_max_retries(api_server):
    srv, base = api_server
    srv.fail_queue = [(500, None)] * 10
    c = _client(base, max_retries=2)
    with pytest.raises(urllib.error.HTTPError) as err:
        c.get_tracks_by_playlist_id("p1", limit=10, offset=0)
    assert err.value.code == 500
    assert c._test_sleeps == [0.5, 1.0]  # 2 retries, then propagate


def test_non_retryable_status_propagates_immediately(api_server):
    srv, base = api_server
    srv.fail_queue = [(404, None)]
    c = _client(base)
    with pytest.raises(urllib.error.HTTPError) as err:
        c.get_tracks_by_playlist_id("p1", limit=10, offset=0)
    assert err.value.code == 404
    assert c._test_sleeps == []


def test_bad_credentials_propagate_from_token_post(api_server):
    _, base = api_server
    c = OAuth2HttpClient(
        token_url=f"{base}/api/token",
        api_base_url=base,
        client_id="wrong",
        client_secret="sec",
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        c.get_playlists_by_user_id("u")
    assert err.value.code == 400


def test_datasource_path_over_real_http(spark, api_server):
    """The full S1 path: spark.read.format('rest_tracks') with the OAuth2
    http options — executor partitions open real sockets to the fixture,
    fetch a token, and drain the pagination protocol."""
    from songs_etl_spark import schemas
    from songs_etl_spark.sources import rest_datasource

    srv, base = api_server
    rest_datasource.register(spark)
    df = (
        spark.read.format("rest_tracks")
        .option("playlists", "p1,p2")
        .option("limit", "4")
        .option("api_base_url", base)
        .option("token_url", f"{base}/api/token")
        .option("client_id", "cid")
        .option("client_secret", "sec")
        # Full-suite headroom: a busy host can still drop/delay the first
        # connects; 6 bounded retries with a short base beat the race
        # without stretching the happy path.
        .option("max_retries", "6")
        .option("backoff_base", "0.2")
        .load()
    )
    from pyspark.sql import functions as F

    assert df.schema == schemas.RAW_TRACKS_SCHEMA
    got = {
        r["playlist_id"]: r["n"]
        for r in df.select("playlist_id", F.size("tracks").alias("n")).collect()
    }
    assert got == {"p1": 5, "p2": 8}
    assert srv.token_serial >= 1


def test_datasource_http_options_validated(spark, api_server):
    from songs_etl_spark.sources import rest_datasource

    _, base = api_server
    rest_datasource.register(spark)
    with pytest.raises(Exception, match="client_secret"):
        (
            spark.read.format("rest_tracks")
            .option("playlists", "p1")
            .option("api_base_url", base)
            .option("token_url", f"{base}/api/token")
            .option("client_id", "cid")
            .load()
            .collect()
        )


def test_env_client_factory(api_server, monkeypatch):
    _, base = api_server
    monkeypatch.setenv("SONGS_ETL_TOKEN_URL", f"{base}/api/token")
    monkeypatch.setenv("SONGS_ETL_API_BASE_URL", base)
    monkeypatch.setenv("SONGS_ETL_CLIENT_ID", "cid")
    monkeypatch.setenv("SONGS_ETL_CLIENT_SECRET", "sec")
    c = env_client()
    assert len(c.get_tracks_by_playlist_id("p1", limit=10, offset=0)["items"]) == 5


def test_env_client_missing_vars(monkeypatch):
    for v in (
        "SONGS_ETL_TOKEN_URL",
        "SONGS_ETL_API_BASE_URL",
        "SONGS_ETL_CLIENT_ID",
        "SONGS_ETL_CLIENT_SECRET",
    ):
        monkeypatch.delenv(v, raising=False)
    with pytest.raises(ValueError, match="missing environment"):
        env_client()


def test_retry_after_http_date_falls_back_to_backoff(api_server):
    """RFC 7231 allows an HTTP-date Retry-After; it must fall back to the
    exponential schedule, not crash the retry path with ValueError."""
    srv, base = api_server
    srv.fail_queue = [(429, "Wed, 21 Oct 2026 07:28:00 GMT")]
    c = _client(base)
    assert len(c.get_tracks_by_playlist_id("p1", limit=10, offset=0)["items"]) == 5
    assert c._test_sleeps == [0.5]


def test_transport_errors_retry_then_recover(api_server, monkeypatch):
    """Connection-level URLErrors (reset, DNS blip) use the same bounded
    backoff as 5xx instead of failing the partition on the first blip."""
    import urllib.request as ur

    _, base = api_server
    c = _client(base)
    real = ur.urlopen
    failures = {"n": 2}

    def flaky(req, timeout=None):
        if getattr(req, "full_url", "").find("/playlists/") >= 0 and failures["n"] > 0:
            failures["n"] -= 1
            raise urllib.error.URLError("connection reset")
        return real(req, timeout=timeout)

    monkeypatch.setattr(ur, "urlopen", flaky)
    assert len(c.get_tracks_by_playlist_id("p1", limit=10, offset=0)["items"]) == 5
    assert c._test_sleeps == [0.5, 1.0]


def test_transport_errors_propagate_after_max_retries(api_server, monkeypatch):
    import urllib.request as ur

    _, base = api_server
    c = _client(base, max_retries=1)
    real = ur.urlopen

    def dead(req, timeout=None):
        if getattr(req, "full_url", "").find("/playlists/") >= 0:
            raise urllib.error.URLError("no route to host")
        return real(req, timeout=timeout)

    monkeypatch.setattr(ur, "urlopen", dead)
    with pytest.raises(urllib.error.URLError):
        c.get_tracks_by_playlist_id("p1", limit=10, offset=0)
    assert c._test_sleeps == [0.5]


def test_factory_allowlist_rejects_string_prefix_sibling(monkeypatch):
    """A prefix 'mycorp' admits mycorp / mycorp.* but never mycorp_evil.*."""
    from songs_etl_spark.sources.rest_datasource import _load_factory

    monkeypatch.setenv("SONGS_ETL_CLIENT_FACTORY_PREFIXES", "mycorp")
    with pytest.raises(ValueError, match="outside the allowed prefixes"):
        _load_factory("mycorp_evil.client:f")
    with pytest.raises(ModuleNotFoundError):
        _load_factory("mycorp.client:f")  # passes the boundary, fails import
