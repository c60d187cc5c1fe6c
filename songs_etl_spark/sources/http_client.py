"""Real HTTP client behind the ``PlaylistApiClient`` protocol (sources/
rest.py): stdlib-urllib OAuth2 client-credentials flow + authed GETs with
retry/backoff — the concrete implementation of the reference extractor's
HTTP layer (`cf_extract/main.py:132-149` get_access_token POST,
`:178-200` bearer GETs with ``raise_for_status``).

Semantics preserved from the reference:

- **Token** — POST form-urlencoded ``grant_type=client_credentials`` with
  client id/secret to the token URL; ``access_token`` from the JSON body;
  any HTTP error propagates (``raise_for_status`` parity).
- **Authed GET** — ``Authorization: Bearer <token>``; non-2xx propagates
  as ``urllib.error.HTTPError`` (the stdlib twin of requests'
  ``HTTPError`` from ``raise_for_status``).

What the reference lacked, added because a real deployment hits it on
day one:

- **401 → one token refresh + replay** (client-credentials tokens expire
  server-side; the reference would crash its daily run instead).
- **429/5xx → bounded exponential backoff** honoring ``Retry-After``
  when the server sends one. Anything else fails fast.

No ``requests`` dependency: stdlib ``urllib.request`` keeps the client
importable on bare executors (the Python DataSource path builds one per
partition from reader options — see sources/rest_datasource.py).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Callable

#: Transient statuses worth retrying: throttle + server-side errors.
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})

#: Longest server-suggested Retry-After honored verbatim; larger (or
#: negative / non-finite) values fall back to bounded exponential backoff.
RETRY_AFTER_CAP = 120.0


class OAuth2HttpClient:
    """``PlaylistApiClient`` over HTTP with OAuth2 client-credentials.

    Parameters mirror a production config block: ``token_url`` (the OAuth2
    token endpoint), ``api_base_url`` (prefix of the resource endpoints),
    client id/secret. ``max_retries``/``backoff_base`` bound the transient-
    error replay; ``sleep`` is injectable so tests assert backoff without
    wall-clock waits."""

    def __init__(
        self,
        token_url: str,
        api_base_url: str,
        client_id: str,
        client_secret: str,
        max_retries: int = 3,
        backoff_base: float = 0.5,
        timeout: float = 30.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.token_url = token_url
        self.api_base_url = api_base_url.rstrip("/")
        self.client_id = client_id
        self.client_secret = client_secret
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.timeout = timeout
        self.sleep = sleep
        self._token: str | None = None

    # -- OAuth2 ----------------------------------------------------------

    def _fetch_token(self) -> str:
        """cf_extract/main.py:132-149: POST client_credentials, JSON
        ``access_token`` out, HTTP errors propagate."""
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": self.client_id,
                "client_secret": self.client_secret,
            }
        ).encode("ascii")
        req = urllib.request.Request(
            self.token_url,
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        return payload["access_token"]

    def _ensure_token(self) -> str:
        if self._token is None:
            self._token = self._fetch_token()
        return self._token

    # -- GET with retry/refresh -----------------------------------------

    def _get_json(self, path_and_query: str) -> dict[str, Any]:
        """Bearer GET of ``api_base_url + path``: 401 refreshes the token
        once and replays; retryable statuses back off exponentially
        (Retry-After honored) up to ``max_retries``; other statuses raise
        immediately (raise_for_status parity)."""
        url = f"{self.api_base_url}{path_and_query}"
        refreshed = False
        attempt = 0
        while True:
            req = urllib.request.Request(
                url, headers={"Authorization": f"Bearer {self._ensure_token()}"}
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as err:
                if err.code == 401 and not refreshed:
                    refreshed = True  # expired token: one refresh + replay
                    self._token = None
                    continue
                if err.code in RETRYABLE_STATUSES and attempt < self.max_retries:
                    delay = self._retry_after_seconds(err) or self.backoff_base * (
                        2**attempt
                    )
                    self.sleep(delay)
                    attempt += 1
                    continue
                raise
            except (urllib.error.URLError, TimeoutError):
                # Transport-level transients (connection reset, DNS blip,
                # socket timeout) — same bounded backoff as 5xx; HTTPError
                # is a URLError subclass but the clause above handled it.
                if attempt >= self.max_retries:
                    raise
                self.sleep(self.backoff_base * (2**attempt))
                attempt += 1

    @staticmethod
    def _retry_after_seconds(err: urllib.error.HTTPError) -> float | None:
        """Delta-seconds form of Retry-After; the RFC's HTTP-date form (sent
        by real CDNs) falls back to exponential backoff rather than crashing
        the retry path."""
        value = err.headers.get("Retry-After") if err.headers else None
        if value is None:
            return None
        try:
            parsed = float(value)
        except ValueError:
            return None
        # Servers are untrusted: a negative value would make time.sleep
        # raise, NaN poisons comparisons, and a huge value stalls the
        # partition forever. Outside [0, cap] → bounded exponential backoff.
        if not (0.0 < parsed <= RETRY_AFTER_CAP):
            return None
        return parsed

    # -- PlaylistApiClient protocol (cf_extract/main.py:178-200) ---------

    def get_playlists_by_user_id(self, user_id: str) -> dict[str, Any]:
        quoted = urllib.parse.quote(user_id, safe="")
        return self._get_json(f"/users/{quoted}/playlists")

    def get_tracks_by_playlist_id(
        self, playlist_id: str, limit: int, offset: int
    ) -> dict[str, Any]:
        quoted = urllib.parse.quote(playlist_id, safe="")
        return self._get_json(f"/playlists/{quoted}/tracks?limit={limit}&offset={offset}")


#: Env names for the zero-arg factory below — the S12 config shim: where
#: the reference fetched spotify_client_id/secret from Secret Manager
#: (cf_extract/main.py:112-126), a Spark deployment injects them into the
#: executor environment (cluster conf / pod spec) and points
#: ``client_factory`` at ``songs_etl_spark.sources.http_client:env_client``.
ENV_TOKEN_URL = "SONGS_ETL_TOKEN_URL"
ENV_API_BASE_URL = "SONGS_ETL_API_BASE_URL"
ENV_CLIENT_ID = "SONGS_ETL_CLIENT_ID"
ENV_CLIENT_SECRET = "SONGS_ETL_CLIENT_SECRET"


def env_client() -> OAuth2HttpClient:
    """Zero-arg factory building the real client from SONGS_ETL_* env vars
    (usable as the ``client_factory`` reader option)."""
    import os

    missing = [
        v
        for v in (ENV_TOKEN_URL, ENV_API_BASE_URL, ENV_CLIENT_ID, ENV_CLIENT_SECRET)
        if not os.environ.get(v)
    ]
    if missing:
        raise ValueError(f"env_client: missing environment variables: {missing}")
    return OAuth2HttpClient(
        token_url=os.environ[ENV_TOKEN_URL],
        api_base_url=os.environ[ENV_API_BASE_URL],
        client_id=os.environ[ENV_CLIENT_ID],
        client_secret=os.environ[ENV_CLIENT_SECRET],
    )
