"""Real HTTP ingestion backend (stdlib urllib, zero deps) implementing the
same protocol as ``fake_backend.FakeVendorBackend``, with the reference's
client semantics re-expressed:

- a pool of clients with distinct browser-emulation header profiles
  (``/root/reference/src/clients/pool.rs:7-47`` builds Firefox/Chrome/
  Safari/Edge emulations; here each profile is a header set),
- per-request inner retry: 429/504/connection errors back off and retry,
  403 raises immediately for the OUTER loop to rotate clients
  (``src/clients/http.rs:110-156``),
- outer per-call loop picks client ``(current + attempt) % len(pool)``
  (``src/services/api.rs:90-91``) so each retry of one logical call walks
  the pool,
- HTTP 400 on a detail lookup degrades to ``None`` — the left-outer null
  row (``src/services/api.rs:118-127``, ``src/services/vendor.rs:96-105``).

The class is addressed as ``module:Class?base_url=...`` (see
``rest._resolve_backend``) so executors construct it from strings; it is
stateless between calls and picklable.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from itertools import count

#: Header profiles standing in for the reference's four TLS emulations
#: (pool.rs:14-19). What matters for parity is N distinct client
#: identities rotated on 403 — the fingerprint itself is cosmetic here.
EMULATION_PROFILES = [
    {"User-Agent": "Mozilla/5.0 (X11; Linux x86_64; rv:136.0) Gecko/20100101 Firefox/136.0"},
    {"User-Agent": "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/133.0.0.0 Safari/537.36"},
    {"User-Agent": "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.3 Safari/605.1.15"},
    {"User-Agent": "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/133.0.0.0 Safari/537.36 Edg/134.0.0.0"},
]


class Forbidden(Exception):
    """HTTP 403 — not retried by the inner loop; the outer loop rotates
    to the next client in the pool (http.rs:127-133)."""


class RateLimited(Exception):
    """HTTP 429 after inner retries exhausted (http.rs:111-117)."""


class HttpStatusError(Exception):
    def __init__(self, status: int, body: bytes = b""):
        self.status = status
        self.body = body
        super().__init__(f"HTTP {status}")


class _HttpClient:
    """One pooled client: a fixed header profile + inner retry loop."""

    def __init__(self, headers: dict, timeout_s: float, max_retries: int,
                 base_delay_s: float, sleeper=time.sleep):
        self.headers = dict(headers)
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.base_delay_s = base_delay_s
        self.sleeper = sleeper

    def get(self, url: str) -> bytes:
        """GET with the reference's inner retry ladder: 429/504/conn-error
        back off ``base * 2^(attempt-1)`` and retry up to max_retries;
        403 raises Forbidden immediately; other 4xx/5xx raise
        HttpStatusError without retry (http.rs:74-156)."""
        attempts = 0
        while True:
            attempts += 1
            try:
                req = urllib.request.Request(url, headers=self.headers)
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    return resp.read()
            except urllib.error.HTTPError as e:
                if e.code == 403:
                    raise Forbidden(url) from e
                if e.code in (429, 504):
                    if attempts >= self.max_retries:
                        if e.code == 429:
                            raise RateLimited(url) from e
                        raise HttpStatusError(e.code) from e
                    self.sleeper(self.base_delay_s * (2 ** (attempts - 1)))
                    continue
                raise HttpStatusError(e.code, e.read() if hasattr(e, "read") else b"") from e
            except urllib.error.URLError as e:
                if attempts >= self.max_retries:
                    raise
                self.sleeper(self.base_delay_s * (2 ** (attempts - 1)))
                continue


class ClientPool:
    """Round-robin pool over the emulation profiles (pool.rs:36-47)."""

    def __init__(self, timeout_s: float, max_retries: int, base_delay_s: float,
                 sleeper=time.sleep):
        self.clients = [
            _HttpClient(h, timeout_s, max_retries, base_delay_s, sleeper)
            for h in EMULATION_PROFILES
        ]
        self._counter = count()

    def current_index(self) -> int:
        return next(self._counter) % len(self.clients)

    def get_client(self, index: int) -> _HttpClient:
        return self.clients[index % len(self.clients)]

    def __len__(self) -> int:
        return len(self.clients)


class HttpVendorBackend:
    """urllib-backed implementation of the vendor-API backend protocol.

    Endpoints (shapes mirror ``src/models/response.rs:3-28``):
      GET {base}/vendors?city_id=C&offset=O&limit=L  -> listing page JSON
      GET {base}/vendors/{code}                      -> details (400 -> None)
      GET {base}/reviews/{code}?limit=30             -> newest-30 reviews
      GET {base}/ratings/{code}                      -> ratings (400 -> None)
    """

    def __init__(self, base_url: str = "http://127.0.0.1:8080",
                 timeout_s: str | float = 30.0,
                 max_retries: str | int = 3,
                 base_delay_s: str | float = 2.0):
        self.base_url = base_url.rstrip("/")
        self.max_retries = int(max_retries)
        self.pool = ClientPool(
            timeout_s=float(timeout_s),
            max_retries=self.max_retries,
            base_delay_s=float(base_delay_s),
        )

    # -- outer loop: client rotation on 403 (api.rs:82-101) ------------

    def _get_rotating(self, url: str) -> bytes:
        # Sample the rotating base ONCE per logical call (successive calls
        # start on successive clients, round-robin); each 403 retry then
        # walks (base + attempt) % n — the reference's exact arithmetic.
        base = self.pool.current_index()
        attempt = 0
        while True:
            if attempt >= self.max_retries:
                raise Forbidden(f"max retries exceeded for {url}")
            client = self.pool.get_client((base + attempt) % len(self.pool))
            try:
                return client.get(url)
            except Forbidden:
                attempt += 1  # next attempt walks to the next client

    # -- protocol ------------------------------------------------------

    def list_page(self, city_id: str, offset: int, limit: int) -> dict:
        body = self._get_rotating(
            f"{self.base_url}/vendors?city_id={city_id}&offset={offset}&limit={limit}"
        )
        return json.loads(body)

    def details(self, code: str) -> str | None:
        try:
            body = self._get_rotating(f"{self.base_url}/vendors/{code}")
        except HttpStatusError as e:
            if e.status == 400:
                return None  # degrade to null row (vendor.rs:96-105)
            raise
        data = json.loads(body).get("data")
        return None if data is None else json.dumps(data, sort_keys=True)

    def reviews(self, code: str) -> list[tuple[str, int]]:
        try:
            body = self._get_rotating(f"{self.base_url}/reviews/{code}?limit=30")
        except HttpStatusError as e:
            if e.status == 400:
                return []
            raise
        items = json.loads(body).get("data") or []
        return [
            (json.dumps(r.get("review", {}), sort_keys=True), int(r["created_at"]))
            for r in items
        ]

    def ratings(self, code: str) -> str | None:
        try:
            body = self._get_rotating(f"{self.base_url}/ratings/{code}")
        except HttpStatusError as e:
            if e.status == 400:
                return None
            raise
        data = json.loads(body).get("data")
        return None if data is None else json.dumps(data, sort_keys=True)
