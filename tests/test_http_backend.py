"""Network-free (loopback-only) tests for the real urllib ingestion
backend: 400→null degradation, 403→client-pool rotation with the
reference's (current+attempt) % n walk, 429 inner backoff-retry, and
end-to-end parity with the deterministic fake backend when the HTTP
server serves the fake's own data."""

from __future__ import annotations

import json
import threading
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlparse

import pytest

from food_panda_etl_spark.sources.fake_backend import FakeVendorBackend
from food_panda_etl_spark.sources.http_backend import (
    EMULATION_PROFILES,
    Forbidden,
    HttpVendorBackend,
)

FAKE = FakeVendorBackend()

# codes with scripted failure ladders (hit counts tracked per path)
FORBID_TWICE = "c9-v00001"   # 403, 403, then 200 — forces two rotations
ALWAYS_403 = "c9-v00002"     # never succeeds
RATE_LIMIT_ONCE = "c9-v00004"  # 429 then 200 — inner retry, same client


class _Handler(BaseHTTPRequestHandler):
    server_version = "test"

    def log_message(self, *a):  # silence
        pass

    def _json(self, obj, status=200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _err(self, status):
        self.send_response(status)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_GET(self):  # noqa: N802 (http.server API)
        u = urlparse(self.path)
        q = dict(parse_qsl(u.query))
        srv = self.server
        with srv.lock:
            srv.hits[u.path] += 1
            srv.agents[u.path].append(self.headers.get("User-Agent", ""))
            nth = srv.hits[u.path]
        parts = u.path.strip("/").split("/")
        if parts[0] == "vendors" and len(parts) == 1:
            return self._json(
                FAKE.list_page(q["city_id"], int(q["offset"]), int(q["limit"]))
            )
        code = parts[1]
        if code == ALWAYS_403:
            return self._err(403)
        if code == FORBID_TWICE and nth <= 2:
            return self._err(403)
        if code == RATE_LIMIT_ONCE and parts[0] == "vendors" and nth == 1:
            return self._err(429)
        i = FAKE._idx(code)
        if parts[0] == "vendors":
            if i % 23 == 11:
                return self._err(400)  # detail 400 → null row
            return self._json({"data": json.loads(FAKE.details(code))})
        if parts[0] == "reviews":
            return self._json(
                {"data": [
                    {"review": json.loads(r), "created_at": ts}
                    for r, ts in FAKE.reviews(code)
                ]}
            )
        if parts[0] == "ratings":
            if i % 13 == 5:
                return self._err(400)
            return self._json({"data": json.loads(FAKE.ratings(code))})
        return self._err(404)


@pytest.fixture()
def api_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.lock = threading.Lock()
    srv.hits = defaultdict(int)
    srv.agents = defaultdict(list)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _backend(srv, **kw):
    return HttpVendorBackend(
        base_url=f"http://127.0.0.1:{srv.server_address[1]}",
        base_delay_s=0.0,  # tests never wall-clock sleep
        **kw,
    )


def test_listing_and_lookups_match_fake(api_server):
    b = _backend(api_server)
    assert b.list_page("11", 0, 48) == FAKE.list_page("11", 0, 48)
    for code in ("c9-v00003", "c9-v00042"):
        assert b.details(code) == FAKE.details(code)
        assert b.reviews(code) == FAKE.reviews(code)
        assert b.ratings(code) == FAKE.ratings(code)


def test_http_400_degrades_to_none(api_server):
    b = _backend(api_server)
    assert b.details("c9-v00011") is None   # 11 % 23 == 11 → 400
    assert b.ratings("c9-v00005") is None   # 5 % 13 == 5 → 400


def test_403_rotates_clients_with_current_plus_attempt(api_server):
    """Two 403s then success: the outer loop must walk the pool with
    (current + attempt) % n — i.e. three DIFFERENT client identities hit
    the endpoint, in pool order (api.rs:90-91)."""
    b = _backend(api_server)
    assert b.details(FORBID_TWICE) == FAKE.details(FORBID_TWICE)
    agents = api_server.agents[f"/vendors/{FORBID_TWICE}"]
    assert len(agents) == 3
    assert len(set(agents)) == 3  # three distinct emulation profiles
    uas = [p["User-Agent"] for p in EMULATION_PROFILES]
    start = uas.index(agents[0])
    assert agents == [uas[(start + k) % len(uas)] for k in range(3)]


def test_403_exhaustion_raises_forbidden(api_server):
    b = _backend(api_server)
    with pytest.raises(Forbidden):
        b.details(ALWAYS_403)
    # exactly max_retries attempts were made
    assert api_server.hits[f"/vendors/{ALWAYS_403}"] == 3


def test_429_retries_on_same_client(api_server):
    b = _backend(api_server)
    assert b.details(RATE_LIMIT_ONCE) == FAKE.details(RATE_LIMIT_ONCE)
    agents = api_server.agents[f"/vendors/{RATE_LIMIT_ONCE}"]
    assert len(agents) == 2
    assert agents[0] == agents[1]  # inner retry does NOT rotate (http.rs)


def test_spark_pipeline_over_http_equals_fake(spark, api_server):
    """The Spark source + mapInPandas enrichment run against the live
    loopback server must produce the same rows as the in-process fake —
    the backend spec travels to executors as a string."""
    from food_panda_etl_spark.sources import (
        lookup_vendor_payloads,
        register_vendor_list_source,
    )

    spec = (
        "food_panda_etl_spark.sources.http_backend:HttpVendorBackend"
        f"?base_url=http://127.0.0.1:{api_server.server_address[1]}&base_delay_s=0"
    )
    register_vendor_list_source(spark)
    listed = (
        spark.read.format("vendor_list")
        .option("cities", "11")
        .option("backend", spec)
        .load()
    )
    fake_listed = (
        spark.read.format("vendor_list").option("cities", "11").load()
    )
    assert sorted(r["code"] for r in listed.collect()) == sorted(
        r["code"] for r in fake_listed.collect()
    )

    some = listed.filter("code in ('c11-v00003','c11-v00011','c11-v00042')")
    via_http = {
        r["code"]: r for r in lookup_vendor_payloads(some, backend_spec=spec).collect()
    }
    via_fake = {r["code"]: r for r in lookup_vendor_payloads(some).collect()}
    assert via_http == via_fake
