"""S7 error policy against REAL HTTP status codes (not injected exceptions).

A live stdlib http.server runs on a loopback port for the session; the
urllib-backed fetcher (sources/http_fetcher.py) must map each status arm
onto the exception surface `fetch_details` dispatches on, and the full
mapInPandas fan-out must behave end-to-end: 404 rows skipped, 5xx retried
to success, 429 failing the stage.
"""

from __future__ import annotations

import json
import threading
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from eve_graph_spark.sources.esi import (
    RateLimitError,
    TransientFetchError,
    fetch_details,
    parse_payloads,
)
from eve_graph_spark.sources.http_fetcher import make_http_fetcher


class _Handler(BaseHTTPRequestHandler):
    hits: dict[str, int] = defaultdict(int)
    lock = threading.Lock()

    def do_GET(self):  # noqa: N802 (http.server API)
        with _Handler.lock:
            _Handler.hits[self.path] += 1
            n_hits = _Handler.hits[self.path]
        route = self.path.strip("/").split("/")
        if route[0] == "ok":
            body = json.dumps({"system_id": int(route[1]), "name": f"sys-{route[1]}"})
            self._reply(200, body)
        elif route[0] == "missing":
            self._reply(404, "not found")
        elif route[0] == "rate":
            self._reply(429, "slow down")
        elif route[0] == "flaky":
            # 500 on the first hit per id, then succeed — exercises the
            # bounded-retry arm against a real transient server fault.
            if n_hits == 1:
                self._reply(500, "boom")
            else:
                self._reply(200, json.dumps({"system_id": int(route[1]), "name": "recovered"}))
        elif route[0] == "teapot":
            self._reply(418, "short and stout")
        else:
            self._reply(404, "no route")

    def _reply(self, code: int, body: str) -> None:
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def server_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_200_returns_body(server_url):
    fetch = make_http_fetcher(server_url + "/ok/{id}")
    assert json.loads(fetch(7)) == {"system_id": 7, "name": "sys-7"}


def test_404_maps_to_keyerror(server_url):
    fetch = make_http_fetcher(server_url + "/missing/{id}")
    with pytest.raises(KeyError):
        fetch(1)


def test_429_maps_to_ratelimit(server_url):
    fetch = make_http_fetcher(server_url + "/rate/{id}")
    with pytest.raises(RateLimitError):
        fetch(1)


def test_500_maps_to_transient(server_url):
    _Handler.hits.clear()
    fetch = make_http_fetcher(server_url + "/flaky/{id}")
    with pytest.raises(TransientFetchError):
        fetch(99)
    assert fetch(99) == json.dumps({"system_id": 99, "name": "recovered"})


def test_other_4xx_reraises(server_url):
    import urllib.error

    fetch = make_http_fetcher(server_url + "/teapot/{id}")
    with pytest.raises(urllib.error.HTTPError):
        fetch(1)


def test_connection_refused_maps_to_transient():
    # A port nothing listens on: URLError -> TransientFetchError.
    fetch = make_http_fetcher("http://127.0.0.1:1/{id}", timeout_sec=0.5)
    with pytest.raises(TransientFetchError):
        fetch(1)


def test_fetch_details_end_to_end_over_http(spark, server_url):
    """404 skipped, 500-then-200 retried to success, 200 parsed — the whole
    fan-out path over live sockets."""
    _Handler.hits.clear()

    def dyn_fetch(i: int) -> str:
        kind = {3: "missing", 4: "flaky"}.get(i, "ok")
        return make_http_fetcher(server_url + "/" + kind + "/{id}")(i)

    ids = spark.createDataFrame([(1,), (2,), (3,), (4,)], "system_id long")
    out = fetch_details(ids, dyn_fetch, concurrency=2, backoff_sec=0.01).orderBy("id")
    rows = {r["id"]: r for r in out.collect()}
    assert rows[3]["status"] == "not_found" and rows[3]["payload"] is None
    assert rows[4]["status"] == "ok" and "recovered" in rows[4]["payload"]
    assert rows[1]["status"] == "ok"
    parsed = parse_payloads(
        out, "system_id long, name string"
    ).orderBy("system_id").collect()
    assert [r["system_id"] for r in parsed] == [1, 2, 4]


def test_fetch_details_rate_limit_fails_stage(spark, server_url):
    fetch = make_http_fetcher(server_url + "/rate/{id}")
    ids = spark.createDataFrame([(1,)], "system_id long")
    with pytest.raises(Exception) as ei:
        fetch_details(ids, fetch, concurrency=1).collect()
    assert "RateLimitError" in str(ei.value)
