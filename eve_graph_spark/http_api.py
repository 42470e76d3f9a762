"""HTTP surface for A1-A6 — the reference's six warp routes on stdlib.

Mirrors reference: src/main.rs:37-69 (route table) and :125-171 (error
mapping): a missing route or unknown system returns **404 + {"error":
"route not found"}**, any other failure 500 + {"error": ...}; refresh
endpoints are POST, route queries GET.

stdlib `http.server` on purpose: the target runtime has no web framework,
and the value here is the route/verb/status CONTRACT, not middleware. The
handler dispatches into `GraphEngine` (api.py), which carries all the
semantics; refresh inputs (the reference fetches these from ESI/EVE-Scout
per request, main.rs:84-107) are injected as provider callables returning
DataFrames, so the server composes with either `make_http_fetcher` (live)
or dict fetchers (hermetic tests).

Spark jobs run on the request thread; the server is intentionally
single-threaded (`HTTPServer`, not ThreadingHTTPServer) because one
SparkSession serializing concurrent route queries through one driver is
the same execution model as the reference's single Neo4j session pool.
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, unquote

from pyspark.sql import DataFrame

from eve_graph_spark.api import GraphEngine, RouteNotFound

Provider = Callable[[], DataFrame]


class EngineProviders:
    """Refresh-input providers (the reference's ESI/EVE-Scout calls)."""

    def __init__(self, esi_systems: Provider | None = None,
                 stargates: Provider | None = None,
                 kills: Provider | None = None,
                 jumps_activity: Provider | None = None,
                 signatures: Provider | None = None):
        self.esi_systems = esi_systems
        self.stargates = stargates
        self.kills = kills
        self.jumps_activity = jumps_activity
        self.signatures = signatures


def _make_handler(engine: GraphEngine, providers: EngineProviders):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            # split the query string off the RAW path BEFORE percent-
            # decoding segments — decoding first would let an encoded '?'
            # inside a system name (".../to/What%3F") truncate the name
            path, _, raw_query = self.path.partition("?")
            parts = [unquote(p) for p in path.strip("/").split("/")]
            # GET /shortest-route/{from}/to/{to}   (main.rs:37-40)
            # GET /safest-route/{from}/to/{to}     (main.rs:42-45)
            if len(parts) == 4 and parts[2] == "to" and parts[0] in (
                "shortest-route", "safest-route"
            ):
                fn = (engine.shortest_route if parts[0] == "shortest-route"
                      else engine.safest_route)
                return self._run(lambda: {"route": fn(parts[1], parts[3])})
            # GET /route-alternatives/{from}/to/{to}[?k=N] — beyond the
            # reference's single-route surface: GDS gds.shortestPath.yens
            # parity over the engine's k_shortest_paths_distributed
            if len(parts) == 4 and parts[2] == "to" and parts[0] == "route-alternatives":
                try:
                    k = int(parse_qs(raw_query).get("k", ["3"])[0])
                    if k < 1:
                        raise ValueError
                except ValueError:
                    return self._json(400, {"error": "k must be a positive integer"})
                return self._run(lambda: {"routes": [
                    {"cost": cost, "route": path}
                    for cost, path in engine.route_alternatives(parts[1], parts[3], k)
                ]})
            self._json(404, {"error": "route not found"})

        def do_POST(self):  # noqa: N802
            parts = self.path.strip("/").split("/")
            actions = {
                # POST /systems/refresh   (main.rs:47-51, A3)
                ("systems", "refresh"): lambda: engine.refresh_systems(
                    providers.esi_systems()),
                # POST /systems/risk      (main.rs:53-57, A4)
                ("systems", "risk"): lambda: engine.refresh_risk(
                    providers.kills(), providers.jumps_activity()),
                # POST /stargates/refresh (main.rs:59-63, A5)
                ("stargates", "refresh"): lambda: engine.refresh_stargates(
                    providers.stargates()),
                # POST /wormholes/refresh (main.rs:65-69, A6)
                ("wormholes", "refresh"): lambda: engine.refresh_wormholes(
                    providers.signatures()),
            }
            action = actions.get(tuple(parts))
            if action is None:
                return self._json(404, {"error": "route not found"})
            return self._run(lambda: {"ok": True, "rows": action().count()})

        def _run(self, thunk):
            # error mapping, main.rs:125-151 + :162-169
            try:
                self._json(200, thunk())
            except RouteNotFound:
                self._json(404, {"error": "route not found"})
            except Exception as e:  # noqa: BLE001 — the 500 arm
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet by default
            pass

    return Handler


def serve(engine: GraphEngine, providers: EngineProviders | None = None,
          host: str = "127.0.0.1", port: int = 0) -> tuple[HTTPServer, threading.Thread]:
    """Start the API server on a daemon thread; returns (server, thread).
    Port 0 picks a free port (server.server_address[1]). Call
    server.shutdown() to stop — the reference binds 8008 (main.rs:79)."""
    srv = HTTPServer((host, port), _make_handler(engine, providers or EngineProviders()))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t
