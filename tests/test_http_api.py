"""A1-A6 over live HTTP: the stdlib server (http_api.py) must mirror the
reference's route table, verbs, and status mapping (main.rs:37-69,
:125-171) — 404 + {"error": "route not found"} for missing routes and
unknown systems, 200 JSON payloads otherwise, POST-only refreshes."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from eve_graph_spark import schemas
from eve_graph_spark.api import GraphEngine
from eve_graph_spark.http_api import EngineProviders, serve


def _sys(sid, name, kills=0, jumps=10, gates=()):
    return (sid, name, -1, 0.5, "B", -1, 0.0, 0.0, 0.0, [], list(gates), kills, jumps)


def _gate(gid, sid, dest_gid, dest_sid):
    return (gid, sid, dest_gid, dest_sid, f"gate-{gid}", 0.0, 0.0, 0.0, 29624)


@pytest.fixture(scope="module")
def api(spark):
    # line 1-2-3-4, hot system 3, wormhole signature 1<->4
    systems = [_sys(i, f"Sys{i}", kills=(5 if i == 3 else 0), gates=[i * 10, i * 10 + 1])
               for i in range(1, 5)]
    gates = []
    for a in range(1, 4):
        b = a + 1
        gates.append(_gate(a * 10, a, b * 10 + 1, b))
        gates.append(_gate(b * 10 + 1, b, a * 10, a))
    esi_systems = spark.createDataFrame(systems, schemas.SYSTEM)
    stargates = spark.createDataFrame(gates, schemas.STARGATE)
    kills = spark.createDataFrame([(i, 5 if i == 3 else 0) for i in range(1, 5)],
                                  schemas.SYSTEM_KILLS)
    jumps_act = spark.createDataFrame([(i, 10) for i in range(1, 5)], schemas.SYSTEM_JUMPS)
    sigs = spark.createDataFrame(
        [("w1", "wormhole", 1, 4)],
        "id string, signature_type string, in_system_id long, out_system_id long",
    )
    eng = GraphEngine(spark.createDataFrame([], schemas.SYSTEM),
                      spark.createDataFrame([], schemas.JUMP))
    eng.bootstrap(esi_systems, stargates, kills, jumps_act, sigs)
    providers = EngineProviders(
        esi_systems=lambda: esi_systems, stargates=lambda: stargates,
        kills=lambda: kills, jumps_activity=lambda: jumps_act,
        signatures=lambda: sigs,
    )
    srv, _ = serve(eng, providers)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def _post(url):
    req = urllib.request.Request(url, method="POST", data=b"")
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_shortest_route_endpoint(api):
    status, body = _get(api + "/shortest-route/Sys1/to/Sys4")
    assert status == 200
    # wormhole shortcut: 1 -> 4 direct
    assert body == {"route": ["Sys1", "Sys4"]}


def test_safest_route_endpoint(api):
    status, body = _get(api + "/safest-route/Sys1/to/Sys4")
    assert status == 200
    assert body["route"][0] == "Sys1" and body["route"][-1] == "Sys4"


def test_unknown_system_is_404_with_reference_body(api):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(api + "/shortest-route/Sys1/to/Nowhere")
    assert ei.value.code == 404
    assert json.loads(ei.value.read()) == {"error": "route not found"}


def test_unknown_route_is_404(api):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(api + "/no-such/endpoint")
    assert ei.value.code == 404


@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_refresh_endpoints_post_only(api):
    for path in ("/systems/refresh", "/systems/risk",
                 "/stargates/refresh", "/wormholes/refresh"):
        status, body = _post(api + path)
        assert status == 200, path
        assert body["ok"] is True and body["rows"] > 0, path
    # GET on a refresh path is not a route
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(api + "/systems/refresh")
    assert ei.value.code == 404


@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_routes_still_work_after_http_refreshes(api):
    status, body = _get(api + "/shortest-route/Sys1/to/Sys4")
    assert status == 200 and body["route"] == ["Sys1", "Sys4"]


@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_route_alternatives_endpoint(api):
    status, body = _get(api + "/route-alternatives/Sys1/to/Sys4?k=2")
    assert status == 200
    routes = body["routes"]
    assert 1 <= len(routes) <= 2
    # best first: the wormhole shortcut, then the 3-gate chain
    assert routes[0]["route"] == ["Sys1", "Sys4"]
    costs = [r["cost"] for r in routes]
    assert costs == sorted(costs)
    if len(routes) == 2:
        assert routes[1]["route"] == ["Sys1", "Sys2", "Sys3", "Sys4"]
    # default k, no query string
    status, body = _get(api + "/route-alternatives/Sys1/to/Sys4")
    assert status == 200 and body["routes"][0]["route"] == ["Sys1", "Sys4"]
    # unknown system maps to the reference 404 body
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(api + "/route-alternatives/Sys1/to/NOPE")
    assert ei.value.code == 404
    # malformed k is a 400, not a 500
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(api + "/route-alternatives/Sys1/to/Sys4?k=abc")
    assert ei.value.code == 400
