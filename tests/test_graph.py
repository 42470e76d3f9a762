"""SSSP engine vs a pure-Python Dijkstra oracle, plus route-API semantics."""

from __future__ import annotations

import heapq

import pytest
from pyspark.sql import functions as F

from eve_graph_spark.api import GraphEngine, RouteNotFound
from eve_graph_spark.operators.graph import ProjectionRegistry, reconstruct_path, sssp
from eve_graph_spark.sources.graph_fixture import build_jumps, build_systems


def py_dijkstra(edges: list[tuple[int, int, float]], src: int) -> dict[int, float]:
    adj: dict[int, list[tuple[int, float]]] = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


@pytest.fixture(scope="module")
def fixture_edges(spark, sf_dir):
    jumps = build_jumps(spark, sf_dir)
    rows = jumps.collect()
    return jumps, [(r["src_system_id"], r["dst_system_id"], r["risk"]) for r in rows]


def test_sssp_cost_matches_dijkstra(spark, fixture_edges):
    jumps, ewr = fixture_edges
    expected = py_dijkstra([(u, v, 1.0) for u, v, _ in ewr], 0)
    got = {
        r["node"]: r["dist"]
        for r in sssp(jumps, [0], weight_col="cost",
                      src_col="src_system_id", dst_col="dst_system_id").collect()
    }
    assert got == expected


def test_sssp_risk_matches_dijkstra(spark, fixture_edges):
    jumps, ewr = fixture_edges
    expected = py_dijkstra(ewr, 0)
    got = {
        r["node"]: r["dist"]
        for r in sssp(jumps, [0], weight_col="risk",
                      src_col="src_system_id", dst_col="dst_system_id").collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], rel=1e-12)


def test_reconstructed_path_is_valid(spark, fixture_edges):
    jumps, ewr = fixture_edges
    edge_set = {(u, v) for u, v, _ in ewr}
    dist = sssp(jumps, [0], weight_col="risk", src_col="src_system_id", dst_col="dst_system_id")
    path = reconstruct_path(dist, 13)
    assert path[0] == 0 and path[-1] == 13
    for a, b in zip(path, path[1:]):
        assert (a, b) in edge_set
    # path total equals the reported shortest distance
    w = {(u, v): r for u, v, r in ewr}
    total = sum(w[(a, b)] for a, b in zip(path, path[1:]))
    d13 = {r["node"]: r["dist"] for r in dist.collect()}[13]
    assert total == pytest.approx(d13, rel=1e-12)


def test_oracle_sssp_bounds_are_safe(spark, fixture_edges):
    """The DuckDB recursive-CTE oracles bound dist at 30 (cost) / 80
    (weighted). Assert true shortest distances sit well inside the bounds
    so the enumeration provably covers the optimum."""
    _, ewr = fixture_edges
    cost_d = py_dijkstra([(u, v, 1.0) for u, v, _ in ewr], 0)
    assert max(cost_d.values()) < 15
    kills = {r["system_id"]: r["kills"] for r in
             build_systems(spark, "/root/testdata/sf0.001").collect()}
    wd = py_dijkstra([(u, v, float((kills[v] * kills[v]) % 7 + 1)) for u, v, _ in ewr], 3)
    assert max(wd.values()) < 40


def test_distributed_loop_matches_local_fast_path(spark, fixture_edges):
    """driver_threshold=0 forces the iterative DataFrame loop; it must
    produce bit-identical (node, dist) to the driver-local fast path."""
    jumps, _ = fixture_edges
    local = {
        r["node"]: r["dist"]
        for r in sssp(jumps, [0], weight_col="risk",
                      src_col="src_system_id", dst_col="dst_system_id").collect()
    }
    dist = {
        r["node"]: r["dist"]
        for r in sssp(jumps, [0], weight_col="risk", src_col="src_system_id",
                      dst_col="dst_system_id", driver_threshold=0).collect()
    }
    assert dist == local


@pytest.mark.slow  # >3s: full-tier only (r14 test tiers)
def test_multi_source_sssp_per_source_parity(spark, fixture_edges):
    """(source, node)-keyed state: per-source (dist, pred) equal k
    independent sssp() runs, on BOTH the driver fast path and the
    distributed one-frontier loop (driver_threshold=0)."""
    from eve_graph_spark.operators.graph import multi_source_sssp

    jumps, _ = fixture_edges
    sources = [0, 3]
    expect = {}
    for s in sources:
        for r in sssp(jumps, [s], weight_col="risk", src_col="src_system_id",
                      dst_col="dst_system_id").collect():
            expect[(s, r["node"])] = (r["dist"], r["pred"])
    for thr in (None, 0):
        kwargs = {} if thr is None else {"driver_threshold": 0}
        got = {
            (r["source"], r["node"]): (r["dist"], r["pred"])
            for r in multi_source_sssp(
                jumps, sources, weight_col="risk", src_col="src_system_id",
                dst_col="dst_system_id", **kwargs
            ).collect()
        }
        assert got == expect, thr


def test_graph_engine_routes(spark, sf_dir):
    systems = build_systems(spark, sf_dir)
    jumps = build_jumps(spark, sf_dir)
    eng = GraphEngine(systems, jumps)
    names = {r["system_id"]: r["name"] for r in systems.collect()}
    route = eng.shortest_route(names[0], names[13])
    assert route[0] == names[0] and route[-1] == names[13]
    safe = eng.safest_route(names[0], names[13])
    assert safe[0] == names[0] and safe[-1] == names[13]
    with pytest.raises(RouteNotFound):
        eng.shortest_route(names[0], "NO-SUCH-SYSTEM")


def test_k_shortest_paths_ranked_and_distinct(spark):
    from eve_graph_spark.operators.graph import k_shortest_paths

    # diamond with a longer detour: 0->1->3 (cost 2), 0->2->3 (cost 3),
    # 0->1->2->3 (cost 4)
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 3, 1.0), (0, 2, 2.0), (2, 3, 1.0), (1, 2, 2.0)],
        "src long, dst long, weight double",
    )
    routes = k_shortest_paths(e, 0, 3, k=3)
    assert [(c, p) for c, p in routes] == [
        (2.0, [0, 1, 3]),
        (3.0, [0, 2, 3]),
        (4.0, [0, 1, 2, 3]),
    ]


@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_k_shortest_distributed_matches_driver(spark, sf_dir):
    """The batched-spur-sweep distributed Yen's returns the same ranked
    (cost, path) list as the driver twin on the fixture graph (top-4
    simple-path costs are distinct there, so output is implementation-
    independent — see route_alternatives_k3). driver_threshold=0 forces
    the distributed machinery; stats pin that spur sweeps are batched
    (one sweep per Yen round, not one per spur)."""
    from eve_graph_spark.operators.graph import (
        k_shortest_paths,
        k_shortest_paths_distributed,
    )
    from eve_graph_spark.sources.graph_fixture import build_jumps

    e = build_jumps(spark, sf_dir).select(
        F.col("src_system_id").alias("src"),
        F.col("dst_system_id").alias("dst"),
        F.floor(F.col("risk") * 1_000_000 + F.lit(0.5)).cast("long").alias("w"),
    )
    local = k_shortest_paths(e, 1, 13, k=3, weight_col="w")
    stats: dict = {}
    dist = k_shortest_paths_distributed(
        e, 1, 13, k=3, weight_col="w", driver_threshold=0, stats_out=stats
    )
    assert dist == local
    assert [c for c, _ in dist] == [9441717.0, 9697133.0, 14013145.0]
    # 1 first-path sweep + 2 Yen rounds = 3 sweeps TOTAL, regardless of
    # how many spur nodes each round fans out
    assert stats["sweeps"] == 3


def test_k_shortest_distributed_target_early_exit(spark):
    """The banned multi-sweep carries sssp()'s single-pair cut: on a long
    chain with the target near the source, the sweep must stop a few
    supersteps after the target settles instead of walking the whole
    chain (frontier rows at/past the settled target dist are pruned)."""
    from eve_graph_spark.operators.graph import k_shortest_paths_distributed

    n = 30
    e = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n)], "src long, dst long, weight double"
    )
    stats: dict = {}
    routes = k_shortest_paths_distributed(
        e, 0, 3, k=1, driver_threshold=0, stats_out=stats
    )
    assert routes == [(3.0, [0, 1, 2, 3])]
    assert stats["sweeps"] == 1
    # unpruned, the single sweep would run ~n supersteps
    assert stats["sweep_iterations"] <= 6


def test_k_shortest_distributed_no_route(spark):
    from eve_graph_spark.operators.graph import k_shortest_paths_distributed

    e = spark.createDataFrame(
        [(0, 1, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    assert k_shortest_paths_distributed(e, 0, 3, k=2, driver_threshold=0) == []


def test_route_alternatives_api(spark, sf_dir):
    from eve_graph_spark.sources.graph_fixture import build_jumps, build_systems

    eng = GraphEngine(build_systems(spark, sf_dir), build_jumps(spark, sf_dir))
    names = {r["system_id"]: r["name"] for r in eng.systems.collect()}
    routes = eng.route_alternatives(names[0], names[13], k=3)
    costs = [c for c, _ in routes]
    assert costs == sorted(costs) and len(routes) == 3
    assert all(p[0] == names[0] and p[-1] == names[13] for _, p in routes)
    assert len({tuple(p) for _, p in routes}) == 3  # distinct paths


def test_projection_registry(spark, sf_dir):
    jumps = build_jumps(spark, sf_dir)
    reg = ProjectionRegistry()
    reg.project("system-map", jumps, "cost")
    assert reg.exists("system-map")
    assert not reg.exists("jump-risk")
    reg.refresh("system-map", jumps, "cost")
    reg.drop("system-map")
    assert not reg.exists("system-map")


def test_apply_delta_truncates_lineage_periodically(spark, sf_dir):
    """A persisted projection's RECOVERY lineage is still its logical plan:
    without periodic truncation, N deltas = an N-deep left_anti+union chain
    that a cache eviction replays in full. Every CHECKPOINT_EVERY_DELTAS-th
    delta must anchor the plan (localCheckpoint), after which the chain is
    gone — and the rows must match a from-scratch rebuild regardless."""
    jumps = build_jumps(spark, sf_dir)
    reg = ProjectionRegistry()
    reg.project("system-map", jumps, "cost")
    n = ProjectionRegistry.CHECKPOINT_EVERY_DELTAS
    for i in range(n):
        added = spark.createDataFrame(
            [(1000 + i, 2000 + i, 1)],
            "src_system_id long, dst_system_id long, cost long",
        )
        reg.apply_delta("system-map", added, None, "cost")
    assert reg._deltas_since_anchor["system-map"] == 0
    plan = reg.get("system-map")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Union" not in plan  # anchored: no delta chain left to replay
    # content parity with a from-scratch projection over the same edges
    expected = jumps.select("src_system_id", "dst_system_id").count() + n
    assert reg.get("system-map").count() == expected
    reg.drop("system-map")


def test_reconstruct_path_iterative_mode_matches_driver_mode(spark, fixture_edges):
    """Distributed path walk: same path as the collect-the-map walk, and it
    never collects the vertex-sized dist table (scale-killer fix, r5)."""
    jumps, _ = fixture_edges
    dist = sssp(jumps, [0], weight_col="risk",
                src_col="src_system_id", dst_col="dst_system_id")
    stats_drv, stats_it = {}, {}
    p_driver = reconstruct_path(dist, 13, stats_out=stats_drv)
    p_iter = reconstruct_path(dist, 13, driver_threshold=0, stats_out=stats_it)
    assert stats_drv["mode"] == "driver"
    assert stats_it["mode"] == "iterative"
    assert p_iter == p_driver
    assert p_iter[0] == 0 and p_iter[-1] == 13
    # rows fetched == path length, NOT vertex count
    assert stats_it["rows_collected"] == len(p_iter)
    assert stats_it["rows_collected"] < dist.count()


def test_reconstruct_path_iterative_unreachable_target(spark, fixture_edges):
    jumps, _ = fixture_edges
    dist = sssp(jumps, [0], weight_col="risk",
                src_col="src_system_id", dst_col="dst_system_id")
    stats = {}
    assert reconstruct_path(dist, 999_999, driver_threshold=0, stats_out=stats) == []
    assert stats["mode"] == "iterative" and stats["rows_collected"] == 0


def test_fits_driver_probe_is_memoized(spark, sf_dir):
    """Six analytics over one snapshot must pay ONE probe job (r5 item 7)."""
    from eve_graph_spark.operators import graph as G

    jumps = build_jumps(spark, sf_dir)
    e = jumps.select(F.col("src_system_id").alias("src"), F.col("dst_system_id").alias("dst"))
    G.clear_probe_cache()
    tracker = spark.sparkContext.statusTracker()
    before_ids = set(tracker.getJobIdsForGroup() or [])
    assert G.fits_driver(e, 2_000_000)
    mid_ids = set(tracker.getJobIdsForGroup() or [])
    assert len(mid_ids - before_ids) >= 1  # first probe ran a job
    # an equivalent-but-distinct plan object hits the memo: zero new jobs
    e2 = jumps.select(F.col("src_system_id").alias("src"), F.col("dst_system_id").alias("dst"))
    assert G.fits_driver(e2, 2_000_000)
    after_ids = set(tracker.getJobIdsForGroup() or [])
    assert after_ids == mid_ids


@pytest.mark.slow  # >3s: full-tier only (r14 test tiers)
def test_sssp_target_early_exit_distributed_chain(spark):
    """r6 verdict item 1: with a target at layer 10 of a long chain, the
    distributed loop must stop ~when the target settles, not relax the
    whole graph — and the path entries must be the full run's values."""
    n, target = 60, 10
    e = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], "src long, dst long, weight double"
    )
    st: dict = {}
    dist = sssp(e, [0], driver_threshold=0, target_id=target, stats_out=st)
    rows = {r["node"]: (r["dist"], r["pred"]) for r in dist.collect()}
    assert st["early_exit"] is True
    assert st["iterations"] <= target + 2  # ~11 supersteps, not 60
    assert reconstruct_path(dist, target) == list(range(target + 1))
    for i in range(target + 1):
        assert rows[i] == (float(i), None if i == 0 else i - 1)


@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_sssp_target_early_exit_branchy_parity(spark, fixture_edges):
    """On the branchy risk fixture the target-pruned distributed run must
    agree with the full distributed run on every entry with
    dist <= dist(target) — the contract reconstruct_path depends on."""
    jumps, _ = fixture_edges
    full = {
        r["node"]: (r["dist"], r["pred"])
        for r in sssp(jumps, [0], weight_col="risk", src_col="src_system_id",
                      dst_col="dst_system_id", driver_threshold=0).collect()
    }
    st: dict = {}
    pruned_df = sssp(jumps, [0], weight_col="risk", src_col="src_system_id",
                     dst_col="dst_system_id", driver_threshold=0,
                     target_id=13, stats_out=st)
    pruned = {r["node"]: (r["dist"], r["pred"]) for r in pruned_df.collect()}
    d13 = full[13][0]
    for node, (d, p) in full.items():
        if d <= d13:
            assert pruned[node] == (d, p), node
    assert reconstruct_path(pruned_df, 13) == reconstruct_path(
        sssp(jumps, [0], weight_col="risk", src_col="src_system_id",
             dst_col="dst_system_id", driver_threshold=0), 13
    )


def test_sssp_target_early_exit_driver_path(spark, fixture_edges):
    jumps, _ = fixture_edges
    full = {
        r["node"]: (r["dist"], r["pred"])
        for r in sssp(jumps, [0], weight_col="risk", src_col="src_system_id",
                      dst_col="dst_system_id").collect()
    }
    pruned = {
        r["node"]: (r["dist"], r["pred"])
        for r in sssp(jumps, [0], weight_col="risk", src_col="src_system_id",
                      dst_col="dst_system_id", target_id=13).collect()
    }
    d13 = full[13][0]
    for node, (d, p) in full.items():
        if d <= d13:
            assert pruned[node] == (d, p), node


def test_sssp_target_edge_cases(spark):
    # target == source: exits after one round, path is the single node
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    st: dict = {}
    dist = sssp(e, [0], driver_threshold=0, target_id=0, stats_out=st)
    assert st["early_exit"] and st["iterations"] == 1
    assert reconstruct_path(dist, 0) == [0]
    # unreachable target: no early exit, loop drains normally, empty path
    e2 = spark.createDataFrame(
        [(0, 1, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    st2: dict = {}
    dist2 = sssp(e2, [0], driver_threshold=0, target_id=3, stats_out=st2)
    assert st2["early_exit"] is False
    assert reconstruct_path(dist2, 3) == []


def test_multi_source_sssp_dedups_repeated_sources(spark, fixture_edges):
    from eve_graph_spark.operators.graph import multi_source_sssp

    jumps, _ = fixture_edges
    once = multi_source_sssp(jumps, [0], weight_col="risk",
                             src_col="src_system_id", dst_col="dst_system_id").collect()
    twice = multi_source_sssp(jumps, [0, 0], weight_col="risk",
                              src_col="src_system_id", dst_col="dst_system_id").collect()
    assert sorted(map(tuple, twice)) == sorted(map(tuple, once))


def test_graph_engine_chokepoints(spark, sf_dir):
    from eve_graph_spark.sources.graph_fixture import build_choke_edges

    # full fixture graph: the ring keeps it 2-connected -> no chokepoints
    eng = GraphEngine(build_systems(spark, sf_dir), build_jumps(spark, sf_dir))
    rows = eng.chokepoints().collect()
    assert len(rows) == 25 and all(r["is_articulation"] == 0 for r in rows)
    assert all(r["name"] for r in rows)  # systems dim joined on

    # hub-tree subgraph as the live jump table: the 5 hubs articulate
    choke = build_choke_edges(spark, sf_dir).select(
        F.col("src").alias("src_system_id"), F.col("dst").alias("dst_system_id"),
    )
    eng2 = GraphEngine(build_systems(spark, sf_dir), choke)
    arts = {r["system_id"] for r in eng2.chokepoints().collect() if r["is_articulation"]}
    assert arts == {0, 1, 2, 3, 4}


def test_graph_engine_route_avoid_list(spark, sf_dir):
    systems = build_systems(spark, sf_dir)
    eng = GraphEngine(systems, build_jumps(spark, sf_dir))
    names = {r["system_id"]: r["name"] for r in systems.collect()}
    base = eng.shortest_route(names[0], names[13])
    # avoiding a system ON the base route forces a different path
    mid = base[len(base) // 2]
    detour = eng.shortest_route(names[0], names[13], avoid=[mid])
    assert mid not in detour
    assert detour[0] == names[0] and detour[-1] == names[13]
    assert len(detour) >= len(base)  # a detour is never shorter
    # avoiding the destination itself -> 404 semantics
    with pytest.raises(RouteNotFound):
        eng.shortest_route(names[0], names[13], avoid=[names[13]])
    # avoid list also applies to the risk projection
    safe = eng.safest_route(names[0], names[13], avoid=[mid])
    assert mid not in safe and safe[-1] == names[13]
