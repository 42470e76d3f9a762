"""a_star: coordinate-pruned single-pair routing (operators/graph.py).

Pins the three claims its docstring makes:
- parity: path cost == sssp's distance on the jump fixture (both weight
  columns), so the heuristic never changes the answer;
- pruning: on a coordinate-true grid the heuristic settles strictly
  fewer nodes than Dijkstra (h = 0);
- admissibility degradations: a zero-weight edge with real length, or a
  node with missing coordinates, silently drops h to 0 — each scenario
  below is built so the PRE-degradation heuristic would return a
  suboptimal route (the round-7 bug), and the test pins the optimal one.
"""

from __future__ import annotations

import pytest

from eve_graph_spark.operators.graph import a_star, sssp


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


EDGE_SCHEMA = "src long, dst long, weight double"
COORD_SCHEMA = "system_id long, x double, y double, z double"


# --- fixture-graph parity ---------------------------------------------------

@pytest.mark.parametrize("weight_col", ["cost", "risk"])
@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_a_star_cost_matches_sssp_on_fixture(spark, sf_dir, weight_col):
    from eve_graph_spark.sources.graph_fixture import build_coords, build_jumps

    jumps = build_jumps(spark, sf_dir, with_risk=True)
    edges = jumps.select(
        "src_system_id",
        "dst_system_id",
        jumps[weight_col].cast("double").alias("weight"),
    )
    coords = build_coords(spark, sf_dir)
    dist = {
        r["node"]: r["dist"]
        for r in sssp(edges, [3], src_col="src_system_id",
                      dst_col="dst_system_id").collect()
    }
    for target in (9, 17, 24):
        got = a_star(edges, coords, 3, target,
                     src_col="src_system_id", dst_col="dst_system_id")
        assert got is not None
        cost, path = got
        assert cost == pytest.approx(dist[target])
        assert path[0] == 3 and path[-1] == target


# --- pruning on a grid ------------------------------------------------------

def _grid(spark, n):
    """n x n 4-neighbour grid, unit weights, coords = positions (+1 offset
    so no node sits at the all-zero placeholder position)."""
    edges, coords = [], []
    nid = lambda i, j: i * n + j  # noqa: E731
    for i in range(n):
        for j in range(n):
            coords.append((nid(i, j), float(i + 1), float(j + 1), 1.0))
            for di, dj in ((0, 1), (1, 0)):
                ii, jj = i + di, j + dj
                if ii < n and jj < n:
                    edges.append((nid(i, j), nid(ii, jj), 1.0))
                    edges.append((nid(ii, jj), nid(i, j), 1.0))
    return _df(spark, edges, EDGE_SCHEMA), _df(spark, coords, COORD_SCHEMA)


def test_a_star_expands_fewer_than_dijkstra_on_grid(spark):
    # Same-row route (0,0) -> (0,n-1): h = euclidean distance is TIGHT
    # along that row (every off-row node has f strictly above the true
    # cost n-1 and is pruned), while Dijkstra floods the manhattan-ball
    # of radius n-1 — most of the square. A corner-to-corner route would
    # show nothing: euclid underestimates manhattan so badly that every
    # grid node has f <= the true cost and A* degenerates to Dijkstra.
    n = 9
    edges, coords = _grid(spark, n)
    no_coords = _df(spark, [], COORD_SCHEMA)  # all missing -> h = 0 = Dijkstra
    st_a, st_d = {}, {}
    got_a = a_star(edges, coords, 0, n - 1, stats_out=st_a)
    got_d = a_star(edges, no_coords, 0, n - 1, stats_out=st_d)
    assert got_a is not None and got_d is not None
    assert got_a[0] == pytest.approx(got_d[0]) == pytest.approx(float(n - 1))
    assert st_a["expansions"] < st_d["expansions"]


# --- admissibility degradations --------------------------------------------

def test_zero_weight_edge_with_length_degrades_h_and_stays_optimal(spark):
    # s--(w=12)-->t euclid 10; s--(w=1)-->m euclid 0.1; m--(w=0)-->t
    # euclid ~10. With r derived only from w>0 edges (the round-7 code),
    # r = 10/12, h(s) = 12, and t settles via the direct edge at cost 12
    # before the true optimum s->m->t = 1 is explored. The free edge with
    # real length must force r -> inf (h = 0).
    edges = _df(spark, [(1, 2, 12.0), (1, 3, 1.0), (3, 2, 0.0)], EDGE_SCHEMA)
    coords = _df(
        spark,
        [(1, 1.0, 0.0, 1.0), (2, 11.0, 0.0, 1.0), (3, 1.0, 0.1, 1.0)],
        COORD_SCHEMA,
    )
    got = a_star(edges, coords, 1, 2)
    assert got is not None
    cost, path = got
    assert cost == pytest.approx(1.0)
    assert path == [1, 3, 2]


def test_missing_coords_degrade_h_and_stay_optimal(spark):
    # s->x->m->t where m has NO coordinates: its incident euclids read 0,
    # so they never raise r, and h(x) = 9/r overestimates the true
    # remaining cost through m (0.2). Tuned so the pre-fix search settles
    # t via the direct w=10.1 edge (f(t) = 10.1 < f(x) = 1.2 + 9/r);
    # with the degradation (any node missing coords -> h = 0) the true
    # optimum 1.2 + 0.1 + 0.1 is found.
    edges = _df(
        spark,
        [(1, 2, 10.1), (1, 4, 1.2), (4, 5, 0.1), (5, 2, 0.1)],
        EDGE_SCHEMA,
    )
    coords = _df(
        spark,
        [(1, 1.0, 0.0, 1.0), (2, 11.0, 0.0, 1.0), (4, 2.0, 0.0, 1.0)],
        COORD_SCHEMA,
    )
    got = a_star(edges, coords, 1, 2)
    assert got is not None
    cost, path = got
    assert cost == pytest.approx(1.4)
    assert path == [1, 4, 5, 2]


def test_all_zero_coords_count_as_placeholder(spark):
    # same topology as above but m carries the (0,0,0) placeholder the
    # reference writes for unpositioned wormhole systems — must degrade
    # exactly like a missing row
    edges = _df(
        spark,
        [(1, 2, 10.1), (1, 4, 1.2), (4, 5, 0.1), (5, 2, 0.1)],
        EDGE_SCHEMA,
    )
    coords = _df(
        spark,
        [(1, 1.0, 0.0, 1.0), (2, 11.0, 0.0, 1.0), (4, 2.0, 0.0, 1.0),
         (5, 0.0, 0.0, 0.0)],
        COORD_SCHEMA,
    )
    got = a_star(edges, coords, 1, 2)
    assert got is not None
    assert got[0] == pytest.approx(1.4)


def test_a_star_unreachable_returns_none(spark):
    edges = _df(spark, [(1, 2, 1.0)], EDGE_SCHEMA)
    coords = _df(spark, [(1, 1.0, 1.0, 1.0), (2, 2.0, 2.0, 1.0),
                         (3, 3.0, 3.0, 1.0)], COORD_SCHEMA)
    assert a_star(edges, coords, 2, 1) is None  # directed: no back edge


# --- engine wiring ----------------------------------------------------------

@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_engine_heuristic_route_matches_default(spark, sf_dir):
    from eve_graph_spark.api import GraphEngine
    from eve_graph_spark.sources.graph_fixture import (
        build_coords,
        build_jumps,
        build_systems,
    )

    systems = build_systems(spark, sf_dir)
    eng = GraphEngine(
        systems,
        build_jumps(spark, sf_dir, with_risk=True),
        coords=build_coords(spark, sf_dir),
    )
    names = {r["system_id"]: r["name"] for r in systems.collect()}
    a, b = names[0], names[13]
    default = eng.shortest_route(a, b)
    heur = eng.shortest_route(a, b, heuristic=True)
    assert heur[0] == default[0] == a and heur[-1] == default[-1] == b
    # cost = 1 per hop, so equally-optimal routes have equal length even
    # when tie-breaks pick different systems
    assert len(heur) == len(default)
    # risk weights: equal total risk need not mean equal hop count — the
    # cost parity for that weight column is pinned by
    # test_a_star_cost_matches_sssp_on_fixture[risk]; here just the wiring
    safe = eng.safest_route(a, b, heuristic=True)
    assert safe[0] == a and safe[-1] == b


def test_engine_heuristic_without_coords_raises(spark, sf_dir):
    from eve_graph_spark.api import GraphEngine
    from eve_graph_spark.sources.graph_fixture import build_jumps, build_systems

    systems = build_systems(spark, sf_dir)
    eng = GraphEngine(systems, build_jumps(spark, sf_dir, with_risk=True))
    names = {r["system_id"]: r["name"] for r in systems.collect()}
    with pytest.raises(ValueError, match="coords"):
        eng.shortest_route(names[0], names[13], heuristic=True)
