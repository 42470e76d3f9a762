"""PropertyGraph (GraphFrames-style) API over the engine's algorithms."""

from __future__ import annotations

import pytest

from eve_graph_spark.graph_api import PropertyGraph


@pytest.fixture()
def graph(spark):
    v = spark.createDataFrame([(i, f"n{i}") for i in range(5)], "id long, name string")
    # path 0-1-2-3 plus triangle 0-1-4
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 4), (4, 1)], "src long, dst long"
    )
    sym = e.unionAll(e.selectExpr("dst as src", "src as dst"))
    return PropertyGraph(v, sym)


def test_degrees(graph):
    d = {r["id"]: r["degree"] for r in graph.degrees.collect()}
    assert d[1] == 6 and d[3] == 2  # symmetric edges double the degree
    ind = {r["id"]: r["inDegree"] for r in graph.inDegrees.collect()}
    assert ind[1] == 3


def test_shortest_paths_landmarks(graph):
    rows = {r["id"]: r["distances"] for r in graph.shortestPaths([0, 3]).collect()}
    assert rows[3][0] == 3.0 and rows[3][3] == 0.0
    assert rows[4][0] == 1.0


def test_connected_components_and_triangles(graph):
    comp = {r["id"]: r["component"] for r in graph.connectedComponents().collect()}
    assert len(set(comp.values())) == 1
    assert graph.triangleCount().collect()[0]["n_triangles"] == 1  # 0-1-4


def test_pagerank_and_bfs(graph):
    pr = {r["id"]: r["pagerank"] for r in graph.pageRank(maxIter=3).collect()}
    assert pr[1] == max(pr.values())  # best-connected node
    assert graph.bfs(0, 3) == [0, 1, 2, 3]
    assert graph.bfs(3, 3) == [3]


def test_centralities(graph):
    bet = {r["id"]: r["betweenness"] for r in graph.betweennessCentrality().collect()}
    # node 2 is the only route to 3: carries (s,3)+(3,s) for s in {0,1,4}
    assert bet[3] == 0.0 and bet[2] > bet[3]
    clo = {r["id"]: r["closeness"] for r in graph.closenessCentrality().collect()}
    assert set(clo) == set(range(5)) and all(v > 0 for v in clo.values())
    # sampled estimator returns the same node universe
    samp = graph.betweennessCentrality(sampleSources=3)
    assert {r["id"] for r in samp.collect()} == set(range(5))


@pytest.mark.slow  # >3s: full-tier only (r14 test tiers)
def test_chokepoints_and_walks(graph):
    # path 0-1-2-3 + triangle 0-1-4: articulation = {1 (cuts 2,3 side), 2
    # (cuts 3)}; bridges = the path edges (1,2),(2,3); triangle edges are
    # on a cycle
    ap = {r["id"]: r["is_articulation"] for r in graph.articulationPoints().collect()}
    assert {i for i, a in ap.items() if a == 1} == {1, 2}
    br = {(r["src"], r["dst"]): r["is_bridge"] for r in graph.bridges().collect()}
    assert {p for p, b in br.items() if b == 1} == {(1, 2), (2, 3)}
    # candidate restriction narrows the scenario set, same verdicts
    cand = graph.vertices.selectExpr("id").where("id in (1, 3)")
    sub = {r["id"]: r["is_articulation"] for r in graph.articulationPoints(cand).collect()}
    assert sub == {1: 1, 3: 0}

    walks = graph.randomWalks(walksPerNode=1, steps=3).collect()
    by_walk = {}
    for r in walks:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert len(by_walk) == 5  # one walk per vertex
    edge_set = {(r["src"], r["dst"]) for r in graph.edges.collect()}
    for steps in by_walk.values():
        for i in range(len(steps) - 1):
            assert (steps[i], steps[i + 1]) in edge_set


def test_node2vec_walks_api(graph):
    walks = graph.node2vecWalks(walksPerNode=1, steps=3, returnMult=100).collect()
    by_walk = {}
    for r in walks:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert len(by_walk) == 5
    edge_set = {(r["src"], r["dst"]) for r in graph.edges.collect()}
    for steps in by_walk.values():
        seq = [steps[i] for i in sorted(steps)]
        for i in range(len(seq) - 1):
            assert (seq[i], seq[i + 1]) in edge_set


@pytest.fixture()
def motif_graph(spark):
    v = spark.createDataFrame(
        [(i, f"n{i}") for i in range(4)], "id long, name string"
    )
    # directed: 0->1, 1->2, 0->2 (shortcut), 2->3, 3->3 (self-loop)
    e = spark.createDataFrame(
        [(0, 1, 10.0), (1, 2, 20.0), (0, 2, 5.0), (2, 3, 1.0), (3, 3, 7.0)],
        "src long, dst long, w double",
    )
    return PropertyGraph(v, e)


def test_motif_two_hop(motif_graph):
    rows = motif_graph.find("(a)-[e1]->(b); (b)-[e2]->(c)").collect()
    triples = {(r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in rows}
    assert triples == {(0, 1, 2), (1, 2, 3), (0, 2, 3), (2, 3, 3), (3, 3, 3)}
    # struct columns carry full attributes, columns in appearance order
    r = next(x for x in rows if (x["a"]["id"], x["b"]["id"], x["c"]["id"]) == (0, 1, 2))
    assert [f for f in rows[0].asDict()] == ["a", "e1", "b", "e2", "c"]
    assert r["e1"]["w"] == 10.0 and r["e2"]["w"] == 20.0
    assert r["b"]["name"] == "n1"


def test_motif_negation(motif_graph):
    # two-hop pairs with NO direct shortcut edge a->c
    rows = motif_graph.find("(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)").collect()
    triples = {(r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in rows}
    # (0,1,2) killed by 0->2; self-loop triples killed by their own edge
    assert triples == {(1, 2, 3), (0, 2, 3)}
    assert [f for f in rows[0].asDict()] == ["a", "b", "c"]


def test_motif_self_loop_unification(motif_graph):
    rows = motif_graph.find("(x)-[e]->(x)").collect()
    assert [(r["x"]["id"], r["e"]["w"]) for r in rows] == [(3, 7.0)]


def test_motif_anonymous_and_standalone(motif_graph):
    # anonymous middle vertex: not returned, not unified
    rows = motif_graph.find("(a)-[]->(); (a)-[e]->(b)").collect()
    assert all(list(r.asDict()) == ["a", "e", "b"] for r in rows)
    # every a with any out-edge pairs with each of its out-edges
    pairs = {(r["a"]["id"], r["b"]["id"]) for r in rows}
    assert (0, 1) in pairs and (0, 2) in pairs
    # standalone vertex term after binding is a no-op
    n = motif_graph.find("(a)-[e]->(b); (a)").count()
    assert n == motif_graph.find("(a)-[e]->(b)").count() == 5


def test_motif_rejects_bad_patterns(motif_graph):
    with pytest.raises(ValueError, match="disconnected"):
        motif_graph.find("(a)-[]->(b); (c)-[]->(d)")
    assert motif_graph.find("(a)").count() == 4  # lone vertex term: all vertices
    with pytest.raises(ValueError, match="disconnected"):
        motif_graph.find("(a)-[]->(b); (z)")  # unbound standalone after edges
    with pytest.raises(ValueError, match="unparseable"):
        motif_graph.find("(a)-->(b)")
    with pytest.raises(ValueError, match="negated"):
        motif_graph.find("(a)-[]->(b); !(a)-[e]->(b)")
    with pytest.raises(ValueError, match="bound"):
        motif_graph.find("(a)-[]->(b); !(a)-[]->(z)")
    with pytest.raises(ValueError, match="more than once"):
        motif_graph.find("(a)-[e]->(b); (b)-[e]->(c)")
    # a self-loop on a NEW vertex links to nothing — refused, not
    # silently cross-joined (code-review finding r9)
    with pytest.raises(ValueError, match="disconnected"):
        motif_graph.find("(a)-[]->(b); (c)-[]->(c)")


def test_motif_plan_has_no_cartesian(motif_graph):
    plan = (
        motif_graph.find("(a)-[e1]->(b); (b)-[e2]->(c); !(a)-[]->(c)")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
