"""Hostile-input sweep for the round-9 graph operators.

The document/embedding queries have a standing hazard sweep
(test_hostile_documents_parity / test_null_embedding_parity); this is the
graph-side analogue for the operators added this round: empty edge sets,
self-loops, parallel (duplicate) edges, and trivial graphs must produce
sensible results — or raise loudly — on BOTH code paths, never crash with
an analysis error or return silent garbage.
"""

from __future__ import annotations

import pytest


def _e(spark, rows, schema="src_system_id long, dst_system_id long"):
    if rows:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame([], schema)


# --- empty edge set -----------------------------------------------------------


def test_empty_graph_power_iteration_family(spark):
    from eve_graph_spark.operators.graph_analytics import (
        article_rank, eigenvector_centrality, hits,
    )

    e = _e(spark, [])
    assert eigenvector_centrality(e).count() == 0
    assert hits(e).count() == 0
    assert article_rank(e).count() == 0


def test_empty_graph_structure_family(spark):
    from eve_graph_spark.operators.graph_analytics import (
        community_metrics, dag_longest_paths, k_truss, local_clustering_coefficient,
        louvain, minimum_spanning_forest, node_similarity,
    )

    e = _e(spark, [])
    assert local_clustering_coefficient(e).count() == 0
    assert k_truss(e, k=3).count() == 0
    assert minimum_spanning_forest(
        _e(spark, [], "src_system_id long, dst_system_id long, risk double"),
        weight_col="risk",
    ).count() == 0
    assert louvain(e).count() == 0
    assert dag_longest_paths(e).count() == 0
    assert node_similarity(e, src_col="src_system_id", dst_col="dst_system_id").count() == 0
    labels = _e(spark, [], "node long, community long")
    assert community_metrics(e, labels).count() == 0


# --- self-loops ----------------------------------------------------------------


@pytest.mark.slow  # >3s: full-tier only (r14 test tiers)
def test_self_loops_are_inert_in_undirected_operators(spark):
    from eve_graph_spark.operators.graph_analytics import (
        k_truss, local_clustering_coefficient, louvain, minimum_spanning_forest,
    )

    # triangle + a self-loop on every node: the undirected canonicalizers
    # filter src != dst, so results match the loop-free graph exactly.
    # louvain left this list in r10: self-loops now contribute to degree
    # (x2) and m — the aggregated-graph convention multilevel Louvain/
    # Leiden require — so they are deliberately NOT inert there (never
    # phantom nodes though; see test_round10_ops self-loop pins).
    tri = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    loops = [(v, v) for v in (1, 2, 3)]
    clean = _e(spark, tri)
    dirty = _e(spark, tri + loops)
    for op in (
        lambda d: sorted(tuple(r) for r in local_clustering_coefficient(d).collect()),
        lambda d: sorted(tuple(r) for r in k_truss(d, k=3).collect()),
    ):
        assert op(dirty) == op(clean)
    # louvain with self-loops: same node set, no phantom entries, and the
    # self-loop mass shifts degrees/m uniformly here (symmetric triangle)
    got = louvain(dirty, rounds=2)
    assert sorted(r["node"] for r in got.collect()) == [1, 2, 3]
    wtri = [(a, b, 1.0) for a, b in tri] + [(v, v, 0.001) for v in (1, 2, 3)]
    wclean = [(a, b, 1.0) for a, b in tri]
    sch = "src_system_id long, dst_system_id long, risk double"
    assert sorted(
        tuple(r) for r in minimum_spanning_forest(_e(spark, wtri, sch), "risk").collect()
    ) == sorted(
        tuple(r) for r in minimum_spanning_forest(_e(spark, wclean, sch), "risk").collect()
    )


def test_self_loop_cycle_still_rejected_by_dag(spark):
    from eve_graph_spark.operators.graph_analytics import dag_longest_paths

    e = _e(spark, [(1, 2), (2, 2)])
    with pytest.raises(ValueError, match="cycle"):
        dag_longest_paths(e)


# --- parallel (duplicate) edges -------------------------------------------------


def test_parallel_edges_collapse_in_set_operators(spark):
    from eve_graph_spark.operators.graph_analytics import (
        k_truss, local_clustering_coefficient, node_similarity,
    )

    tri = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    dup = _e(spark, tri * 3)
    clean = _e(spark, tri)
    assert sorted(tuple(r) for r in local_clustering_coefficient(dup).collect()) == \
        sorted(tuple(r) for r in local_clustering_coefficient(clean).collect())
    assert sorted(tuple(r) for r in k_truss(dup, k=3).collect()) == \
        sorted(tuple(r) for r in k_truss(clean, k=3).collect())
    assert sorted(tuple(r) for r in node_similarity(
        dup, src_col="src_system_id", dst_col="dst_system_id").collect()) == \
        sorted(tuple(r) for r in node_similarity(
            clean, src_col="src_system_id", dst_col="dst_system_id").collect())


def test_parallel_edges_count_with_multiplicity_in_power_iteration(spark):
    from eve_graph_spark.operators.graph_analytics import eigenvector_centrality

    # GDS multigraph semantics: a doubled edge doubles the contribution —
    # results must DIFFER from the deduped graph (documented, not a bug)
    base = [(1, 2), (2, 1), (2, 3), (3, 2)]
    single = {r["node"]: r["score"]
              for r in eigenvector_centrality(_e(spark, base)).collect()}
    doubled = {r["node"]: r["score"]
               for r in eigenvector_centrality(_e(spark, base + [(1, 2)])).collect()}
    assert single != doubled


# --- trivial graphs --------------------------------------------------------------


def test_single_edge_graphs(spark):
    from eve_graph_spark.operators.graph_analytics import (
        dag_longest_paths, k_truss, local_clustering_coefficient, louvain,
        minimum_spanning_forest,
    )

    e = _e(spark, [(1, 2), (2, 1)])
    lcc = {r["node"]: r["lcc_fp"] for r in local_clustering_coefficient(e).collect()}
    assert lcc == {1: 0, 2: 0}
    assert k_truss(e, k=3).count() == 0  # no triangles at all
    comm = {r["node"]: r["community"] for r in louvain(e, rounds=2).collect()}
    assert comm[1] == comm[2]  # one edge -> one community
    w = _e(spark, [(1, 2, 3.0), (2, 1, 3.0)],
           "src_system_id long, dst_system_id long, risk double")
    mst = [(r["src"], r["dst"]) for r in minimum_spanning_forest(w, "risk").collect()]
    assert mst == [(1, 2)]
    dag = {r["node"]: r["topo_level"]
           for r in dag_longest_paths(_e(spark, [(1, 2)])).collect()}
    assert dag == {1: 0, 2: 1}


def test_fastrp_trivial_and_empty(spark):
    from eve_graph_spark.operators.graph_analytics import fastrp_embeddings

    assert fastrp_embeddings(_e(spark, [])).count() == 0
    one = fastrp_embeddings(_e(spark, [(1, 2), (2, 1)]), dim=4).collect()
    assert {r["node"] for r in one} == {1, 2}
