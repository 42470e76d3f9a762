"""GraphFrames-style property-graph API over the engine's operators.

GraphFrames is the de-facto PySpark property-graph interface (vertices DF
with `id`, edges DF with `src`/`dst`); exposing the engine's algorithms
behind the same method names lets graph users keep their call sites. No
GraphFrames jar is required — everything delegates to the self-contained
operators in `operators/graph.py` / `operators/graph_analytics.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eve_graph_spark.operators.graph import sssp
from eve_graph_spark.operators.graph_analytics import (
    connected_components,
    pagerank,
    triangle_count,
)


class PropertyGraph:
    """GraphFrames-convention graph: `vertices` has `id`, `edges` has
    `src`, `dst` and optional weight columns."""

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        if "id" not in vertices.columns:
            raise ValueError("vertices must have an 'id' column")
        if not {"src", "dst"} <= set(edges.columns):
            raise ValueError("edges must have 'src' and 'dst' columns")
        self.vertices = vertices
        self.edges = edges

    @property
    def degrees(self) -> DataFrame:
        """(id, degree) — total degree, GraphFrames-compatible."""
        ends = self.edges.select(F.col("src").alias("id")).unionAll(
            self.edges.select(F.col("dst").alias("id"))
        )
        return ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))

    @property
    def inDegrees(self) -> DataFrame:  # noqa: N802 - GraphFrames name
        return self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("inDegree")
        )

    @property
    def outDegrees(self) -> DataFrame:  # noqa: N802 - GraphFrames name
        return self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("outDegree")
        )

    def shortestPaths(self, landmarks: list[int], weight_col: str | None = None) -> DataFrame:  # noqa: N802
        """Distances from every landmark: (id, distances map<landmark,dist>).
        Unweighted (cost=1) when `weight_col` is None, like GraphFrames;
        weighted via the engine's SSSP otherwise (which GraphFrames lacks).
        All landmarks run as ONE (source, node)-keyed frontier loop
        (multi_source_sssp): O(max diameter) supersteps total, not
        len(landmarks) sequential sweeps."""
        from eve_graph_spark.operators.graph import multi_source_sssp

        e = self.edges.withColumn("__w", F.lit(1.0) if weight_col is None else F.col(weight_col))
        d = multi_source_sssp(
            e, list(landmarks), weight_col="__w", src_col="src", dst_col="dst"
        ).select(F.col("node").alias("id"), F.col("source").alias("lm"), "dist")
        return d.groupBy("id").agg(
            F.map_from_entries(F.collect_list(F.struct("lm", "dist"))).alias("distances")
        )

    def connectedComponents(self) -> DataFrame:  # noqa: N802
        """(id, component) — undirected; edges are symmetrized first."""
        sym = self.edges.select("src", "dst").unionAll(
            self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return connected_components(sym, src_col="src", dst_col="dst").select(
            F.col("node").alias("id"), "component"
        )

    def pageRank(self, maxIter: int = 3, resetProbability: float = 0.15) -> DataFrame:  # noqa: N802,N803
        return pagerank(
            self.edges, iterations=maxIter, damping=1.0 - resetProbability,
            src_col="src", dst_col="dst",
        ).select(F.col("node").alias("id"), F.col("rank").alias("pagerank"))

    def triangleCount(self) -> DataFrame:  # noqa: N802
        sym = self.edges.select("src", "dst").unionAll(
            self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return triangle_count(sym, src_col="src", dst_col="dst")

    def dfs(self, from_id: int, maxDepth: int | None = None) -> DataFrame:  # noqa: N803
        """(node, visit_order) — GDS gds.dfs counterpart: deterministic
        depth-first preorder from `from_id` (smallest unvisited neighbor
        first; see operators.graph.dfs for the sequential-kernel scale
        posture). maxDepth bounds descent depth like GDS."""
        from eve_graph_spark.operators.graph import dfs

        return dfs(self.edges, from_id, src_col="src", dst_col="dst",
                   max_depth=maxDepth)

    def bfs(self, from_id: int, to_id: int) -> list[int]:
        """Unweighted shortest path between two vertex ids (node-id list,
        empty when unreachable) — the GraphFrames bfs result reduced to
        the path itself."""
        from eve_graph_spark.operators.graph import reconstruct_path

        e = self.edges.withColumn("__w", F.lit(1.0))
        # target-pruned: the frontier loop stops once to_id settles
        dist = sssp(e, [from_id], weight_col="__w", src_col="src", dst_col="dst",
                    target_id=to_id)
        return reconstruct_path(dist, to_id)

    def betweennessCentrality(self, sampleSources: int | None = None,  # noqa: N802,N803
                              weightCol: str | None = None) -> DataFrame:  # noqa: N803
        """(id, betweenness) — Brandes over ordered pairs; pass
        sampleSources=k for the source-sampled estimator at scale,
        weightCol for weighted (Dijkstra-Brandes) betweenness
        (graph_analytics.betweenness_centrality semantics)."""
        from eve_graph_spark.operators.graph_analytics import betweenness_centrality

        return betweenness_centrality(
            self.edges, src_col="src", dst_col="dst", sample_sources=sampleSources,
            weight_col=weightCol,
        ).select(F.col("node").alias("id"), "betweenness")

    def closenessCentrality(self, landmarks: int | None = None,  # noqa: N802
                            weightCol: str | None = None) -> DataFrame:  # noqa: N803
        from eve_graph_spark.operators.graph_analytics import closeness_centrality

        return closeness_centrality(
            self.edges, src_col="src", dst_col="dst", landmarks=landmarks,
            weight_col=weightCol,
        ).select(F.col("node").alias("id"), "closeness")

    def harmonicCentrality(self, landmarks: list[int] | None = None,  # noqa: N802
                           weightCol: str | None = None) -> DataFrame:  # noqa: N803
        """(id, harmonic, eccentricity) — Σ 1/d over reachable peers plus
        max distance per source; weightCol switches hop distance to
        weighted shortest-path distance (GDS relationshipWeightProperty
        semantics). `landmarks` = explicit source sample for the scale
        path (rows are emitted per landmark)."""
        from eve_graph_spark.operators.graph_analytics import harmonic_centrality

        return harmonic_centrality(
            self.edges, src_col="src", dst_col="dst", landmarks=landmarks,
            weight_col=weightCol,
        ).select(F.col("node").alias("id"), "harmonic", "eccentricity")

    def articulationPoints(self, candidates: DataFrame | None = None) -> DataFrame:  # noqa: N802
        """(id, reached, is_articulation) — chokepoint vertices whose
        removal disconnects the (symmetrized) graph. All remove-one
        scenarios run as one keyed exclusion-BFS frontier loop; pass
        `candidates` (an id DataFrame) to restrict the scenario set at
        scale (graph_analytics.articulation_points)."""
        from eve_graph_spark.operators.graph_analytics import articulation_points

        return articulation_points(
            self.edges, src_col="src", dst_col="dst", candidates=candidates
        ).select(F.col("node").alias("id"), "reached", "is_articulation")

    def bridges(self) -> DataFrame:
        """(src, dst, reached, is_bridge) per undirected edge — gates whose
        loss disconnects the graph (graph_analytics.bridges)."""
        from eve_graph_spark.operators.graph_analytics import bridges

        return bridges(self.edges, src_col="src", dst_col="dst")

    def randomWalks(self, walksPerNode: int = 2, steps: int = 4) -> DataFrame:  # noqa: N802,N803
        """(walk_id, step, node) — deterministic node2vec-style walk corpus
        seeded from every vertex (graph_analytics.random_walks; the
        "random" next hop is a seeded portable hash, so corpora are
        reproducible across runs and engines)."""
        from eve_graph_spark.operators.graph_analytics import random_walks

        return random_walks(
            self.edges, walks_per_node=walksPerNode, steps=steps,
            nodes=self.vertices.select("id"), src_col="src", dst_col="dst",
        )

    def node2vecWalks(self, walksPerNode: int = 2, steps: int = 4,  # noqa: N802,N803
                      returnMult: int = 4, inoutMult: int = 2) -> DataFrame:  # noqa: N803
        """(walk_id, step, node) — second-order p/q-biased walk corpus
        (graph_analytics.node2vec_walks): return candidates penalized
        returnMult x, out-of-neighborhood inoutMult x, distance-1 free."""
        from eve_graph_spark.operators.graph_analytics import node2vec_walks

        return node2vec_walks(
            self.edges, walks_per_node=walksPerNode, steps=steps,
            return_mult=returnMult, inout_mult=inoutMult,
            nodes=self.vertices.select("id"), src_col="src", dst_col="dst",
        )

    def nodeSimilarity(self, topK: int | None = None) -> DataFrame:  # noqa: N802,N803
        """(node, other, inter, union, jaccard_fp[, rank]) — GDS
        gds.nodeSimilarity parity: Jaccard over out-neighbor sets for
        pairs sharing a neighbor, optionally top-K per node
        (graph_analytics.node_similarity; fixed-point similarity)."""
        from eve_graph_spark.operators.graph_analytics import node_similarity

        return node_similarity(self.edges, top_k=topK, src_col="src", dst_col="dst")

    def eigenvectorCentrality(self, maxIter: int = 3) -> DataFrame:  # noqa: N802,N803
        """(node, score) — GDS gds.eigenvector parity: L2-normalized power
        iteration (graph_analytics.eigenvector_centrality)."""
        from eve_graph_spark.operators.graph_analytics import eigenvector_centrality

        return eigenvector_centrality(self.edges, iterations=maxIter,
                                      src_col="src", dst_col="dst")

    def hits(self, maxIter: int = 2) -> DataFrame:  # noqa: N803
        """(node, hub, authority) — GDS gds.hits parity (Kleinberg HITS,
        graph_analytics.hits)."""
        from eve_graph_spark.operators.graph_analytics import hits

        return hits(self.edges, iterations=maxIter, src_col="src", dst_col="dst")

    def localClusteringCoefficient(self) -> DataFrame:  # noqa: N802
        """(node, degree, triangles, lcc_fp) — GDS
        gds.localClusteringCoefficient parity on the undirected projection
        (graph_analytics.local_clustering_coefficient)."""
        from eve_graph_spark.operators.graph_analytics import (
            local_clustering_coefficient,
        )

        return local_clustering_coefficient(self.edges, src_col="src", dst_col="dst")

    def communityMetrics(self, labels: DataFrame) -> DataFrame:  # noqa: N802
        """(community, nodes, internal, outgoing, incoming, conductance_fp,
        modularity_fp) — GDS gds.conductance + gds.modularity parity for a
        node→community assignment (graph_analytics.community_metrics)."""
        from eve_graph_spark.operators.graph_analytics import community_metrics

        return community_metrics(self.edges, labels, src_col="src", dst_col="dst")

    def personalizedPageRank(self, sourceNodes: list[int],  # noqa: N802,N803
                             maxIter: int = 3,
                             resetProbability: float = 0.15) -> DataFrame:  # noqa: N803
        """(node, rank) — personalized PageRank (GDS sourceNodes): teleport
        mass pinned to sourceNodes (graph_analytics.pagerank(sources=…))."""
        from eve_graph_spark.operators.graph_analytics import pagerank

        return pagerank(self.edges, iterations=maxIter,
                        damping=1.0 - resetProbability,
                        sources=sourceNodes, src_col="src", dst_col="dst")

    def spanningTree(self, weightCol: str = "weight") -> DataFrame:  # noqa: N802,N803
        """(src, dst, weight_fp) — GDS gds.spanningTree parity: minimum
        spanning forest via distributed Borůvka
        (graph_analytics.minimum_spanning_forest)."""
        from eve_graph_spark.operators.graph_analytics import minimum_spanning_forest

        return minimum_spanning_forest(self.edges, weight_col=weightCol,
                                       src_col="src", dst_col="dst")

    def dagLongestPath(self, weightCol: str | None = None) -> DataFrame:  # noqa: N802,N803
        """(node, topo_level, longest_dist_fp) — GDS gds.dag.topologicalSort
        + gds.dag.longestPath parity; raises ValueError on cyclic input
        (graph_analytics.dag_longest_paths)."""
        from eve_graph_spark.operators.graph_analytics import dag_longest_paths

        return dag_longest_paths(self.edges, weight_col=weightCol,
                                 src_col="src", dst_col="dst")

    def louvain(self, rounds: int = 4, maxLevels: int = 1,  # noqa: N803
                weightCol: str | None = None, gamma: float = 1.0,  # noqa: N803
                stats_out: dict | None = None) -> DataFrame:
        """(node, community) — GDS gds.louvain parity: deterministic
        synchronous modularity-optimizing local moves
        (graph_analytics.louvain); maxLevels > 1 stacks levels with
        community aggregation between them
        (graph_analytics.louvain_multilevel, the GDS maxLevels knob);
        weightCol is relationshipWeightProperty; gamma is the GDS
        resolution parameter (>1 → more, smaller communities);
        stats_out receives the GDS ranIterations/didConverge yield
        (rounds, moves_per_round, did_converge; per_level when
        maxLevels > 1).

        Deliberate default divergence from GDS: maxLevels defaults to 1
        here (10 in GDS). The engine runs a FIXED level/round budget for
        deterministic, oracle-replayable output instead of GDS's
        converge-up-to-budget semantics, so stacking 10 levels on an
        already-converged graph would buy nothing and cost 9 no-op
        passes; callers wanting GDS-default depth pass maxLevels=10 and
        read stats_out['did_converge']."""
        from eve_graph_spark.operators.graph_analytics import (
            louvain,
            louvain_multilevel,
        )

        if maxLevels > 1:
            return louvain_multilevel(self.edges, levels=maxLevels,
                                      rounds=rounds, src_col="src",
                                      dst_col="dst", weight_col=weightCol,
                                      gamma=gamma, stats_out=stats_out)
        return louvain(self.edges, rounds=rounds, src_col="src",
                       dst_col="dst", weight_col=weightCol,
                       gamma=gamma, stats_out=stats_out)

    def leiden(self, rounds: int = 4, maxLevels: int = 2,  # noqa: N803
               weightCol: str | None = None, gamma: float = 1.0,  # noqa: N803
               stats_out: dict | None = None) -> DataFrame:
        """(node, community) — GDS gds.leiden counterpart, deterministic:
        louvain local moves + the Leiden refinement (every returned
        community induces a CONNECTED subgraph) + self-loop aggregation
        per level (graph_analytics.leiden); gamma/stats_out as in
        louvain().

        Deliberate default divergence from GDS: maxLevels defaults to 2
        (10 in GDS) — two levels already exercise refinement + one
        aggregation on the fixed budget the deterministic contract needs;
        pass maxLevels=10 for GDS-default depth and read
        stats_out['did_converge'] to see whether the extra levels
        matter."""
        from eve_graph_spark.operators.graph_analytics import leiden

        return leiden(self.edges, levels=maxLevels, rounds=rounds,
                      src_col="src", dst_col="dst", weight_col=weightCol,
                      gamma=gamma, stats_out=stats_out)

    def kTruss(self, k: int = 3) -> DataFrame:  # noqa: N802
        """(src, dst, support) — GDS gds.ktruss parity: maximal subgraph
        where every edge closes >= k-2 in-subgraph triangles
        (graph_analytics.k_truss)."""
        from eve_graph_spark.operators.graph_analytics import k_truss

        return k_truss(self.edges, k=k, src_col="src", dst_col="dst")

    def articleRank(self, maxIter: int = 3,  # noqa: N802,N803
                    resetProbability: float = 0.15) -> DataFrame:  # noqa: N803
        """(node, rank) — GDS gds.articleRank parity: pagerank with
        contributions damped by (deg + avgDeg)
        (graph_analytics.article_rank)."""
        from eve_graph_spark.operators.graph_analytics import article_rank

        return article_rank(self.edges, iterations=maxIter,
                            damping=1.0 - resetProbability,
                            src_col="src", dst_col="dst")

    def fastRP(self, dim: int = 8, iterations: int = 2) -> DataFrame:  # noqa: N802
        """(node, e0..e{dim-1}) — GDS gds.fastRP parity: deterministic
        sparse-projection structural embeddings
        (graph_analytics.fastrp_embeddings)."""
        from eve_graph_spark.operators.graph_analytics import fastrp_embeddings

        return fastrp_embeddings(self.edges, dim=dim, iterations=iterations,
                                 src_col="src", dst_col="dst")

    def k1Coloring(self, maxRounds: int = 12) -> DataFrame:  # noqa: N802,N803
        """(node, color) — GDS gds.beta.k1coloring parity: proper vertex
        coloring via deterministic Jones-Plassmann
        (graph_analytics.k1_coloring)."""
        from eve_graph_spark.operators.graph_analytics import k1_coloring

        return k1_coloring(self.edges, max_rounds=maxRounds,
                           src_col="src", dst_col="dst")

    def sllpa(self, rounds: int = 5, minCount: int = 2,  # noqa: N803
              weightCol: str | None = None) -> DataFrame:  # noqa: N803
        """(node, label, cnt) — GDS gds.sllpa parity: overlapping
        community memberships via speaker-listener label propagation
        (graph_analytics.sllpa). weightCol weights the listen votes
        (weighted SLPA, Xie & Szymanski — the relationshipWeightProperty
        knob)."""
        from eve_graph_spark.operators.graph_analytics import sllpa

        return sllpa(self.edges, rounds=rounds, min_count=minCount,
                     src_col="src", dst_col="dst", weight_col=weightCol)

    def find(self, pattern: str) -> DataFrame:
        """GraphFrames motif finding: `find("(a)-[e]->(b); (b)-[e2]->(c)")`
        returns one row per match with a STRUCT column per named element
        (full vertex/edge attributes), columns in first-appearance order.

        Supported, matching GraphFrames semantics:
        - positive edge terms `(a)-[e]->(b)`; any name may be empty
          (anonymous: matched but not returned, not unified);
        - repeated vertex names unify (same vertex), and DIFFERENT names
          may still bind the same vertex — no implicit distinctness;
        - standalone vertex terms `(a)`;
        - negated terms `!(a)-[]->(b)`: no edge a->b exists; compiled to a
          broadcast-friendly left_anti join. Named edges are not allowed
          inside negations and both endpoints must be bound positively.

        Plan shape: each positive term is ONE equi-join keyed on the
        shared vertex id (never a cartesian for connected patterns — a
        term sharing no vertex with what's bound so far raises, unlike
        GraphFrames' implicit cross join, because at 100 TB that cross
        join is a mistake you want loudly); vertex attributes attach at
        the END via one id-keyed join per named vertex, so motif joins
        carry only ids + named edge structs.
        """
        import re

        term_re = re.compile(
            r"^(!?)\s*\((\w*)\)\s*(?:-\s*\[(\w*)\]\s*->\s*\((\w*)\))?$"
        )
        terms = []
        for raw in pattern.split(";"):
            raw = raw.strip()
            if not raw:
                continue
            m = term_re.match(raw)
            if not m:
                raise ValueError(f"unparseable motif term: {raw!r}")
            neg, a, en, b = m.group(1) == "!", m.group(2), m.group(3), m.group(4)
            if b is None:  # standalone vertex
                if neg:
                    raise ValueError("negated standalone vertex is not supported")
                if not a:
                    raise ValueError("standalone vertex term must be named")
                terms.append(("vertex", a))
            else:
                if neg and en:
                    raise ValueError(
                        f"named edge {en!r} not allowed in negated term"
                    )
                terms.append(("edge", neg, a, en, b))

        edge_attrs = self.edges.columns
        vcol: dict[str, str] = {}  # vertex name -> flat id column in res
        appearance: list[tuple[str, str]] = []  # (kind, name) first-appearance
        edge_structs: dict[str, str] = {}  # edge name -> struct column
        res: DataFrame | None = None
        n_pos = 0

        def note(kind: str, name: str) -> None:
            if name and (kind, name) not in appearance:
                appearance.append((kind, name))

        for t in terms:
            if t[0] == "vertex":
                name = t[1]
                note("v", name)
                if name in vcol:
                    continue
                if res is not None:
                    raise ValueError(
                        f"vertex term ({name}) shares no vertex with the "
                        "pattern so far — disconnected motifs are refused "
                        "(they compile to cross joins)"
                    )
                res = self.vertices.select(F.col("id").alias(f"__v_{name}"))
                vcol[name] = f"__v_{name}"
                continue
            _, neg, a, en, b = t
            if neg:
                if a not in vcol or b not in vcol:
                    raise ValueError(
                        f"negated term endpoints ({a})->({b}) must be bound "
                        "by positive terms first"
                    )
                ne = self.edges.select(
                    F.col("src").alias("__ns"), F.col("dst").alias("__nd")
                )
                res = res.join(
                    ne,
                    (F.col(vcol[a]) == F.col("__ns"))
                    & (F.col(vcol[b]) == F.col("__nd")),
                    "left_anti",
                )
                continue
            if en and en in edge_structs:
                raise ValueError(f"edge name {en!r} used more than once")
            i = n_pos
            n_pos += 1
            sel = [
                F.col("src").alias(f"__s{i}"),
                F.col("dst").alias(f"__d{i}"),
            ]
            if en:
                sel.append(
                    F.struct(*[F.col(c) for c in edge_attrs]).alias(f"__e_{en}")
                )
                edge_structs[en] = f"__e_{en}"
            ei = self.edges.select(*sel)
            note("v", a)
            if en:
                note("e", en)
            note("v", b)
            if res is None:
                res = ei
                if a == b and a:
                    res = res.filter(F.col(f"__s{i}") == F.col(f"__d{i}"))
            else:
                # only conditions that LINK to an already-bound vertex count
                # toward connectivity — a self-loop equality on a brand-new
                # vertex constrains the new side alone, and treating it as
                # a link would let "(a)-[]->(b); (c)-[]->(c)" silently plan
                # the cross join this method exists to refuse
                link_conds = []
                if a and a in vcol:
                    link_conds.append(F.col(vcol[a]) == ei[f"__s{i}"])
                if b and b in vcol:
                    link_conds.append(F.col(vcol[b]) == ei[f"__d{i}"])
                if not link_conds:
                    # covers the new-vertex self-loop too: (c)-[]->(c) with
                    # c unbound links to nothing
                    raise ValueError(
                        f"term ({a})-[{en}]->({b}) shares no vertex with the "
                        "pattern so far — disconnected motifs are refused "
                        "(they compile to cross joins)"
                    )
                cond = link_conds[0]
                for c in link_conds[1:]:
                    cond = cond & c
                res = res.join(ei, cond)
            if a and a not in vcol:
                vcol[a] = f"__s{i}"
            if b and b not in vcol:
                vcol[b] = f"__d{i}"

        if res is None:
            raise ValueError("empty motif pattern")

        vattrs = self.vertices.columns
        out_cols = []
        for kind, name in appearance:
            if kind == "e":
                out_cols.append(F.col(f"__e_{name}").alias(name))
                continue
            vd = self.vertices.select(
                F.col("id").alias(f"__vid_{name}"),
                F.struct(*[F.col(c) for c in vattrs]).alias(f"__vs_{name}"),
            )
            res = res.join(vd, F.col(vcol[name]) == F.col(f"__vid_{name}"))
            out_cols.append(F.col(f"__vs_{name}").alias(name))
        return res.select(*out_cols)
