"""Graph analytics — SURVEY.md §2.6 (G1-G8): projections + weighted SSSP.

The reference delegates Dijkstra to Neo4j GDS over an in-memory CSR
projection (src/database.rs:422-456, :484-544). Spark has no built-in
weighted shortest path, so the core here is a **Pregel-style iterative
DataFrame Bellman-Ford / delta-relaxation loop**:

    dist'(v) = min(dist(v), min over in-edges (u,v) of dist(u) + w(u,v))

iterated until the frontier (set of vertices whose distance improved) is
empty. Per iteration that is one join (frontier × edges, broadcast when the
frontier is small) and one min-aggregation — both Catalyst-planned.

Scale posture:
- edges are hash-partitioned by `src` once up front and persisted, so every
  iteration's frontier-edges join reuses the same partitioning (no repeated
  edge shuffle);
- the frontier is broadcast while small (it usually is: SSSP frontiers are
  a thin wavefront), falling back to a shuffle join past a row threshold;
- `localCheckpoint()` every few iterations truncates lineage, otherwise the
  plan tree doubles per iteration and planning time explodes;
- early termination the moment the frontier is empty (`frontier.isEmpty()`),
  the analogue of Dijkstra settling all reachable nodes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eve_graph_spark.checkpointing import truncate_lineage

BROADCAST_FRONTIER_MAX = 2_000_000  # rows; beyond this, shuffle-join the frontier

# Driver-threshold probe memo: every driver-local fast path costs a
# limit(N+1).count() job to decide, and a bootstrap running 6 analytics
# over the SAME edge snapshot paid 6 identical probe jobs. Keyed by the
# analyzed-plan semanticHash + threshold: equivalent plans built twice
# (e.g. _edge_frame over the memoized fixture) hit the same entry.
# The verdict only picks an execution strategy — both strategies return
# bit-identical results — so a stale hit (data changed under an identical
# plan, e.g. an overwritten parquet path) can cost performance, never
# correctness of values; call `clear_probe_cache()` after rewriting
# inputs in place.
_PROBE_CACHE: dict[tuple[int, int], bool] = {}
_PROBE_CACHE_MAX = 256


def clear_probe_cache() -> None:
    _PROBE_CACHE.clear()


def force_distributed() -> bool:
    """True when SPARK_GRAFT_FORCE_DISTRIBUTED=1: every driver-local
    fast-path cutover answers "doesn't fit" so the DISTRIBUTED twin runs
    regardless of input size. Both branches return bit-identical values
    (parity-pinned), so this only selects the execution strategy — it
    exists so the bench can time and shuffle-row-pin the distributed
    plans that a fixture-sized input would otherwise never exercise
    (r13 verdict item 3: 38/179 bench plans were fully driver-local,
    leaving the scale-path perf unmeasured)."""
    import os

    return os.environ.get("SPARK_GRAFT_FORCE_DISTRIBUTED", "") == "1"


def fits_driver(df: DataFrame, threshold: int,
                force_exempt: bool = False) -> bool:
    """True when df has ≤ threshold rows — memoized limit(N+1).count probe.

    `force_exempt=True` opts a call site OUT of the forced-distributed
    arm: operators whose driver branch has NO distributed twin (a_star,
    dfs, all-pairs sigma with source_ids=None) must keep probing honestly
    — forcing them "distributed" can only turn a fixture-sized input into
    the scale-guard ValueError, which is the guard doing its job, not a
    measurable twin."""
    if not threshold or (force_distributed() and not force_exempt):
        return False
    try:
        key = (df.semanticHash(), threshold)
    except Exception:  # pragma: no cover — plan not analyzable
        key = None
    if key is not None and key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    verdict = df.limit(threshold + 1).count() <= threshold
    if key is not None:
        if len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
            _PROBE_CACHE.clear()  # probes are cheap; a rare full reset beats LRU bookkeeping
        _PROBE_CACHE[key] = verdict
    return verdict


@dataclass
class ProjectionRegistry:
    """G1-G6 (database.rs:387-482): named, cached edge projections.

    The reference's GDS named graphs are columnar snapshots that go stale
    until explicitly dropped + rebuilt; the Spark analogue is a persisted
    DataFrame in a name → DF dict with the same explicit-refresh semantics.
    """

    _graphs: dict[str, DataFrame] = field(default_factory=dict)
    # deltas applied since the projection last had its lineage truncated
    _deltas_since_anchor: dict[str, int] = field(default_factory=dict)
    # Every N-th apply_delta localCheckpoints the patched projection: a
    # persisted frame's RECOVERY lineage is still its logical plan, so an
    # unbounded left_anti+union chain means one evicted block replays
    # every historical delta back to the original derivation. Truncating
    # on a period bounds recovery at N deltas for a small per-period
    # materialization cost (the projection is persisted anyway).
    CHECKPOINT_EVERY_DELTAS = 8

    def project(self, name: str, edges: DataFrame, weight_col: str) -> DataFrame:
        """G1/G2: materialize (src, dst, weight), partitioned by src for the
        SSSP join, persisted — the 'CSR snapshot'."""
        proj = (
            edges.select(
                F.col("src_system_id").alias("src"),
                F.col("dst_system_id").alias("dst"),
                F.col(weight_col).cast("double").alias("weight"),
            )
            .repartition("src")
            .persist()
        )
        proj.count()  # force materialization, like gds.graph.project
        self._graphs[name] = proj
        self._deltas_since_anchor[name] = 0  # fresh derivation = fresh anchor
        return proj

    def exists(self, name: str) -> bool:
        """G3 (database.rs:387-400)."""
        return name in self._graphs

    def get(self, name: str) -> DataFrame:
        return self._graphs[name]

    def drop(self, name: str) -> None:
        """G4/G5 (database.rs:402-420)."""
        g = self._graphs.pop(name, None)
        self._deltas_since_anchor.pop(name, None)
        if g is not None:
            g.unpersist()

    def refresh(self, name: str, edges: DataFrame, weight_col: str) -> DataFrame:
        """G6 (database.rs:468-482): drop-if-exists + rebuild."""
        self.drop(name)
        return self.project(name, edges, weight_col)

    def apply_delta(self, name: str, added: DataFrame | None,
                    removed_keys: DataFrame | None, weight_col: str,
                    stats_out: dict | None = None) -> DataFrame:
        """Incremental projection maintenance (r6 verdict item 6): apply an
        edge delta to a persisted projection instead of re-deriving it
        from the full edge table. `added` is rows in the edge-table
        schema; `removed_keys` is (src_system_id, dst_system_id) pairs.
        One left_anti + union over the OLD PERSISTED projection — the
        scan is the cached projection plus delta-sized sides, never the
        upstream derivation (which at 100 TB is the full risk/cost join
        pipeline the wormhole poll loop must not replay every cycle).

        `stats_out` records `removed_rows`/`added_rows` (delta sizes).
        """
        old = self._graphs[name]
        cur = old
        n_removed = n_added = 0
        want_stats = stats_out is not None
        if removed_keys is not None:
            rk = removed_keys.select(
                F.col("src_system_id").alias("__rs"), F.col("dst_system_id").alias("__rd")
            )
            if want_stats:  # each count is an extra job over the delta side
                n_removed = rk.count()
            cur = cur.join(
                F.broadcast(rk),
                (cur["src"] == F.col("__rs")) & (cur["dst"] == F.col("__rd")),
                "left_anti",
            )
        if added is not None:
            add = added.select(
                F.col("src_system_id").alias("src"),
                F.col("dst_system_id").alias("dst"),
                F.col(weight_col).cast("double").alias("weight"),
            )
            if want_stats:
                n_added = add.count()
            cur = cur.unionByName(add)
        n_since = self._deltas_since_anchor.get(name, 0) + 1
        if n_since >= self.CHECKPOINT_EVERY_DELTAS:
            # keyed_by: if the stats-cap rebuild fires it must re-anchor
            # the src co-location this projection promises (ADVICE r11)
            new = truncate_lineage(cur.repartition("src"), keyed_by=("src",))
            n_since = 0
        else:
            new = cur.repartition("src").persist()
            new.count()
        self._deltas_since_anchor[name] = n_since
        old.unpersist()
        self._graphs[name] = new
        if stats_out is not None:
            stats_out["removed_rows"] = n_removed
            stats_out["added_rows"] = n_added
        return new


DRIVER_SSSP_MAX_EDGES = 2_000_000  # below this, solve on the driver


def _collect_adj(e: DataFrame) -> dict[int, list[tuple[int, float]]]:
    adj: dict[int, list[tuple[int, float]]] = {}
    for r in e.collect():
        adj.setdefault(r["src"], []).append((r["dst"], r["weight"]))
    return adj


def _relax_local(
    adj: dict[int, list[tuple[int, float]]], source_ids: list[int],
    target_id: int | None = None,
) -> dict[int, tuple[float, int | None]]:
    """The shared driver-side frontier relaxation kernel: identical update
    rule and (dist, pred) tie-break as the distributed loops, so results
    are bit-identical — float addition order per path is the same
    IEEE-754 sequence.

    `target_id` enables the single-pair early exit (see `sssp`): stop once
    the frontier's min tentative dist >= the target's settled dist. Rounds
    that run are identical to the full run, so every returned entry with
    dist <= dist(target) — the whole shortest path included — carries the
    full run's exact (dist, pred)."""
    best: dict[int, tuple[float, int | None]] = {int(s): (0.0, None) for s in source_ids}
    frontier = set(best)
    while frontier:
        if target_id is not None and target_id in best:
            dt = best[target_id][0]
            if min(best[u][0] for u in frontier) >= dt:
                break
        candidates: dict[int, tuple[float, int]] = {}
        for u in frontier:
            du = best[u][0]
            for v, w in adj.get(u, ()):
                c = (du + w, u)
                if v not in candidates or c < candidates[v]:
                    candidates[v] = c
        frontier = set()
        for v, (d, p) in candidates.items():
            if v not in best or d < best[v][0]:
                best[v] = (d, p)
                frontier.add(v)
    return best


def double_sweep_local(
    adj: dict[int, list[tuple[int, float]]], start: int
) -> tuple[int, float, float]:
    """Driver-side double-sweep kernel (r13, guide §5.3/§1.2): BOTH
    diameter sweeps from ONE collected adjacency — the composition that
    previously ran sweep 1 as a Spark job, collected the peak, and ran
    sweep 2 as another job pays 2 edge collects + 2 scalar jobs for a
    graph already on the driver. Returns (peak_node, peak_dist, lb) with
    the exact values of the job-composed form: `_relax_local` is the same
    relaxation kernel `_sssp_local` wraps, the peak rule is the
    `orderBy(desc(dist), asc(node)).limit(1)` tie-break (max dist, ties
    to min node — float negation is exact, so the sort keys agree), and
    lb is the plain MAX over sweep-2 distances (no NaN: weights are
    non-negative finite)."""
    b1 = _relax_local(adj, [int(start)])
    peak_node, (peak_dist, _) = min(b1.items(), key=lambda kv: (-kv[1][0], kv[0]))
    b2 = _relax_local(adj, [int(peak_node)])
    lb = max(d for d, _ in b2.values())
    return int(peak_node), float(peak_dist), float(lb)


def _sssp_local(e: DataFrame, source_ids: list[int],
                target_id: int | None = None) -> DataFrame:
    """Small-graph fast path: collect edges, run the shared relaxation
    kernel on the driver.

    Rationale: the reference's production graph is ~9k nodes / ~28k
    directed edges; GDS itself solves it single-machine over CSR. A route
    query on a graph that fits on the driver must not launch 30 Spark
    jobs — the distributed loop below is for graphs that don't fit.
    """
    best = _relax_local(_collect_adj(e), source_ids, target_id)
    rows = [(n, d, p) for n, (d, p) in best.items()]
    return e.sparkSession.createDataFrame(rows, _SSSP_SCHEMA)


_SSSP_SCHEMA = T.StructType(
    [
        T.StructField("node", T.LongType(), False),
        T.StructField("dist", T.DoubleType(), False),
        T.StructField("pred", T.LongType(), True),
    ]
)


def sssp(
    edges: DataFrame,
    source_ids: list[int],
    weight_col: str = "weight",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 200,
    checkpoint_every: int = 5,
    driver_threshold: int = DRIVER_SSSP_MAX_EDGES,
    target_id: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Weighted single/multi-source shortest paths (G7/G8 kernel).

    Returns (node long, dist double, pred long) — pred is the upstream node
    on a shortest path (ties broken by smallest dist then smallest pred, so
    the result is deterministic). Unreachable nodes are absent.

    Weights must be non-negative (true for cost ≡ 1 and risk ≥ baseline > 0,
    database.rs:375, :324-332).

    `target_id` is the single-pair early exit for route queries (the
    reference's flagship A1/A2 shape, database.rs:484-513: GDS Dijkstra
    stops at targetNode; r6 verdict item 1): stop relaxing once the
    frontier's min tentative dist >= the target's settled dist. With
    non-negative weights every future candidate is >= that min, so
    neither the target nor any node on its shortest path can improve
    again — and because whole rounds run unchanged before the cut, every
    returned entry with dist <= dist(target) is bit-identical (dist AND
    pred) to the full run: `reconstruct_path(dist, target_id)` walks only
    such entries. Entries for farther nodes may be tentative or absent —
    when a target is supplied the result is a ROUTE table, not an
    all-nodes distance table. On a 1000-layer graph with the target at
    layer 10 this is ~11 supersteps instead of ~1000.

    Graphs with ≤ `driver_threshold` edges are solved on the driver
    (`_sssp_local`); pass 0 to force the distributed loop.

    If `stats_out` is a dict, the distributed loop records
    `iterations` (relaxation rounds run), `dist_checkpoints` (lineage
    truncations of the accumulated dist table), and `early_exit` (whether
    the target cut fired) into it — observability for tests pinning
    convergence/lineage behavior on long-diameter graphs.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    if fits_driver(e, driver_threshold):
        return _sssp_local(e, source_ids, target_id)

    seed_schema = T.StructType(
        [
            T.StructField("node", T.LongType(), False),
            T.StructField("dist", T.DoubleType(), False),
            T.StructField("pred", T.LongType(), True),
        ]
    )
    dist = spark.createDataFrame([(int(s), 0.0, None) for s in source_ids], seed_schema)
    frontier = dist
    frontier_rows = len(source_ids)
    n_iters = n_ckpts = 0
    early_exit = False
    # target already settled at 0.0 when it is a source
    best_target: float | None = (
        0.0 if target_id is not None and target_id in {int(s) for s in source_ids} else None
    )

    for it in range(max_iterations):
        fr = F.broadcast(frontier) if frontier_rows <= BROADCAST_FRONTIER_MAX else frontier
        # relax: messages to each neighbor; keep the best (dist, pred) per node
        candidates = (
            fr.join(e, fr.node == e.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("weight")).alias("dist"),
                F.col("src").alias("pred"),
            )
            .groupBy("node")
            .agg(F.min(F.struct("dist", "pred")).alias("best"))
            .select("node", F.col("best.dist").alias("dist"), F.col("best.pred").alias("pred"))
        )
        # improved = candidates strictly better than (or absent from) dist
        old = dist.select(F.col("node"), F.col("dist").alias("old_dist"))
        improved = (
            candidates.join(old, "node", "left")
            .filter(F.col("old_dist").isNull() | (F.col("dist") < F.col("old_dist")))
            .select("node", "dist", "pred")
        )
        improved = improved.transform(truncate_lineage)
        if target_id is None:
            frontier_rows = improved.count()
            frontier_min = target_dist = None
        else:
            # one job reads all three scalars off the checkpointed frontier
            row = improved.agg(
                F.count(F.lit(1)).alias("n"),
                F.min("dist").alias("mn"),
                F.min(F.when(F.col("node") == target_id, F.col("dist"))).alias("td"),
            ).collect()[0]
            frontier_rows, frontier_min, target_dist = row["n"], row["mn"], row["td"]
        n_iters = it + 1
        if frontier_rows == 0:
            break
        frontier = improved
        # merge: improved rows replace their old entries
        dist = (
            dist.join(improved.select(F.col("node").alias("__n")), dist.node == F.col("__n"), "left_anti")
            .unionByName(improved)
        )
        if (it + 1) % checkpoint_every == 0:
            dist = dist.transform(truncate_lineage)
            n_ckpts += 1
        if target_id is not None:
            if target_dist is not None:
                best_target = target_dist  # strictly improving, latest wins
            # every future candidate is >= the frontier's min tentative
            # dist (weights >= 0), so once that min reaches the target's
            # settled dist nothing on the target's path can change
            if best_target is not None and frontier_min >= best_target:
                early_exit = True
                break
    if stats_out is not None:
        stats_out["iterations"] = n_iters
        stats_out["dist_checkpoints"] = n_ckpts
        stats_out["early_exit"] = early_exit
    return dist


def sssp_route(
    edges: DataFrame,
    source_id: int,
    target_id: int,
    weight_col: str = "weight",
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int = DRIVER_SSSP_MAX_EDGES,
) -> tuple[DataFrame, list[int]]:
    """(full dist table, source→target node path) — the shared tail of the
    route queries (A1/A2): SSSP dist, dist-table-derived preds
    (pred(v) := MIN(src) over edges with dist(src) + w == dist(v) EXACTLY —
    the SQL-replayable tie-break, see safest_route_path), pred-chain walk.

    r13 (guide §2.4 — remove whole jobs, not just exchanges): below
    `driver_threshold` edges the ≤threshold branch used to run the preds
    derivation as a distributed 3-frame join + groupBy and
    reconstruct_path as a separate collect — 5+ scheduler round-trips over
    <100-row frames, each paying fixed job latency (decomposed at sf0.1:
    preds 0.89 s + dist⋈preds collect 1.16 s on a 25-node graph). One edge
    collect now feeds the relaxation, the preds rule AND the walk.
    Bit-identical by construction: Python float add/compare on the
    collected doubles are the same IEEE-754 ops the distributed filter
    runs, and MIN over longs is engine-independent. Above the threshold
    the distributed derivation below is exactly the old query plan.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    source_id, target_id = int(source_id), int(target_id)
    if fits_driver(e, driver_threshold):
        rows = e.collect()
        adj: dict[int, list[tuple[int, float]]] = {}
        for r in rows:
            adj.setdefault(r["src"], []).append((r["dst"], r["weight"]))
        best = _relax_local(adj, [source_id], None)
        pred: dict[int, int] = {}
        for r in rows:
            u, v, w = r["src"], r["dst"], r["weight"]
            if v == source_id or u not in best or v not in best:
                continue
            if best[u][0] + w == best[v][0] and (v not in pred or u < pred[v]):
                pred[v] = u
        path: list[int] = []
        if target_id in best:
            path = [target_id]
            while path[-1] in pred and len(path) <= 10_000:
                path.append(pred[path[-1]])
            path.reverse()
        dist_df = spark.createDataFrame(
            [(n, d) for n, (d, _p) in best.items()], "node long, dist double"
        )
        return dist_df, path

    dist = sssp(
        e, [source_id], weight_col="weight", driver_threshold=driver_threshold
    ).select("node", "dist")
    u = dist.select(F.col("node").alias("u_node"), F.col("dist").alias("u_dist"))
    preds = (
        dist.join(e, e.dst == dist.node)
        .join(u, u.u_node == e.src)
        .filter((F.col("u_dist") + F.col("weight")) == F.col("dist"))
        .filter(F.col("node") != source_id)
        .groupBy("node")
        .agg(F.min("src").alias("pred"))
    )
    path = reconstruct_path(dist.join(preds, "node", "left"), target_id)
    return dist, path


_MSSSP_SCHEMA = T.StructType(
    [
        T.StructField("source", T.LongType(), False),
        T.StructField("node", T.LongType(), False),
        T.StructField("dist", T.DoubleType(), False),
        T.StructField("pred", T.LongType(), True),
    ]
)


def _multi_sssp_local(e: DataFrame, source_ids: list[int]) -> DataFrame:
    adj = _collect_adj(e)
    rows = [
        (int(s), n, d, p)
        for s in source_ids
        for n, (d, p) in _relax_local(adj, [s]).items()
    ]
    return e.sparkSession.createDataFrame(rows, _MSSSP_SCHEMA)


def multi_source_sssp(
    edges: DataFrame,
    source_ids: list[int],
    weight_col: str = "weight",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 200,
    checkpoint_every: int = 5,
    driver_threshold: int = DRIVER_SSSP_MAX_EDGES,
    stats_out: dict | None = None,
) -> DataFrame:
    """Per-source weighted shortest paths: (source, node, dist, pred),
    one row per (source, reachable node).

    `sssp(edges, [s1, s2])` keeps ONE dist table — the min over sources
    (the "distance to the nearest source" semantic). This keeps state
    keyed `(source, node)` instead, which is what landmark algorithms
    (closeness centrality, landmark distance oracles) need — and it runs
    all k sweeps as ONE frontier loop: every iteration unions the live
    frontiers of all sources into a single frontier×edges join + one
    (source, node) min-aggregation, so the whole run is O(max diameter)
    supersteps instead of k sequential O(diameter) job chains (the
    round-5 verdict's one scale-weak plan, graph_analytics closeness).

    Same relaxation rule, tie-break ((dist, pred) struct min), broadcast
    threshold, lineage-checkpoint cadence, and driver-threshold fast path
    as `sssp` — per-source results are bit-identical to running `sssp`
    k times. State growth: the dist table is Σ per-source reachable sets
    (k×V worst case) hash-partitioned on the composite key; the frontier
    is the union of per-source wavefronts and leaves broadcast range once
    it exceeds BROADCAST_FRONTIER_MAX rows.

    `stats_out`: records `iterations` and `dist_checkpoints` like `sssp`
    — the loop count is max-diameter-bound, NOT k-proportional, which the
    scale smoke pins.
    """
    spark = edges.sparkSession
    # order-preserving dedup: a repeated source id would seed duplicate
    # (source, source) state rows and emit every result row twice
    source_ids = list(dict.fromkeys(source_ids))
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    if fits_driver(e, driver_threshold):
        return _multi_sssp_local(e, source_ids)

    dist = spark.createDataFrame(
        [(int(s), int(s), 0.0, None) for s in source_ids], _MSSSP_SCHEMA
    )
    frontier = dist
    frontier_rows = len(source_ids)
    n_iters = n_ckpts = 0

    for it in range(max_iterations):
        fr = F.broadcast(frontier) if frontier_rows <= BROADCAST_FRONTIER_MAX else frontier
        candidates = (
            fr.join(e, fr.node == e.src)
            .select(
                F.col("source"),
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("weight")).alias("dist"),
                F.col("src").alias("pred"),
            )
            .groupBy("source", "node")
            .agg(F.min(F.struct("dist", "pred")).alias("best"))
            .select(
                "source", "node",
                F.col("best.dist").alias("dist"), F.col("best.pred").alias("pred"),
            )
        )
        old = dist.select("source", "node", F.col("dist").alias("old_dist"))
        improved = (
            candidates.join(old, ["source", "node"], "left")
            .filter(F.col("old_dist").isNull() | (F.col("dist") < F.col("old_dist")))
            .select("source", "node", "dist", "pred")
        )
        improved = improved.transform(truncate_lineage)
        frontier_rows = improved.count()
        n_iters = it + 1
        if frontier_rows == 0:
            break
        frontier = improved
        imp_keys = improved.select(
            F.col("source").alias("__s"), F.col("node").alias("__n")
        )
        dist = dist.join(
            imp_keys,
            (dist["source"] == F.col("__s")) & (dist["node"] == F.col("__n")),
            "left_anti",
        ).unionByName(improved)
        if (it + 1) % checkpoint_every == 0:
            dist = dist.transform(truncate_lineage)
            n_ckpts += 1
    if stats_out is not None:
        stats_out["iterations"] = n_iters
        stats_out["dist_checkpoints"] = n_ckpts
    return dist


def k_shortest_paths(edges: DataFrame, source: int, target: int, k: int = 3,
                     weight_col: str = "weight", src_col: str = "src",
                     dst_col: str = "dst",
                     driver_threshold: int = DRIVER_SSSP_MAX_EDGES) -> list[tuple[float, list[int]]]:
    """Yen's algorithm: the k best loop-free routes, ranked by total cost
    (SURVEY §2.8 route ranking). Route alternatives only make sense on a
    graph small enough to answer interactively, so this is driver-side
    over the collected edge list (guarded by the same threshold as SSSP);
    at cluster scale you'd run it per-request on the driver against the
    broadcast edge snapshot, not as a distributed job.

    Returns [(total_cost, [node, ...])], best first; ties by path nodes.
    """
    if k < 1:
        return []
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    if not fits_driver(e, driver_threshold, force_exempt=True):
        raise ValueError("graph exceeds driver threshold; route alternatives "
                         "are a driver-side interactive query")
    import heapq

    adj: dict[int, list[tuple[int, float]]] = {}
    for r in e.collect():
        adj.setdefault(r["src"], []).append((r["dst"], r["weight"]))

    def dijkstra(banned_edges: set, banned_nodes: set, s: int):
        dist = {s: 0.0}
        pred: dict[int, int] = {}
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, ()):
                if (u, v) in banned_edges or v in banned_nodes:
                    continue
                nd = d + w
                if nd < dist.get(v, float("inf")):
                    dist[v], pred[v] = nd, u
                    heapq.heappush(pq, (nd, v))
        if target not in dist:
            return None
        path, cur = [target], target
        while cur != s:
            cur = pred[cur]
            path.append(cur)
        return dist[target], list(reversed(path))

    first = dijkstra(set(), set(), source)
    if first is None:
        return []
    found = [first]
    candidates: list[tuple[float, list[int]]] = []
    while len(found) < k:
        _, prev_path = found[-1]
        for i in range(len(prev_path) - 1):
            spur, root = prev_path[i], prev_path[: i + 1]
            banned_e = {
                (p[len(root) - 1], p[len(root)])
                for _, p in found
                if len(p) > len(root) and p[: len(root)] == root
            }
            banned_n = set(root[:-1])
            spur_res = dijkstra(banned_e, banned_n, spur)
            if spur_res is None:
                continue
            spur_cost, spur_path = spur_res
            # min over parallel edges — the weight the relaxation itself
            # would ride (matches the distributed twin's min-aggregated
            # weight cache)
            root_cost = sum(
                min(w for v, w in adj[a] if v == b)
                for a, b in zip(root, root[1:])
            )
            cand = (root_cost + spur_cost, root[:-1] + spur_path)
            if cand not in candidates and cand not in found:
                candidates.append(cand)
        if not candidates:
            break
        candidates.sort(key=lambda c: (c[0], c[1]))
        found.append(candidates.pop(0))
    return found


_JSSSP_SCHEMA = T.StructType(
    [
        T.StructField("jid", T.LongType(), False),
        T.StructField("node", T.LongType(), False),
        T.StructField("dist", T.DoubleType(), False),
        T.StructField("pred", T.LongType(), True),
    ]
)


def _banned_multi_sweep(
    e: DataFrame,
    jobs: list[tuple[int, int, set[int], set[tuple[int, int]]]],
    target: int,
    max_iterations: int,
    checkpoint_every: int,
    stats_out: dict | None = None,
) -> dict[int, tuple[float, list[int]]]:
    """One (jid, node)-keyed frontier loop answering MANY banned-graph
    single-pair queries at once: `jobs` is [(jid, start, banned_nodes,
    banned_edges)], the per-jid ban sets are path-sized (Yen's roots /
    shared prefixes), and every iteration relaxes ALL jobs' frontiers in a
    single frontier×edges join. Bans are broadcast anti-joins on the
    candidate stream — (jid, node) kills re-entry into a root, (jid, src,
    dst) kills the one prefix edge a found path already used — so the
    superstep count is max-diameter-bound, not Σ per-job diameters, and
    the data never moves per job.

    Returns {jid: (dist, [start..target])} for jobs that reach `target`.
    Path extraction walks pred pointers for ALL jids together: one
    path-sized pushed-down fetch per hop, ≤ path-length hops, never a
    vertex-sized collect (same discipline as reconstruct_path's iterative
    mode). Tie-break is min (dist, pred) struct — bit-identical float
    accumulation to `sssp`/`multi_source_sssp`.
    """
    spark = e.sparkSession
    seeds = spark.createDataFrame(
        [(int(j), int(s), 0.0, None) for j, s, _, _ in jobs], _JSSSP_SCHEMA
    )
    bn = [(int(j), int(n)) for j, _, bns, _ in jobs for n in sorted(bns)]
    be = [(int(j), int(u), int(v)) for j, _, _, bes in jobs for u, v in sorted(bes)]
    bn_df = (
        F.broadcast(spark.createDataFrame(bn, "jid long, bnode long")) if bn else None
    )
    be_df = (
        F.broadcast(spark.createDataFrame(be, "jid long, bsrc long, bdst long"))
        if be
        else None
    )
    dist = seeds
    frontier = seeds
    frontier_rows = len(jobs)
    n_iters = 0
    for it in range(max_iterations):
        fr = F.broadcast(frontier) if frontier_rows <= BROADCAST_FRONTIER_MAX else frontier
        cand = fr.join(e, fr.node == e.src).select(
            F.col("jid"),
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("weight")).alias("dist"),
            F.col("src").alias("pred"),
        )
        # bans BEFORE the min-agg so banned candidates never hit the shuffle
        if be_df is not None:
            cand = cand.join(
                be_df,
                (cand["jid"] == be_df["jid"])
                & (cand["pred"] == be_df["bsrc"])
                & (cand["node"] == be_df["bdst"]),
                "left_anti",
            )
        if bn_df is not None:
            cand = cand.join(
                bn_df,
                (cand["jid"] == bn_df["jid"]) & (cand["node"] == bn_df["bnode"]),
                "left_anti",
            )
        cand = (
            cand.groupBy("jid", "node")
            .agg(F.min(F.struct("dist", "pred")).alias("best"))
            .select(
                "jid", "node",
                F.col("best.dist").alias("dist"), F.col("best.pred").alias("pred"),
            )
        )
        old = dist.select("jid", "node", F.col("dist").alias("old_dist"))
        improved = (
            cand.join(old, ["jid", "node"], "left")
            .filter(F.col("old_dist").isNull() | (F.col("dist") < F.col("old_dist")))
            .select("jid", "node", "dist", "pred")
        )
        improved = improved.transform(truncate_lineage)
        n_iters = it + 1
        if improved.isEmpty():
            frontier_rows = 0
            break
        imp_keys = improved.select(F.col("jid").alias("__j"), F.col("node").alias("__n"))
        dist = dist.join(
            imp_keys,
            (dist["jid"] == F.col("__j")) & (dist["node"] == F.col("__n")),
            "left_anti",
        ).unionByName(improved)
        if (it + 1) % checkpoint_every == 0:
            dist = dist.transform(truncate_lineage)
        # per-jid TARGET early-exit (the single-pair cut sssp() carries,
        # r6): every sweep here is a single-target query — once a jid's
        # target has settled at dist T, frontier rows with dist >= T can
        # never lie on a better path to it (positive weights), so they are
        # pruned before the next superstep. Relaxations along any improving
        # path all carry dist < final T <= current T, so the kept set is
        # exact for the target AND for every node on its shortest path.
        tgt_d = dist.filter(F.col("node") == F.lit(int(target))).select(
            F.col("jid").alias("__tj"), F.col("dist").alias("__td")
        )
        frontier = (
            improved.join(
                F.broadcast(tgt_d), improved["jid"] == F.col("__tj"), "left"
            )
            .filter(F.col("__td").isNull() | (F.col("dist") < F.col("__td")))
            .select("jid", "node", "dist", "pred")
        ).transform(truncate_lineage)
        frontier_rows = frontier.count()
        if frontier_rows == 0:
            break
    if stats_out is not None:
        stats_out["sweep_iterations"] = stats_out.get("sweep_iterations", 0) + n_iters
        stats_out["sweeps"] = stats_out.get("sweeps", 0) + 1
    dist = dist.persist()
    try:
        tgt = {
            r["jid"]: (r["dist"], r["pred"])
            for r in dist.filter(F.col("node") == F.lit(int(target))).collect()
        }
        paths: dict[int, list[int]] = {j: [int(target)] for j in tgt}
        cur = {j: p for j, (_, p) in tgt.items() if p is not None}
        while cur:
            conds = None
            for j, n in cur.items():
                c = (F.col("jid") == int(j)) & (F.col("node") == int(n))
                conds = c if conds is None else (conds | c)
            got = {
                r["jid"]: r["pred"]
                for r in dist.filter(conds).select("jid", "node", "pred").collect()
            }
            nxt: dict[int, int] = {}
            for j, n in cur.items():
                paths[j].append(int(n))
                p = got.get(j)
                if p is not None:
                    nxt[j] = p
            cur = nxt
        return {j: (tgt[j][0], list(reversed(paths[j]))) for j in tgt}
    finally:
        dist.unpersist()


def k_shortest_paths_distributed(
    edges: DataFrame,
    source: int,
    target: int,
    k: int = 3,
    weight_col: str = "weight",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 200,
    checkpoint_every: int = 5,
    driver_threshold: int = DRIVER_SSSP_MAX_EDGES,
    stats_out: dict | None = None,
) -> list[tuple[float, list[int]]]:
    """Yen's k best loop-free routes with BATCHED spur sweeps — the
    distributed twin of `k_shortest_paths` (GDS `gds.shortestPath.yens`
    parity, the step past database.rs:484-544's single Dijkstra).

    Below `driver_threshold` it delegates to the driver implementation
    (identical results; a reference-scale graph must not launch Spark jobs
    per route query). Above it, each Yen round runs ONE `_banned_multi_sweep`
    over all |prev_path| spur jobs instead of |spurs| serial SSSPs, so a
    round costs O(max diameter) supersteps regardless of path length.
    Candidate bookkeeping (path-sized) stays on the driver; edge weights
    for root costs are prefetched per found path via pushed-down filters
    (path-sized rows, never the edge table).

    Output is implementation-independent whenever the top-(k+1) simple-path
    costs are distinct (ties are broken by min-(dist, pred) here vs heap
    order in the driver twin — both return SOME optimal path under exact
    cost ties, the same guarantee GDS gives).

    Returns [(total_cost, [node, ...])], best first; ties by path nodes.
    """
    if k < 1:
        return []
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    if fits_driver(e, driver_threshold):
        return k_shortest_paths(
            edges, source, target, k, weight_col, src_col, dst_col, driver_threshold
        )
    e = e.persist()
    wcache: dict[tuple[int, int], float] = {}

    def prefetch(path: list[int]) -> None:
        missing = [p for p in zip(path, path[1:]) if p not in wcache]
        if not missing:
            return
        conds = None
        for u, v in missing:
            c = (F.col("src") == int(u)) & (F.col("dst") == int(v))
            conds = c if conds is None else (conds | c)
        for r in e.filter(conds).select("src", "dst", "weight").collect():
            # MIN over parallel edges — the weight the relaxation rode
            # (an arbitrary duplicate's weight would inflate root costs)
            key = (r["src"], r["dst"])
            if key not in wcache or r["weight"] < wcache[key]:
                wcache[key] = r["weight"]

    try:
        first = _banned_multi_sweep(
            e, [(0, source, set(), set())], target,
            max_iterations, checkpoint_every, stats_out,
        )
        if 0 not in first:
            return []
        found = [first[0]]
        prefetch(found[0][1])
        candidates: list[tuple[float, list[int]]] = []
        while len(found) < k:
            _, prev_path = found[-1]
            jobs: list[tuple[int, int, set[int], set[tuple[int, int]]]] = []
            roots: dict[int, list[int]] = {}
            for i in range(len(prev_path) - 1):
                spur, root = prev_path[i], prev_path[: i + 1]
                banned_e = {
                    (p[len(root) - 1], p[len(root)])
                    for _, p in found
                    if len(p) > len(root) and p[: len(root)] == root
                }
                banned_n = set(root[:-1])
                jobs.append((i, spur, banned_n, banned_e))
                roots[i] = root
            res = _banned_multi_sweep(
                e, jobs, target, max_iterations, checkpoint_every, stats_out
            )
            for i, root in roots.items():
                if i not in res:
                    continue
                spur_cost, spur_path = res[i]
                root_cost = sum(wcache[(a, b)] for a, b in zip(root, root[1:]))
                cand = (root_cost + spur_cost, root[:-1] + spur_path)
                if cand not in candidates and cand not in found:
                    candidates.append(cand)
            if not candidates:
                break
            candidates.sort(key=lambda c: (c[0], c[1]))
            nxt = candidates.pop(0)
            found.append(nxt)
            prefetch(nxt[1])
        return found
    finally:
        e.unpersist()


def a_star(
    edges: DataFrame,
    coords: DataFrame,
    source: int,
    target: int,
    weight_col: str = "weight",
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "system_id",
    driver_threshold: int = DRIVER_SSSP_MAX_EDGES,
    stats_out: dict | None = None,
) -> tuple[float, list[int]] | None:
    """A* single-pair route over the stored x,y,z coordinates — the
    reference keeps them on every System (database.rs:86-88) but never
    queries them; here they prune the search (r6 verdict item 1's
    optional arm, on top of the sssp(target_id=) early exit).

    Heuristic: h(v) = euclid(v, target) / r with r = max over edges of
    (euclid(u, v) / w(u, v)) — the best distance-per-cost any single
    edge achieves. Admissible (any path to the target must cover the
    straight-line distance at cost >= euclid/r) and consistent
    (euclid(u,t) <= euclid(u,v) + euclid(v,t) <= r*w + euclid(v,t)),
    so the first settle of the target is optimal and no node is
    re-expanded.

    Two degradations keep h admissible on dirty inputs, both collapsing
    it to 0 (= plain Dijkstra, always correct):
    - an edge with w <= 0 but positive euclidean length achieves
      infinite distance-per-cost, so no finite r bounds the graph —
      r is forced to inf;
    - a node with MISSING or ALL-ZERO (placeholder) coordinates anywhere
      in the edge set: a cheap wormhole through such a node covers real
      distance that r never saw (its incident euclids read as 0), so any
      nonzero h could overestimate the remaining cost.
    Both arms are pinned by tests/test_a_star.py.

    Driver-side over the collected edge list, like `k_shortest_paths`:
    a single-pair interactive route on a graph that fits the driver
    must not launch a job per expansion (the distributed answer to the
    same question is sssp(target_id=...)). Raises above
    `driver_threshold`.

    Returns (total_cost, [node, ...]) or None when unreachable.
    `stats_out["expansions"]` counts settled nodes — the quantity the
    heuristic exists to shrink (tests/test_a_star.py pins it strictly
    below Dijkstra's on a coordinate-true grid).
    """
    import heapq
    import math

    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    if not fits_driver(e, driver_threshold, force_exempt=True):
        raise ValueError(
            "a_star: graph exceeds the driver threshold; single-pair routes "
            "at that scale run sssp(target_id=...) with its distributed "
            "early-exit loop"
        )
    xyz = {
        r[id_col]: (float(r["x"]), float(r["y"]), float(r["z"]))
        for r in coords.select(id_col, "x", "y", "z").collect()
    }

    def euclid(a: int, b: int) -> float:
        pa, pb = xyz.get(a), xyz.get(b)
        if pa is None or pb is None:
            return 0.0
        return math.dist(pa, pb)

    erows = e.collect()
    nodes = {row["src"] for row in erows} | {row["dst"] for row in erows}
    coords_ok = all(
        n in xyz and any(c != 0.0 for c in xyz[n]) for n in nodes
    )
    adj: dict[int, list[tuple[int, float]]] = {}
    r_best = 0.0
    for row in erows:
        u, v, w = row["src"], row["dst"], row["weight"]
        adj.setdefault(u, []).append((v, w))
        if w > 0:
            r_best = max(r_best, euclid(u, v) / w)
        elif euclid(u, v) > 0:
            r_best = math.inf  # free edge with real length: unbounded ratio

    use_h = coords_ok and 0.0 < r_best < math.inf

    def h(v: int) -> float:
        return euclid(v, target) / r_best if use_h else 0.0

    dist = {source: 0.0}
    pred: dict[int, int] = {}
    pq = [(h(source), source)]
    settled: set[int] = set()
    expansions = 0
    while pq:
        f, u = heapq.heappop(pq)
        if u in settled:
            continue
        settled.add(u)
        expansions += 1
        if u == target:
            break
        du = dist[u]
        for v, w in adj.get(u, ()):
            nd = du + w
            if v not in dist or nd < dist[v]:
                dist[v], pred[v] = nd, u
                heapq.heappush(pq, (nd + h(v), v))
    if stats_out is not None:
        stats_out["expansions"] = expansions
    if target not in settled:
        return None
    path, cur = [target], target
    while cur != source:
        cur = pred[cur]
        path.append(cur)
    return dist[target], list(reversed(path))


def dfs(edges: DataFrame, source: int,
        src_col: str = "src_system_id", dst_col: str = "dst_system_id",
        max_depth: int | None = None,
        driver_threshold: int = DRIVER_SSSP_MAX_EDGES) -> DataFrame:
    """GDS `gds.dfs` counterpart: depth-first preorder from `source`,
    returned as (node, visit_order) with visit_order starting at 1.

    Deterministic spec (GDS's traversal order depends on its internal
    adjacency layout; ours is pinned so the SQL oracle can replay it):
    from the current node descend into the SMALLEST unvisited neighbor;
    when none remains, backtrack — i.e. textbook recursive DFS with
    ascending-id neighbor order. `max_depth` bounds descent depth from
    the source (GDS maxDepth): nodes deeper than it are neither visited
    nor traversed through.

    Scale posture: DFS order is inherently SEQUENTIAL — each step depends
    on the entire visited set, so no superstep decomposition exists (GDS
    also computes it single-threaded on the in-memory projection). The
    kernel therefore runs on the driver for graphs within
    `driver_threshold` edges and raises loudly beyond it, the same
    budget-exhaustion convention as MST/k-truss — a silent distributed
    "DFS" would really be a BFS-ish frontier walk with different
    semantics. For reachability at scale use `connected_components`; for
    ordered exploration use `sssp`/`bfs_from`.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    if not fits_driver(e, driver_threshold, force_exempt=True):
        raise ValueError(
            f"dfs: graph exceeds driver_threshold={driver_threshold} edges; "
            "depth-first order is sequential and cannot be computed "
            "distributed — use connected_components / sssp for scale paths"
        )
    adj: dict[int, list[int]] = {}
    for r in e.collect():
        if r["src"] != r["dst"]:
            adj.setdefault(r["src"], []).append(r["dst"])
    for k in adj:
        adj[k] = sorted(set(adj[k]))
    spark = edges.sparkSession
    if source not in adj:
        # GDS semantics: an absent / isolated source visits just itself
        return spark.createDataFrame([(source, 1)], "node long, visit_order long")
    visited = [source]
    vis = {source}
    stack = [source]
    while stack:
        cur = stack[-1]
        nxt = None
        if max_depth is None or len(stack) <= max_depth:
            for u in adj.get(cur, ()):
                if u not in vis:
                    nxt = u
                    break
        if nxt is None:
            stack.pop()
        else:
            vis.add(nxt)
            visited.append(nxt)
            stack.append(nxt)
    return spark.createDataFrame(
        [(n, i + 1) for i, n in enumerate(visited)], "node long, visit_order long"
    )


DRIVER_PATH_MAX_NODES = 2_000_000  # below this, collect the whole pred map


def reconstruct_path(
    dist: DataFrame,
    target_id: int,
    max_hops: int = 10_000,
    driver_threshold: int = DRIVER_PATH_MAX_NODES,
    stats_out: dict | None = None,
) -> list[int]:
    """Walk pred pointers target → source (GDS returning nodeIds,
    database.rs:496-498).

    The dist table covers ALL reachable vertices, not just the path — on a
    100× graph a full `.collect()` here is a driver OOM even though the
    answer is a handful of hops. Two modes, threshold-guarded like `sssp`:

    - **driver mode** (≤ `driver_threshold` rows): collect the {node: pred}
      map once and walk it locally — right for the reference-scale graph;
    - **distributed mode**: persist dist once, then walk backward hop by
      hop; each step is ONE row fetched via a pushed-down `node = cur`
      filter on the persisted table. Total driver traffic is O(path length)
      rows, never O(vertices), and the number of jobs is bounded by the
      path length (≤ max_hops) — the per-hop lookup is a cached-scan probe,
      the same cost class as the verdict's suggested 1-row broadcast
      semi-join but without building a join plan per hop.

    `stats_out` (tests/observability): records `mode` ('driver' |
    'iterative') and `rows_collected` — pinning that the distributed walk
    never collects the vertex-sized table.
    """
    if fits_driver(dist, driver_threshold):
        rows = dist.select("node", "pred").collect()
        if stats_out is not None:
            stats_out["mode"] = "driver"
            stats_out["rows_collected"] = len(rows)
        pred = {r["node"]: r["pred"] for r in rows}
        if target_id not in pred:
            return []
        path = [target_id]
        while pred[path[-1]] is not None and len(path) <= max_hops:
            path.append(pred[path[-1]])
        return list(reversed(path))

    d = dist.select("node", "pred").persist()
    n_collected = 0
    try:
        path = [target_id]
        row = d.filter(F.col("node") == target_id).head()
        if row is None:
            if stats_out is not None:
                stats_out["mode"] = "iterative"
                stats_out["rows_collected"] = 0
            return []
        n_collected += 1
        cur_pred = row["pred"]
        while cur_pred is not None and len(path) <= max_hops:
            path.append(cur_pred)
            row = d.filter(F.col("node") == cur_pred).head()
            n_collected += 1
            cur_pred = row["pred"] if row is not None else None
        if stats_out is not None:
            stats_out["mode"] = "iterative"
            stats_out["rows_collected"] = n_collected
        return list(reversed(path))
    finally:
        d.unpersist()


def path_as_names(systems: DataFrame, path: list[int]) -> list[str]:
    """F6 (database.rs:498): node-id path → name path, one broadcast lookup."""
    if not path:
        return []
    spark = systems.sparkSession
    order = spark.createDataFrame(list(enumerate(path)), "pos int, system_id long")
    rows = (
        order.join(F.broadcast(systems.select("system_id", "name")), "system_id")
        .orderBy("pos")
        .select("name")
        .collect()
    )
    return [r["name"] for r in rows]
