"""Query registry — every operator from SURVEY.md §2, runnable as
(spark, sf_dir) -> DataFrame, each with a DuckDB oracle SQL twin.

Determinism rules (so the driver's value-hash matches bit-for-bit):
- sums of doubles go through DECIMAL(38,12) (exact, order-independent),
  then cast back to double — both engines produce the identical double;
- ratios/averages are a SINGLE double division of identical operands;
- timestamps are reduced to epoch-second longs or 'yyyy-MM-dd' strings;
- every top-k has a total tie-break order;
- keep-first dedup picks winners by MIN(key), never physical order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eve_graph_spark.checkpointing import truncate_lineage

from eve_graph_spark.functions.risk import risk_expr
from eve_graph_spark.operators import relational as R
from eve_graph_spark.operators.dedup import portable_band_buckets_sql
from eve_graph_spark.operators.graph import sssp
from eve_graph_spark.sources.graph_fixture import (
    CHOKE_SQL_CTE,
    GRAPH_SQL_CTE,
    MESH_SQL_CTE,
    build_jumps,
    build_mesh_edges,
    build_systems,
)
from eve_graph_spark.sources.tables import events_with_ts, load_table, spread

# MESH_SQL_CTE body without surrounding whitespace, for splicing into
# _graph_cte chains (the mesh overlay rides after the base fix_* CTEs)
_MESH_BODY = MESH_SQL_CTE.strip()

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


# The driver oracle-checks the FIRST 50 entries of queries() per round.
# The check order is DERIVED from the committed CORRECTNESS_r*.json files
# (no hand-maintained list): queries with no driver row in any prior round
# come first, then queries whose most-recent row was red, then everything
# already green/rows-only — registration order within each tier. This way
# newly-registered or newly-fixed queries always rotate into the window
# automatically.
_PRIORITY_CACHE: dict[str, int] | None = None


def _correctness_tiers(root=None) -> dict[str, int]:
    """name -> tier from CORRECTNESS_r*.json at the repo root.

    0 = never driver-checked, 1 = latest row red, 2 = latest row green or
    rows-only-by-design. Names absent from every file default to 0.
    """
    global _PRIORITY_CACHE
    if root is None and _PRIORITY_CACHE is not None:
        return _PRIORITY_CACHE
    import json
    import re
    from pathlib import Path

    caching = root is None
    root = Path(root) if root is not None else Path(__file__).resolve().parents[1]
    latest: dict[str, dict] = {}
    rounds = sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.sub(r"\D", "", p.stem) or 0),
    )
    for path in rounds:
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            latest.update(rows)
    tiers: dict[str, int] = {}
    for name, row in latest.items():
        if not isinstance(row, dict):
            continue
        err = row.get("err")
        if row.get("hash_match") is False or err not in (None, "no_oracle"):
            tiers[name] = 1
        else:
            tiers[name] = 2
    if caching:
        _PRIORITY_CACHE = tiers
    return tiers


# Queries whose Spark plan or oracle changed in the current round: forced
# into the driver window right after the never-checked tier, so changed code
# is always externally re-verified in the round it changes (ADVICE r2).
_MODIFIED_THIS_ROUND = {
    # r12: the global-rank offsets moved from a driver collect + literal
    # map to a K-row broadcast frame (values identical, plan changed).
    "token_budget_sample",
    "customer_spend_quartiles",
    # r12: oracle SQL now interpolates ANN_QUERY_IDS / ANN_PRODUCTION_K
    # (same values, oracle text changed).
    "ann_ivf_production",
    # r12: the two xxhash64 twins went from rows-only to boolean-pinned
    # contracts (new output schemas + oracles).
    "minhash_near_dups",
    "simhash_signatures",
}


def _prioritized(d: dict[str, object]) -> dict[str, object]:
    tiers = _correctness_tiers()

    def key(n: str) -> float:
        if tiers.get(n, 0) == 0:
            return 0.0
        if n in _MODIFIED_THIS_ROUND:
            return 0.5
        return float(tiers[n])

    names = sorted(d, key=key)  # stable sort: registration order within tier
    return {n: d[n] for n in names}


def queries() -> dict[str, QueryFn]:
    return _prioritized(dict(_QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_ORACLES))


def _dsum(col, alias: str):
    """Exact, order-independent sum of a double column (see module doc).

    Doubles are fixed-pointed via floor(x*1e6 + 0.5) — every step is an IEEE
    double op that both engines execute identically — then summed as exact
    integers and divided back once. (A double→decimal cast is NOT portable:
    Spark casts via the shortest decimal repr, DuckDB via the exact binary
    expansion, and the 12th fractional digit diverges.)
    """
    return (F.sum(F.floor(F.col(col) * 1000000 + F.lit(0.5))) / F.lit(1000000.0)).alias(alias)


def _dsum_sql(expr: str, alias: str) -> str:
    return f"SUM(CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS {alias}"


def _graph_cte(body: str) -> str:
    return f"WITH RECURSIVE {GRAPH_SQL_CTE} {body}"


# =========================================================================
# Flagship: pricing summary (TPC-H Q1 shape) — scan + filter + wide agg.
# Catalyst pushes the shipdate filter into the parquet scan; the groupBy is
# a 6-group partial-aggregated shuffle — the cheapest possible plan shape.
# =========================================================================

@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql("l_quantity", "sum_qty")},
           {_dsum_sql("l_extendedprice", "sum_base_price")},
           {_dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {_dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .withColumn("__disc_price", disc_price)
        .withColumn("__charge", charge)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            _dsum("__disc_price", "sum_disc_price"),
            _dsum("__charge", "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# =========================================================================
# §2.2 scans / lookups / counts / existence
# =========================================================================

@register(
    "point_lookup",
    "SELECT s_suppkey, s_name, s_nationkey FROM supplier WHERE s_suppkey = 7 LIMIT 1",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q4 get_system (database.rs:137-148): predicate pushed to parquet scan.
    sup = load_table(spark, sf_dir, "supplier")
    return R.point_lookup(sup, "s_suppkey", 7).select("s_suppkey", "s_name", "s_nationkey")


@register(
    "projection_scan",
    "SELECT o_orderkey FROM orders",
)
def projection_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q2 get_all_system_ids (database.rs:164-176): column-pruned scan.
    return R.projection_scan(load_table(spark, sf_dir, "orders"), ["o_orderkey"])


@register(
    "table_counts",
    """
    SELECT 'customer' AS tbl, COUNT(*) AS cnt FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    """,
)
def table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q7/Q8 get_saved_*_count (database.rs:178-197), one row per table.
    out = None
    for t in ("customer", "orders", "lineitem", "supplier"):
        c = R.global_count(load_table(spark, sf_dir, t)).select(F.lit(t).alias("tbl"), "cnt")
        out = c if out is None else out.unionByName(c)
    return out


@register(
    "exists_checks",
    _graph_cte(
        """
        SELECT 'jump_0_1' AS probe,
               (SELECT COUNT(*) FROM fix_jumps WHERE src_system_id = 0 AND dst_system_id = 1) > 0 AS found
        UNION ALL
        SELECT 'jump_0_9',
               (SELECT COUNT(*) FROM fix_jumps WHERE src_system_id = 0 AND dst_system_id = 9) > 0
        UNION ALL
        SELECT 'system_12',
               (SELECT COUNT(*) FROM fix_systems WHERE system_id = 12) > 0
        """
    ),
)
def exists_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q5/Q6 existence probes (database.rs:68-79, :334-353), batched: all
    # edge probes share ONE scan (exists_many), not one action per probe.
    jumps = build_jumps(spark, sf_dir, with_risk=False)
    systems = build_systems(spark, sf_dir)
    edge_probes = R.exists_many(jumps, {
        "jump_0_1": (F.col("src_system_id") == 0) & (F.col("dst_system_id") == 1),
        "jump_0_9": (F.col("src_system_id") == 0) & (F.col("dst_system_id") == 9),
    })
    sys_probes = R.exists_many(systems, {"system_12": F.col("system_id") == 12})
    return edge_probes.unionByName(sys_probes)


# =========================================================================
# §2.3 mutations as batch dataflow
# =========================================================================

@register(
    "dedup_exact_documents",
    """
    SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W11 remove_duplicate_* (database.rs:546-555) generalized to content
    # dedup: keep the smallest doc_id per exact text. Hash-partition on the
    # text hash; partial aggregation keeps the shuffle narrow at scale.
    docs = load_table(spark, sf_dir, "documents")
    return R.dedup_keep_first(docs.select("doc_id", "text"), ["text"], order_by=["doc_id"]).select(
        "doc_id", "text"
    )


@register(
    "anti_join_remove",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0)
    """,
)
def anti_join_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W9 remove_by_ids (database.rs:557-567): anti-join delete of a keyed
    # id set (every 5th customer) — non-empty remainder at every SF.
    cust = load_table(spark, sf_dir, "customer")
    ids = cust.filter(F.col("c_custkey") % 5 == 0)
    return R.remove_by_ids(cust, ids, "c_custkey").select("c_custkey", "c_name")


@register(
    "keyed_update",
    """
    WITH act AS (SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
    SELECT c.c_custkey, COALESCE(a.n_orders, 0) AS n_orders, c.c_acctbal
    FROM customer c LEFT JOIN act a USING (c_custkey)
    """,
)
def keyed_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W6/W7 keyed SET (database.rs:256-292): join + coalesce, one pass.
    cust = load_table(spark, sf_dir, "customer").withColumn("n_orders", F.lit(0).cast("long"))
    act = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("upd"))
    )
    return R.keyed_update(cust, act, "c_custkey", "n_orders", "upd").select(
        "c_custkey", "n_orders", "c_acctbal"
    )


@register(
    "diff_sync",
    """
    WITH expected AS (
        SELECT c_custkey AS k FROM customer WHERE c_custkey % 3 <> 0
        UNION ALL
        SELECT c_custkey + 10000000 FROM customer WHERE c_custkey % 7 = 0
    ),
    current_ AS (SELECT c_custkey AS k FROM customer)
    SELECT 'to_add' AS action, k FROM expected WHERE k NOT IN (SELECT k FROM current_)
    UNION ALL
    SELECT 'to_remove', k FROM current_ WHERE k NOT IN (SELECT k FROM expected)
    """,
)
def diff_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D1 (sync.rs:121-170): two-way set diff as left_anti joins. Expected
    # set is shifted/filtered so both to_add and to_remove are non-empty
    # at every SF (the raw data has full FK coverage → trivial diffs).
    cust = load_table(spark, sf_dir, "customer")
    expected = (
        cust.filter(F.col("c_custkey") % 3 != 0)
        .select(F.col("c_custkey").alias("k"))
        .unionByName(
            cust.filter(F.col("c_custkey") % 7 == 0).select((F.col("c_custkey") + 10000000).alias("k"))
        )
    )
    current = cust.select(F.col("c_custkey").alias("k"))
    # Both directions consumed together → the one-pass full-outer form
    # (diff_sync's two anti-joins re-plan each input per direction).
    return R.diff_sync_actions(expected, current, "k")


# =========================================================================
# Graph fixture: vertex/edge derivation + risk scoring (F1/F2, W4, W8)
# =========================================================================

@register(
    "graph_systems",
    _graph_cte("SELECT system_id, name, constellation_id, security_status, kills, jumps FROM fix_systems"),
)
def graph_systems(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_systems(spark, sf_dir)


@register(
    "graph_edges",
    _graph_cte("SELECT src_system_id, dst_system_id, cost, risk, kind FROM fix_jumps"),
)
def graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W4 edge derivation + W8 risk onto inbound edges, full fidelity.
    return build_jumps(spark, sf_dir)


@register(
    "risk_scores",
    _graph_cte(
        """
        SELECT dst_system_id AS system_id, risk FROM fix_sys_risk
        """
    ),
)
def risk_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1 + F2 (database.rs:324-332, sync.rs:303-307) over the fixture.
    systems = build_systems(spark, sf_dir)
    totals = systems.agg(F.sum("kills").alias("tk"), F.sum("jumps").alias("tj")).select(
        F.when(F.col("tj") > 0, F.col("tk") / F.col("tj")).otherwise(F.lit(0.01)).alias("baseline")
    )
    return systems.crossJoin(F.broadcast(totals)).select(
        "system_id", risk_expr(F.col("kills"), F.col("jumps"), F.col("baseline")).alias("risk")
    )


# =========================================================================
# Weighted SSSP (G7/G8). DuckDB oracle = bounded recursive enumeration of
# (node, dist) pairs — exact because weights are integers and bounded.
# The float-risk variant is validated in tests/ against a Python Dijkstra.
# =========================================================================

@register(
    "sssp_cost",
    _graph_cte(
        """
        , walk(node, dist) AS (
            SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            UNION
            SELECT e.dst_system_id, w.dist + e.cost
            FROM walk w JOIN fix_jumps e ON e.src_system_id = w.node
            WHERE w.dist < 30
        )
        SELECT node, CAST(MIN(dist) AS DOUBLE) AS dist FROM walk GROUP BY node
        """
    ),
)
def sssp_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    # G7 shortest route kernel: uniform cost=1 (database.rs:484-513).
    jumps = build_jumps(spark, sf_dir)
    return sssp(jumps, [0], weight_col="cost", src_col="src_system_id", dst_col="dst_system_id").select(
        "node", "dist"
    )


@register(
    "sssp_weighted",
    _graph_cte(
        """
        , wedges AS (
            SELECT e.src_system_id AS src, e.dst_system_id AS dst,
                   CAST((s.kills * s.kills) % 7 + 1 AS BIGINT) AS w
            FROM fix_edges_base e JOIN fix_systems s ON s.system_id = e.dst_system_id
        ),
        walk(node, dist) AS (
            SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT)
            UNION
            SELECT e.dst, w.dist + e.w FROM walk w JOIN wedges e ON e.src = w.node
            WHERE w.dist < 80
        )
        SELECT node, CAST(MIN(dist) AS DOUBLE) AS dist FROM walk GROUP BY node
        """
    ),
)
def sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # G8 safest-route kernel with non-uniform weights (database.rs:515-544).
    systems = build_systems(spark, sf_dir)
    jumps = build_jumps(spark, sf_dir, with_risk=False)
    wedges = jumps.join(
        F.broadcast(systems.select(F.col("system_id").alias("dst_system_id"),
                                   ((F.col("kills") * F.col("kills")) % 7 + 1).cast("long").alias("w"))),
        "dst_system_id",
    ).select(F.col("src_system_id").alias("src"), F.col("dst_system_id").alias("dst"), "w")
    return sssp(wedges, [3], weight_col="w").select("node", "dist")


@register(
    "landmark_distances",
    _graph_cte(
        """
        , walk(src, node, dist) AS (
            SELECT system_id, system_id, CAST(0 AS BIGINT)
            FROM fix_systems WHERE system_id IN (0, 3, 7)
            UNION
            SELECT w.src, e.dst_system_id, w.dist + e.cost
            FROM walk w JOIN fix_jumps e ON e.src_system_id = w.node
            WHERE w.dist < 30
        )
        SELECT src AS source, node, CAST(MIN(dist) AS DOUBLE) AS dist
        FROM walk GROUP BY src, node
        """
    ),
)
def landmark_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Landmark distance table — the building block of landmark closeness
    # and distance-oracle embeddings: per-(landmark, node) hop distances
    # from 3 pivots in ONE (source, node)-keyed frontier loop
    # (graph.multi_source_sssp, r6) instead of k sequential SSSP sweeps.
    # Hop sums are exact integers in doubles, so the oracle replays them
    # bit-for-bit via the recursive CTE.
    from eve_graph_spark.operators.graph import multi_source_sssp

    jumps = build_jumps(spark, sf_dir)
    return multi_source_sssp(
        jumps, [0, 3, 7], weight_col="cost",
        src_col="src_system_id", dst_col="dst_system_id",
    ).select("source", "node", "dist")


def _bellman_ford_unrolled_sql(source: int, rounds: int, prefix: str = "srp",
                               source_sql: str | None = None) -> str:
    """Unrolled Bellman-Ford rounds over fix_jumps risk weights, as chained
    CTEs (DuckDB-safe: float dists make a recursive-CTE enumeration
    explode — cycles generate unbounded distinct float sums that UNION
    can't dedup, unlike sssp_weighted's small-integer dist space). The
    fixture graph is 25 nodes at EVERY SF, so `rounds`=24 covers all
    simple shortest paths and the text is constant-sized."""
    # Every CTE is MATERIALIZED (DuckDB hint): d{r} references d{r-1}
    # twice, so inlining doubles the plan per round — 2^24 copies of the
    # parquet-backed view chain exhausts file descriptors. Materialized,
    # each round is one ≤25-row temp computed once.
    parts = [
        f"{prefix}_edges AS MATERIALIZED "
        f"(SELECT src_system_id, dst_system_id, risk FROM fix_jumps)",
        f"{prefix}_d0 AS (SELECT CAST({source_sql or source} AS BIGINT) AS node, "
        f"CAST(0.0 AS DOUBLE) AS dist)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"{prefix}_d{r} AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM ("
            f"SELECT node, dist FROM {prefix}_d{r-1} "
            f"UNION ALL SELECT e.dst_system_id, d.dist + e.risk "
            f"FROM {prefix}_d{r-1} d JOIN {prefix}_edges e ON e.src_system_id = d.node"
            f") GROUP BY node)"
        )
    parts.append(f"{prefix}_mindist AS MATERIALIZED (SELECT node, dist FROM {prefix}_d{rounds})")
    return ", ".join(parts)


@register(
    "safest_route_path",
    _graph_cte(
        f"""
        , {_bellman_ford_unrolled_sql(0, 24)},
        srp_preds AS MATERIALIZED (
            SELECT m.node, MIN(e.src_system_id) AS pred
            FROM srp_mindist m
            JOIN srp_edges e ON e.dst_system_id = m.node
            JOIN srp_mindist u ON u.node = e.src_system_id
            WHERE u.dist + e.risk = m.dist AND m.node <> 0
            GROUP BY m.node
        ),
        srp_back(hop, node, dist) AS (
            SELECT 0, m.node, m.dist FROM srp_mindist m WHERE m.node = 13
            UNION ALL
            SELECT b.hop + 1, p.pred, m.dist
            FROM srp_back b
            JOIN srp_preds p ON p.node = b.node
            JOIN srp_mindist m ON m.node = p.pred
            WHERE b.hop < 30
        ),
        srp_len AS (SELECT MAX(hop) AS mx FROM srp_back)
        SELECT CAST(l.mx - b.hop AS BIGINT) AS pos, b.node AS system_id,
               s.name, b.dist AS cum_risk
        FROM srp_back b CROSS JOIN srp_len l
        JOIN fix_systems s ON s.system_id = b.node
        """
    ),
)
def safest_route_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2/G8 end-to-end: float risk weights + path reconstruction, HASH-
    # CHECKED since r5 (4 rounds of rows-only before). The path is derived
    # from the dist TABLE, not the relaxation loop's pred column: pred(v)
    # := MIN(src) among edges satisfying dist(src) + risk = dist(v)
    # EXACTLY (both engines' dist values are the identical IEEE-754
    # min-plus fixpoint, so the equality sets — and therefore the chosen
    # path, its positions, and cumulative risks — agree bit-for-bit; the
    # loop's pred breaks float ties by first-achiever ITERATION, which no
    # SQL engine can reproduce). Chain is strictly dist-decreasing
    # (risk > 0) hence acyclic and ≤ 24 hops. The walk itself is the
    # SHIPPING reconstruct_path (r7 verdict item 5): threshold-guarded —
    # driver mode collects only (node, pred) here, iterative mode above
    # the threshold fetches one pushed-down row per hop — so the
    # registered query never collects a vertex-sized dist map; cum_risk
    # comes from joining the path-sized order frame back onto dist.
    # The oracle recomputes everything via unrolled Bellman-Ford.
    # r13: dist + preds + walk via sssp_route — one edge collect on the
    # ≤threshold branch instead of a distributed 3-frame preds join plus a
    # separate reconstruct collect (values bit-identical; see sssp_route).
    from eve_graph_spark.operators.graph import sssp_route

    jumps = build_jumps(spark, sf_dir)
    systems = build_systems(spark, sf_dir)
    dist, path = sssp_route(
        jumps, 0, 13, weight_col="risk",
        src_col="src_system_id", dst_col="dst_system_id",
    )
    order = spark.createDataFrame(
        list(enumerate(path)), "pos long, system_id long"
    )
    return (
        dist.withColumnRenamed("node", "system_id")
        .join(F.broadcast(order), "system_id")
        .join(F.broadcast(systems.select("system_id", "name")), "system_id")
        .select("pos", "system_id", "name", F.col("dist").alias("cum_risk"))
    )


@register(
    "stargate_diff_sync",
    """
    WITH sg_expected AS (
        SELECT DISTINCT CAST(n_nationkey * 100 + i AS BIGINT) AS stargate_id
        FROM nation, (VALUES (1), (2), (3)) v(i)
        WHERE i <= 2 + n_nationkey % 2
    ),
    sg_current AS (
        SELECT CAST(n_nationkey * 100 + i AS BIGINT) AS stargate_id
        FROM nation, (VALUES (2), (3)) v(i)
    )
    SELECT 'to_add' AS action, stargate_id FROM sg_expected
    WHERE stargate_id NOT IN (SELECT stargate_id FROM sg_current)
    UNION ALL
    SELECT 'to_remove', stargate_id FROM sg_current
    WHERE stargate_id NOT IN (SELECT stargate_id FROM sg_expected)
    """,
)
def stargate_diff_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D2 (sync.rs:172-221): expected gate ids = EXPLODE of the per-system
    # stargates array, then two-way left_anti diff against current gates.
    systems = build_systems(spark, sf_dir).withColumn(
        "stargates",
        F.expr("transform(sequence(1, 2 + cast(system_id % 2 as int)), i -> system_id * 100 + i)"),
    )
    expected = R.expected_stargates(systems)
    current = build_systems(spark, sf_dir).select(
        F.explode(F.expr("transform(sequence(2, 3), i -> system_id * 100 + i)")).alias("stargate_id")
    )
    to_add, to_remove = R.diff_sync(expected, current, "stargate_id")
    return to_add.select(F.lit("to_add").alias("action"), "stargate_id").unionByName(
        to_remove.select(F.lit("to_remove").alias("action"), "stargate_id")
    )


@register(
    "drop_connections",
    _graph_cte(
        """
        SELECT src_system_id, dst_system_id, cost, kind FROM fix_jumps
        WHERE src_system_id NOT IN (0, 12) AND dst_system_id NOT IN (0, 12)
        """
    ),
)
def drop_connections(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W13 drop_system_connections (database.rs:458-466): undirected edge
    # delete for a node set — two broadcast anti-joins, no shuffle.
    jumps = build_jumps(spark, sf_dir)
    reset = build_systems(spark, sf_dir).filter(F.col("system_id").isin(0, 12)).select("system_id")
    return R.drop_node_connections(jumps, reset).select(
        "src_system_id", "dst_system_id", "cost", "kind"
    )


@register(
    "wormhole_refresh",
    _graph_cte(
        """
        , wr_sigs AS (
            SELECT CAST(s_suppkey % 25 AS BIGINT) AS src,
                   CAST((s_suppkey * 7 + 3) % 25 AS BIGINT) AS dst
            FROM supplier WHERE s_suppkey % 3 = 0
        ),
        wr_kept AS (
            SELECT * FROM fix_jumps
            WHERE src_system_id NOT IN (2, 17) AND dst_system_id NOT IN (2, 17)
        ),
        wr_new AS (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM wr_sigs
                UNION ALL SELECT dst AS src, src AS dst FROM wr_sigs
            )
        ),
        wr_missing AS (
            SELECT src AS src_system_id, dst AS dst_system_id FROM wr_new
            WHERE NOT EXISTS (
                SELECT 1 FROM wr_kept k
                WHERE k.src_system_id = wr_new.src AND k.dst_system_id = wr_new.dst
            )
        )
        SELECT src_system_id, dst_system_id, cost, risk, kind FROM wr_kept
        UNION ALL
        SELECT src_system_id, dst_system_id, CAST(1 AS BIGINT),
               CAST(NULL AS DOUBLE), 'wormhole' FROM wr_missing
        """
    ),
)
def wormhole_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A6 end-to-end (main.rs:201-212, sync.rs:66-94): reset wormhole-hub
    # connections (W13), filter wormhole signatures (D3), insert both
    # directions (W3) idempotently (W5). Signatures are derived
    # deterministically from supplier so the whole dataflow is oracle-able.
    jumps = build_jumps(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    sigs = sup.select(
        F.when(F.col("s_suppkey") % 3 == 0, "wormhole").otherwise("data").alias("signature_type"),
        (F.col("s_suppkey") % 25).cast("long").alias("in_system_id"),
        ((F.col("s_suppkey") * 7 + 3) % 25).cast("long").alias("out_system_id"),
    )
    reset = spark.createDataFrame([(2,), (17,)], "system_id long")
    kept = R.drop_node_connections(jumps, reset)
    wh = R.filter_wormhole_signatures(sigs).select(
        F.col("in_system_id").alias("src_system_id"),
        F.col("out_system_id").alias("dst_system_id"),
        F.lit(1).cast("long").alias("cost"),
        F.lit(None).cast("double").alias("risk"),
        F.lit("wormhole").alias("kind"),
    )
    return R.upsert_edges_if_missing(kept, R.bidirectional_edges(wh)).select(
        "src_system_id", "dst_system_id", "cost", "risk", "kind"
    )


@register(
    "connected_components",
    _graph_cte(
        """
        , cc_edges AS (
            SELECT src_system_id, dst_system_id FROM fix_jumps
            WHERE src_system_id % 6 <> 0 AND dst_system_id % 6 <> 0
        ),
        cc_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src_system_id AS node FROM cc_edges
                UNION ALL SELECT dst_system_id FROM cc_edges
            )
        ),
        cc_walk(node, label) AS (
            SELECT node, node FROM cc_nodes
            UNION
            SELECT e.dst_system_id, w.label
            FROM cc_walk w JOIN cc_edges e ON e.src_system_id = w.node
        )
        SELECT node, MIN(label) AS component FROM cc_walk GROUP BY node
        """
    ),
)
def connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GraphX-style connected components (min-label) on a deterministically
    # disconnected subgraph (dropping nodes ≡0 mod 6 splits the ring).
    from eve_graph_spark.operators.graph_analytics import connected_components

    jumps = build_jumps(spark, sf_dir, with_risk=False).filter(
        (F.col("src_system_id") % 6 != 0) & (F.col("dst_system_id") % 6 != 0)
    )
    return connected_components(jumps)


_PR_ITER_SQL = """
pr{i} AS (
    SELECT n.node,
           (1.0 - 0.85) / (SELECT n FROM pr_n)
           + 0.85 * (COALESCE(c.s, 0) / 1000000000000.0) AS rank
    FROM pr_nodes n LEFT JOIN (
        SELECT e.dst_system_id AS node,
               SUM(CAST(FLOOR(p.rank / d.deg * 1000000000000 + 0.5) AS BIGINT)) AS s
        FROM pr{prev} p JOIN pr_deg d ON d.node = p.node
                        JOIN fix_jumps e ON e.src_system_id = p.node
        GROUP BY 1
    ) c ON c.node = n.node
)"""


@register(
    "pagerank",
    _graph_cte(
        """
        , pr_nodes AS (
            -- inside WITH RECURSIVE, DuckDB treats a bare UNION body as a
            -- recursive union and skips cross-branch dedup; DISTINCT over
            -- UNION ALL is the portable spelling
            SELECT DISTINCT node FROM (
                SELECT src_system_id AS node FROM fix_jumps
                UNION ALL SELECT dst_system_id FROM fix_jumps
            )
        ),
        pr_n AS (SELECT COUNT(*) AS n FROM pr_nodes),
        pr_deg AS (SELECT src_system_id AS node, COUNT(*) AS deg FROM fix_jumps GROUP BY 1),
        pr0 AS (SELECT node, 1.0 / (SELECT n FROM pr_n) AS rank FROM pr_nodes),
        """
        + ",".join(_PR_ITER_SQL.format(i=i, prev=i - 1) for i in (1, 2, 3))
        + """
        SELECT node, rank FROM pr3
        """
    ),
)
def pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-point PageRank, 3 supersteps — bit-reproducible across engines
    # (exact integer contribution sums, one double division per step).
    from eve_graph_spark.operators.graph_analytics import pagerank

    jumps = build_jumps(spark, sf_dir, with_risk=False)
    return pagerank(jumps, iterations=3)


@register(
    "triangle_count",
    _graph_cte(
        """
        , tri_canon AS (
            SELECT DISTINCT src_system_id AS a, dst_system_id AS b
            FROM fix_jumps WHERE src_system_id < dst_system_id
        )
        SELECT COUNT(*) AS n_triangles
        FROM tri_canon e1
        JOIN tri_canon e2 ON e2.a = e1.b
        JOIN tri_canon e3 ON e3.a = e1.a AND e3.b = e2.b
        """
    ),
)
def triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global triangle count — pure joins over the canonical (a<b) edge set.
    from eve_graph_spark.operators.graph_analytics import triangle_count

    return triangle_count(build_jumps(spark, sf_dir, with_risk=False))


@register(
    "two_hop_reach",
    _graph_cte(
        """
        SELECT a.src_system_id AS system_id,
               COUNT(DISTINCT b.dst_system_id) AS n_two_hop
        FROM fix_jumps a JOIN fix_jumps b ON b.src_system_id = a.dst_system_id
        WHERE b.dst_system_id <> a.src_system_id
        GROUP BY a.src_system_id
        """
    ),
)
def two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Motif-style 2-hop neighborhood size: (a)->(b)->(c), c != a —
    # one self-join keyed on the intermediate node.
    jumps = build_jumps(spark, sf_dir, with_risk=False)
    a = jumps.select(F.col("src_system_id"), F.col("dst_system_id").alias("mid"))
    b = jumps.select(F.col("src_system_id").alias("mid"), F.col("dst_system_id").alias("two_hop"))
    return (
        a.join(b, "mid")
        .filter(F.col("two_hop") != F.col("src_system_id"))
        .groupBy(F.col("src_system_id").alias("system_id"))
        .agg(F.count_distinct("two_hop").alias("n_two_hop"))
    )


@register(
    "dfs_traversal",
    _graph_cte(
        """
        , dfs_edges AS (
            SELECT DISTINCT src_system_id AS src, dst_system_id AS dst
            FROM fix_jumps
        ),
        dfs_walk(stack, visited) AS (
            SELECT [CAST(0 AS BIGINT)], [CAST(0 AS BIGINT)]
            UNION ALL
            SELECT
              CASE WHEN nxt IS NULL THEN stack[1:len(stack)-1]
                   ELSE list_append(stack, nxt) END,
              CASE WHEN nxt IS NULL THEN visited
                   ELSE list_append(visited, nxt) END
            FROM (
              SELECT stack, visited,
                     (SELECT MIN(e.dst) FROM dfs_edges e
                      WHERE e.src = stack[len(stack)]
                        AND NOT list_contains(visited, e.dst)) AS nxt
              FROM dfs_walk
            )
            WHERE len(stack) > 0
        ),
        dfs_final AS (SELECT visited FROM dfs_walk WHERE len(stack) = 0),
        dfs_idx AS (
            SELECT unnest(range(1, len(visited) + 1)) AS ord FROM dfs_final
        )
        SELECT CAST(f.visited[i.ord] AS BIGINT) AS node,
               CAST(i.ord AS BIGINT) AS visit_order
        FROM dfs_final f, dfs_idx i
        """
    ),
)
def dfs_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.dfs analogue with a PINNED deterministic order (smallest
    # unvisited neighbor first), replayed by the oracle as a single-row
    # recursive state machine (stack + visited arrays, one CTE iteration
    # per DFS step). DFS is inherently sequential — the engine runs it on
    # the driver and raises beyond the edge threshold (operators/graph.py
    # `dfs` docstring has the scale rationale).
    from eve_graph_spark.operators.graph import dfs

    return dfs(build_jumps(spark, sf_dir, with_risk=False), 0)


@register(
    "closeness_centrality",
    _graph_cte(
        """
        , aw(src, node, dist) AS (
            SELECT system_id, system_id, CAST(0 AS BIGINT) FROM fix_systems
            UNION
            SELECT w.src, e.dst_system_id, w.dist + 1
            FROM aw w JOIN fix_jumps e ON e.src_system_id = w.node
            WHERE w.dist < 12
        ),
        best AS (SELECT src, node, MIN(dist) AS d FROM aw GROUP BY src, node)
        SELECT src AS node, CAST(COUNT(*) - 1 AS DOUBLE) / SUM(d) AS closeness
        FROM best GROUP BY src
        """
    ),
)
def closeness_centrality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Closeness = (reached-1)/Σ hop-dist: exact all-pairs BFS (driver fast
    # path; landmark-sampled distributed variant for big graphs).
    from eve_graph_spark.operators.graph_analytics import closeness_centrality

    return closeness_centrality(build_jumps(spark, sf_dir, with_risk=False))


@register(
    "degree_centrality",
    _graph_cte(
        """
        SELECT node, CAST(SUM(o) AS BIGINT) AS out_degree,
               CAST(SUM(i) AS BIGINT) AS in_degree
        FROM (SELECT src_system_id AS node, 1 AS o, 0 AS i FROM fix_jumps
              UNION ALL
              SELECT dst_system_id AS node, 0 AS o, 1 AS i FROM fix_jumps) d
        GROUP BY node
        """
    ),
)
def degree_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Degree centrality (GDS family, completing pagerank/closeness/
    # betweenness): ONE union + single groupBy — one keyed shuffle of
    # (node, 0/1, 0/1) rows at any scale, with map-side partial sums;
    # no join, no second edge scan (the union's two branches share the
    # scan via ReuseExchange-free column pruning on the same subtree).
    jumps = build_jumps(spark, sf_dir, with_risk=False)
    tagged = jumps.select(
        F.col("src_system_id").alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionByName(
        jumps.select(
            F.col("dst_system_id").alias("node"), F.lit(0).alias("o"), F.lit(1).alias("i")
        )
    )
    return tagged.groupBy("node").agg(
        F.sum("o").cast("long").alias("out_degree"),
        F.sum("i").cast("long").alias("in_degree"),
    )


@register(
    "harmonic_centrality",
    _graph_cte(
        """
        , hw(src, node, dist) AS (
            SELECT system_id, system_id, CAST(0 AS BIGINT) FROM fix_systems
            UNION
            SELECT w.src, e.dst_system_id, w.dist + 1
            FROM hw w JOIN fix_jumps e ON e.src_system_id = w.node
            WHERE w.dist < 12
        ),
        hbest AS (SELECT src, node, MIN(dist) AS d FROM hw GROUP BY src, node)
        SELECT src AS node,
               CAST(SUM(CASE WHEN d > 0
                             THEN CAST(FLOOR(1000000.0 / d + 0.5) AS BIGINT)
                             ELSE 0 END) AS DOUBLE) / 1000000.0 AS harmonic,
               CAST(MAX(d) AS BIGINT) AS eccentricity
        FROM hbest GROUP BY src
        """
    ),
)
def harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Harmonic centrality (Σ 1/d over reachable peers — the
    # disconnected-robust closeness variant) and eccentricity (max d),
    # via the graph_analytics operator (one pass over bfs_sigma's
    # all-pairs dist table). Each 1/d term is fixed-pointed to integer
    # micro-units BEFORE the sum, so the aggregate is order-independent
    # and hash-exact vs DuckDB's recursive-CTE replay (same cap-12 BFS
    # as the closeness oracle); eccentricity is an integer MAX — exact
    # by nature. Scale shape: all-pairs is the fixture-bound driver
    # path; at scale the same aggregate runs landmark-sampled.
    from eve_graph_spark.operators.graph_analytics import harmonic_centrality as hc

    return hc(build_jumps(spark, sf_dir, with_risk=False))


def _betweenness_unrolled_sql(levels: int = 12) -> str:
    """DuckDB replay of betweenness via the pair formula. dist+sigma come
    from walk counts: w{L}(s,v) = number of length-L walks; the MINIMAL
    L with a walk is d(s,v), and its count is sigma (a minimal-length
    walk cannot revisit a node, so minimal walks == shortest paths).
    Unrolled `levels` rounds like the LPA/kcore oracles — the fixture
    jump graph is 25 nodes with diameter <= 12 at every SF (pinned by
    the hash-green closeness oracle's same cap). Each term of the pair
    sum is fixed-pointed to integer micro-units BEFORE summing, making
    the SUM exact integer arithmetic — order-independent, so Spark and
    DuckDB hash-match bit-for-bit (same device as _dsum/pagerank)."""
    steps = [
        ", bnodes AS MATERIALIZED (SELECT DISTINCT src_system_id AS node FROM fix_jumps)",
        ", bw0 AS MATERIALIZED (SELECT node AS s, node AS v, CAST(1 AS DOUBLE) AS cnt FROM bnodes)",
    ]
    for i in range(1, levels + 1):
        steps.append(f"""
    , bw{i} AS MATERIALIZED (
        SELECT w.s, e.dst_system_id AS v, SUM(w.cnt) AS cnt
        FROM bw{i - 1} w JOIN fix_jumps e ON e.src_system_id = w.v
        GROUP BY w.s, e.dst_system_id
    )""")
    union = " UNION ALL ".join(
        f"SELECT {i} AS lvl, s, v, cnt FROM bw{i}" for i in range(levels + 1)
    )
    steps.append(f"""
    , ballw AS MATERIALIZED ({union})
    , bds AS MATERIALIZED (SELECT s, v, MIN(lvl) AS d FROM ballw GROUP BY s, v)
    , bsig AS MATERIALIZED (
        SELECT a.s, a.v, ds.d, a.cnt AS sigma
        FROM ballw a JOIN bds ds ON a.s = ds.s AND a.v = ds.v AND a.lvl = ds.d
    )
    SELECT n.node,
           COALESCE(CAST(t.fp AS DOUBLE) / 1000000.0, 0.0) AS betweenness
    FROM bnodes n LEFT JOIN (
        SELECT sv.v AS node,
               SUM(CAST(FLOOR(sv.sigma * vt.sigma / st.sigma * 1000000 + 0.5)
                   AS BIGINT)) AS fp
        FROM bsig sv
        JOIN bsig vt ON vt.s = sv.v
        JOIN bsig st ON st.s = sv.s AND st.v = vt.v
        WHERE sv.d + vt.d = st.d AND sv.s <> sv.v AND vt.s <> vt.v
        GROUP BY sv.v
    ) t ON t.node = n.node""")
    return _graph_cte("".join(steps))


@register("betweenness_centrality", _betweenness_unrolled_sql(12))
def betweenness_centrality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Betweenness over ordered (s,t) pairs via the PAIR FORMULA on
    # bfs_sigma's (dist, sigma) table: bet(v) = sum over pairs of
    # sigma_sv * sigma_vt / sigma_st where d(s,v)+d(v,t)=d(s,t). Each
    # term is fixed-pointed to integer micro-units before the sum, so
    # the aggregate is order-independent and hash-exact vs DuckDB —
    # the Brandes-accumulation OPERATOR (graph_analytics.
    # betweenness_centrality, with the sampled scale path) cannot be
    # fixed-pointed (nested non-integer ratios) and is pinned against
    # this formula in tests/test_betweenness.py instead. The 25-row
    # fixture node collect is constant-size by construction (same
    # pattern as safest_route_path).
    from eve_graph_spark.operators.graph_analytics import bfs_sigma

    jumps = build_jumps(spark, sf_dir, with_risk=False)
    # sources=None: all-pairs forward pass from bfs_sigma's single edge
    # collect; the dist==0 rows ARE the node set (one row per source),
    # so no separate node-list job or second fixture subtree is planned
    # the driver-path result is a Python-built relation; the pair join
    # scans it FOUR times (nodes/sv/vt/st) and each scan of a
    # python-RDD-backed plan pays a Python-worker deserialization pass —
    # one eager localCheckpoint materializes JVM blocks instead (625
    # rows), turning all four scans JVM-side (~3x on this query's bench)
    vs = bfs_sigma(jumps, None).transform(truncate_lineage)
    nodes = vs.filter(F.col("dist") == 0).select("node")
    sv = vs.select(
        F.col("source").alias("s"), F.col("node").alias("v"),
        F.col("dist").alias("d_sv"), F.col("sigma").alias("sig_sv"),
    )
    vt = vs.select(
        F.col("source").alias("v2"), F.col("node").alias("t"),
        F.col("dist").alias("d_vt"), F.col("sigma").alias("sig_vt"),
    )
    st = vs.select(
        F.col("source").alias("s2"), F.col("node").alias("t2"),
        F.col("dist").alias("d_st"), F.col("sigma").alias("sig_st"),
    )
    # broadcast hints: every side is a slice of the 625-row all-pairs
    # local relation (constant-size at every SF by fixture construction),
    # so the three-way pair join runs shuffle-free
    terms = (
        sv.join(F.broadcast(vt), sv["v"] == vt["v2"])
        .join(F.broadcast(st), (F.col("s") == F.col("s2")) & (F.col("t") == F.col("t2")))
        .filter(
            (F.col("d_sv") + F.col("d_vt") == F.col("d_st"))
            & (F.col("s") != F.col("v"))
            & (F.col("v2") != F.col("t"))
        )
    )
    fp = F.floor(
        F.col("sig_sv") * F.col("sig_vt") / F.col("sig_st") * 1000000 + F.lit(0.5)
    ).cast("long")
    per_v = terms.groupBy(F.col("v").alias("node")).agg(F.sum(fp).alias("__fp"))
    return nodes.join(F.broadcast(per_v), "node", "left").select(
        "node",
        (F.coalesce(F.col("__fp"), F.lit(0)).cast("double") / F.lit(1000000.0)).alias(
            "betweenness"
        ),
    )


def _weighted_betweenness_unrolled_sql(hops: int = 24) -> str:
    """DuckDB replay of WEIGHTED betweenness via the pair formula over
    weighted walk enumeration: vw{i}(s, v, wsum, cnt) counts i-hop walks
    by total weight; dist(s,v) = MIN wsum over every hop count, sigma =
    the count at that wsum summed across hop counts (each walk appears in
    exactly one vw{i}; positive weights make every min-weight walk a
    simple path, so minimal walks == shortest paths and counts match —
    hop counts CAN differ among equal-weight shortest paths, hence the
    cross-i sum). Weights are the sssp_weighted fixture's
    (kills² % 7 + 1) integers, so wsum/d are exact in BIGINTs and the
    pair-formula terms are fixed-pointed exactly like the hop version.
    `hops`=24 covers all simple paths on the 25-node fixture."""
    steps = [
        ", vw_edges AS MATERIALIZED (SELECT e.src_system_id AS src, "
        "e.dst_system_id AS dst, CAST((s.kills * s.kills) % 7 + 1 AS BIGINT) AS w "
        "FROM fix_edges_base e JOIN fix_systems s ON s.system_id = e.dst_system_id)",
        ", vw_nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM vw_edges)",
        ", vw0 AS MATERIALIZED (SELECT node AS s, node AS v, CAST(0 AS BIGINT) AS wsum, "
        "CAST(1 AS DOUBLE) AS cnt FROM vw_nodes)",
    ]
    for i in range(1, hops + 1):
        steps.append(
            f", vw{i} AS MATERIALIZED (SELECT w.s, e.dst AS v, w.wsum + e.w AS wsum, "
            f"SUM(w.cnt) AS cnt FROM vw{i - 1} w JOIN vw_edges e ON e.src = w.v "
            f"GROUP BY w.s, e.dst, w.wsum + e.w)"
        )
    union = " UNION ALL ".join(
        f"SELECT s, v, wsum, cnt FROM vw{i}" for i in range(hops + 1)
    )
    steps.append(f"""
    , vwall AS MATERIALIZED (
        SELECT s, v, wsum, SUM(cnt) AS cnt FROM ({union}) GROUP BY s, v, wsum
    )
    , vwd AS MATERIALIZED (SELECT s, v, MIN(wsum) AS d FROM vwall GROUP BY s, v)
    , vwsig AS MATERIALIZED (
        SELECT a.s, a.v, ds.d, a.cnt AS sigma
        FROM vwall a JOIN vwd ds ON a.s = ds.s AND a.v = ds.v AND a.wsum = ds.d
    )
    SELECT n.node,
           COALESCE(CAST(t.fp AS DOUBLE) / 1000000.0, 0.0) AS betweenness
    FROM vw_nodes n LEFT JOIN (
        SELECT sv.v AS node,
               SUM(CAST(FLOOR(sv.sigma * vt.sigma / st.sigma * 1000000 + 0.5)
                   AS BIGINT)) AS fp
        FROM vwsig sv
        JOIN vwsig vt ON vt.s = sv.v
        JOIN vwsig st ON st.s = sv.s AND st.v = vt.v
        WHERE sv.d + vt.d = st.d AND sv.s <> sv.v AND vt.s <> vt.v
        GROUP BY sv.v
    ) t ON t.node = n.node""")
    return _graph_cte("".join(steps))


@register("betweenness_weighted", _weighted_betweenness_unrolled_sql(24))
def betweenness_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WEIGHTED betweenness (GDS relationshipWeightProperty parity, r6
    # verdict item 3) via the pair formula over dijkstra_sigma's
    # (dist, sigma) table — same fixed-point-terms device as the hop
    # version, same integer (kills² % 7 + 1) weights as sssp_weighted so
    # dist equalities are exact in doubles. The Brandes-accumulation
    # OPERATOR (betweenness_centrality(weight_col=...), with the
    # Dijkstra-Brandes driver path and the depth-layered distributed
    # backward pass) cannot be fixed-pointed and is pinned against an
    # independent Floyd-Warshall pair-formula oracle in
    # tests/test_weighted_centrality.py instead.
    from eve_graph_spark.operators.graph_analytics import dijkstra_sigma

    systems = build_systems(spark, sf_dir)
    jumps = build_jumps(spark, sf_dir, with_risk=False)
    wedges = jumps.join(
        F.broadcast(systems.select(F.col("system_id").alias("dst_system_id"),
                                   ((F.col("kills") * F.col("kills")) % 7 + 1)
                                   .cast("long").alias("w"))),
        "dst_system_id",
    ).select(F.col("src_system_id").alias("src"), F.col("dst_system_id").alias("dst"), "w")
    # sources=None: all-pairs driver path (25-node fixture at every SF);
    # one eager localCheckpoint turns the four pair-join scans JVM-side
    # (same rationale as betweenness_centrality)
    vs = dijkstra_sigma(wedges, None, weight_col="w",
                        src_col="src", dst_col="dst").transform(truncate_lineage)
    nodes = vs.filter(F.col("dist") == 0).select("node")
    sv = vs.select(
        F.col("source").alias("s"), F.col("node").alias("v"),
        F.col("dist").alias("d_sv"), F.col("sigma").alias("sig_sv"),
    )
    vt = vs.select(
        F.col("source").alias("v2"), F.col("node").alias("t"),
        F.col("dist").alias("d_vt"), F.col("sigma").alias("sig_vt"),
    )
    st = vs.select(
        F.col("source").alias("s2"), F.col("node").alias("t2"),
        F.col("dist").alias("d_st"), F.col("sigma").alias("sig_st"),
    )
    terms = (
        sv.join(F.broadcast(vt), sv["v"] == vt["v2"])
        .join(F.broadcast(st), (F.col("s") == F.col("s2")) & (F.col("t") == F.col("t2")))
        .filter(
            (F.col("d_sv") + F.col("d_vt") == F.col("d_st"))
            & (F.col("s") != F.col("v"))
            & (F.col("v2") != F.col("t"))
        )
    )
    fp = F.floor(
        F.col("sig_sv") * F.col("sig_vt") / F.col("sig_st") * 1000000 + F.lit(0.5)
    ).cast("long")
    per_v = terms.groupBy(F.col("v").alias("node")).agg(F.sum(fp).alias("__fp"))
    return nodes.join(F.broadcast(per_v), "node", "left").select(
        "node",
        (F.coalesce(F.col("__fp"), F.lit(0)).cast("double") / F.lit(1000000.0)).alias(
            "betweenness"
        ),
    )


def _weighted_closeness_sql(rounds: int = 24) -> str:
    """DuckDB replay of weighted closeness on the float risk graph:
    multi-source unrolled Bellman-Ford (min-plus over doubles is
    engine-exact — min is order-free and IEEE addition is monotone, the
    safest_route_path argument), then Σdist made order-independent by
    fixed-pointing each dist to micro-units before the integer sum."""
    parts = [
        ", cw_edges AS MATERIALIZED "
        "(SELECT src_system_id, dst_system_id, risk FROM fix_jumps)",
        ", cw_d0 AS (SELECT system_id AS s, system_id AS node, "
        "CAST(0.0 AS DOUBLE) AS dist FROM fix_systems)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f", cw_d{r} AS MATERIALIZED (SELECT s, node, MIN(dist) AS dist FROM ("
            f"SELECT s, node, dist FROM cw_d{r - 1} "
            f"UNION ALL SELECT d.s, e.dst_system_id, d.dist + e.risk "
            f"FROM cw_d{r - 1} d JOIN cw_edges e ON e.src_system_id = d.node"
            f") GROUP BY s, node)"
        )
    parts.append(f"""
    SELECT node,
           CASE WHEN SUM(fp) > 0
                THEN CAST(COUNT(*) - 1 AS DOUBLE)
                     / (CAST(SUM(fp) AS DOUBLE) / 1000000.0)
                ELSE 0.0 END AS closeness
    FROM (SELECT s, node, CAST(FLOOR(dist * 1000000.0 + 0.5) AS BIGINT) AS fp
          FROM cw_d{rounds})
    GROUP BY node""")
    return _graph_cte("".join(parts))


@register("closeness_weighted", _weighted_closeness_sql(24))
def closeness_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WEIGHTED closeness on the RISK graph (r6 verdict item 3): every
    # pivot runs through the one-loop weighted multi-source SSSP; float
    # dists are engine-exact min-plus fixpoints, and the operator
    # quantizes each dist to micro-units before the sum so the aggregate
    # is order-independent and hash-exact vs the unrolled-Bellman-Ford
    # oracle. 24 rounds cover all simple paths on the 25-node fixture.
    from eve_graph_spark.operators.graph_analytics import closeness_centrality

    return closeness_centrality(build_jumps(spark, sf_dir), weight_col="risk")


def _weighted_harmonic_sql(rounds: int = 24) -> str:
    """DuckDB replay of weighted harmonic + eccentricity on the float risk
    graph: the same unrolled min-plus Bellman-Ford as weighted closeness
    (dist bits are engine-exact), then 1/d fixed-pointed to micro-units
    per term (an IEEE double division + floor on identical d bits —
    identical in both engines) and MAX(dist) compared bit-for-bit."""
    parts = [
        ", hcw_edges AS MATERIALIZED "
        "(SELECT src_system_id, dst_system_id, risk FROM fix_jumps)",
        ", hcw_d0 AS (SELECT system_id AS s, system_id AS node, "
        "CAST(0.0 AS DOUBLE) AS dist FROM fix_systems)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f", hcw_d{r} AS MATERIALIZED (SELECT s, node, MIN(dist) AS dist FROM ("
            f"SELECT s, node, dist FROM hcw_d{r - 1} "
            f"UNION ALL SELECT d.s, e.dst_system_id, d.dist + e.risk "
            f"FROM hcw_d{r - 1} d JOIN hcw_edges e ON e.src_system_id = d.node"
            f") GROUP BY s, node)"
        )
    parts.append(f"""
    SELECT s AS node,
           CAST(SUM(CASE WHEN dist > 0
                         THEN CAST(FLOOR(1000000.0 / dist + 0.5) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) / 1000000.0 AS harmonic,
           MAX(dist) AS eccentricity
    FROM hcw_d{rounds}
    GROUP BY s""")
    return _graph_cte("".join(parts))


@register("harmonic_weighted", _weighted_harmonic_sql(24))
def harmonic_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WEIGHTED harmonic centrality + eccentricity on the RISK graph (r7
    # verdict stretch 7: GDS relationshipWeightProperty parity for the
    # last hop-only centrality pair). Same exactness chain as
    # closeness_weighted — engine-exact min-plus dists out of the one
    # weighted multi-source frontier loop (dijkstra_sigma), per-term
    # 1e6 fixed-point before the order-free integer sum, bit-exact MAX
    # for eccentricity.
    from eve_graph_spark.operators.graph_analytics import harmonic_centrality as hc

    return hc(build_jumps(spark, sf_dir), weight_col="risk")


# =========================================================================
# Sort / top-k / window — SURVEY §2.8 relational extensions
# =========================================================================

@register(
    "top_k_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-k: Spark plans TakeOrderedAndProject — no full sort at scale.
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "window_top_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def window_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "tumbling_window_events",
    f"""
    SELECT (epoch_ms(ts) // 600000) * 600 AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum_sql("value", "sum_value")}
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch analogue of the streaming tumbling window (F.window) — expressed
    # as epoch bucketing so the oracle is engine-neutral. The streaming
    # variant lives in eve_graph_spark/streaming/.
    ev = events_with_ts(spark, sf_dir)
    return (
        ev.groupBy(
            (F.expr("ts_sec div 600") * 600).alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value", "sum_value"))
    )


# =========================================================================
# Joins / rollup / set ops — relational breadth (SURVEY §2.8)
# =========================================================================

@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 3-way join: customer (filtered, broadcast) ⋈ orders ⋈ lineitem.
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("__rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(_dsum("__rev", "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate")
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 6-way star join; all dims broadcast, only the fact side shuffles for
    # the final aggregation.
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .withColumn("__rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("n_name")
        .agg(_dsum("__rev", "revenue"))
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q4 shape: EXISTS-subquery as a left_semi join, then aggregate.
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "rollup_orders",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "cube_orders",
    f"""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
           {_dsum_sql("o_totalprice", "sum_total")}
    FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouping-sets breadth (SURVEY §2.8): CUBE = all 4 grouping sets in
    # one pass — Spark expands then partial-aggregates, one shuffle.
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), _dsum("o_totalprice", "sum_total"))
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT 100.0 * ({_dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", "x").replace(" AS x", "")})
           / ({_dsum_sql("l_extendedprice * (1 - l_discount)", "y").replace(" AS y", "")}) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q14 shape: fact ⋈ broadcast(part dim) + conditional aggregate.
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)).alias("__promo"),
        rev.alias("__rev"),
    )
    agg = joined.agg(_dsum("__promo", "p"), _dsum("__rev", "r"))
    return agg.select((F.lit(100.0) * F.col("p") / F.col("r")).alias("promo_revenue"))


@register(
    "sliding_window_events",
    f"""
    WITH slid AS (
        SELECT unnest([(epoch_ms(ts) // 1000 // 300) * 300,
                       (epoch_ms(ts) // 1000 // 300) * 300 - 300]) AS window_start,
               event_type, value
        FROM events
    )
    SELECT window_start, event_type, COUNT(*) AS n_events,
           {_dsum_sql("value", "sum_value")}
    FROM slid GROUP BY 1, 2
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch analogue of the streaming sliding window (10-min window, 5-min
    # slide): each event explodes into its two covering windows, then one
    # aggregation — the same shape F.window(ts, '10 minutes', '5 minutes')
    # plans, but epoch-bucketed so the oracle is engine-neutral.
    ev = events_with_ts(spark, sf_dir)
    ws = (F.expr("ts_sec div 300") * 300).cast("long")
    return (
        ev.select(
            F.explode(F.array(ws, ws - 300)).alias("window_start"), "event_type", "value"
        )
        .groupBy("window_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value", "sum_value"))
    )


@register(
    "embedding_near_dups",
    """
    WITH pos AS (SELECT unnest(range(1, 65)) AS pos),
    v AS (SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS val
          FROM embeddings, pos
          WHERE embedding IS NOT NULL AND len(embedding) = 64),
    dots AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               SUM(CAST(FLOOR(a.val * b.val * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0 AS dot
        FROM v a JOIN v b ON b.vec_id = a.vec_id + 1 AND b.pos = a.pos
        GROUP BY 1, 2
    ),
    norms AS (
        SELECT vec_id, SUM(CAST(FLOOR(val * val * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0 AS sq
        FROM v GROUP BY 1
    )
    SELECT id_a, id_b,
           d.dot / (sqrt(na.sq) * sqrt(nb.sq)) AS cosine,
           d.dot / (sqrt(na.sq) * sqrt(nb.sq)) >= 0.2 AS is_near
    FROM dots d JOIN norms na ON na.vec_id = d.id_a
                JOIN norms nb ON nb.vec_id = d.id_b
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding-cosine near-dup: exact fixed-point cosine on candidate
    # pairs (consecutive ids keep the oracle linear; LSH generates the
    # candidates at scale — see ann_lsh_topk).
    from eve_graph_spark.operators.similarity import pairwise_cosine

    # NULL / wrong-width guard symmetric with the oracle's WHERE: without
    # it a NULL embedding vanishes Spark-side (posexplode emits no rows)
    # while the oracle keeps a NULL-cosine pair row (ADVICE r4 class).
    emb = spread(load_table(spark, sf_dir, "embeddings")).filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    )
    pairs = emb.select(F.col("vec_id").alias("id_a"), (F.col("vec_id") + 1).alias("id_b")).join(
        emb.select(F.col("vec_id").alias("id_b")), "id_b", "left_semi"
    )
    scored = pairwise_cosine(emb, pairs)
    return scored.select("id_a", "id_b", "cosine", (F.col("cosine") >= 0.2).alias("is_near"))


@register(
    "full_outer_activity",
    """
    WITH act AS (
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        WHERE o_orderkey % 2 = 0 GROUP BY o_custkey
    ),
    vip AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0)
    SELECT COALESCE(v.c_custkey, a.o_custkey) AS custkey,
           v.c_name, COALESCE(a.n_orders, 0) AS n_orders
    FROM vip v FULL OUTER JOIN act a ON v.c_custkey = a.o_custkey
    """,
)
def full_outer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full outer join breadth: both sides deliberately partial so all
    # three match classes (left-only / right-only / both) are non-empty.
    act = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    vip = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", "c_name"
    )
    return vip.join(act, vip.c_custkey == act.o_custkey, "full_outer").select(
        F.coalesce(vip.c_custkey, act.o_custkey).alias("custkey"),
        "c_name",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
    )


@register(
    "exact_median_price",
    """
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag, l_extendedprice AS median_price
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def exact_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact discrete median (lower median: element at (n+1)/2) — chosen
    # over interpolated percentiles, whose (a + (b-a)*frac) float paths
    # differ between engines. Total tie-break makes the pick deterministic.
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    return (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("l_returnflag", F.col("l_extendedprice").alias("median_price"))
    )


@register(
    "sketches",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_within_bound,
           TRUE AS p50_within_bound,
           TRUE AS p95_within_bound,
           TRUE AS p99_within_bound
    FROM events GROUP BY event_type
    """,
)
def sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sketch surface: HyperLogLog++ distinct users and approximate value
    # quantiles per event type — the O(1)-memory per group answers a
    # 100 TB profiling pass actually uses (exact twins exist above).
    #
    # Hash-checkable form (4 rounds of rows-only before r5): the sketch
    # ESTIMATES can't match any exact engine, so the output carries what
    # CAN — the exact distinct count, plus booleans asserting each
    # estimate sits inside its documented error bound, computed Spark-side
    # against exact ranks. The oracle recomputes the exact count and emits
    # TRUE for the bounds; an out-of-bound estimate flips the Spark
    # boolean and fails the hash. Bounds: HLL++ |approx-exact| ≤ 3·rsd·
    # exact (rsd=0.02); percentile_approx (GK sketch, accuracy=10000) rank
    # error ≤ ceil(n/accuracy)+1, checked via the exact rank interval
    # [count(<est)+1, count(≤est)] of the returned value.
    #
    # Plan: two scans of events (sketch agg + rank-check agg vs the
    # broadcast 5-row estimate table) — both partial-agg'd; at 100 TB the
    # second scan is what a one-sided profiling pass would avoid, but the
    # *check* is the point of this query; the production call is the first
    # aggregate alone.
    ev = events_with_ts(spark, sf_dir)
    q = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    est = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n"),
        q.getItem(0).alias("p50_est"),
        q.getItem(1).alias("p95_est"),
        q.getItem(2).alias("p99_est"),
    )
    ranks = (
        ev.select("event_type", "value")
        .join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                agg
                for p in ("p50", "p95", "p99")
                for agg in (
                    F.sum((F.col("value") < F.col(f"{p}_est")).cast("long")).alias(f"{p}_lt"),
                    F.sum((F.col("value") <= F.col(f"{p}_est")).cast("long")).alias(f"{p}_le"),
                )
            ]
        )
    )
    tol = F.ceil(F.col("n") / F.lit(10000)) + 1

    def within(p: str, frac: float):
        target = F.col("n") * F.lit(frac)
        # exact rank interval of the returned value must intersect
        # [target - tol, target + tol]
        return (F.col(f"{p}_le") >= target - tol) & (F.col(f"{p}_lt") <= target + tol)

    hll_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= F.lit(3 * 0.02) * F.col("exact_users")
    )
    return (
        est.join(F.broadcast(ranks), "event_type")
        .select(
            "event_type",
            "exact_users",
            hll_ok.alias("hll_within_bound"),
            within("p50", 0.5).alias("p50_within_bound"),
            within("p95", 0.95).alias("p95_within_bound"),
            within("p99", 0.99).alias("p99_within_bound"),
        )
    )


@register(
    "set_ops",
    """
    SELECT 'intersect' AS op, k FROM
        (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except', k FROM
        (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union', k FROM
        (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D1 generalized: distinct set algebra over nation keys.
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return (
        c.intersect(s).select(F.lit("intersect").alias("op"), "k")
        .unionByName(c.subtract(s).select(F.lit("except").alias("op"), "k"))
        .unionByName(c.union(s).distinct().select(F.lit("union").alias("op"), "k"))
    )


@register(
    "asof_join_events",
    """
    WITH l AS (
        SELECT user_id, epoch_us(ts) AS ts, event_id FROM events
        WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT user_id, epoch_us(ts) AS ts, MIN(event_id) AS r_event_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT l.event_id, l.user_id, l.ts,
           COALESCE(r.r_event_id, -1) AS r_event_id
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # As-of join: each purchase matched to the user's most recent view at
    # or before it — union-scan idiom (one shuffle), oracled against
    # DuckDB's native ASOF JOIN.
    from eve_graph_spark.operators.asof import asof_join

    # µs timestamps on BOTH sides (DuckDB reads TIMESTAMP_NANOS at µs
    # precision, so nanos would diverge in output AND tie semantics)
    ev = events_with_ts(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_us").alias("ts"), "event_id"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts_us").alias("ts"))
        .agg(F.min("event_id").alias("r_event_id"))
    )
    # -1 sentinel for "no prior view": a NULL here makes pandas lift the
    # oracle's whole r_event_id column to float64 (66 -> 66.0), failing the
    # driver's hash on every matched row whenever ANY row is unmatched.
    return asof_join(left, right, on="ts", by=["user_id"]).select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce("r_event_id", F.lit(-1)).cast("long").alias("r_event_id"),
    )


@register(
    "range_join_orders",
    """
    WITH pts AS (SELECT o_orderkey, o_orderkey % 997 AS val FROM orders),
    bands AS (
        SELECT CAST(n_nationkey AS BIGINT) AS band_id,
               CAST(n_nationkey * 40 AS BIGINT) AS lo,
               CAST(n_nationkey * 40 + 60 AS BIGINT) AS hi
        FROM nation
    )
    SELECT o_orderkey, val, band_id
    FROM pts JOIN bands ON val >= lo AND val <= hi
    """,
)
def range_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range join via bin-bucketed equi-join (see operators/range_join.py);
    # the oracle uses DuckDB's native inequality join — same result set.
    from eve_graph_spark.operators.range_join import range_join

    pts = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_orderkey") % 997).alias("val")
    )
    bands = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("band_id"),
        (F.col("n_nationkey") * 40).cast("long").alias("lo"),
        (F.col("n_nationkey") * 40 + 60).cast("long").alias("hi"),
    )
    return range_join(pts, bands, "val", "lo", "hi", bin_width=64).select(
        "o_orderkey", "val", "band_id"
    )


@register(
    "time_rollup_events",
    f"""
    WITH e AS (
        SELECT epoch_ms(ts) // 1000 AS tsec, value FROM events
    ),
    b AS (SELECT (tsec // 60) * 60 AS minute_start,
                 (tsec // 3600) * 3600 AS hour_start, value FROM e)
    SELECT 'minute' AS grain, minute_start AS bucket_start,
           COUNT(*) AS n_events, {_dsum_sql("value", "sum_value")}
    FROM b GROUP BY minute_start
    UNION ALL
    SELECT 'hour', hour_start, COUNT(*), {_dsum_sql("value", "x").replace(" AS x", "")}
    FROM b GROUP BY hour_start
    """,
)
def time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hypertable-style multi-resolution rollup: minute + hour aggregates,
    # one partial-aggregated shuffle per grain. At scale the hour grain
    # would fold the minute output (60x smaller input) instead of
    # re-scanning — compose: hour = rollup(minute) — kept flat here so the
    # oracle stays a plain GROUP BY.
    ev = events_with_ts(spark, sf_dir).select(
        (F.expr("ts_sec div 60") * 60).alias("minute_start"),
        (F.expr("ts_sec div 3600") * 3600).alias("hour_start"),
        "value",
    )
    minute = ev.groupBy("minute_start").agg(
        F.count(F.lit(1)).alias("n_events"), _dsum("value", "sum_value")
    ).select(F.lit("minute").alias("grain"), F.col("minute_start").alias("bucket_start"),
             "n_events", "sum_value")
    hour = ev.groupBy("hour_start").agg(
        F.count(F.lit(1)).alias("n_events"), _dsum("value", "sum_value")
    ).select(F.lit("hour").alias("grain"), F.col("hour_start").alias("bucket_start"),
             "n_events", "sum_value")
    return minute.unionByName(hour)


@register(
    "sessionize_events",
    """
    WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events),
    o AS (SELECT user_id, event_id, tns,
                 LAG(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS prev
          FROM e),
    flagged AS (SELECT user_id, event_id, tns,
                       CASE WHEN prev IS NULL OR tns - prev > 1800000000000 THEN 1 ELSE 0 END AS new_s
                FROM o),
    sess AS (SELECT user_id, tns,
                    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
             FROM flagged)
    SELECT user_id, session_no, COUNT(*) AS n_events,
           (MAX(tns) - MIN(tns)) // 1000000000 AS duration_sec
    FROM sess GROUP BY user_id, session_no
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Session windows with a 30-min gap, batch form (gaps-and-islands).
    # The streaming form (F.session_window + watermark) is in
    # eve_graph_spark/streaming/; this one is SQL-oracle-checkable.
    ev = events_with_ts(spark, sf_dir).select("user_id", "event_id", F.col("ts_ns").alias("tns"))
    w = Window.partitionBy("user_id").orderBy("tns", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("tns").over(w).isNull()
            | ((F.col("tns") - F.lag("tns").over(w)) > 1_800_000_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_no", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(tns) - min(tns)) div 1000000000").alias("duration_sec"),
    )


# =========================================================================
# Text analysis (operators/text_analysis.py) — all JVM column expressions
# =========================================================================

@register(
    "lang_id_documents",
    """
    WITH scores AS (
        SELECT doc_id,
               len(list_filter(string_split(lower(text), ' '),
                   w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS en,
               len(list_filter(string_split(lower(text), ' '),
                   w -> w IN ('el','la','de','que','y','en','un','es','se','no'))) AS es,
               len(list_filter(string_split(lower(text), ' '),
                   w -> w IN ('der','die','und','das','in','zu','den','ist','von','mit'))) AS de
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN en = 0 AND es = 0 AND de = 0 THEN 'und'
                WHEN en >= es AND en >= de THEN 'en'
                WHEN es >= de THEN 'es'
                ELSE 'de' END AS lang_guess
    FROM scores
    """,
)
def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eve_graph_spark.operators.text_analysis import lang_id_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", lang_id_expr(F.col("text")).alias("lang_guess"))


@register(
    "quality_scores",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
           CAST(length(coalesce(text, '')) AS DOUBLE)
               / len(string_split(lower(coalesce(text, '')), ' '))
             + CAST(len(list_filter(string_split(lower(coalesce(text, '')), ' '),
                    w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS DOUBLE)
               / len(string_split(lower(coalesce(text, '')), ' '))
             - CASE WHEN length(coalesce(text, '')) = 0 THEN 0.0
                    ELSE CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
                         / CAST(length(text) AS DOUBLE) END AS quality
    FROM documents
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eve_graph_spark.operators.text_analysis import (
        punct_count,
        quality_score_expr,
        word_count,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        word_count(F.col("text")).alias("n_words"),
        punct_count(F.col("text")).alias("n_punct"),
        quality_score_expr(F.col("text")).alias("quality"),
    )


@register(
    "token_counts",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS n_tokens
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eve_graph_spark.operators.text_analysis import token_count

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


@register(
    "fingerprints",
    """
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, least(length(text), 64) + 1),
                       i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eve_graph_spark.operators.text_analysis import fingerprint_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", fingerprint_expr(F.col("text")).alias("fingerprint"))


@register(
    "normalize_by_group",
    """
    SELECT event_id, event_type,
           CASE WHEN mx = mn THEN 0.0 ELSE (value - mn) / (mx - mn) END AS norm_value
    FROM (
        SELECT event_id, event_type, value,
               MIN(value) OVER (PARTITION BY event_type) AS mn,
               MAX(value) OVER (PARTITION BY event_type) AS mx
        FROM events
    )
    """,
)
def normalize_by_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped-map applyInPandas (the UDAF surface) vs a window-function
    # oracle: min-max normalization is exact in both formulations.
    from eve_graph_spark.operators.pandas_surface import normalize_by_group

    ev = events_with_ts(spark, sf_dir).select("event_id", "event_type", "value")
    return normalize_by_group(ev, ["event_type"], "value").select(
        "event_id", "event_type", "norm_value"
    )


@register(
    "chunk_documents",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    c AS (
        SELECT doc_id,
               list_transform(
                   range(0, 1 + CASE WHEN len(words) <= 50 THEN 0
                                     ELSE (len(words) - 50 + 39) // 40 END),
                   i -> array_to_string(list_slice(words, i * 40 + 1, i * 40 + 50), ' ')
               ) AS chunks
        FROM w
    )
    SELECT doc_id, (u.i - 1) AS chunk_no, chunks[u.i] AS chunk_text,
           len(string_split(chunks[u.i], ' ')) AS n_words
    FROM c, unnest(range(1, len(chunks) + 1)) AS u(i)
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LLM-training chunking: overlapping 50-word windows, stride 40,
    # exploded to one row per chunk. The split materializes ONCE.
    from eve_graph_spark.operators.text_analysis import chunk_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", F.split("text", " ").alias("__words"))
        .select("doc_id", F.posexplode(chunk_expr("__words", 50, 40)).alias("chunk_no", "chunk_text"))
        .select(
            "doc_id", "chunk_no", "chunk_text",
            F.size(F.split("chunk_text", " ")).alias("n_words"),
        )
    )


@register(
    "stratified_sample",
    """
    SELECT event_id, event_type FROM events
    WHERE ((event_id % 100) * 61) % 100 < 10
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic ~10% sample via a portable integer hash (Knuth
    # multiplicative) — reproducible across engines and runs, unlike
    # df.sample(); stratification is per-key filtering, no shuffle at all.
    ev = events_with_ts(spark, sf_dir)
    return ev.filter((F.col("event_id") % 100) * 61 % 100 < 10).select(
        "event_id", "event_type"
    )


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
    ),
    toks2 AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks2 GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks2 GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, score, rank FROM (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf * (SELECT n_docs FROM n) AS DOUBLE) / dfreq.df AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf * (SELECT n_docs FROM n) AS DOUBLE) / dfreq.df DESC,
                            tf.term
               ) AS rank
        FROM tf JOIN dfreq USING (term)
    ) WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TF-IDF-style term salience, top-3 per doc. Uses the exact rational
    # tf * n_docs / docfreq instead of ln(idf): integer operands and ONE
    # double division are bit-identical across engines; ln() is not.
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.length("term") > 0)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df from tf itself: tf rows are unique per (doc, term), so doc
    # frequency is a windowed COUNT over the term partition. The separate
    # dropDuplicates+groupBy(term) branch re-planned the tokenize subtree
    # (a second corpus scan) and its join redistributed tf by term anyway —
    # the window pays that same term shuffle once, with no extra scan.
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)


# =========================================================================
# Dedup (operators/dedup.py)
# =========================================================================

@register(
    "ngram_jaccard_pairs",
    """
    WITH sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(string_split(lower(coalesce(text, '')), ' ')) >= 3 THEN
                   list_transform(range(0, len(string_split(lower(coalesce(text, '')), ' ')) - 2),
                       i -> array_to_string(list_slice(string_split(lower(coalesce(text, '')), ' '), i + 1, i + 3), ' '))
                   ELSE [lower(coalesce(text, ''))] END) AS sh
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact 3-word-shingle Jaccard on consecutive doc pairs — the oracled
    # verify-kernel of the near-dup pipeline (pair generation at scale is
    # LSH, below; consecutive pairs keep the oracle linear-sized).
    from eve_graph_spark.operators.dedup import jaccard_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = docs.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")).join(
        docs.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi"
    )
    return jaccard_pairs(docs, pairs)


@register(
    "minhash_near_dups_portable",
    f"""
    WITH msh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(string_split(lower(coalesce(text, '')), ' ')) >= 3 THEN
                   list_transform(range(0, len(string_split(lower(coalesce(text, '')), ' ')) - 2),
                       i -> array_to_string(list_slice(string_split(lower(coalesce(text, '')), ' '), i + 1, i + 3), ' '))
                   ELSE [lower(coalesce(text, ''))] END) AS sh
        FROM documents
    ),
    mhs AS (
        SELECT doc_id, sh,
               list_transform(sh, s ->
                   ('0x' || substr(md5(s), 1, 14))::BIGINT % 2147483647) AS hs
        FROM msh
    ),
    msigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), j ->
                   list_min(list_transform(hs,
                       h -> ((2 * j + 1) * h + 97 * j + 13) % 2147483647))) AS sig
        FROM mhs
    ),
    mbanded AS (
        SELECT DISTINCT doc_id, u.i AS band, ({portable_band_buckets_sql('sig', 4, 2, one_based=True)})[u.i] AS bucket
        FROM msigs, unnest(range(1, 5)) AS u(i)
    ),
    mcand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM mbanded a JOIN mbanded b USING (band, bucket)
        WHERE a.doc_id < b.doc_id
    ),
    -- r10: verification is TEXT-FREE — Jaccard over the distinct DIGEST
    -- sets (the same md5-mod-P family the signatures use), replaying
    -- dedup.jaccard_pairs(digest='portable') exactly, collisions included
    mdg AS (SELECT doc_id, list_distinct(hs) AS dg FROM mhs)
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(x.dg, y.dg)) AS DOUBLE)
             / len(list_distinct(list_concat(x.dg, y.dg))) AS jaccard
    FROM mcand c JOIN mdg x ON x.doc_id = c.id_a JOIN mdg y ON y.doc_id = c.id_b
    WHERE CAST(len(list_intersect(x.dg, y.dg)) AS DOUBLE)
             / len(list_distinct(list_concat(x.dg, y.dg))) >= 0.5
    """,
)
def minhash_near_dups_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The SAME MinHash-LSH pipeline as minhash_near_dups, on portable
    # polynomial/universal hashes — fully oracle-checked end to end
    # (signatures, banding, candidate generation, exact-Jaccard verify).
    from eve_graph_spark.operators.dedup import portable_minhash_near_dups

    docs = spread(load_table(spark, sf_dir, "documents"))
    return portable_minhash_near_dups(docs, threshold=0.5)


@register(
    "lsh_capped_pairs_portable",
    f"""
    WITH msh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(string_split(lower(coalesce(text, '')), ' ')) >= 3 THEN
                   list_transform(range(0, len(string_split(lower(coalesce(text, '')), ' ')) - 2),
                       i -> array_to_string(list_slice(string_split(lower(coalesce(text, '')), ' '), i + 1, i + 3), ' '))
                   ELSE [lower(coalesce(text, ''))] END) AS sh
        FROM documents
    ),
    mhs AS (
        SELECT doc_id, sh,
               list_transform(sh, s ->
                   ('0x' || substr(md5(s), 1, 14))::BIGINT % 2147483647) AS hs
        FROM msh
    ),
    msigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), j ->
                   list_min(list_transform(hs,
                       h -> ((2 * j + 1) * h + 97 * j + 13) % 2147483647))) AS sig
        FROM mhs
    ),
    mbanded AS (
        SELECT DISTINCT doc_id, u.i AS band, ({portable_band_buckets_sql('sig', 4, 2, one_based=True)})[u.i] AS bucket
        FROM msigs, unnest(range(1, 5)) AS u(i)
    ),
    bsz AS (SELECT band, bucket, COUNT(*) AS n FROM mbanded GROUP BY 1, 2),
    allp AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM mbanded a
        JOIN mbanded b USING (band, bucket)
        JOIN bsz s USING (band, bucket)
        WHERE s.n <= 2 AND a.doc_id < b.doc_id
    ),
    chain AS (
        SELECT id_a, id_b FROM (
            SELECT m.doc_id AS id_a,
                   LEAD(m.doc_id) OVER (PARTITION BY m.band, m.bucket
                                        ORDER BY m.doc_id) AS id_b
            FROM mbanded m JOIN bsz s USING (band, bucket)
            WHERE s.n > 2
        ) WHERE id_b IS NOT NULL
    )
    SELECT DISTINCT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b
    FROM (SELECT * FROM allp UNION ALL SELECT * FROM chain)
    """,
)
def lsh_capped_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The r12 degenerate-bucket cap, HASH-CHECKED: portable banding with
    # max_bucket_size=2 — on the natural fixture corpus several buckets
    # hold 3-4 docs at every SF, so the over-cap sorted-id CHAIN path
    # actually executes and the oracle replays BOTH arms exactly
    # (all-pairs for buckets <= 2, consecutive-id chain above). The
    # production-scale behavior (7,998,108 -> 6,005 candidates on a
    # planted 4,000-doc mega-bucket) is measured in
    # scripts/scale_stress.py --lsh-megabucket; this query pins the split
    # logic bit-for-bit where the driver can see it.
    from eve_graph_spark.operators.dedup import portable_lsh_candidates

    docs = spread(load_table(spark, sf_dir, "documents"))
    return portable_lsh_candidates(docs, max_bucket_size=2)


@register(
    "minhash_near_dups",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           TRUE AS precision_ok,
           TRUE AS any_pairs
    FROM documents
    """,
)
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full xxhash64 MinHash+LSH near-dup pipeline at threshold 0.5 — the
    # production-hash twin of hash-green minhash_near_dups_portable.
    # r11 verdict item 5: no longer rows-only. xxhash64 signatures (and
    # therefore WHICH pairs LSH surfaces) can't be replayed in SQL, but
    # the pipeline's CONTRACT can: per document, every returned pair it
    # participates in must pass an exact STRING-shingle Jaccard >= 0.5
    # recompute (precision — a broken band join, digest collision
    # handling, or threshold filter flips it). RECALL stays pinned by the
    # portable twin, which replays the whole pipeline bit-for-bit. The
    # recompute joins text for only the returned pairs (dozens), not the
    # corpus.
    #
    # `any_pairs` is the NON-VACUITY pin (ADVICE r12): with zero pairs the
    # per-doc precision verdicts all coalesce to TRUE, so the most
    # plausible xxhash64-specific regression — an empty/broken band join —
    # used to stay hash-green. The fixture corpora contain near-dups the
    # deterministic xxhash64 pipeline surfaces at every SF (measured 28 /
    # 25 / 256 pairs at sf0.001/0.01/0.1), so the oracle asserts TRUE and
    # an empty pair set flips every row's hash. It replaces the old
    # `canonical_ok`, which was tautological (the pipeline filters
    # id_a < id_b upstream of the check).
    from eve_graph_spark.operators.dedup import jaccard_pairs, minhash_dedup

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = minhash_dedup(docs, threshold=0.5)  # id_a, id_b, digest jaccard
    exact = jaccard_pairs(docs, pairs.select("id_a", "id_b"), digest=None)
    # materialize the pair-sized verdicts BEFORE the two-endpoint explode:
    # each branch would otherwise re-plan (and at scale re-EXECUTE) the
    # whole LSH + two-verify pipeline — 13 corpus scans instead of 7
    # (test_plan_scan_budget pins it)
    per_pair = exact.select(
        "id_a", "id_b",
        (F.col("jaccard") >= 0.5).alias("__prec"),
    ).transform(truncate_lineage)
    ends = per_pair.select(F.col("id_a").alias("doc_id"), "__prec").unionByName(
        per_pair.select(F.col("id_b").alias("doc_id"), "__prec")
    )
    verdicts = ends.groupBy("doc_id").agg(F.bool_and("__prec").alias("__p"))
    # 1-row broadcast (Cross BNLJ, the whitelisted scalar shape): reads
    # the already-materialized per_pair frame, not the corpus
    nonempty = per_pair.agg((F.count(F.lit(1)) > 0).alias("any_pairs"))
    return (
        docs.select("doc_id")
        # verdicts is EXPLICITLY broadcast: its rows are the pair
        # participants — intrinsically sparse output of the
        # post-threshold LSH verify (a corpus where this is corpus-sized
        # needs exact-dup pre-collapse first, near_dup_clusters' job) —
        # and without the hint AQE occasionally shuffled the corpus-sized
        # doc_id side instead (observed 15,489 vs 20,489 shuffle rows
        # across otherwise-identical r13 bench runs)
        .join(F.broadcast(verdicts), "doc_id", "left")
        .crossJoin(F.broadcast(nonempty))
        .select(
            "doc_id",
            F.coalesce("__p", F.lit(True)).alias("precision_ok"),
            "any_pairs",
        )
    )


@register(
    "simhash_portable",
    """
    WITH psh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(string_split(lower(coalesce(text, '')), ' ')) >= 2 THEN
                   list_transform(range(0, len(string_split(lower(coalesce(text, '')), ' ')) - 1),
                       i -> array_to_string(list_slice(string_split(lower(coalesce(text, '')), ' '), i + 1, i + 2), ' '))
                   ELSE [lower(coalesce(text, ''))] END) AS sh
        FROM documents
    ),
    phs AS (
        SELECT doc_id,
               list_transform(sh, s ->
                   ('0x' || substr(md5(s), 1, 14))::BIGINT % 2147483647) AS hs
        FROM psh
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 31), b ->
               CASE WHEN list_sum(list_transform(hs, h -> 2 * ((h >> b) & 1) - 1)) > 0
                    THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE CAST(0 AS BIGINT) END
           )) AS BIGINT) AS simhash
    FROM phs
    """,
)
def simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SimHash on the portable 31-bit hash — fully oracle-checked twin of
    # the xxhash64 production signature below.
    from eve_graph_spark.operators.dedup import portable_simhash_sql

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", F.expr(portable_simhash_sql("text")).alias("simhash"))


@register(
    "simhash_signatures",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           TRUE AS sig_nonnull,
           TRUE AS text_determines_sig,
           TRUE AS recompute_stable
    FROM documents
    """,
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Production (xxhash64) SimHash signatures — twin of hash-green
    # simhash_portable. r11 verdict item 5: no longer rows-only. The
    # 64-bit values can't be replayed in SQL, but per document the oracle
    # pins: the signature is non-null (null text must still sign — a
    # dropped doc silently exits the dedup universe), equal TEXT yields
    # equal signatures (the vote accumulator is a pure function of the
    # shingle multiset), and an independent recompute across a DIFFERENT
    # partitioning lands bit-identical (no partition-dependent state in
    # the expression). A flipped bit anywhere fails the hash.
    from eve_graph_spark.operators.dedup import simhash_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    # materialized once — consumed by the per-text group AND the final
    # join, which would otherwise re-plan the signature scan
    sigs = docs.select(
        "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("__t"),
        simhash_expr("text").alias("__sig"),
    ).transform(truncate_lineage)
    # second, independently planned + shuffled evaluation of the same expr
    resig = (
        docs.repartition(7, "doc_id")
        .select("doc_id", simhash_expr("text").alias("__sig2"))
    )
    per_text = sigs.groupBy("__t").agg(
        (F.count_distinct("__sig") == 1).alias("__one_sig_per_text")
    )
    return (
        sigs.join(resig, "doc_id")
        .join(per_text, "__t")
        .select(
            "doc_id",
            F.col("__sig").isNotNull().alias("sig_nonnull"),
            F.col("__one_sig_per_text").alias("text_determines_sig"),
            (F.col("__sig") == F.col("__sig2")).alias("recompute_stable"),
        )
    )


# =========================================================================
# Similarity search (operators/similarity.py)
# =========================================================================

ANN_QUERY_IDS = [0, 1, 2, 3, 4]

@register(
    "ann_brute_force_topk",
    """
    WITH pos AS (SELECT unnest(range(1, 65)) AS pos),
    q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
          WHERE vec_id IN (0,1,2,3,4) AND embedding IS NOT NULL AND len(embedding) = 64),
    qexp AS (SELECT query_id, pos, CAST(qvec[pos] AS DOUBLE) AS qval FROM q, pos),
    cand AS (SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS cval FROM embeddings, pos
             WHERE embedding IS NOT NULL AND len(embedding) = 64),
    dots AS (
        SELECT query_id, vec_id,
               SUM(CAST(FLOOR(cval * qval * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0 AS dot
        FROM cand JOIN qexp USING (pos)
        WHERE vec_id <> query_id
        GROUP BY query_id, vec_id
    ),
    norms AS (
        SELECT vec_id AS nid,
               SUM(CAST(FLOOR(cval * cval * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0 AS sqnorm
        FROM cand GROUP BY vec_id
    ),
    scored AS (
        SELECT d.query_id, d.vec_id,
               d.dot / (sqrt(qn.sqnorm) * sqrt(cn.sqnorm)) AS cosine
        FROM dots d JOIN norms qn ON qn.nid = d.query_id
                    JOIN norms cn ON cn.nid = d.vec_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eve_graph_spark.operators.similarity import brute_force_topk

    # guard symmetric with the oracle's WHERE (ADVICE r4 class): NULL /
    # short vectors otherwise diverge between posexplode and unnest-range
    emb = spread(load_table(spark, sf_dir, "embeddings")).filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    )
    return brute_force_topk(emb, ANN_QUERY_IDS, k=10, exact_fixed_point=True).select(
        "query_id", "vec_id", "cosine", "rank"
    )


def _lsh_planes_values_sql() -> str:
    """The registered LSH query's hyperplanes as a SQL VALUES list.

    The planes come from a seeded LCG (similarity.random_hyperplanes), so
    they are CONSTANTS both engines can share: every value is a dyadic
    rational (state/2^30 - 1) whose repr() round-trips exactly through any
    IEEE-double SQL parser."""
    from eve_graph_spark.operators.similarity import random_hyperplanes

    return ",\n            ".join(
        "({}, [{}])".format(i, ", ".join(repr(v) for v in row))
        for i, row in enumerate(random_hyperplanes(64, 8))
    )


@register(
    "ann_lsh_topk",
    f"""
    WITH pos AS (SELECT unnest(range(1, 65)) AS pos),
    planes AS (SELECT * FROM (VALUES
            {_lsh_planes_values_sql()}
    ) AS t(i, pvec)),
    pexp AS (SELECT i, pos, CAST(pvec[pos] AS DOUBLE) AS pval FROM planes, pos),
    emb AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
    v AS (SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS val FROM emb, pos),
    idots AS (
        SELECT v.vec_id, p.i,
               SUM(CAST(FLOOR(v.val * p.pval * 1000000000 + 0.5) AS BIGINT)) AS idot
        FROM v JOIN pexp p USING (pos) GROUP BY 1, 2
    ),
    bucket AS (
        SELECT vec_id,
               SUM(CASE WHEN idot > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS bucket
        FROM idots GROUP BY 1
    ),
    q AS (SELECT vec_id AS query_id, bucket FROM bucket WHERE vec_id IN (0,1,2,3,4)),
    cand_pairs AS (
        SELECT q.query_id, b.vec_id
        FROM q JOIN bucket b ON b.bucket = q.bucket AND b.vec_id <> q.query_id
    ),
    dots AS (
        SELECT cp.query_id, cp.vec_id,
               SUM(CAST(FLOOR(qv.val * cv.val * 1000000000 + 0.5) AS BIGINT))
                   / 1000000000.0 AS dot
        FROM cand_pairs cp
        JOIN v cv ON cv.vec_id = cp.vec_id
        JOIN v qv ON qv.vec_id = cp.query_id AND qv.pos = cv.pos
        GROUP BY 1, 2
    ),
    norms AS (
        SELECT vec_id AS nid,
               SUM(CAST(FLOOR(val * val * 1000000000 + 0.5) AS BIGINT))
                   / 1000000000.0 AS sq
        FROM v GROUP BY 1
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT d.query_id, d.vec_id,
               d.dot / (sqrt(qn.sq) * sqrt(cn.sq)) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY d.query_id
                   ORDER BY d.dot / (sqrt(qn.sq) * sqrt(cn.sq)) DESC, d.vec_id
               ) AS rank
        FROM dots d
        JOIN norms qn ON qn.nid = d.query_id
        JOIN norms cn ON cn.nid = d.vec_id
    ) WHERE rank <= 10
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-checkable since r5 (4 rounds rows-only): the hyperplanes are
    # seeded-LCG constants and the sign bits + re-rank cosine go through
    # integer fixed point (exact_lsh_bucket_expr / fixed_dot), so the
    # ENTIRE approximate pipeline — bucket assignment included — is
    # bit-reproducible by an oracle inlining the same plane constants.
    # Recall stays probabilistic (that's the operator's contract, pinned
    # separately in tests); what the hash now proves is that the
    # bucket-restricted candidate set and its exact re-rank are right.
    from eve_graph_spark.operators.similarity import lsh_bucketed_topk

    emb = spread(load_table(spark, sf_dir, "embeddings")).filter(
        F.size("embedding") == 64  # symmetric with the oracle's len() guard
    )
    return lsh_bucketed_topk(emb, ANN_QUERY_IDS, k=10, exact_fixed_point=True).select(
        "query_id", "vec_id", "cosine", "rank"
    )


@register(
    "ann_ivf_topk",
    """
    WITH pos AS (SELECT unnest(range(1, 65)) AS pos),
    emb AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
    v AS (SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS val FROM emb, pos),
    qexp AS (SELECT vec_id AS query_id, pos, val FROM v WHERE vec_id IN (0,1,2,3,4)),
    dots AS (
        SELECT qe.query_id, cv.vec_id,
               SUM(CAST(FLOOR(qe.val * cv.val * 1000000000 + 0.5) AS BIGINT))
                   / 1000000000.0 AS dot
        FROM v cv JOIN qexp qe ON qe.pos = cv.pos AND cv.vec_id <> qe.query_id
        GROUP BY 1, 2
    ),
    norms AS (
        SELECT vec_id AS nid,
               SUM(CAST(FLOOR(val * val * 1000000000 + 0.5) AS BIGINT))
                   / 1000000000.0 AS sq
        FROM v GROUP BY 1
    ),
    scored AS (
        SELECT d.query_id, d.vec_id,
               d.dot / (sqrt(qn.sq) * sqrt(cn.sq)) AS cosine
        FROM dots d
        JOIN norms qn ON qn.nid = d.query_id
        JOIN norms cn ON cn.nid = d.vec_id
    )
    SELECT query_id, vec_id AS exact_top1_vec_id, cosine AS exact_top1_cosine,
           TRUE AS ivf_recall_at_10_ok
    FROM (
        SELECT query_id, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-checkable since r5, sketches-style: Lloyd training (float argmax
    # + mean updates) can't be replayed bit-for-bit in SQL, so the output
    # carries what CAN — the exact-fixed-point top-1 neighbor per query,
    # plus a boolean asserting IVF recall@10 ≥ 0.5 against the exact top-10
    # (the bound the operator's tests pin; measured 0.7-0.9 on the
    # fixtures). The oracle recomputes the exact top-1 and emits TRUE; an
    # IVF regression below the bound flips the boolean and fails the hash.
    # The full approximate top-k surface remains `similarity.ivf_topk`,
    # parity-pinned between its driver-local and distributed paths.
    from eve_graph_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spread(load_table(spark, sf_dir, "embeddings")).filter(
        F.size("embedding") == 64
    )
    exact = brute_force_topk(emb, ANN_QUERY_IDS, k=10, exact_fixed_point=True).select(
        "query_id", "vec_id", "cosine", "rank"
    )
    ivf = (
        ivf_topk(emb, ANN_QUERY_IDS, k=10)
        .select("query_id", "vec_id")
        .withColumn("__hit", F.lit(1))
    )
    # Single consumer of `exact`: the first cut branched it twice (overlap
    # semi-join + the rank-1 filter), so Catalyst planned the whole
    # exact-fixed-point brute force TWICE — measured ~2x the expected wall
    # at sf0.1. One left join + min_by/sum aggregate keeps both outputs
    # (top-1 row and recall count) in one pass over the single subtree.
    return (
        exact.join(ivf, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.min_by("vec_id", "rank").alias("exact_top1_vec_id"),
            F.min_by("cosine", "rank").alias("exact_top1_cosine"),
            (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) >= 5).alias(
                "ivf_recall_at_10_ok"
            ),
        )
    )


@register(
    "ann_ivf_pq_topk",
    """
    WITH pos AS (SELECT unnest(range(1, 65)) AS pos),
    emb AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
    v AS (SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS val FROM emb, pos),
    qexp AS (SELECT vec_id AS query_id, pos, val FROM v WHERE vec_id IN (0,1,2,3,4)),
    dots AS (
        SELECT qe.query_id, cv.vec_id,
               SUM(CAST(FLOOR(qe.val * cv.val * 1000000000 + 0.5) AS BIGINT))
                   / 1000000000.0 AS dot
        FROM v cv JOIN qexp qe ON qe.pos = cv.pos AND cv.vec_id <> qe.query_id
        GROUP BY 1, 2
    ),
    norms AS (
        SELECT vec_id AS nid,
               SUM(CAST(FLOOR(val * val * 1000000000 + 0.5) AS BIGINT))
                   / 1000000000.0 AS sq
        FROM v GROUP BY 1
    ),
    scored AS (
        SELECT d.query_id, d.vec_id,
               d.dot / (sqrt(qn.sq) * sqrt(cn.sq)) AS cosine
        FROM dots d
        JOIN norms qn ON qn.nid = d.query_id
        JOIN norms cn ON cn.nid = d.vec_id
    )
    SELECT query_id, vec_id AS exact_top1_vec_id, cosine AS exact_top1_cosine,
           TRUE AS pq_recall_at_10_ok
    FROM (
        SELECT query_id, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF-PQ (r6 verdict item 8) under the same recall harness as
    # ann_ivf_topk: PQ training (per-subspace float k-means) can't be
    # replayed in SQL, so the output carries the exact-fixed-point top-1
    # per query plus a boolean pinning PQ recall@10 >= 0.5 vs the exact
    # top-10 (measured 0.8-0.9 on the fixtures — identical to plain IVF
    # at the default rerank depth, since the ADC shortlist of 100 covers
    # the probed cells' true top-10). A PQ regression (bad codebooks,
    # broken ADC, shortlist too shallow) flips the boolean and fails the
    # hash.
    from eve_graph_spark.operators.similarity import (
        brute_force_topk, ivf_pq_index, ivf_pq_topk,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings")).filter(
        F.size("embedding") == 64
    )
    # r14 (guide §1.2, r13-verdict item 4): build the index ONCE here and
    # share its training collect with the exact side — when the collect
    # covered the whole corpus, the exact side's |Q|-row query batch is a
    # local frame instead of another corpus scan, and ivf_pq_topk's whole
    # ADC+rerank runs driver-side (bit-parity pinned in tests). Values are
    # identical: the q rows are the same source rows either way.
    index, model = ivf_pq_index(emb)
    if "_corpus_rows" not in model:
        # distributed encode (big corpus / forced-distributed arm): the
        # in-place index must be materialized once, exactly as ivf_pq_topk
        # did when it built the index itself — see its docstring
        from eve_graph_spark.checkpointing import truncate_lineage

        index = index.transform(truncate_lineage)
    q_df = None
    if "_corpus_rows" in model:
        qset = {int(q) for q in ANN_QUERY_IDS}
        q_df = spark.createDataFrame(
            [
                (int(r["vec_id"]), [float(x) for x in r["embedding"]])
                for r in model["_corpus_rows"] if int(r["vec_id"]) in qset
            ],
            "query_id long, qvec array<double>",
        )
    exact = brute_force_topk(
        emb, ANN_QUERY_IDS, k=10, exact_fixed_point=True, q_df=q_df
    ).select("query_id", "vec_id", "cosine", "rank")
    pq = (
        ivf_pq_topk(emb, ANN_QUERY_IDS, k=10, index=index, model=model)
        .select("query_id", "vec_id")
        .withColumn("__hit", F.lit(1))
    )
    return (
        exact.join(pq, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.min_by("vec_id", "rank").alias("exact_top1_vec_id"),
            F.min_by("cosine", "rank").alias("exact_top1_cosine"),
            (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) >= 5).alias(
                "pq_recall_at_10_ok"
            ),
        )
    )


#: k for the production IVF row below — interpolated into BOTH the Spark
#: body and the oracle SQL so editing one cannot silently desynchronize
#: the other (ADVICE r11); ANN_QUERY_IDS plays the same dual role.
ANN_PRODUCTION_K = 10

@register(
    "ann_ivf_production",
    f"""
    SELECT CAST(vec_id AS BIGINT) AS query_id,
           CAST({ANN_PRODUCTION_K} AS BIGINT) AS n_results,
           TRUE AS results_distinct,
           TRUE AS ranks_wellformed,
           TRUE AS cosines_monotone,
           TRUE AS self_excluded,
           TRUE AS cosine_recompute_ok
    FROM embeddings
    WHERE vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})
      AND len(embedding) = 64
    """,
)
def ann_ivf_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The PRODUCTION ivf_topk path on its own bench clock (r5 verdict
    # item 2): `ann_ivf_topk` above is the CHECK — it pays an extra exact
    # brute-force pass to bound recall, so its bench number conflated
    # check cost with operator cost (0.79 s → 1.75 s in r5). This row
    # times what a user actually calls; the recall bound and the
    # driver-local/distributed parity stay pinned by ann_ivf_topk and
    # tests/test_round4_ops.py.
    #
    # r10 verdict item 2: no longer rows-only. The raw (query_id, vec_id,
    # cosine, rank) rows depend on which cells the trained quantizer
    # probes, so no SQL oracle can reproduce them — but the OUTPUT can
    # still be pinned without paying the brute-force pass. Per query we
    # assert (a) exactly k distinct results with ranks 1..k, (b) cosines
    # nonincreasing in rank, (c) the query itself excluded, and (d) every
    # returned cosine agrees (±1e-6) with an exact fixed-point recompute
    # from the raw vectors — a 50-pair join, not a corpus scan. A broken
    # re-rank, a float drift in the dot product, or a truncated result
    # list flips a boolean and fails the hash; RECALL stays pinned by
    # ann_ivf_topk, which exists precisely to pay that check.
    from eve_graph_spark.operators.similarity import ivf_topk

    emb = spread(load_table(spark, sf_dir, "embeddings")).filter(
        F.size("embedding") == 64
    )
    res = ivf_topk(emb, ANN_QUERY_IDS, k=ANN_PRODUCTION_K)  # query_id, vec_id, cosine, rank

    # exact fixed-point cosine recompute for ONLY the returned pairs:
    # the involved-id set is <= 5 queries + 50 neighbours, broadcast both.
    ids = (
        res.select(F.col("vec_id").alias("vid"))
        .union(res.select(F.col("query_id").alias("vid")))
        .distinct()
    )
    vecs = emb.join(F.broadcast(ids), emb["vec_id"] == F.col("vid")).select(
        F.col("vid"), F.col("embedding").alias("vec")
    )
    fp = F.lit(10**9)
    def _sq_fp(v):  # fixed-point squared norm, mirrors the oracle's SUM(FLOOR(...))
        return (
            F.aggregate(
                v,
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.floor(x * x * fp + F.lit(0.5)).cast("long"),
            )
            / fp
        )
    paired = (
        res.join(
            F.broadcast(vecs.select(F.col("vid").alias("query_id"), F.col("vec").alias("qv"))),
            "query_id",
        )
        .join(
            F.broadcast(vecs.select(F.col("vid").alias("vec_id"), F.col("vec").alias("cv"))),
            "vec_id",
        )
        .withColumn(
            "dot_fp",
            F.aggregate(
                F.zip_with(
                    "qv", "cv",
                    lambda a, b: F.floor(a * b * fp + F.lit(0.5)).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            / fp,
        )
        .withColumn(
            "cos_fp", F.col("dot_fp") / (F.sqrt(_sq_fp(F.col("qv"))) * F.sqrt(_sq_fp(F.col("cv"))))
        )
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    flagged = paired.withColumn("prev_cos", F.lag("cosine").over(w))
    return (
        flagged.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_results"),
            (F.count_distinct("vec_id") == F.count(F.lit(1))).alias("results_distinct"),
            (
                (F.min("rank") == 1)
                & (F.max("rank") == F.count(F.lit(1)))
                & (F.count_distinct("rank") == F.count(F.lit(1)))
            ).alias("ranks_wellformed"),
            F.bool_and(
                F.col("prev_cos").isNull() | (F.col("cosine") <= F.col("prev_cos"))
            ).alias("cosines_monotone"),
            F.bool_and(F.col("vec_id") != F.col("query_id")).alias("self_excluded"),
            F.bool_and(
                F.abs(F.col("cosine") - F.col("cos_fp")) < F.lit(1e-6)
            ).alias("cosine_recompute_ok"),
        )
        .select(
            "query_id", "n_results", "results_distinct", "ranks_wellformed",
            "cosines_monotone", "self_excluded", "cosine_recompute_ok",
        )
    )


# =========================================================================
# Multimodal plumbing (operators/multimodal.py)
# =========================================================================

@register(
    "multimodal_features",
    """
    SELECT doc_id AS media_id, md5(text) AS digest, strlen(text) AS n_bytes
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mapInPandas feature extraction over binary blobs; digest + byte size
    # are oracle-checkable (md5 of the utf-8 bytes), the decoded feature
    # vector is covered by unit tests (deterministic fake decoder).
    from eve_graph_spark.operators.multimodal import documents_as_media, extract_features

    docs = spread(load_table(spark, sf_dir, "documents"))
    media = documents_as_media(docs)
    return extract_features(media).select("media_id", "digest", "n_bytes")


# =========================================================================
# TPC-H relational breadth (adapted to the driver schema: no partsupp, no
# comment/phone/shipmode columns). Each plan is the shape Catalyst should
# pick at 100 TB: dims broadcast, facts shuffle once for the aggregate,
# filters pushed into the parquet scan.
# =========================================================================

@register(
    "q6_forecast_revenue",
    f"""
    SELECT {_dsum_sql("l_extendedprice * l_discount", "revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q6: pure scan + conjunctive filter + single aggregate. All four
    # predicates reach the parquet reader (PushedFilters); zero joins.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .withColumn("__rev", F.col("l_extendedprice") * F.col("l_discount"))
        .agg(_dsum("__rev", "revenue"))
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {_dsum_sql("volume", "revenue")}
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                      JOIN orders   ON o_orderkey = l_orderkey
                      JOIN customer ON c_custkey = o_custkey
                      JOIN nation n1 ON s_nationkey = n1.n_nationkey
                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q7: nation-pair trade volume by year. The nation dim joins twice
    # under different roles (supplier side / customer side) — both broadcast.
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__vol"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum("__vol", "revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           ({_dsum_sql("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0.0 END", "x").replace(" AS x", "")})
           / ({_dsum_sql("volume", "y").replace(" AS y", "")}) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation n1 ON c_nationkey = n1.n_nationkey
                  JOIN region   ON n1.n_regionkey = r_regionkey
                  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q8: national market share — conditional-sum / sum ratio per
    # year. 8-way star join, every dim broadcast, one fact shuffle.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("__vol"),
            F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0.0)).alias("__nvol"),
        )
    )
    agg = joined.groupBy("o_year").agg(_dsum("__nvol", "n"), _dsum("__vol", "d"))
    return agg.select("o_year", (F.col("n") / F.col("d")).alias("mkt_share"))


@register(
    "q9_product_type_profit",
    f"""
    SELECT nation, o_year, {_dsum_sql("volume", "sum_profit")}
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q9 shape (profit = discounted revenue; the driver schema has no
    # partsupp/supplycost): LIKE-filtered part dim, grouped by supplier
    # nation and order year.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__vol"),
        )
        .groupBy("nation", "o_year")
        .agg(_dsum("__vol", "sum_profit"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name
    FROM (
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
                      JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
    )
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q10: top-20 customers by returned-item revenue. orderBy+limit
    # plans as TakeOrderedAndProject (no global sort); revenue is
    # fixed-point so the top-20 frontier is engine-identical.
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .withColumn("__rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum("__rev", "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderstatus <> 'O'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q13: order-count histogram over a left outer join (customers
    # with zero matching orders must appear with c_count = 0).
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "O").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q17_small_quantity_revenue",
    f"""
    WITH part_avg AS (
        SELECT l_partkey,
               ({_dsum_sql("l_quantity", "s").replace(" AS s", "")}) / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ({_dsum_sql("l_extendedprice", "s").replace(" AS s", "")}) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN part_avg USING (l_partkey)
    WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q17: correlated scalar subquery (per-part average quantity)
    # decorrelated into an aggregate + join — the per-part avg table is
    # partkey-sized, so it broadcasts; the fact scans once.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    part_avg = (
        li.groupBy("l_partkey")
        .agg(_dsum("l_quantity", "s"), F.count(F.lit(1)).alias("n"))
        .select("l_partkey", (F.col("s") / F.col("n")).alias("avg_qty"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((_dsum("l_extendedprice", "s")))
        .select((F.col("s") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    f"""
    WITH big AS (
        SELECT l_orderkey, {_dsum_sql("l_quantity", "sum_qty")}
        FROM lineitem GROUP BY l_orderkey
        HAVING ({_dsum_sql("l_quantity", "x").replace(" AS x", "")}) > 300.0
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18: HAVING over a fact aggregation, then join the survivors
    # (tiny) back to orders/customer — survivors broadcast, top-20 via
    # TakeOrderedAndProject.
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1.0 AND 11.0)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10.0 AND 20.0)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20.0 AND 30.0)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q19: OR-of-ANDs predicate spanning both join sides. Catalyst
    # pushes the common join key through; the per-side conjuncts prune the
    # part dim before broadcast.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1.0, 11.0))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10.0, 20.0))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20.0, 30.0))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .withColumn("__rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .agg(_dsum("__rev", "revenue"))
    )


@register(
    "q22_sales_opportunity",
    f"""
    WITH avg_bal AS (
        SELECT ({_dsum_sql("c_acctbal", "s").replace(" AS s", "")}) / COUNT(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
           {_dsum_sql("c_acctbal", "totacctbal")}
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY cntrycode
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join,
    # grouped by a derived country code (nationkey mod — the driver schema
    # has no phone column). The threshold is a 1-row cross join; the
    # anti-join side is keys-only.
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(_dsum("c_acctbal", "s"), F.count(F.lit(1)).alias("n"))
        .select((F.col("s") / F.col("n")).alias("__avg_bal"))
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select((F.col("c_nationkey") % 5).cast("long").alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"), _dsum("c_acctbal", "totacctbal"))
    )


# =========================================================================
# Relational surface: pivot, grouping sets, window frames; directed SCC
# =========================================================================

@register(
    "pivot_status_by_year",
    f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           {_dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", "total_f")},
           {_dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", "total_o")},
           {_dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", "total_p")}
    FROM orders GROUP BY o_year
    """,
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pivot (long → wide): one shuffle, explicit value list so the output
    # schema is static (no extra distinct-scan to discover pivot values —
    # that matters at 100 TB).
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(_dsum("o_totalprice", "t"))
        .withColumnsRenamed({"F": "total_f", "O": "total_o", "P": "total_p"})
    )


_GS_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           SUM(CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)) / 1000000e0 AS total,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("grouping_sets_orders", _GS_SQL)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arbitrary GROUPING SETS (beyond rollup/cube): the same SQL text runs
    # on both engines — one pass, Expand feeds a single aggregation.
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GS_SQL)


@register(
    "rolling_customer_revenue",
    """
    SELECT o_custkey, o_orderkey,
           SUM(CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) / 1000000.0 AS rolling_total
    FROM orders
    """,
)
def rolling_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window FRAME (ROWS BETWEEN): 3-order rolling revenue per customer.
    # The frame sums exact fixed-point longs, so every engine agrees on
    # every prefix; (o_orderdate, o_orderkey) is a total order.
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    fixed = F.floor(F.col("o_totalprice") * 1000000 + F.lit(0.5)).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(fixed).over(w) / F.lit(1000000.0)).alias("rolling_total"),
    )


@register(
    "scc_membership",
    _graph_cte(
        """
        , dir_edges AS (
            SELECT src_system_id AS src, dst_system_id AS dst FROM fix_jumps
            WHERE kind = 'wormhole'
               OR (dst_system_id = src_system_id + 1 AND src_system_id % 7 <> 0)
        ),
        reach AS (
            SELECT src AS a, dst AS b FROM dir_edges
            UNION
            SELECT r.a, e.dst FROM reach r JOIN dir_edges e ON r.b = e.src
        ),
        verts AS (
            SELECT DISTINCT src AS v FROM dir_edges
            UNION SELECT DISTINCT dst FROM dir_edges
        ),
        mutual AS (
            SELECT n.v AS node, m.v AS other
            FROM verts n JOIN verts m
              ON n.v = m.v
              OR (EXISTS (SELECT 1 FROM reach WHERE a = n.v AND b = m.v)
                  AND EXISTS (SELECT 1 FROM reach WHERE a = m.v AND b = n.v))
        )
        SELECT node, MIN(other) AS scc FROM mutual GROUP BY node
        """
    ),
)
def scc_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Directed strongly connected components on a cycle-broken variant of
    # the fixture graph (forward ring with every 7th edge cut + both
    # wormhole directions): the two wormhole pairs are the only non-trivial
    # SCCs, so direction-blind components would be wrong here.
    from eve_graph_spark.operators.graph_analytics import strongly_connected_components

    jumps = build_jumps(spark, sf_dir)
    directed = jumps.filter(
        (F.col("kind") == "wormhole")
        | (
            (F.col("dst_system_id") == F.col("src_system_id") + 1)
            & (F.col("src_system_id") % 7 != 0)
        )
    )
    return strongly_connected_components(directed)


# =========================================================================
# Composite pipelines: end-to-end dedup (pairs → clusters → survivors) and
# hypertable-style gap-fill with LOCF
# =========================================================================

_MINHASH_PAIRS_FOR_CC = f"""
    msh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(string_split(lower(coalesce(text, '')), ' ')) >= 3 THEN
                   list_transform(range(0, len(string_split(lower(coalesce(text, '')), ' ')) - 2),
                       i -> array_to_string(list_slice(string_split(lower(coalesce(text, '')), ' '), i + 1, i + 3), ' '))
                   ELSE [lower(coalesce(text, ''))] END) AS sh
        FROM documents
    ),
    mhs AS (
        SELECT doc_id, sh,
               list_transform(sh, s ->
                   ('0x' || substr(md5(s), 1, 14))::BIGINT % 2147483647) AS hs
        FROM msh
    ),
    msigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), j ->
                   list_min(list_transform(hs,
                       h -> ((2 * j + 1) * h + 97 * j + 13) % 2147483647))) AS sig
        FROM mhs
    ),
    mbanded AS (
        SELECT DISTINCT doc_id, u.i AS band, ({portable_band_buckets_sql('sig', 4, 2, one_based=True)})[u.i] AS bucket
        FROM msigs, unnest(range(1, 5)) AS u(i)
    ),
    mcand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM mbanded a JOIN mbanded b USING (band, bucket)
        WHERE a.doc_id < b.doc_id
    ),
    mdgcc AS (
        -- r10 text-free verify: Jaccard over distinct digest sets, the
        -- same digests the signatures hashed — see jaccard_pairs(digest=)
        SELECT doc_id, list_distinct(hs) AS dg FROM mhs
    ),
    mpairs AS (
        SELECT c.id_a, c.id_b
        FROM mcand c JOIN mdgcc x ON x.doc_id = c.id_a JOIN mdgcc y ON y.doc_id = c.id_b
        WHERE CAST(len(list_intersect(x.dg, y.dg)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.dg, y.dg))) >= 0.5
    )
"""


@register(
    "dedup_pipeline_documents",
    f"""
    WITH RECURSIVE {_MINHASH_PAIRS_FOR_CC},
    dedup_edges AS (
        SELECT id_a AS src, id_b AS dst FROM mpairs
        UNION ALL SELECT id_b, id_a FROM mpairs
    ),
    dedup_reach AS (
        SELECT src AS node, src AS r FROM dedup_edges
        UNION
        SELECT e.dst, r.r FROM dedup_reach r JOIN dedup_edges e ON e.src = r.node
    ),
    dedup_cc AS (SELECT node, MIN(r) AS cluster FROM dedup_reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(c.cluster, d.doc_id) AS cluster,
           COALESCE(c.cluster, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN dedup_cc c ON c.node = d.doc_id
    """,
)
def dedup_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The full LLM-corpus dedup pipeline in one query: exact-dup collapse →
    # MinHash-LSH near-dup PAIRS over representatives → connected
    # components (transitive near-dup CLUSTERS) → members mapped back →
    # keep-min survivor per cluster. The pre-collapse kills the C(m,2)
    # LSH pair blowup on identical-doc groups (see near_dup_clusters);
    # cluster ids are provably unchanged, so the member-level recursive-CTE
    # oracle still applies. Every stage oracle-checked.
    from eve_graph_spark.operators.dedup import near_dup_clusters

    docs = spread(load_table(spark, sf_dir, "documents"))
    clusters = near_dup_clusters(docs, threshold=0.5)
    return clusters.select(
        "doc_id",
        "cluster",
        (F.col("cluster") == F.col("doc_id")).alias("keep"),
    )


@register(
    "time_gapfill_events",
    f"""
    WITH grid AS (
        SELECT t.event_type, g.minute_ts
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                          TIMESTAMP '2024-01-01 23:59:00',
                                          INTERVAL 1 MINUTE)) AS minute_ts
        ) g
    ),
    msum AS (
        SELECT event_type, date_trunc('minute', ts) AS minute_ts,
               COUNT(*) AS n_events, {_dsum_sql("value", "sum_value")}
        FROM events
        WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
        GROUP BY 1, 2
    )
    SELECT g.event_type,
           CAST(epoch(g.minute_ts) AS BIGINT) AS minute_sec,
           COALESCE(m.n_events, 0) AS n_events,
           COALESCE(LAST_VALUE(m.sum_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.minute_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0) AS filled_value
    FROM grid g LEFT JOIN msum m USING (event_type, minute_ts)
    """,
)
def time_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hypertable gap-fill + LOCF: dense minute grid per event type (grid =
    # types × sequence(), generated, never scanned), left join the sparse
    # minute aggregates, carry the last observation forward. The grid size
    # is fixed by the time range, not the data volume — at 100 TB the
    # heavy side is still one partial-aggregated shuffle of the facts.
    ev = events_with_ts(spark, sf_dir)
    day = ev.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    msum = (
        day.groupBy("event_type", F.date_trunc("minute", "ts").alias("minute_ts"))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value", "sum_value"))
    )
    # Grid types from the UNFILTERED frame — matches the oracle's grid CTE
    # (a type first seen after the filled day still gets empty grid rows).
    grid = (
        ev.select("event_type").distinct()
        .crossJoin(
            F.broadcast(
                day.sparkSession.range(1)
                .select(
                    F.explode(
                        F.expr(
                            "sequence(timestamp'2024-01-01 00:00:00',"
                            " timestamp'2024-01-01 23:59:00', interval 1 minute)"
                        )
                    ).alias("minute_ts")
                )
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(msum, ["event_type", "minute_ts"], "left")
        .select(
            "event_type",
            F.col("minute_ts").cast("long").alias("minute_sec"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce(F.last("sum_value", ignorenulls=True).over(w), F.lit(0.0)).alias(
                "filled_value"
            ),
        )
    )


# =========================================================================
# Entity resolution, link prediction, JSON extraction, and time-series
# smoothing/interpolation
# =========================================================================

@register(
    "fuzzy_match_customers",
    """
    WITH dirty AS (
        SELECT c_custkey AS dirty_key, upper(c_name) AS dirty_name,
               c_custkey % 1000 AS block
        FROM customer
    ),
    clean AS (
        SELECT c_custkey AS clean_key, c_name AS clean_name,
               c_custkey % 1000 AS block
        FROM customer
    ),
    scored AS (
        SELECT d.dirty_key, c.clean_key,
               levenshtein(d.dirty_name, c.clean_name) AS distance
        FROM dirty d JOIN clean c USING (block)
    ),
    best AS (
        SELECT dirty_key, clean_key, CAST(distance AS BIGINT) AS distance,
               ROW_NUMBER() OVER (PARTITION BY dirty_key
                                  ORDER BY distance, clean_key) AS rn
        FROM scored WHERE distance <= 7
    )
    SELECT dirty_key, clean_key, distance FROM best WHERE rn = 1
    """,
)
def fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Entity resolution: case-mangled customer names resolved back to their
    # source rows by blocked levenshtein (block = custkey residue, so the
    # candidate join is an equi-join — never all-pairs). distance<=7 keeps
    # exactly the true match (7 case flips); any other in-block candidate
    # differs in >=1 leading digit too (>=8).
    from eve_graph_spark.operators.entity_resolution import blocked_fuzzy_match

    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.select(
        F.col("c_custkey").alias("key"),
        F.upper("c_name").alias("name"),
        (F.col("c_custkey") % 1000).alias("block"),
    )
    clean = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        (F.col("c_custkey") % 1000).alias("block"),
    )
    return blocked_fuzzy_match(dirty, clean, max_distance=7)


@register(
    "link_prediction_jaccard",
    _graph_cte("""
    , lp_edges AS (SELECT DISTINCT src_system_id AS src, dst_system_id AS dst FROM fix_jumps),
    lp_deg AS (SELECT src AS node, COUNT(*) AS deg FROM lp_edges GROUP BY src),
    lp_common AS (
        SELECT a.src AS node_a, b.src AS node_b, COUNT(*) AS common_cnt
        FROM lp_edges a JOIN lp_edges b ON a.dst = b.dst AND a.src < b.src
        GROUP BY a.src, b.src
    )
    SELECT c.node_a, c.node_b, c.common_cnt,
           CAST(c.common_cnt AS DOUBLE)
             / CAST(da.deg + db.deg - c.common_cnt AS DOUBLE) AS jaccard
    FROM lp_common c
    JOIN lp_deg da ON da.node = c.node_a
    JOIN lp_deg db ON db.node = c.node_b
    WHERE NOT EXISTS (
        SELECT 1 FROM lp_edges e WHERE e.src = c.node_a AND e.dst = c.node_b
    )
    """),
)
def link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Link prediction over the jump graph: neighborhood Jaccard for
    # non-adjacent pairs (wedge self-join — the triangle-count shuffle
    # shape, partitioned by the shared neighbor).
    from eve_graph_spark.operators.graph_analytics import jaccard_link_prediction

    return jaccard_link_prediction(build_jumps(spark, sf_dir))


@register(
    "events_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Semi-structured column: per-row JSON payload parsed JVM-side
    # (get_json_object, codegen'd — no Python), then a plain partial-agg
    # shuffle. At 100 TB prefer from_json once into a struct column and
    # write it back typed; this query is the ad-hoc exploration shape.
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "ewma_user_value",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           list_reduce(list(CAST(value AS DOUBLE) ORDER BY event_id),
                       (acc, x) -> acc * 0.75 + x * 0.25) AS ewma
    FROM events
    GROUP BY user_id
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-user EWMA of event values in event order: non-associative fold
    # pinned to a total order (operators/timeseries.py). One shuffle, fold
    # runs inside the JVM aggregate expression.
    from eve_graph_spark.operators.timeseries import ewma_by_group

    ev = load_table(spark, sf_dir, "events")
    return ewma_by_group(ev, "user_id", "event_id", "value", alpha=0.25)


@register(
    "time_interpolate_events",
    f"""
    WITH grid AS (
        SELECT t.event_type, g.minute_ts
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                          TIMESTAMP '2024-01-01 23:59:00',
                                          INTERVAL 1 MINUTE)) AS minute_ts
        ) g
    ),
    msum AS (
        SELECT event_type, date_trunc('minute', ts) AS minute_ts,
               {_dsum_sql("value", "obs")}
        FROM events
        WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
        GROUP BY 1, 2
    ),
    j AS (
        SELECT g.event_type, CAST(epoch(g.minute_ts) AS BIGINT) AS minute_sec, m.obs
        FROM grid g LEFT JOIN msum m USING (event_type, minute_ts)
    ),
    w AS (
        SELECT event_type, minute_sec, obs,
               LAST_VALUE(obs IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY minute_sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               LAST_VALUE(CASE WHEN obs IS NOT NULL THEN minute_sec END IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY minute_sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
               FIRST_VALUE(obs IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY minute_sec
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               FIRST_VALUE(CASE WHEN obs IS NOT NULL THEN minute_sec END IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY minute_sec
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
        FROM j
    )
    SELECT event_type, minute_sec,
           CASE WHEN obs IS NOT NULL THEN obs
                WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v)
                     * (CAST(minute_sec - prev_t AS DOUBLE)
                        / CAST(next_t - prev_t AS DOUBLE))
           END AS interp_value
    FROM w
    """,
)
def time_interpolate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Linear interpolation over the dense minute grid (companion to the
    # LOCF gap-fill): carry prev/next observation + their timestamps with
    # IGNORE NULLS frames, interpolate proportionally. Same scale shape as
    # time_gapfill_events — the grid is generated, facts shuffle once.
    ev = events_with_ts(spark, sf_dir)
    day = ev.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    msum = day.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute_ts")
    ).agg(_dsum("value", "obs"))
    # Grid types from the UNFILTERED frame — matches the oracle's grid CTE
    # (a type first seen after the filled day still gets empty grid rows).
    grid = (
        ev.select("event_type").distinct()
        .crossJoin(
            F.broadcast(
                day.sparkSession.range(1).select(
                    F.explode(
                        F.expr(
                            "sequence(timestamp'2024-01-01 00:00:00',"
                            " timestamp'2024-01-01 23:59:00', interval 1 minute)"
                        )
                    ).alias("minute_ts")
                )
            )
        )
    )
    j = grid.join(msum, ["event_type", "minute_ts"], "left").select(
        "event_type", F.col("minute_ts").cast("long").alias("minute_sec"), "obs"
    )
    w_prev = (
        Window.partitionBy("event_type").orderBy("minute_sec")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type").orderBy("minute_sec")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("obs").isNotNull(), F.col("minute_sec"))
    w = j.select(
        "event_type",
        "minute_sec",
        "obs",
        F.last("obs", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_t, ignorenulls=True).over(w_prev).alias("prev_t"),
        F.first("obs", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_t, ignorenulls=True).over(w_next).alias("next_t"),
    )
    interp = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (
                (F.col("minute_sec") - F.col("prev_t")).cast("double")
                / (F.col("next_t") - F.col("prev_t")).cast("double")
            )
        )
    )
    return w.select("event_type", "minute_sec", interp.alias("interp_value"))


# =========================================================================
# Relational breadth II: unpivot, time-RANGE frames, Q15/Q21 shapes, and a
# one-pass column profiler
# =========================================================================

@register(
    "unpivot_status_counts",
    """
    WITH wide AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_O,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_F,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_P
        FROM orders GROUP BY 1
    )
    SELECT order_year, status, cnt FROM (
        SELECT order_year, 'O' AS status, cnt_O AS cnt FROM wide
        UNION ALL SELECT order_year, 'F', cnt_F FROM wide
        UNION ALL SELECT order_year, 'P', cnt_P FROM wide
    )
    """,
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Wide→long: conditional-count pivot then DataFrame.unpivot (Spark's
    # melt). The unpivot is a zero-shuffle projection — only the pivot agg
    # shuffles.
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy(F.year("o_orderdate").cast("long").alias("order_year")).agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("cnt_O"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("cnt_F"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("cnt_P"),
    )
    long = wide.unpivot(["order_year"], ["cnt_O", "cnt_F", "cnt_P"], "status", "cnt")
    return long.select(
        "order_year", F.substring("status", 5, 1).alias("status"), "cnt"
    )


@register(
    "rolling_30d_customer_spend",
    """
    SELECT o_orderkey, o_custkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_sec,
           SUM(CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) / 1000000.0 AS spend_30d
    FROM orders
    """,
)
def rolling_30d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Time-based RANGE frame: per customer, total spend in the trailing 30
    # days of each order. The frame is on epoch seconds (RANGE needs a
    # numeric order key); the frame sum is exact fixed-point so engines
    # agree bit-for-bit regardless of in-frame order.
    o = load_table(spark, sf_dir, "orders")
    # tz-free epoch seconds for a TIMESTAMP_NTZ (a direct long cast is
    # illegal, and unix_timestamp() would re-interpret in the session tz)
    sec = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        * 86400
        + F.hour("o_orderdate") * 3600
        + F.minute("o_orderdate") * 60
        + F.second("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(sec.alias("order_sec"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        sec.alias("order_sec"),
        (
            F.sum(F.floor(F.col("o_totalprice") * 1000000 + F.lit(0.5))).over(w)
            / F.lit(1000000.0)
        ).alias("spend_30d"),
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5)
                        AS BIGINT)) AS total_fp
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_fp / 1000000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_fp = (SELECT MAX(total_fp) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q15: top supplier by 3-month revenue. The scalar-max-broadcast
    # form (.agg(max) + join) re-planned the revenue aggregate — i.e. the
    # full fact scan + groupBy — twice. The max now comes from a
    # single-partition window over the ALREADY-AGGREGATED per-supplier
    # rows: one fact pass, at the DOCUMENTED cost of funneling all
    # per-supplier rows (16 logical bytes each, ~3-4x that as UnsafeRow +
    # sort overhead) through ONE task — a deliberate trade that holds to
    # ~1e8 suppliers (a few GB in the task) but inverts past that, where
    # the old scalar form's second fact scan stays fully distributed; at
    # extreme supplier cardinality switch to a two-level (salted partial
    # max, then 1-row final) max instead. Ties keep all max suppliers,
    # matching the correlated-subquery semantics; comparison stays on the
    # exact fixed-point sum.
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.floor(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 1000000
                    + F.lit(0.5)
                )
            ).alias("total_fp")
        )
    )
    top = rev.withColumn(
        "__mx", F.max("total_fp").over(Window.partitionBy(F.lit(1)))
    ).filter(F.col("total_fp") == F.col("__mx"))
    return top.join(sup, top.supplier_no == sup.s_suppkey).select(
        "s_suppkey", "s_name", (F.col("total_fp") / F.lit(1000000.0)).alias("total_revenue")
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    multi AS (
        SELECT l1.l_orderkey, l1.l_suppkey
        FROM late l1
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        )
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM multi JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q21 shape (lateness adapted to the driver schema: shipped >90
    # days after order date): the sole late supplier on multi-supplier
    # orders. The textbook EXISTS/NOT-EXISTS decorrelation scans the fact
    # THREE times (late + semi probe + anti probe), each with its own
    # orderkey shuffle. The per-order predicates are all functions of one
    # order's line set, so a single scan + two-level aggregation computes
    # them instead: per-(order, supplier) late-line counts (map-side
    # partial combine collapses lines before the wire), then per-order
    # supplier/late-supplier tallies. "EXISTS another supplier" ⇔
    # n_supp > 1; "NOT EXISTS another LATE supplier" ⇔ n_late_supp == 1;
    # numwait keeps per-LINE multiplicity (a supplier late on 3 lines of
    # one order counts 3), matching the EXISTS form row-for-row. No
    # Expand-based multi-countDistinct: two plain aggregates, the second
    # over ~4 rows/order. At 100 TB: one fact scan, one orderkey-ish
    # shuffle of distinct (order, supplier) pairs, supplier broadcast.
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    lo = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
            ).alias("is_late"),
        )
    )
    per_pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("late_lines")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("late_lines") > 0).cast("int")).alias("n_late_supp"),
        F.max(F.when(F.col("late_lines") > 0, F.col("l_suppkey"))).alias("sole_supp"),
        F.sum(F.when(F.col("late_lines") > 0, F.col("late_lines"))).alias("n_late_lines"),
    )
    qual = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    return (
        qual.join(F.broadcast(sup), qual.sole_supp == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "profile_lineitem",
    f"""
    SELECT 'l_quantity' AS column_name, COUNT(*) AS n,
           COUNT(*) - COUNT(l_quantity) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v,
           {_dsum_sql("l_quantity", "sum_v")}
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice), MIN(l_extendedprice),
           MAX(l_extendedprice), {_dsum_sql("l_extendedprice", "sum_v")}
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount), MIN(l_discount), MAX(l_discount),
           {_dsum_sql("l_discount", "sum_v")}
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
           COUNT(DISTINCT l_tax), MIN(l_tax), MAX(l_tax),
           {_dsum_sql("l_tax", "sum_v")}
    FROM lineitem
    """,
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Data-profiling op: per-column stats in ONE scan of the fact table
    # (the oracle's UNION ALL is 4 scans — DuckDB's cost, not ours). The
    # count-distincts expand the agg but stay a single pass; output is
    # long-format (one row per column) via explode of a struct array.
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    plain, nd = [], []
    for c in cols:
        plain += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            _dsum(c, f"{c}__sum"),
        ]
        nd.append(F.count_distinct(F.col(c)).alias(f"{c}__nd"))
    # r13 (guide §2.3): mixing count_distincts with plain aggregates in
    # ONE aggregate makes Spark Expand every input row x (n_distinct_cols
    # + 1) so the plain aggregates re-scan every expanded copy. Two
    # single-purpose passes (plain aggs with no Expand; distincts alone)
    # cross-joined as 1-row frames measured 2.78 s -> ~1.5 s at sf0.1 for
    # identical values (each aggregate sees the same rows either way).
    one = li.agg(*plain).crossJoin(F.broadcast(li.agg(*nd)))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
                F.col(f"{c}__sum").alias("sum_v"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


# =========================================================================
# Training-corpus ops III: benchmark decontamination, sequence packing,
# and the end-to-end corpus curation pipeline
# =========================================================================

_SHINGLE5_SQL = """
    list_distinct(CASE WHEN len(string_split(lower(coalesce(text, '')), ' ')) >= 5 THEN
        list_transform(range(0, len(string_split(lower(coalesce(text, '')), ' ')) - 4),
            i -> array_to_string(list_slice(string_split(lower(coalesce(text, '')), ' '), i + 1, i + 5), ' '))
        ELSE [lower(coalesce(text, ''))] END)
"""


@register(
    "decontaminate_documents",
    f"""
    WITH bench_sh AS (
        SELECT DISTINCT unnest({_SHINGLE5_SQL}) AS sh
        FROM documents WHERE doc_id < 20
    ),
    corp_sh AS (
        SELECT doc_id, unnest({_SHINGLE5_SQL}) AS sh
        FROM documents WHERE doc_id >= 20
    ),
    hits AS (
        SELECT c.doc_id, COUNT(*) AS n_shared
        FROM corp_sh c JOIN bench_sh b USING (sh)
        GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_shared, 0) AS n_shared,
           COALESCE(h.n_shared, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id >= 20
    """,
)
def decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benchmark decontamination: flag corpus docs sharing any 5-gram with
    # the benchmark set (doc_id < 20 stands in for the eval suite). The
    # benchmark shingle set is tiny and broadcast — the corpus side is one
    # explode + hash join + count, no self-join. At 100 TB the benchmark
    # side stays driver-size (eval suites are small) so the plan is a
    # broadcast semi-ish join against the exploded corpus.
    from eve_graph_spark.operators.dedup import shingles_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    bench_sh = (
        docs.filter(F.col("doc_id") < 20)
        .select(F.explode(shingles_expr("text", 5)).alias("sh"))
        .distinct()
    )
    corp = docs.filter(F.col("doc_id") >= 20)
    corp_sh = corp.select("doc_id", F.explode(shingles_expr("text", 5)).alias("sh"))
    hits = (
        corp_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        corp.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


@register(
    "sequence_packing",
    """
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens AS prev_cum
        FROM toks
    )
    SELECT doc_id, source, n_tokens,
           CAST(prev_cum // 2048 AS BIGINT) AS bin,
           CAST(prev_cum % 2048 AS BIGINT) AS bin_offset
    FROM cum
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sequence packing for training: docs are appended in doc_id order into
    # 2048-token context bins, one stream per source shard (the partition
    # key — so the window never needs a global sort; at 100 TB each shard
    # packs independently, which is how packing is actually run).
    from eve_graph_spark.operators.text_analysis import token_count

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = toks.withColumn("prev_cum", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return cum.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(F.col("prev_cum") / F.lit(2048)).cast("long").alias("bin"),
        (F.col("prev_cum") % 2048).alias("bin_offset"),
    )


@register(
    "corpus_curation_pipeline",
    """
    WITH lang AS (
        SELECT doc_id, text,
               len(list_filter(string_split(lower(text), ' '),
                   w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS en,
               len(list_filter(string_split(lower(text), ' '),
                   w -> w IN ('el','la','de','que','y','en','un','es','se','no'))) AS es,
               len(list_filter(string_split(lower(text), ' '),
                   w -> w IN ('der','die','und','das','in','zu','den','ist','von','mit'))) AS de
        FROM documents
    ),
    en_docs AS (
        SELECT doc_id, text FROM lang
        WHERE NOT (en = 0 AND es = 0 AND de = 0) AND en >= es AND en >= de
    ),
    scored AS (
        SELECT doc_id, text,
               CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' '))
                 + CAST(len(list_filter(string_split(lower(text), ' '),
                        w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS DOUBLE)
                   / len(string_split(lower(text), ' '))
                 - CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) AS quality
        FROM en_docs
    ),
    good AS (SELECT doc_id, text FROM scored WHERE quality > 5.2),
    deduped AS (
        SELECT MIN(doc_id) AS doc_id FROM good GROUP BY md5(text)
    ),
    shuffled AS (
        SELECT g.doc_id,
               ((g.doc_id % 1000000007) * 654435747) % 1000000007 AS shuffle_pos,
               CAST(len(regexp_extract_all(g.text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS BIGINT)
                   AS n_tokens
        FROM good g JOIN deduped d ON g.doc_id = d.doc_id
    )
    SELECT doc_id, shuffle_pos, n_tokens FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY shuffle_pos, doc_id) AS rn FROM shuffled
    ) WHERE rn <= 100
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The end-to-end corpus curation run, as one declarative plan:
    # lang-ID filter → quality filter → exact dedup (keep-min per digest)
    # → deterministic hash shuffle → take the first 100 → token counts.
    # Every stage is an operator from the registry (lang_id_expr,
    # quality_score_expr, exact-dedup shape, Knuth-hash sampling), composed
    # the way a production curation job chains them: filters first (cheap,
    # pushed down), dedup's shuffle only sees survivors, the top-k is a
    # TakeOrderedAndProject — never a global sort of the corpus.
    from eve_graph_spark.operators.text_analysis import (
        lang_id_expr,
        quality_score_expr,
        token_count,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    en_docs = docs.filter(lang_id_expr(F.col("text")) == "en")
    good = en_docs.filter(quality_score_expr(F.col("text")) > 5.2)
    keep = good.groupBy(F.md5(F.encode("text", "utf-8")).alias("__digest")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # r13 (guide §1.2 — don't compute things you throw away): the
    # re-attach side joins the RAW scan, not `good` — keep's doc_ids come
    # from good, so membership already implies both filters, and the
    # lang-ID + quality regex expressions (measured ~1.5 s/corpus pass at
    # sf0.1, the pipeline's dominant cost) run ONCE instead of twice.
    # Identical rows: doc_id is the documents PK, so docs ⋉ keep ==
    # good ⋉ keep.
    survivors = docs.join(keep.select("doc_id"), "doc_id", "left_semi")
    shuffled = survivors.select(
        "doc_id",
        ((F.col("doc_id") % 1000000007) * 654435747 % 1000000007).alias("shuffle_pos"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy("shuffle_pos", "doc_id")
    return (
        shuffled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 100)
        .select("doc_id", "shuffle_pos", "n_tokens")
    )


# =========================================================================
# Window variants (lag, ntile, percent_rank) and exact moments
# =========================================================================

@register(
    "event_value_deltas",
    """
    SELECT user_id, event_id, value,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS delta,
           COALESCE(LAG(event_id) OVER (PARTITION BY user_id ORDER BY event_id), -1)
               AS prev_event_id
    FROM events
    """,
)
def event_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Change detection per user stream: LAG over the per-user total order.
    # One shuffle on user_id; delta is one double subtraction of identical
    # operands in both engines.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        # -1 sentinel: a NULL first-row-per-user lifts the oracle's whole
        # column to float64 through pandas, hash-breaking every row
        F.coalesce(F.lag("event_id").over(w), F.lit(-1)).alias("prev_event_id"),
    )


@register(
    "customer_spend_quartiles",
    """
    WITH spend AS (
        SELECT o_custkey,
               SUM(CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)) AS spend_fp,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, spend_fp / 1000000.0 AS total_spend, n_orders,
           NTILE(4) OVER (ORDER BY spend_fp, o_custkey) AS quartile,
           PERCENT_RANK() OVER (ORDER BY spend_fp, o_custkey) AS pct_rank
    FROM spend
    """,
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NTILE + PERCENT_RANK over per-customer lifetime spend, computed as a
    # DISTRIBUTED global rank — no data-sized single-partition Window node:
    #   1. range-shuffle the per-customer agg on the total sort key
    #      (spend_fp, o_custkey — unique, so no cross-partition ties);
    #   2. per-partition row_number (keyed window, partitioned by the range
    #      partition id);
    #   3. add per-partition offsets. The offsets are a K-row DataFrame
    #      (K = number of range partitions, not data-sized): groupBy-count
    #      + a K-row prefix-sum window, broadcast-joined back on __pid —
    #      ONE action after the snapshot, no driver collect, no 2K-literal
    #      map expression in the plan (K is thousands on a real cluster).
    # NTILE/PERCENT_RANK are then pure expressions of the 0-based rank r and
    # total count N (carried on the same broadcast row), matching both
    # engines' semantics exactly.
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 1000000 + F.lit(0.5))).alias("spend_fp"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    k = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # localCheckpoint, not persist: freezes the range partitioning that both
    # reads (offset branch + main branch) rely on sharing, and leaks no
    # session-lifetime cache entry.
    ranked = (
        spend.repartitionByRange(k, "spend_fp", "o_custkey")
        .withColumn("__pid", F.spark_partition_id())
        .transform(truncate_lineage)
    )
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        ranked.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long").alias("__off"),
            F.sum("__cnt").over(w_all).cast("long").alias("__n"),
        )
    )
    local_w = Window.partitionBy("__pid").orderBy("spend_fp", "o_custkey")
    r = (F.col("__off") + F.row_number().over(local_w) - 1).alias("__r")
    # NTILE(t) over N rows: the first N%t tiles hold ceil(N/t) rows, the
    # rest floor(N/t) — closed form over the 0-based rank (same double-
    # division floor both engines evaluate; exact for counts < 2^53).
    base = F.floor(F.col("__n") / F.lit(4)).cast("long")
    rem = (F.col("__n") % 4).cast("long")
    big = base + 1
    tile = F.when(
        F.col("__r") < rem * big, F.floor(F.col("__r") / big) + 1
    ).otherwise(
        rem + F.floor((F.col("__r") - rem * big) / F.greatest(base, F.lit(1))) + 1
    )
    return (
        ranked.join(F.broadcast(offs), "__pid")
        .select(
            "o_custkey",
            (F.col("spend_fp") / F.lit(1000000.0)).alias("total_spend"),
            "n_orders",
            "__pid",
            "spend_fp",
            "__off",
            "__n",
        )
        .withColumn("__r", r)
        .select(
            "o_custkey",
            "total_spend",
            "n_orders",
            tile.cast("int").alias("quartile"),
            (
                F.col("__r")
                / F.greatest(F.col("__n") - 1, F.lit(1)).cast("double")
            ).alias("pct_rank"),
        )
    )


@register(
    "event_value_moments",
    """
    WITH fp AS (
        SELECT event_type,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_value,
           CAST(COUNT(*) * SUM(v * v) - SUM(v) * SUM(v) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / (COUNT(*) - 1)
             / 1000000.0 / 1000000.0 AS var_value
    FROM fp
    GROUP BY event_type
    """,
)
def event_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact mean and sample variance via integer sufficient statistics
    # (Σv, Σv² on fixed-point values): var = (nΣv² − (Σv)²)/n/(n−1). Built-in
    # stddev/variance stream float partials in engine-specific order — this
    # form is a partial-aggregable integer sum, so it's both one-shuffle
    # scalable AND bit-identical across engines.
    ev = load_table(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    # Σv² (and the nΣv²−(Σv)² combination) exceeds int64 — accumulate in
    # DECIMAL(38,0), the exact-integer 128-bit path (DuckDB promotes its
    # BIGINT sums to HUGEINT automatically; this is the Spark equivalent).
    agg = ev.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("s2"),
    )
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1").cast("decimal(38,0)")
    )
    return agg.select(
        "event_type",
        "n",
        (F.col("s1").cast("double") / F.col("n") / F.lit(1000000.0)).alias("mean_value"),
        (
            num.cast("double")
            / F.col("n").cast("double")
            / (F.col("n") - 1)
            / F.lit(1000000.0)
            / F.lit(1000000.0)
        ).alias("var_value"),
    )


# =========================================================================
# k-core membership (rows-only: deletion-based fixpoint, no SQL oracle) and
# weighted deterministic sampling
# =========================================================================

def _lpa_cte_body(iterations: int) -> str:
    """Chained-CTE replay of deterministic synchronous LPA (see
    _lpa_unrolled_sql) WITHOUT the final select, so downstream oracles
    (community metrics) can keep consuming lpa{iterations}."""
    # NB: the outer query is WITH RECURSIVE (for _graph_cte siblings); under
    # WITH RECURSIVE, DuckDB 1.0 treats any CTE with a *top-level* UNION as
    # recursive and emits duplicate rows — so dedup via subquery + DISTINCT.
    steps = [", lpa_nodes AS (SELECT DISTINCT node FROM ("
             "SELECT src_system_id AS node FROM fix_jumps"
             " UNION ALL SELECT dst_system_id FROM fix_jumps))",
             ", lpa0 AS (SELECT node, node AS community FROM lpa_nodes)"]
    for i in range(1, iterations + 1):
        steps.append(f"""
    , lpa{i} AS MATERIALIZED (
        SELECT n.node, COALESCE(w.community, n.community) AS community
        FROM lpa{i - 1} n LEFT JOIN (
            SELECT dst, community FROM (
                SELECT e.dst_system_id AS dst, l.community,
                       ROW_NUMBER() OVER (PARTITION BY e.dst_system_id
                                          ORDER BY COUNT(*) DESC, l.community) AS rn
                FROM fix_jumps e JOIN lpa{i - 1} l ON l.node = e.src_system_id
                GROUP BY e.dst_system_id, l.community
            ) t WHERE rn = 1
        ) w ON w.dst = n.node
    )""")
    return "".join(steps)


def _lpa_unrolled_sql(iterations: int) -> str:
    """DuckDB replay of deterministic synchronous LPA: the fixed superstep
    count is unrolled into chained CTEs (each = most-frequent in-neighbor
    label, ties to the smallest label, keep own label when no in-edges).
    Spark's early fixpoint stop is safe to over-unroll: applying a step to
    fixpoint labels returns them unchanged."""
    return _graph_cte(
        _lpa_cte_body(iterations)
        + f" SELECT node, community FROM lpa{iterations}"
    )


@register("label_propagation_communities", _lpa_unrolled_sql(5))
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Community detection on the jump graph via deterministic synchronous
    # LPA (most-frequent neighbor label, min-label tie-break — no random
    # state, so reruns and engines agree). Fully oracle-checked: the fixed
    # superstep count unrolls into chained SQL CTEs; also pinned on known
    # graphs in tests/test_graph_analytics.py.
    from eve_graph_spark.operators.graph_analytics import label_propagation

    return label_propagation(build_jumps(spark, sf_dir), iterations=5)


def _kcore_unrolled_sql(k: int, rounds: int) -> str:
    """DuckDB replay of the k-core peel, unrolled `rounds` times (peel
    depth on the fixed 25-node jump graph is < rounds; parity at every SF
    because `nation` is fixed-size). Each round: out-degree over surviving
    edges, keep nodes with deg >= k, keep edges with both endpoints kept.
    Over-unrolling past the fixpoint is a no-op round."""
    steps = [", kc0 AS MATERIALIZED (SELECT DISTINCT src_system_id AS src, dst_system_id AS dst"
             " FROM fix_jumps)"]
    for i in range(1, rounds + 1):
        steps.append(f"""
    , kcn{i} AS MATERIALIZED (
        SELECT src AS node FROM kc{i - 1} GROUP BY src HAVING COUNT(*) >= {k}
    )
    , kc{i} AS MATERIALIZED (
        SELECT e.src, e.dst FROM kc{i - 1} e
        JOIN kcn{i} a ON e.src = a.node JOIN kcn{i} b ON e.dst = b.node
    )""")
    steps.append(f" SELECT DISTINCT src AS node FROM kc{rounds}")
    return _graph_cte("".join(steps))


@register("kcore_membership", _kcore_unrolled_sql(3, 8))
def kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 3-core of the jump graph: ring edges alone give degree 2, so the
    # 3-core is held up by hubs and wormholes. Fully oracle-checked via an
    # unrolled peel replay; also pinned on known graphs in
    # tests/test_pipeline_ops.py.
    from eve_graph_spark.operators.graph_analytics import k_core

    return k_core(build_jumps(spark, sf_dir), k=3)


@register(
    "weighted_sample_documents",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS BIGINT)
               AS n_tokens
    FROM documents
    WHERE ((doc_id % 1000) * 761) % 1000
          < len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]'))
    """,
)
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic weighted sampling: keep probability ∝ token count
    # (hash-threshold on a portable integer hash). Reproducible across
    # engines, runs, and partitionings — unlike rand()-based sampling —
    # and zero-shuffle: the predicate runs in the scan stage.
    from eve_graph_spark.operators.text_analysis import token_count

    docs = load_table(spark, sf_dir, "documents")
    tok = token_count(F.col("text")).cast("long")
    return docs.select("doc_id", tok.alias("n_tokens")).filter(
        (F.col("doc_id") % 1000) * 761 % 1000 < F.col("n_tokens")
    )


# =========================================================================
# Embedding centroids, grouped exact median, exact correlation
# =========================================================================

@register(
    "label_centroids",
    """
    SELECT label, i - 1 AS idx,
           CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
                AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_val
    FROM embeddings, unnest(range(1, 65)) AS u(i)
    WHERE embedding IS NOT NULL AND len(embedding) = 64
    GROUP BY label, i
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-class embedding centroids (the building block of IVF cells,
    # nearest-class-mean classification, and diversity balancing): explode
    # by dimension, one partial-agg shuffle keyed by (label, dim). The
    # per-dimension sums are fixed-pointed so the mean is bit-identical.
    # At 100 TB: the explode is map-side (64 rows out per vector, no text),
    # and the shuffle carries only (label, idx, partial sums) — 640 cells.
    # NULL/short-vector guard symmetric with the oracle: the oracle's
    # unnest-range cross would otherwise COUNT(*) 64 rows for a NULL
    # vector (diluting the mean) while posexplode drops it entirely.
    emb = spread(load_table(spark, sf_dir, "embeddings")).filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    )
    return (
        emb.select("label", F.posexplode("embedding").alias("idx", "val"))
        .groupBy("label", "idx")
        .agg(
            (
                F.sum(
                    F.floor(F.col("val").cast("double") * 1000000 + F.lit(0.5))
                ).cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0)
            ).alias("mean_val")
        )
    )


@register(
    "median_value_by_event_type",
    """
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type, value AS median_value
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def median_value_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped exact (discrete, lower-median) percentile: rank within group,
    # pick row (n+1)/2 — engine-portable because the picked value is an
    # input datum, never an interpolated float. Same shape scales: one
    # shuffle by group, and at 100 TB swap in approx_percentile for the
    # sketch variant (the `sketches` query) when exactness isn't required.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    return (
        ev.select(
            "event_type",
            "value",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("value").alias("median_value"))
    )


@register(
    "price_quantity_corr",
    """
    WITH fp AS (
        SELECT CAST(FLOOR(l_quantity * 1000000 + 0.5) AS BIGINT) AS x,
               CAST(FLOOR(l_extendedprice * 1000000 + 0.5) AS BIGINT) AS y
        FROM lineitem
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT)) AS DOUBLE)
             / sqrt(CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                         - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT)) AS DOUBLE))
             / sqrt(CAST(COUNT(*) * SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                         - SUM(CAST(y AS HUGEINT)) * SUM(CAST(y AS HUGEINT)) AS DOUBLE)) AS corr_xy
    FROM fp
    """,
)
def price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact Pearson correlation from integer sufficient statistics
    # (Σx, Σy, Σxy, Σx², Σy² on fixed-point values; 128-bit accumulation).
    # sqrt is IEEE-correctly-rounded in both engines, so applying it to
    # identical doubles keeps the result bit-identical — unlike corr(),
    # whose float partials are order-dependent. One partial-agg shuffle.
    li = load_table(spark, sf_dir, "lineitem")
    x = F.floor(F.col("l_quantity") * 1000000 + F.lit(0.5)).cast("long")
    y = F.floor(F.col("l_extendedprice") * 1000000 + F.lit(0.5)).cast("long")
    agg = li.select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)"))).alias("sxy"),
        F.sum((F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)"))).alias("sxx"),
        F.sum((F.col("y").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)"))).alias("syy"),
    )
    nD = F.col("n").cast("decimal(38,0)")
    cov = (nD * F.col("sxy") - F.col("sx").cast("decimal(38,0)") * F.col("sy").cast("decimal(38,0)")).cast("double")
    vx = (nD * F.col("sxx") - F.col("sx").cast("decimal(38,0)") * F.col("sx").cast("decimal(38,0)")).cast("double")
    vy = (nD * F.col("syy") - F.col("sy").cast("decimal(38,0)") * F.col("sy").cast("decimal(38,0)")).cast("double")
    return agg.select(
        "n", (cov / F.sqrt(vx) / F.sqrt(vy)).alias("corr_xy")
    )


# =========================================================================
# TPC-H sweep completion: Q2/Q11/Q12/Q16/Q20 adapted to the driver schema.
# The fixtures have no partsupp table, so lineitem's (l_partkey, l_suppkey)
# pairs serve as the part-supplier relationship (51k distinct pairs at
# sf0.01) — same join topology, same plan shapes.
# =========================================================================

@register(
    "q12_priority_by_status",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
               AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
               AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q12 shape (l_linestatus stands in for l_shipmode): fact-fact
    # join with conditional counting folded into the aggregate. The
    # shipdate range prunes lineitem at the scan; both sides are large at
    # scale, so this is a shuffle join on orderkey — the projection keeps
    # it to two columns per side.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH supply AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice) AS ps_supplycost
        FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
        SELECT s_suppkey, s_acctbal, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    best AS (
        SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
        FROM supply JOIN eu ON ps_suppkey = s_suppkey
        GROUP BY ps_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost AS supplycost
    FROM part JOIN supply ON p_partkey = supply.ps_partkey
              JOIN eu ON ps_suppkey = s_suppkey
              JOIN best ON supply.ps_partkey = best.ps_partkey
                       AND ps_supplycost = min_cost
    WHERE p_size <= 15 AND p_type = 'SMALL'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 10
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q2 shape: correlated MIN subquery decorrelated into a per-part
    # minimum joined back on (partkey, cost). supply is the one shuffle
    # (groupBy partkey+suppkey over the fact); everything downstream of it
    # is partkey/suppkey-sized and broadcasts. MIN over identical doubles
    # is exact, so the equality join-back is deterministic in both engines.
    li = load_table(spark, sf_dir, "lineitem")
    supply = (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min("l_extendedprice").alias("ps_supplycost"))
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu_supply = supply.join(F.broadcast(eu), supply.ps_suppkey == eu.s_suppkey)
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    # per-part min via a window over eu_supply itself: the decorrelated
    # groupBy+join-back form planned eu_supply — and with it the fact
    # aggregation and the whole dim chain — TWICE. The window shuffles by
    # ps_partkey exactly like the join-back did, so this is strictly one
    # fewer plan of everything upstream; ties keep all min-cost suppliers,
    # matching the correlated-subquery semantics.
    return (
        eu_supply.withColumn(
            "__min_cost",
            F.min("ps_supplycost").over(Window.partitionBy("ps_partkey")),
        )
        .filter(F.col("ps_supplycost") == F.col("__min_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey")
        )
        .limit(10)
    )


@register(
    "q11_important_stock",
    """
    WITH val AS (
        SELECT l_partkey,
               SUM(CAST(FLOOR(l_extendedprice * l_quantity * 1000000 + 0.5) AS BIGINT))
                   AS value_fp
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, value_fp / 1000000.0 AS stock_value
    FROM val
    WHERE CAST(value_fp AS HUGEINT) * (SELECT COUNT(*) FROM val)
          > 2 * (SELECT CAST(SUM(value_fp) AS HUGEINT) FROM val)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q11 shape: per-group value vs a global-scalar HAVING threshold.
    # The per-part aggregate is computed once, persisted implicitly via the
    # two consumers of one shuffle output; the global total is a 1-row
    # broadcast crossJoin, never a second scan of the fact.
    #
    # Threshold (round-10 fix): TPC-H's fixed fraction-of-total goes
    # vacuous on this data — per-part share shrinks ~1/SF as the part
    # count grows, so the original 1% HAVING returned 0 rows at EVERY
    # tested SF and its hash-green was sha256("") (r9 verdict item 1).
    # "value > 2× the average part value" keeps the global-scalar HAVING
    # shape and is scale-invariant: 19 / 91 / 957 rows at sf0.001/0.01/0.1.
    # The comparison is integer cross-multiplication (value·n > 2·total) in
    # decimal(38,0) ↔ HUGEINT — exact on both engines, no float AVG drift.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(asia_supp), li.l_suppkey == asia_supp.s_suppkey)
        .select(
            "l_partkey",
            F.floor(F.col("l_extendedprice") * F.col("l_quantity") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("__v"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("__v").alias("value_fp"))
    )
    threshold = val.agg(
        F.sum("value_fp").cast("decimal(38,0)").alias("__tot"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
    )
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(
            F.col("value_fp").cast("decimal(38,0)") * F.col("__n")
            > F.lit(2).cast("decimal(38,0)") * F.col("__tot")
        )
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            (F.col("value_fp") / F.lit(1000000.0)).alias("stock_value"),
        )
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'ECONOMY'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q16 shape: NOT IN (non-null key -> plain anti-join) feeding a
    # COUNT(DISTINCT) grouped by dim attributes. The excluded-supplier set
    # and the filtered part dim both broadcast; the only shuffle is the
    # distinct aggregate itself (Spark plans it as a two-phase
    # expand/partial-agg, which is exactly right at 100 TB).
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "ECONOMY")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    f"""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, {_dsum_sql("l_quantity", "qty")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM shipped JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO' AND qty > 60.0
    )
    ORDER BY s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q20 shape: nested semi-join chain — an aggregated subquery
    # (per part+supplier shipped volume) filtered by a dim predicate and a
    # volume threshold, collapsed to a supplier id set that semi-joins the
    # supplier dim. One fact shuffle (the groupBy); the id set is
    # supplier-sized and broadcasts into the semi-join.
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(_dsum("l_quantity", "qty"))
    promo = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    qualifying = (
        shipped.join(F.broadcast(promo), shipped.l_partkey == promo.p_partkey)
        .filter(F.col("qty") > 60.0)
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# =========================================================================
# Round-2 additions: training-data curation operators (all oracle-backed).
# New registrations land after _CHECK_PRIORITY's window on purpose — the
# round-2 driver window is already committed to the round-1-unverified set;
# these rotate into the round-3 window.
# =========================================================================

_QUALITY_SQL = """CAST(length(coalesce(text, '')) AS DOUBLE)
               / len(string_split(lower(coalesce(text, '')), ' '))
             + CAST(len(list_filter(string_split(lower(coalesce(text, '')), ' '),
                    w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS DOUBLE)
               / len(string_split(lower(coalesce(text, '')), ' '))
             - CASE WHEN length(coalesce(text, '')) = 0 THEN 0.0
                    ELSE CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
                         / CAST(length(text) AS DOUBLE) END"""


@register(
    "repetition_stats_documents",
    """
    WITH w AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS gram FROM documents
    ),
    b AS (
        SELECT doc_id, unnest(list_transform(
                   range(1, len(string_split(lower(text), ' '))),
                   i -> string_split(lower(text), ' ')[i] || ' ' ||
                        string_split(lower(text), ' ')[i + 1])) AS gram
        FROM documents
    ),
    wc AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM w GROUP BY doc_id, gram),
    bc AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM b GROUP BY doc_id, gram),
    ws AS (
        SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
               COUNT(*) AS n_distinct_words, CAST(MAX(cnt) AS BIGINT) AS top_word_n
        FROM wc GROUP BY doc_id
    ),
    bs AS (
        SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
               CAST(MAX(cnt) AS BIGINT) AS top_bigram_n
        FROM bc GROUP BY doc_id
    )
    SELECT ws.doc_id, ws.n_words, ws.n_distinct_words, ws.top_word_n,
           COALESCE(bs.top_bigram_n, 0) AS top_bigram_n,
           (CAST(ws.n_words AS DOUBLE) - CAST(ws.n_distinct_words AS DOUBLE))
               / CAST(ws.n_words AS DOUBLE) AS dup_word_frac,
           CAST(ws.top_word_n AS DOUBLE) / CAST(ws.n_words AS DOUBLE) AS top_word_frac,
           COALESCE(CAST(bs.top_bigram_n AS DOUBLE) / CAST(bs.n_bigrams AS DOUBLE),
                    0.0) AS top_bigram_frac
    FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
    """,
)
def repetition_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher-style repetition filters (duplicate-word fraction, top-word /
    # top-bigram fraction) — the quality gate every LLM corpus pass runs
    # before training. Linear explode→count shape, not per-row O(len²).
    from eve_graph_spark.operators.text_analysis import repetition_stats

    return repetition_stats(spread(load_table(spark, sf_dir, "documents")))


@register(
    "pii_redact_documents",
    r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\+\d{1,3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g') AS redacted,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
             + len(regexp_extract_all(text, '\+\d{1,3}[- ]\d{3}[- ]\d{4}\b')) AS n_hits
    FROM documents
    """,
)
def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PII scrub pass over the corpus: typed placeholder substitution +
    # per-doc hit count. Regexes live in the RE2 ∩ Java common subset so
    # the oracle runs the *same pattern strings* — this query is literally
    # a cross-engine regex-semantics parity check. Zero shuffle.
    from eve_graph_spark.operators.text_analysis import PII_PATTERNS, redact_pii

    docs = spread(load_table(spark, sf_dir, "documents"))
    n_hits = None
    for pattern, _ in PII_PATTERNS:
        c = F.size(F.regexp_extract_all(F.col("text"), F.lit(pattern), F.lit(0)))
        n_hits = c if n_hits is None else n_hits + c
    return docs.select(
        "doc_id",
        redact_pii(F.col("text")).alias("redacted"),
        n_hits.cast("long").alias("n_hits"),
    )


@register(
    "train_test_split_leakage",
    """
    WITH s AS (
        SELECT doc_id,
               CASE WHEN ((doc_id % 1000003) * 2654435761 % 1000003) % 100 < 90
                    THEN 'train' ELSE 'test' END AS split,
               md5(substr(text, 1, 32)) AS prefix_digest
        FROM documents
    )
    SELECT doc_id, split,
           MIN(split) OVER (PARTITION BY prefix_digest)
             <> MAX(split) OVER (PARTITION BY prefix_digest) AS leaked
    FROM s
    """,
)
def train_test_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic hash split (90/10) + cross-split contamination check:
    # a doc is `leaked` when another doc with the same 32-char-prefix
    # fingerprint landed in the other split (prefix fingerprints are the
    # standard cheap proxy for benchmark contamination). Knuth
    # multiplicative hash with mod-before-multiply so int64 never
    # overflows (ANSI-safe); min/max-over-window instead of the
    # COUNT(DISTINCT)-over-window Spark lacks.
    docs = spread(load_table(spark, sf_dir, "documents"))
    m = 1000003
    bucket = (F.col("doc_id") % m) * F.lit(2654435761) % m % 100
    s = docs.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("test").alias("split"),
        F.md5(F.substring("text", 1, 32).cast("binary")).alias("prefix_digest"),
    )
    w = Window.partitionBy("prefix_digest")
    return s.select(
        "doc_id",
        "split",
        (F.min("split").over(w) != F.max("split").over(w)).alias("leaked"),
    )


@register(
    "unigram_logprob_quality",
    """
    WITH w AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents
    ),
    v AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_w FROM w GROUP BY word),
    t AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM v),
    lp AS (
        SELECT word,
               CAST(floor(ln(CAST(n_w AS DOUBLE) / CAST((SELECT n_total FROM t) AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT) AS lp
        FROM v
    )
    SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(lp.lp) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_logprob
    FROM w JOIN lp USING (word)
    GROUP BY w.doc_id
    """,
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Perplexity-proxy quality score: corpus unigram LM, per-doc mean log
    # prob. Two wordcount aggs + one join keyed on word — at 100 TB the
    # vocab side is zipf-small but unbounded, so no forced broadcast (AQE
    # decides). ln() differs across engines by ≤1-2 ulp → fixed-pointed at
    # 1e-6 (house determinism idiom) before the order-independent integer
    # sum; the two final divisions are single IEEE ops, portable.
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word"))
    # One tokenize pass: per-(doc, word) counts carry BOTH sides of the LM.
    # The vocab count n_w is a windowed sum over the word partition (the
    # LM-then-join-back form re-planned the tokenize subtree twice and
    # aggregated the vocab twice); n_total is a scan-side sum of token-
    # array sizes — the same scalar as count(w) without an explode, with
    # NULL text contributing 0 exactly as explode drops it. Per-word log
    # probs are applied with multiplicity c — the identical integer-
    # fixed-point addends as the row-per-token sum, order-independent.
    cw = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    tot = docs.agg(
        F.sum(
            F.when(F.col("text").isNull(), F.lit(0)).otherwise(
                F.size(F.split(F.lower("text"), " "))
            )
        ).alias("n_total")
    )
    lp = F.floor(
        F.log(F.col("n_w").cast("double") / F.col("n_total").cast("double"))
        * 1000000.0
        + 0.5
    ).cast("long")
    return (
        cw.withColumn("n_w", F.sum("c").over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            (
                F.sum(F.col("c") * lp).cast("double") / F.sum("c") / 1000000.0
            ).alias("avg_logprob"),
        )
    )


_DOMAIN_MIX_WEIGHTS: tuple[tuple[str, int], ...] = (
    # lang → doc quota in the mixed sample (a "data recipe": upsample en,
    # cap the rest), fixture-independent constants shared with the oracle.
    ("en", 40), ("de", 15), ("es", 15), ("fr", 15), ("zh", 15),
)


@register(
    "domain_mix_documents",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id % 1000003) * 2654435761 % 1000003, doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang FROM ranked
    WHERE rn <= CASE lang {' '.join(f"WHEN '{lang}' THEN {q}" for lang, q in _DOMAIN_MIX_WEIGHTS)} ELSE 0 END
    """,
)
def domain_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Domain-mixture sampling (the "data recipe" step): deterministic
    # per-domain quotas filled in portable-hash order, so every engine —
    # and every rerun — picks the same docs. One shuffle keyed on lang;
    # rank-within-group never materializes more than the quota per
    # partition after the filter. Skew note: at 100 TB a single giant
    # domain makes ROW_NUMBER over one partition a straggler — the quota
    # is a constant, so the scale path is TABLESAMPLE-then-rank or a
    # bucket < quota/count filter; here quotas ≪ group sizes and the
    # window is the exact, portable form.
    docs = spread(load_table(spark, sf_dir, "documents"))
    m = 1000003
    quota = F.lit(0)
    for lang, q in _DOMAIN_MIX_WEIGHTS:
        quota = F.when(F.col("lang") == lang, q).otherwise(quota)
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy((F.col("doc_id") % m) * F.lit(2654435761) % m, "doc_id")
    )
    return (
        docs.select("doc_id", "lang", quota.alias("__q"), rn.alias("__rn"))
        .filter(F.col("__rn") <= F.col("__q"))
        .select("doc_id", "lang")
    )


@register(
    "dedup_survivors_quality",
    f"""
    WITH RECURSIVE {{pairs}},
    dedup_edges AS (
        SELECT id_a AS src, id_b AS dst FROM mpairs
        UNION ALL SELECT id_b, id_a FROM mpairs
    ),
    dedup_reach AS (
        SELECT src AS node, src AS r FROM dedup_edges
        UNION
        SELECT e.dst, r.r FROM dedup_reach r JOIN dedup_edges e ON e.src = r.node
    ),
    dedup_cc AS (SELECT node, MIN(r) AS cluster FROM dedup_reach GROUP BY node),
    member AS (
        SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster,
               {_QUALITY_SQL} AS quality
        FROM documents d LEFT JOIN dedup_cc c ON c.node = d.doc_id
    ),
    best AS (
        SELECT cluster, doc_id, quality,
               ROW_NUMBER() OVER (PARTITION BY cluster
                                  ORDER BY quality DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY cluster) AS n_members
        FROM member
    )
    SELECT cluster, doc_id AS survivor_doc_id, n_members, quality AS survivor_quality
    FROM best WHERE rn = 1
    """.replace("{pairs}", _MINHASH_PAIRS_FOR_CC),
)
def dedup_survivors_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality-aware survivor selection: near-dup clusters (MinHash-LSH →
    # connected components) keep their *highest-quality* member, not the
    # min id — what a production corpus dedup actually ships. Ties on
    # quality break to min doc_id for determinism. The quality score is
    # the same portable expression the quality_scores query pins.
    from eve_graph_spark.operators.dedup import near_dup_clusters
    from eve_graph_spark.operators.text_analysis import quality_score_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    # Exact-dup pre-collapse before LSH (near_dup_clusters): same clusters,
    # none of the C(m,2) pair blowup on identical-doc groups. The quality
    # score rides near_dup_clusters' member-map scan (carry=, r13): one
    # corpus scan instead of a second full scan + doc_id-keyed join, with
    # the identical expression producing identical values.
    member = near_dup_clusters(
        docs, threshold=0.5,
        carry={"quality": quality_score_expr(F.col("text"))},
    ).select("doc_id", "cluster", "quality")
    w = Window.partitionBy("cluster")
    best = member.select(
        "cluster",
        "doc_id",
        "quality",
        F.row_number().over(w.orderBy(F.desc("quality"), "doc_id")).alias("__rn"),
        F.count(F.lit(1)).over(w).alias("n_members"),
    )
    return best.filter(F.col("__rn") == 1).select(
        "cluster",
        F.col("doc_id").alias("survivor_doc_id"),
        "n_members",
        F.col("quality").alias("survivor_quality"),
    )


# =========================================================================
# Round-4 additions: four more corpus-curation operators — paragraph-level
# dedup, token-budget selection, embedding sign-grid semantic dedup, and
# incremental snapshot dedup. All oracle-backed.
# =========================================================================


@register(
    "paragraph_dedup_rate",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    idx AS (
        SELECT doc_id, ws,
               unnest(range(0, CASE WHEN len(ws) <= 20 THEN 1
                                    ELSE 1 + (len(ws) - 20 + 19) // 20 END)) AS i
        FROM w
    ),
    chunks AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(ws, i * 20 + 1, i * 20 + 20), ' ')) AS d
        FROM idx
    ),
    freq AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM chunks GROUP BY d)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS dup_frac
    FROM chunks c JOIN freq f ON f.d = c.d
    GROUP BY c.doc_id
    """,
)
def paragraph_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Paragraph-level (20-word block) exact dedup rate per document — the
    # boilerplate detector: a doc whose blocks mostly appear elsewhere in
    # the corpus is template/chrome, not content. Two keyed shuffles:
    # block-digest counts (partial-agg'd map-side), then per-doc rollup.
    # The digests are 32-byte md5s, ~0.2% of the text volume on the wire —
    # text itself never shuffles, same budget shape as MinHash (SCALE.md).
    from eve_graph_spark.operators.text_analysis import chunk_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    chunks = (
        docs.select("doc_id", F.split("text", " ").alias("__w"))
        .select("doc_id", F.explode(chunk_expr("__w", 20, 20)).alias("__chunk"))
        .select("doc_id", F.md5(F.encode("__chunk", "utf-8")).alias("__d"))
    )
    freq = chunks.groupBy("__d").agg(F.count(F.lit(1)).alias("__n"))
    return (
        chunks.join(freq, "__d")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("__n") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            (F.col("n_dup_chunks").cast("double") / F.col("n_chunks").cast("double")).alias(
                "dup_frac"
            ),
        )
    )


@register(
    "boilerplate_strip_documents",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    idx AS (
        SELECT doc_id, ws,
               unnest(range(0, CASE WHEN len(ws) <= 20 THEN 1
                                    ELSE 1 + (len(ws) - 20 + 19) // 20 END)) AS i
        FROM w
    ),
    blocks AS (
        SELECT doc_id, i,
               array_to_string(list_slice(ws, i * 20 + 1, i * 20 + 20), ' ') AS block
        FROM idx
    ),
    wd AS (SELECT doc_id, i, block, md5(block) AS d FROM blocks),
    freq AS (SELECT d, COUNT(*) AS n FROM wd GROUP BY d)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           COALESCE(array_to_string(list(b.block ORDER BY b.i)
                        FILTER (WHERE f.n = 1), ' '), '') AS clean_text
    FROM wd b JOIN freq f USING (d)
    GROUP BY b.doc_id
    """,
)
def boilerplate_strip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C4-style boilerplate REMOVAL (the transform, where
    # paragraph_dedup_rate above is the metric): drop every 20-word block
    # whose content appears more than once corpus-wide, rebuild the doc
    # from the surviving blocks in order. Same chunking as the rate query
    # (chunk_expr stride=20). Shuffle budget: the freq side is digest-only
    # (partial-agg'd map-side); the rewrite side necessarily moves text
    # twice (digest-keyed join + doc-keyed regroup) — inherent to any
    # transform that rewrites documents, and each is one keyed pass, no
    # window over a corpus-global partition. A mega-common block (classic
    # skew) lands on one join key; AQE skew-join splits it.
    from eve_graph_spark.operators.text_analysis import chunk_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    blocks = (
        docs.select("doc_id", F.split("text", " ").alias("__w"))
        .select("doc_id", F.posexplode(chunk_expr("__w", 20, 20)).alias("__i", "__chunk"))
        .select("doc_id", "__i", "__chunk", F.md5(F.encode("__chunk", "utf-8")).alias("__d"))
    )
    freq = blocks.groupBy("__d").agg(F.count(F.lit(1)).alias("__n"))
    kept = F.when(
        F.col("__n") == 1, F.struct(F.col("__i").alias("i"), F.col("__chunk").alias("c"))
    )  # NULL for removed blocks: collect_list skips NULLs
    return (
        blocks.join(freq, "__d")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.when(F.col("__n") > 1, 1).otherwise(0)).alias("n_removed"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept)), lambda x: x["c"]), " "
            ).alias("clean_text"),
        )
    )


TOKEN_BUDGET = 10_000


@register(
    "token_budget_sample",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS BIGINT)
                   AS n_tokens,
               {_QUALITY_SQL} AS quality
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS BIGINT)
                   AS cum_tokens
        FROM t
    )
    SELECT doc_id, n_tokens, cum_tokens FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Greedy token-budget selection: take docs best-quality-first until the
    # corpus-wide token budget is spent — the "fill the training mix to N
    # tokens" step. The global prefix sum is DISTRIBUTED, not a
    # single-partition window: range-shuffle on the (quality desc, doc_id)
    # total order, per-partition running sum (keyed window), plus constant
    # per-partition token offsets. The offsets are themselves a DataFrame —
    # a K-row groupBy + single-partition window (K = range partitions, not
    # data-sized) broadcast-joined back on __pid — so the whole query is
    # ONE action after the snapshot: no driver collect, no K-entry literal
    # map in the plan (at cluster scale K is thousands; a create_map of 2K
    # literals bloats the expression tree, a K-row broadcast does not).
    from eve_graph_spark.operators.text_analysis import quality_score_expr, token_count

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        quality_score_expr(F.col("text")).alias("quality"),
    )
    k = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # localCheckpoint, NOT persist: the frozen snapshot is what keeps both
    # reads of the frame (offset branch + main branch) on the SAME range
    # partitioning — recomputing would re-sample range bounds (persist may
    # evict + recompute with different range sampling), and its blocks are
    # context-cleaned on GC — persist() here leaked a cached DF per
    # invocation for the session lifetime (ADVICE r4).
    ranged = (
        t.repartitionByRange(k, F.col("quality").desc(), F.col("doc_id"))
        .withColumn("__pid", F.spark_partition_id())
        .transform(truncate_lineage)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        ranged.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("__s"))
        .select(
            "__pid",
            F.coalesce(F.sum("__s").over(w_off), F.lit(0)).cast("long").alias("__off"),
        )
    )
    local_w = Window.partitionBy("__pid").orderBy(F.desc("quality"), "doc_id")
    cum = (F.col("__off") + F.sum("n_tokens").over(local_w)).alias("cum_tokens")
    return (
        ranged.join(F.broadcast(offs), "__pid")
        .select("doc_id", "n_tokens", cum)
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
    )


@register(
    "semantic_bucket_dedup",
    """
    WITH b AS (
        SELECT vec_id,
               CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
                  + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
                  + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
                  + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
                  + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings WHERE embedding IS NOT NULL
    )
    SELECT vec_id, bucket,
           MIN(vec_id) OVER (PARTITION BY bucket) AS survivor_vec_id,
           CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS n_members,
           vec_id <> MIN(vec_id) OVER (PARTITION BY bucket) AS is_dup
    FROM b
    """,
)
def semantic_bucket_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Semantic (embedding-space) dedup via sign-grid bucketing: the sign
    # bits of the first 8 dimensions are an 8-bit SimHash over the
    # embedding — vectors in the same orthant bucket together, min vec_id
    # survives. One keyed shuffle on the bucket id; the 64-float vector
    # never shuffles (the bucket is computed in the scan stage). The
    # scale path to finer granularity is more bits (wider orthant code) or
    # random-hyperplane projections — same plan shape either way.
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    # coalesce per-element: a NULL in any of the first 8 dims must vote 0,
    # matching the oracle's CASE WHEN ... ELSE 0 (NULL >= 0 is NULL there,
    # which falls to ELSE); without it the whole bucket goes NULL Spark-side.
    # F.get, not getItem: a vector shorter than 8 dims must yield NULL (→
    # vote 0) like DuckDB's out-of-bounds list index — getItem THROWS under
    # ANSI mode (pinned by test_null_embedding_parity's 3-wide row).
    bucket = sum(
        F.coalesce((F.get("embedding", i) >= 0).cast("long"), F.lit(0)) * (1 << i)
        for i in range(8)
    ).cast("long")
    w = Window.partitionBy("bucket")
    return (
        emb.select("vec_id", bucket.alias("bucket"))
        .select(
            "vec_id",
            "bucket",
            F.min("vec_id").over(w).alias("survivor_vec_id"),
            F.count(F.lit(1)).over(w).alias("n_members"),
        )
        .withColumn("is_dup", F.col("vec_id") != F.col("survivor_vec_id"))
    )


@register(
    "incremental_snapshot_dedup",
    """
    WITH old AS (
        SELECT md5(text) AS d, MIN(doc_id) AS dup_of
        FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL
        GROUP BY md5(text)
    ),
    new AS (
        SELECT doc_id, md5(text) AS d FROM documents WHERE doc_id % 2 = 1
    )
    SELECT n.doc_id, o.dup_of, o.dup_of IS NOT NULL AS is_dup
    FROM new n LEFT JOIN old o ON o.d = n.d
    """,
)
def incremental_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental ingestion dedup: screen a new crawl batch (odd doc_ids
    # here) against the already-curated corpus (even doc_ids) by exact
    # digest. The old corpus collapses to a (digest, min_id) index — in
    # production that index is materialized/bucketed by digest once and
    # each nightly batch shuffle-joins against it, so the cost per batch is
    # O(batch + index), never O(corpus^2). NULL text never matches (SQL
    # equality), mirrored in the oracle by the IS NOT NULL guard on the
    # index side.
    docs = spread(load_table(spark, sf_dir, "documents"))
    digest = F.md5(F.encode("text", "utf-8"))
    old = (
        docs.filter((F.col("doc_id") % 2 == 0) & F.col("text").isNotNull())
        .groupBy(digest.alias("__d"))
        .agg(F.min("doc_id").alias("dup_of"))
    )
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", digest.alias("__d"))
    return new.join(old, "__d", "left").select(
        "doc_id", "dup_of", F.col("dup_of").isNotNull().alias("is_dup")
    )


@register(
    "hard_negatives_topk",
    """
    WITH pos AS (SELECT unnest(range(1, 65)) AS pos),
    v AS (SELECT vec_id, label, pos, CAST(embedding[pos] AS DOUBLE) AS val
          FROM embeddings, pos
          WHERE embedding IS NOT NULL AND len(embedding) = 64),
    norms AS (
        SELECT vec_id, SUM(CAST(FLOOR(val * val * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0 AS sq
        FROM v GROUP BY 1
    ),
    q AS (SELECT vec_id, label FROM embeddings WHERE vec_id % 20 = 0),
    dots AS (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               SUM(CAST(FLOOR(a.val * b.val * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0 AS dot
        FROM v a JOIN v b ON b.pos = a.pos
        WHERE a.vec_id % 20 = 0 AND b.label <> a.label
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT d.query_id, d.vec_id,
               d.dot / (sqrt(nq.sq) * sqrt(nv.sq)) AS cosine
        FROM dots d JOIN norms nq ON nq.vec_id = d.query_id
                    JOIN norms nv ON nv.vec_id = d.vec_id
    )
    SELECT query_id, vec_id AS negative_vec_id, cosine,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT query_id, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hard-negative mining for contrastive training: for each query vector,
    # the top-3 most-cosine-similar vectors with a DIFFERENT label — the
    # near-misses a bi-encoder learns the most from. Exact brute-force
    # scoring (the query batch broadcasts; the corpus is scanned once —
    # the same shape as ann_brute_force_topk, whose LSH/IVF variants are
    # the documented scale path for wider query sets), fixed-point dot for
    # engine parity, top-3 via rank-filter (WindowGroupLimit: per-partition
    # top-k, no global sort).
    #
    # r13 (guide §3.1/§2.3, same rewrite as
    # similarity._brute_force_topk_fixed_point): one broadcast crossJoin
    # of the query batch onto the corpus scan, dot and both norms as
    # map-side integer array folds — the previous posexplode → equi-join
    # on pos → SUM shape shuffled |corpus|·|Q|·dim product rows through
    # an aggregate exchange for values the fold produces bit-identically
    # (same integer addends, order-free addition; SUM null/empty
    # semantics reproduced by _fixed_dot_sum_semantics). Zero exchanges
    # remain below the top-k window. An earlier round measured the HOF
    # fold slower, but that predates the r13 let-binding fixes; the
    # interleaved A/B now favors the fold (OPTIMIZATION_r13.md).
    FP = 1_000_000_000
    emb = load_table(spark, sf_dir, "embeddings")
    # NULL / wrong-width guard, symmetric with the oracle's WHERE: a NULL
    # embedding would silently vanish from the Spark side (posexplode of
    # NULL emits no rows) while the oracle kept it as a NULL-cosine
    # candidate — engine divergence the moment the fixture grows NULLs.
    from eve_graph_spark.operators.similarity import (
        _fixed_dot_sum_semantics, fixed_sqnorm_expr,
    )

    v = emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    ).select("vec_id", "label", F.col("embedding").cast("array<double>").alias("vec"))
    # candidate norms hoisted into the scan projection: once per corpus
    # row, not once per (candidate, query) pair. spread(): the folds run
    # at scan parallelism — a single-row-group parquet read is ONE task,
    # which would serialize |corpus|·|Q|·dim interpreted fold steps (at
    # scale the scan has real splits and spread is a no-op).
    cand = spread(v).select(
        "vec_id", "label", "vec",
        fixed_sqnorm_expr(F.col("vec"), FP).alias("v_sq"),
    )
    qb = v.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("vec").alias("qvec"),
        fixed_sqnorm_expr(F.col("vec"), FP).alias("q_sq"),
    )
    scored = (
        cand.crossJoin(F.broadcast(qb))
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "query_id",
            "vec_id",
            (_fixed_dot_sum_semantics(F.col("qvec"), F.col("vec"))
             / (F.sqrt("q_sq") * F.sqrt("v_sq"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.select("query_id", "vec_id", "cosine", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            F.col("vec_id").alias("negative_vec_id"),
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


RESAMPLE_MOD = 1_000_003


@register(
    "lang_temperature_resample",
    f"""
    WITH counts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang
                    FROM documents GROUP BY lang),
    floor_n AS (SELECT MIN(n_lang) AS min_n FROM counts),
    rates AS (
        SELECT lang, n_lang,
               CAST(FLOOR(sqrt(CAST(f.min_n AS DOUBLE) / CAST(n_lang AS DOUBLE))
                          * {RESAMPLE_MOD} + 0.5) AS BIGINT) AS keep_fp
        FROM counts, floor_n f
    )
    SELECT d.doc_id, d.lang, r.keep_fp
    FROM documents d JOIN rates r USING (lang)
    WHERE (d.doc_id % {RESAMPLE_MOD}) * 2654435761 % {RESAMPLE_MOD} < r.keep_fp
    """,
)
def lang_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Temperature-based language rebalancing (the multilingual data-mix
    # step): downsample each language at rate sqrt(min_count / count) —
    # temperature alpha = 0.5, chosen because IEEE-754 requires sqrt to be
    # correctly rounded, so Spark and DuckDB compute the IDENTICAL rate
    # (pow(x, 0.7) carries no such guarantee and can flip a fixed-point
    # boundary). Selection is the deterministic Knuth-hash threshold, so
    # reruns and engines agree row-for-row. Two tiny aggregates (per-lang
    # counts, global min) broadcast back onto the scan — the corpus is
    # read once and never shuffled.
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    # min over a single-partition window of the per-lang aggregate: the
    # separate .agg(min) + crossJoin form re-planned `counts` — i.e. the
    # corpus-wide count — twice. The window input is #langs rows (bounded,
    # tiny), so one partition is free, and the corpus aggregates once.
    rates = counts.withColumn(
        "min_n", F.min("n_lang").over(Window.partitionBy(F.lit(1)))
    ).select(
        "lang",
        F.floor(
            F.sqrt(F.col("min_n").cast("double") / F.col("n_lang").cast("double"))
            * RESAMPLE_MOD
            + F.lit(0.5)
        )
        .cast("long")
        .alias("keep_fp"),
    )
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(rates), "lang")
        .filter((F.col("doc_id") % RESAMPLE_MOD) * 2654435761 % RESAMPLE_MOD < F.col("keep_fp"))
        .select("doc_id", "lang", "keep_fp")
    )


@register(
    "containment_pairs",
    """
    WITH sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(string_split(lower(coalesce(text, '')), ' ')) >= 3 THEN
                   list_transform(range(0, len(string_split(lower(coalesce(text, '')), ' ')) - 2),
                       i -> array_to_string(list_slice(string_split(lower(coalesce(text, '')), ' '), i + 1, i + 3), ' '))
                   ELSE [lower(coalesce(text, ''))] END) AS sh
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment_a,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh) AS containment_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.8
               OR CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh) >= 0.8
               AS is_contained
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Asymmetric shingle containment |A∩B|/|A| vs /|B| — catches quotes /
    # subsets / doc-inside-doc that symmetric Jaccard under-scores (a short
    # doc fully quoted inside a long one has tiny Jaccard but containment
    # 1.0). Same consecutive-pair oracle convention as ngram_jaccard_pairs;
    # at scale the pair source is the LSH candidate stream and the kernel
    # is unchanged (shingle arrays meet only inside the pair join).
    from eve_graph_spark.operators.dedup import shingles_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", shingles_expr("text", 3).alias("sh"))
    pairs = sh.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")).join(
        sh.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi"
    )
    j = (
        pairs.join(sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    ca = (inter / F.size("sh_a").cast("double")).alias("containment_a")
    cb = (inter / F.size("sh_b").cast("double")).alias("containment_b")
    return j.select(
        "id_a", "id_b", ca, cb,
        ((inter / F.size("sh_a").cast("double") >= 0.8)
         | (inter / F.size("sh_b").cast("double") >= 0.8)).alias("is_contained"),
    )


@register(
    "containment_pairs_lsh",
    f"""
    WITH csh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(string_split(lower(coalesce(text, '')), ' ')) >= 3 THEN
                   list_transform(range(0, len(string_split(lower(coalesce(text, '')), ' ')) - 2),
                       i -> array_to_string(list_slice(string_split(lower(coalesce(text, '')), ' '), i + 1, i + 3), ' '))
                   ELSE [lower(coalesce(text, ''))] END) AS sh
        FROM documents
    ),
    chs AS (
        SELECT doc_id, sh,
               list_transform(sh, s ->
                   ('0x' || substr(md5(s), 1, 14))::BIGINT % 2147483647) AS hs
        FROM csh
    ),
    csigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), j ->
                   list_min(list_transform(hs,
                       h -> ((2 * j + 1) * h + 97 * j + 13) % 2147483647))) AS sig
        FROM chs
    ),
    cbanded AS (
        SELECT DISTINCT doc_id, u.i AS band, ({{bands_sql}})[u.i] AS bucket
        FROM csigs, unnest(range(1, 9)) AS u(i)
    ),
    ccand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM cbanded a JOIN cbanded b USING (band, bucket)
        WHERE a.doc_id < b.doc_id
    ),
    -- r10 text-free verify: containment over distinct digest sets (same
    -- md5-mod-P digests as the signatures) — containment_for_pairs(
    -- digest='portable'), replayed exactly, collisions included
    cdg AS (SELECT doc_id, list_distinct(hs) AS dg FROM chs)
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(x.dg, y.dg)) AS DOUBLE) / len(x.dg) AS containment_a,
           CAST(len(list_intersect(x.dg, y.dg)) AS DOUBLE) / len(y.dg) AS containment_b,
           CAST(len(list_intersect(x.dg, y.dg)) AS DOUBLE) / len(x.dg) >= 0.8
               OR CAST(len(list_intersect(x.dg, y.dg)) AS DOUBLE) / len(y.dg) >= 0.8
               AS is_contained
    FROM ccand c JOIN cdg x ON x.doc_id = c.id_a JOIN cdg y ON y.doc_id = c.id_b
    """.replace("{bands_sql}", portable_band_buckets_sql("sig", 8, 1, one_based=True)),
)
def containment_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The containment kernel wired to its AT-SCALE pair source (r4 verdict
    # flagged the registered consecutive-pair form as a kernel demo): LSH
    # candidates feed the asymmetric containment verifier. Banding is
    # (b=8, r=1) rather than the Jaccard-dedup (4, 2) because containment
    # pairs (short doc quoted inside a long one) have LOW symmetric
    # Jaccard — the single-row bands keep the collision curve hot at
    # j≈0.2. Oracle reproduces the whole pipeline (signatures → banding →
    # candidates → containment) on the portable hash family. The
    # consecutive-pair `containment_pairs` stays as the linear-sized
    # oracle twin of the kernel alone.
    from eve_graph_spark.operators.dedup import containment_for_pairs, portable_lsh_candidates

    docs = spread(load_table(spark, sf_dir, "documents"))
    cands = portable_lsh_candidates(docs, bands=8, rows_per_band=1)
    return containment_for_pairs(docs, cands, digest="portable")


@register(
    "self_repetition_spans",
    """
    WITH w AS (SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS ws FROM documents),
    g AS (
        SELECT doc_id,
               array_to_string(list_slice(ws, i + 1, i + 5), ' ') AS gram
        FROM w, LATERAL unnest(range(0, CASE WHEN len(ws) >= 5 THEN len(ws) - 4 ELSE 0 END)) AS u(i)
    ),
    counts AS (
        SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS n
        FROM g GROUP BY doc_id, gram
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_spans,
           MAX(n) AS top_span_n,
           CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE)
               / CAST(SUM(n) AS DOUBLE) AS repeated_span_frac
    FROM counts GROUP BY doc_id
    """,
)
def self_repetition_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Long-span self-repetition (Gopher's "repeated 5-gram" class): docs
    # that loop the same 5-word span are generation/template junk that
    # word- and bigram-level stats under-detect. Linear explode → two
    # keyed aggregations, partial-agg'd map-side — the same scale shape as
    # repetition_stats, deliberately NOT the O(len²) per-row form. Docs
    # shorter than 5 words have no spans and drop out (both engines).
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " ")
    grams = (
        docs.select("doc_id", words.alias("__w"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(__w) >= 5 THEN "
                    "transform(sequence(0, size(__w) - 5), i -> concat_ws(' ', slice(__w, i + 1, 5))) "
                    "ELSE array() END"
                )
            ).alias("gram"),
        )
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_spans"),
        F.max("n").alias("top_span_n"),
        (
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).cast("double")
            / F.sum("n").cast("double")
        ).alias("repeated_span_frac"),
    )


@register(
    "quality_deciles",
    f"""
    WITH t AS (SELECT doc_id, {_QUALITY_SQL} AS q FROM documents),
    d AS (SELECT doc_id, q, NTILE(10) OVER (ORDER BY q, doc_id) AS decile FROM t)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(q) AS min_q, MAX(q) AS max_q,
           SUM(CAST(FLOOR(q * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS sum_q_fp
    FROM d GROUP BY decile
    """,
)
def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality-score calibration histogram: corpus deciles with per-bin
    # stats — what you eyeball before picking a quality filter threshold.
    # The global NTILE is the same DISTRIBUTED rank as
    # token_budget_sample: range-shuffle on the (q, doc_id) total order,
    # per-partition row_number, plus constant per-partition row offsets.
    # r13 (verdict item 3): the offsets — and the corpus total the
    # closed-form tile expression needs — are a K-row DataFrame
    # (K = range partitions) broadcast-joined back on __pid, not a driver
    # collect + 2K-literal create_map: at cluster scale K is thousands and
    # a literal map bloats the expression tree, a K-row broadcast does
    # not. Per-bin sums are 1e6 fixed-point so both engines add exact
    # integers.
    from eve_graph_spark.operators.text_analysis import quality_score_expr

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", quality_score_expr(F.col("text")).alias("q"))
    k = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # localCheckpoint for the same reasons as token_budget_sample: offset
    # consistency by construction + no session-lifetime cache leak.
    ranked = (
        t.repartitionByRange(k, "q", "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .transform(truncate_lineage)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = (
        ranked.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long").alias("__off"),
            F.sum("__cnt").over(w_all).cast("long").alias("__n"),
        )
    )
    local_w = Window.partitionBy("__pid").orderBy("q", "doc_id")
    r = (F.col("__off") + F.row_number().over(local_w) - 1).alias("__r")
    base = F.floor(F.col("__n") / F.lit(10)).cast("long")
    rem = (F.col("__n") % 10).cast("long")
    big = base + F.lit(1)
    tile = F.when(
        F.col("__r") < rem * big, F.floor(F.col("__r") / big) + 1
    ).otherwise(
        rem + F.floor((F.col("__r") - rem * big) / F.greatest(base, F.lit(1))) + 1
    )
    return (
        ranked.join(F.broadcast(offs), "__pid")
        .withColumn("__r", r)
        .select("q", tile.cast("long").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
            (F.sum(F.floor(F.col("q") * 1000000 + F.lit(0.5)).cast("long")) / F.lit(1000000.0)).alias("sum_q_fp"),
        )
    )


@register(
    "event_anomaly_zscore",
    """
    WITH stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS s,
               SUM(CAST(FLOOR(value * value * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS ss
        FROM events GROUP BY event_type
    ),
    m AS (
        SELECT event_type, n,
               s / n AS mean,
               ss / n - (s / n) * (s / n) AS var
        FROM stats
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN m.var > 0 THEN (e.value - m.mean) / sqrt(m.var) END AS z,
           CASE WHEN m.var > 0 THEN abs((e.value - m.mean) / sqrt(m.var)) > 3.0
                ELSE FALSE END AS is_anomaly
    FROM events e JOIN m USING (event_type)
    """,
)
def event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-type z-score anomaly flagging: population moments from ONE
    # partial-agg'd pass (1e6 fixed-point sums so both engines add exact
    # integers; the mean/var derivation is the identical left-to-right
    # double chain), broadcast back onto the scan — the fact table is
    # read once and shuffles only the per-type sums. Zero-variance types
    # get NULL z / FALSE flag in both engines via the same guard.
    ev = load_table(spark, sf_dir, "events")
    fp = lambda c: F.floor(c * 1000000 + F.lit(0.5)).cast("long")  # noqa: E731
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(fp(F.col("value"))) / F.lit(1000000.0)).alias("s"),
        (F.sum(fp(F.col("value") * F.col("value"))) / F.lit(1000000.0)).alias("ss"),
    )
    m = stats.select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mean"),
        (F.col("ss") / F.col("n") - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))).alias("var"),
    )
    z = (F.col("value") - F.col("mean")) / F.sqrt("var")
    return (
        ev.select("event_id", "event_type", "value")
        .join(F.broadcast(m), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(F.col("var") > 0, z).alias("z"),
            F.when(F.col("var") > 0, F.abs(z) > 3.0).otherwise(F.lit(False)).alias("is_anomaly"),
        )
    )


# =========================================================================
# Training-corpus ops IV: Bloom-filter decontamination, BM25 retrieval,
# and cross-document duplicate-span detection
# =========================================================================

BLOOM_M = 16_384  # bits in the Bloom filter
BLOOM_K = 3       # hash functions


@register(
    "bloom_decontaminate",
    f"""
    WITH bench_sh AS (
        SELECT unnest({{SH5}}) AS sh
        FROM documents WHERE doc_id < 20
    ),
    bench_bits AS (
        SELECT DISTINCT
               ('0x' || substr(md5(sh || '#' || CAST(i AS VARCHAR)), 1, 14))::BIGINT
                   % {BLOOM_M} AS bit
        FROM bench_sh, (SELECT unnest([0, 1, 2]) AS i)
    ),
    corp_sh AS (
        SELECT doc_id, unnest({{SH5}}) AS sh
        FROM documents WHERE doc_id >= 20
    ),
    corp_bits AS (
        SELECT doc_id,
               ('0x' || substr(md5(sh), 1, 14))::BIGINT AS sh_dg,
               ('0x' || substr(md5(sh || '#' || CAST(i AS VARCHAR)), 1, 14))::BIGINT
                   % {BLOOM_M} AS bit
        FROM corp_sh, (SELECT unnest([0, 1, 2]) AS i)
    ),
    sh_hits AS (
        SELECT c.doc_id, c.sh_dg
        FROM corp_bits c JOIN bench_bits b USING (bit)
        GROUP BY c.doc_id, c.sh_dg
        HAVING COUNT(*) = {BLOOM_K}
    ),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom_hits
        FROM sh_hits GROUP BY doc_id
    ),
    n_sh AS (
        SELECT doc_id, CAST(len({{SH5}}) AS BIGINT) AS n_shingles
        FROM documents WHERE doc_id >= 20
    )
    SELECT n.doc_id, n.n_shingles,
           COALESCE(p.n_bloom_hits, 0) AS n_bloom_hits,
           COALESCE(p.n_bloom_hits, 0) > 0 AS flagged
    FROM n_sh n LEFT JOIN per_doc p USING (doc_id)
    """.replace("{SH5}", _SHINGLE5_SQL),
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bloom-filter decontamination — the scale path when the eval-suite
    # shingle set outgrows a literal broadcast set (decontaminate_documents'
    # plan): the benchmark side is compressed to an m-bit Bloom filter
    # (here m=16384, k=3, realized as its set-bit positions), which stays
    # a few KB no matter how many benchmarks feed it. A corpus shingle is
    # flagged iff ALL k of its bit positions are set — genuine Bloom
    # semantics including deterministic false positives, identical in both
    # engines because the bit positions come from the house portable
    # md5-derived hash (dedup.py:portable_shingle_hash_sql idiom). The
    # corpus side is one explode + k-fan-out + broadcast join + count:
    # only (doc_id, 56-bit shingle-digest, bit) rows shuffle, never text —
    # shingles_expr is array_distinct per doc SCAN-side, so no distinct()
    # (a full-text shuffle) is ever needed, and n_shingles is just the
    # array size (zero-shuffle). First cut shuffled shingle STRINGS and
    # measured 790 MB write / 112 s on the 500k-doc stress corpus; this
    # form shuffles fixed-width longs. A digest collision merging two
    # shingles is ~2^-56-rare and engine-identical (same md5 both sides).
    # At 100 TB the bench_bits side is a guaranteed broadcast (<= m rows);
    # the per-shingle HAVING k runs map-side against it.
    from eve_graph_spark.operators.dedup import shingles_expr

    docs = spread(load_table(spark, sf_dir, "documents"))
    i3 = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("i")
    bit = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("sh"), F.lit("#"), F.col("i").cast("string"))), 1, 14),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    ).alias("bit")
    sh_dg = F.conv(F.substring(F.md5(F.col("sh")), 1, 14), 16, 10).cast("long").alias("sh_dg")

    bench_sh = docs.filter(F.col("doc_id") < 20).select(
        F.explode(shingles_expr("text", 5)).alias("sh")
    )
    bench_bits = bench_sh.select(F.col("sh"), i3).select(bit).distinct()

    corp_sh = docs.filter(F.col("doc_id") >= 20).select(
        "doc_id", F.explode(shingles_expr("text", 5)).alias("sh")
    )
    corp_bits = corp_sh.select("doc_id", sh_dg, i3.alias("i"), F.col("sh")).select(
        "doc_id", "sh_dg", bit
    )
    sh_hits = (
        corp_bits.join(F.broadcast(bench_bits), "bit")
        .groupBy("doc_id", "sh_dg")
        .agg(F.count(F.lit(1)).alias("k_set"))
        .filter(F.col("k_set") == BLOOM_K)
    )
    per_doc = sh_hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_bloom_hits"))
    n_sh = docs.filter(F.col("doc_id") >= 20).select(
        "doc_id", F.size(shingles_expr("text", 5)).cast("long").alias("n_shingles")
    )
    return (
        n_sh.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0)) > 0).alias("flagged"),
        )
    )


# (query_id, term) — a fixture-independent retrieval workload over the
# corpus vocabulary; shared constants with the oracle.
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark"), (1, "join"),
    (2, "window"), (2, "merge"), (2, "sort"),
    (3, "hash"), (3, "filter"),
)
BM25_TOPK = 10


def _bm25_query_values_sql() -> str:
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in BM25_QUERIES)
    return f"(VALUES {rows}) AS q(query_id, term)"


@register(
    "bm25_topk",
    f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS word
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM w GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM dl
    ),
    q AS (SELECT query_id, term FROM {_bm25_query_values_sql()}),
    tf AS (
        SELECT w.doc_id, q.query_id, q.term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM w JOIN q ON w.word = q.term
        GROUP BY 1, 2, 3
    ),
    df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tf GROUP BY term
    ),
    idf AS (
        SELECT term,
               CAST(floor(ln((CAST((SELECT n_docs FROM stats) AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                             / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                          * 1000000.0 + 0.5) AS BIGINT) AS idf_fp
        FROM df
    ),
    scored AS (
        SELECT t.doc_id, t.query_id,
               CAST(floor((CAST(i.idf_fp AS DOUBLE) / 1000000.0)
                          * (CAST(t.tf AS DOUBLE) * 2.2
                             / (CAST(t.tf AS DOUBLE)
                                + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
                                                        / (SELECT avgdl FROM stats)))))
                          * 1000000000.0 + 0.5) AS BIGINT) AS term_score_fp
        FROM tf t JOIN idf i USING (term) JOIN dl d USING (doc_id)
    ),
    totals AS (
        SELECT query_id, doc_id, CAST(SUM(term_score_fp) AS BIGINT) AS score_fp
        FROM scored GROUP BY 1, 2
    )
    SELECT query_id, doc_id,
           CAST(score_fp AS DOUBLE) / 1000000000.0 AS score,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT query_id, doc_id, score_fp,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_fp DESC, doc_id) AS rnk
        FROM totals
    ) WHERE rnk <= {BM25_TOPK}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BM25 top-k retrieval (k1=1.2, b=0.75) over the corpus for a constant
    # query workload — the "mine relevant training docs for a topic" step.
    # No inverted index is materialized: the term set broadcasts and only
    # (doc_id, term, tf, dl) postings for QUERY terms shuffle — the
    # classic scatter-gather top-k plan, so at 100 TB the shuffle is
    # |query terms| x |matching docs|, not |corpus|. dl (doc word count)
    # is the split-array SIZE computed scan-side and carried through the
    # postings agg — the first cut derived it with a word-level explode +
    # groupBy, a corpus-wide shuffle for a number the scan already knows.
    # Two corpus scans remain (corpus-wide dl stats; postings): at 100 TB
    # re-scanning parquet for the tiny stats agg beats materializing an
    # O(corpus) cache.
    # Determinism: tf/dl/df are exact integers; avgdl is one division of
    # exact operands; ln goes through the house 1e-6 fixed point; each
    # per-term score is the identical left-to-right double chain fixed-
    # pointed at 1e-9 before the order-independent integer sum; ranking
    # orders by the integer score. Constants 2.2/1.2/0.25/0.75 parse to
    # identical doubles in both engines. dl-as-array-size equals the
    # oracle's COUNT(*) over unnest (split of '' yields one '' element in
    # both engines).
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", F.split(F.lower(F.coalesce("text", F.lit(""))), " ").alias("ws")
    )
    # dl == |words| == |spaces| + 1 for any text (split on ' ' yields one
    # element per gap, '' splits to ['']), so the corpus-stats pass counts
    # CHARACTERS instead of running the regex split: length - length(
    # without-spaces) + 1. Case-mapping never touches U+0020, so counting
    # on the un-lowered text is exact (r14, guide §1.2 — the stats scan
    # was paying a full regex split per doc for one integer).
    t_raw = F.coalesce("text", F.lit(""))
    dl_cheap = (
        F.length(t_raw) - F.length(F.replace(t_raw, F.lit(" "), F.lit(""))) + 1
    ).cast("long")
    stats = docs.select(dl_cheap.alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    q = spark.createDataFrame(list(BM25_QUERIES), "query_id long, term string")
    w = base.select(
        "doc_id", F.size("ws").cast("long").alias("dl"), F.explode("ws").alias("word")
    )
    # Postings keyed by (doc, term) — NOT (doc, query, term): the query_id
    # dimension re-attaches from the broadcast workload after the heavy
    # agg, so a term shared by two queries costs one posting row, and df
    # becomes a windowed count over rows that are already unique per doc —
    # no countDistinct, and no second plan of the postings subtree (the
    # groupBy(term)+join form re-planned tf and with it the corpus scan).
    # r14: the term MATCH is a literal IN-set predicate (whole-stage
    # codegen) instead of a broadcast hash join against the 7-row distinct
    # workload — same surviving rows (join on distinct terms ≡ isin), one
    # BroadcastExchange + distinct agg fewer in the plan (guide §2.4).
    terms = sorted({t for _, t in BM25_QUERIES})
    tf = (
        w.filter(F.col("word").isin(terms))
        .groupBy("doc_id", F.col("word").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    )
    idf_fp = (
        F.floor(
            F.log(
                (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
                / (F.col("df").cast("double") + 0.5)
                + 1.0
            )
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("idf_fp")
    )
    term_score_fp = (
        F.floor(
            (F.col("idf_fp").cast("double") / 1000000.0)
            * (
                F.col("tf").cast("double")
                * 2.2
                / (
                    F.col("tf").cast("double")
                    + 1.2 * (0.25 + 0.75 * (F.col("dl").cast("double") / F.col("avgdl")))
                )
            )
            * 1000000000.0
            + 0.5
        )
        .cast("long")
        .alias("term_score_fp")
    )
    # single stats reference (1-row broadcast carries n_docs AND avgdl) so
    # the corpus-stats scan happens once; query_ids fan back in from the
    # broadcast workload table only now, after the per-(doc,term) agg.
    scored = (
        tf.join(F.broadcast(q), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_fp", idf_fp)
        .select("doc_id", "query_id", term_score_fp)
    )
    totals = scored.groupBy("query_id", "doc_id").agg(F.sum("term_score_fp").alias("score_fp"))
    rw = Window.partitionBy("query_id").orderBy(F.desc("score_fp"), "doc_id")
    return (
        totals.select("query_id", "doc_id", "score_fp", F.row_number().over(rw).alias("rank"))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "query_id",
            "doc_id",
            (F.col("score_fp").cast("double") / 1000000000.0).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


@register(
    "duplicate_text_spans",
    """
    WITH words AS (
        SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS ws
        FROM documents
    ),
    pos_sh AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               ('0x' || substr(md5(array_to_string(list_slice(ws, i + 1, i + 5), ' ')), 1, 14))::BIGINT
                   AS digest
        FROM words, LATERAL unnest(range(0, len(ws) - 4)) AS t(i)
        WHERE len(ws) >= 5
    ),
    dup_digests AS (
        SELECT digest FROM pos_sh
        GROUP BY digest HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    dup_pos AS (
        SELECT p.doc_id, p.pos,
               p.pos - ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS grp
        FROM pos_sh p JOIN dup_digests d USING (digest)
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_shingles
    FROM dup_pos
    GROUP BY doc_id, grp
    """,
)
def duplicate_text_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cross-document exact duplicate-span detection (the Lee et al. 2022
    # "Deduplicating Training Data" substring-dedup analog, re-expressed
    # relationally): every word position whose 5-gram occurs in >= 2
    # DISTINCT docs is duplicated; adjacent duplicated positions merge
    # into maximal spans via the islands trick (pos - row_number). Output
    # is (doc_id, span word range, shingle count) — the spans a curation
    # pass would cut instead of dropping whole near-dup docs. Scale: only
    # (doc_id, pos, 56-bit digest-long) rows shuffle — text 5-grams are
    # hashed scan-side and never move (a 32-hex-char digest column
    # measured 2.5 GB of shuffle on the 500k-doc stress corpus; the long
    # is fixed-width and ~1/4 of that); the dup-digest side is an agg +
    # self-equi-join on digest (AQE picks the strategy; no broadcast
    # assumption since duplicated-shingle volume is corpus-sized in the
    # worst case). The islands window partitions by doc_id — bounded by
    # doc length, never corpus-global.
    # Kernel lives in operators/dedup.py:duplicate_spans with a
    # widen-on-demand digest width (SCALE.md states the FP bound); the
    # registered form pins the 56-bit default the oracle replays.
    from eve_graph_spark.operators.dedup import duplicate_spans

    docs = spread(load_table(spark, sf_dir, "documents"))
    return duplicate_spans(docs, ngram=5, digest_hex_chars=14)


# =========================================================================
# Round 8: graph-ML sampling + chokepoint (single-point-of-failure) analysis.
# random_walks feeds node2vec/DeepWalk-style embedding training; the
# chokepoint pair answers "which systems/gates must not fall" — the route-
# robustness question a navigation engine (reference's domain) gets asked.
# All three are exact integer/count arithmetic, so the oracles replay them
# bit-for-bit.
# =========================================================================

def _random_walk_oracle_sql(steps: int, walks_per_node: int,
                            as_cte: str | None = None) -> str:
    """Unrolled walk replay: one (candidates, min-score, pick) CTE triple per
    step — recursive CTEs can't host the per-step argmin aggregate, and with
    4 steps unrolling is smaller than the workaround. Scoring is
    graph_analytics.rw_score_sql, the committed twin of _rw_score_expr.
    With `as_cte`, the final (walk_id, step, node) union is emitted as one
    more named CTE instead of the terminal SELECT, so downstream oracles
    (skipgram_pairs) can build on the identical replayed corpus."""
    from eve_graph_spark.operators.graph_analytics import rw_score_sql

    reps = " UNION ALL ".join(f"SELECT {r} AS r" for r in range(walks_per_node))
    parts = [
        f"""rw_s0 AS (
            SELECT CAST(system_id * {walks_per_node} + r.r AS BIGINT) AS walk_id,
                   system_id AS node
            FROM fix_systems CROSS JOIN ({reps}) r
        )"""
    ]
    for i in range(1, steps + 1):
        score = rw_score_sql("w.walk_id", i, "e.dst_system_id")
        parts.append(
            f"""rw_c{i} AS (
            SELECT w.walk_id, CAST(e.dst_system_id AS BIGINT) AS dst, {score} AS score
            FROM rw_s{i - 1} w JOIN fix_jumps e ON e.src_system_id = w.node
        )"""
        )
        parts.append(
            f"rw_m{i} AS (SELECT walk_id, MIN(score) AS ms FROM rw_c{i} GROUP BY walk_id)"
        )
        parts.append(
            f"""rw_s{i} AS (
            SELECT c.walk_id, MIN(c.dst) AS node
            FROM rw_c{i} c JOIN rw_m{i} m ON m.walk_id = c.walk_id AND c.score = m.ms
            GROUP BY c.walk_id
        )"""
        )
    final = "\nUNION ALL ".join(
        f"SELECT walk_id, CAST({i} AS INTEGER) AS step, node FROM rw_s{i}"
        for i in range(steps + 1)
    )
    if as_cte is not None:
        parts.append(f"{as_cte} AS (\n{final}\n)")
        return ", " + ",\n".join(parts)
    return ", " + ",\n".join(parts) + "\n" + final


@register("random_walks", _graph_cte(_random_walk_oracle_sql(steps=4, walks_per_node=2)))
def random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Graph-embedding training corpus: 2 walks × 4 steps from every system,
    # next hop = argmin of a seeded portable hash over out-neighbors
    # (reproducible "randomness" both engines replay exactly). The frontier
    # carries (walk_id, node) only — one join per step, co-located when the
    # edge table is bucketed by src (SCALE.md). Distributed/driver parity
    # is pinned in tests/test_round8_ops.py.
    from eve_graph_spark.operators.graph_analytics import random_walks as rw

    jumps = build_jumps(spark, sf_dir)
    systems = build_systems(spark, sf_dir)
    return rw(jumps, walks_per_node=2, steps=4, nodes=systems.select("system_id"))


_CHOKE_ORACLE_BODY = """
, {choke}
, ap_seeds AS (
    SELECT v.system_id AS ex, MIN(s.system_id) AS start
    FROM fix_systems v JOIN fix_systems s ON s.system_id <> v.system_id
    GROUP BY v.system_id
),
ap_reach(ex, node) AS (
    SELECT ex, start FROM ap_seeds
    UNION
    SELECT r.ex, e.dst
    FROM ap_reach r JOIN fix_choke e ON e.src = r.node
    WHERE e.dst <> r.ex
)
SELECT ex AS system_id, COUNT(*) AS reached,
       CAST(COUNT(*) < (SELECT COUNT(*) FROM fix_systems) - 1 AS INTEGER) AS is_articulation
FROM ap_reach GROUP BY ex
"""


@register(
    "chokepoint_systems",
    _graph_cte(_CHOKE_ORACLE_BODY.format(choke=CHOKE_SQL_CTE)),
)
def chokepoint_systems(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Articulation points of the hub-tree+wormholes subgraph (the full
    # fixture ring is 2-connected — degenerate for this analysis; the
    # chokepoint fixture provably yields the 5 region hubs, see
    # graph_fixture.py). Exclusion-BFS: all |V| remove-one scenarios run as
    # ONE (ex, node)-keyed frontier loop; the oracle replays it with a
    # single multi-key recursive CTE. reached counts are exact integers.
    from eve_graph_spark.operators.graph_analytics import articulation_points
    from eve_graph_spark.sources.graph_fixture import build_choke_edges

    choke = build_choke_edges(spark, sf_dir)
    return articulation_points(choke, src_col="src", dst_col="dst").select(
        F.col("node").alias("system_id"), "reached", "is_articulation"
    )


_BRIDGE_ORACLE_BODY = """
, {choke}
, br_pairs AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM fix_choke
),
br_reach(a, b, node) AS (
    SELECT a, b, (SELECT MIN(system_id) FROM fix_systems) FROM br_pairs
    UNION
    SELECT r.a, r.b, e.dst
    FROM br_reach r JOIN fix_choke e ON e.src = r.node
    WHERE NOT ((e.src = r.a AND e.dst = r.b) OR (e.src = r.b AND e.dst = r.a))
)
SELECT a AS src_system_id, b AS dst_system_id, COUNT(*) AS reached,
       CAST(COUNT(*) < (SELECT COUNT(*) FROM fix_systems) AS INTEGER) AS is_bridge
FROM br_reach GROUP BY a, b
"""


@register(
    "bridge_gates",
    _graph_cte(_BRIDGE_ORACLE_BODY.format(choke=CHOKE_SQL_CTE)),
)
def bridge_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bridge edges of the chokepoint subgraph: every gate off the single
    # wormhole cycle (21 of 25 — a mixed signal, not a degenerate
    # all-or-nothing; see graph_fixture.py). Same exclusion-BFS kernel as
    # chokepoint_systems, keyed by the undirected edge pair instead of the
    # excluded vertex.
    from eve_graph_spark.operators.graph_analytics import bridges
    from eve_graph_spark.sources.graph_fixture import build_choke_edges

    choke = build_choke_edges(spark, sf_dir)
    return bridges(choke, src_col="src", dst_col="dst").select(
        F.col("src").alias("src_system_id"), F.col("dst").alias("dst_system_id"),
        "reached", "is_bridge",
    )


from eve_graph_spark.operators.clustering import kmeans_assign, kmeans_oracle_sql  # noqa: E402


@register("kmeans_embeddings", kmeans_oracle_sql(k=4, iterations=2, dim=64))
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full-corpus Lloyd's over the embedding table (2 rounds, k=4,
    # deterministic lowest-id init): the SemDeDup-style cluster-then-curate
    # building block. Assignment is a scan-side codegen expression against
    # broadcast centroid literals; the update is one (cluster, dim)-keyed
    # partial-sum shuffle of k*64 cells; centroids are the only driver
    # round-trip (parameter-server pattern — model state, never data).
    # Integer fixed-point end to end, so the oracle replays assignments
    # bit-for-bit. operators/clustering.py holds both sides.
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return kmeans_assign(emb, k=4, iterations=2).select(
        F.col("id").alias("vec_id"), "cluster"
    )


from eve_graph_spark.operators.dedup import (  # noqa: E402
    semantic_dedup,
    semantic_dedup_oracle_sql,
)


@register("semantic_dedup_embeddings", semantic_dedup_oracle_sql(k=4, iterations=2, tau=0.3))
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup (Abbas et al. 2023): kmeans-cluster the embedding space,
    # then keep-first-drop in-cluster cosine near-dups — the semantic
    # complement to the MinHash/SimHash surface-form dedup family. Pair
    # enumeration is per-cluster (the SemDeDup point: Σ|c|² not n²; k is
    # the bound knob at scale); cosines ride the same 1e-9 fixed-point
    # integers the ANN oracles pin, so the DuckDB replay — kmeans CTEs +
    # pairwise cosine — is bit-exact. tau=0.3 is fixture-calibrated (the
    # synthetic corpus' 99th-percentile in-cluster cosine; real web-scale
    # SemDeDup runs ~0.95) so the dup branch is exercised on real rows.
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return semantic_dedup(emb, k=4, iterations=2, tau=0.3).select(
        F.col("id").alias("vec_id"), "cluster", "n_close", "kept"
    )


from eve_graph_spark.operators.quantization import (  # noqa: E402
    quantization_oracle_sql,
    quantization_report,
)


@register("embedding_quantization", quantization_oracle_sql(dim=64))
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # int8 scalar quantization of the embedding corpus (the 4x vector-
    # storage rung below PQ): stats pass = one 64-cell min/max shuffle;
    # quantize pass = one scan-side codegen expression against broadcast
    # per-dim (min, scale) literals — codes, a position-weighted code
    # checksum (pins the exact int8 codes), and exact fixed-point
    # reconstruction MSE, zero further shuffle. operators/quantization.py
    # holds both sides.
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return quantization_report(emb).select(
        F.col("id").alias("vec_id"), "code_checksum", "mse"
    )


def _node2vec_oracle_sql(steps: int, walks_per_node: int,
                         return_mult: int, inout_mult: int) -> str:
    """Unrolled node2vec replay: same shape as _random_walk_oracle_sql plus
    the prev column and the CASE bias multiplier; the distance-1 test is a
    left probe on (prev, dst). fix_jumps carries the (2,17) pair twice
    (gate + wormhole rows) — harmless here because every pick is a MIN."""
    from eve_graph_spark.operators.graph_analytics import rw_score_sql

    reps = " UNION ALL ".join(f"SELECT {r} AS r" for r in range(walks_per_node))
    parts = [
        f"""nv_s0 AS (
            SELECT CAST(system_id * {walks_per_node} + r.r AS BIGINT) AS walk_id,
                   CAST(NULL AS BIGINT) AS prev, system_id AS node
            FROM fix_systems CROSS JOIN ({reps}) r
        )"""
    ]
    for i in range(1, steps + 1):
        score = rw_score_sql("w.walk_id", i, "e.dst_system_id")
        parts.append(
            f"""nv_c{i} AS (
            SELECT w.walk_id, w.node AS cur,
                   CAST(e.dst_system_id AS BIGINT) AS dst,
                   ({score}) * (CASE WHEN w.prev IS NULL THEN 1
                                     WHEN e.dst_system_id = w.prev THEN {return_mult}
                                     WHEN e2.src_system_id IS NOT NULL THEN 1
                                     ELSE {inout_mult} END) AS b
            FROM nv_s{i - 1} w
            JOIN fix_jumps e ON e.src_system_id = w.node
            LEFT JOIN (SELECT DISTINCT src_system_id, dst_system_id FROM fix_jumps) e2
              ON e2.src_system_id = w.prev AND e2.dst_system_id = e.dst_system_id
        )"""
        )
        parts.append(
            f"nv_m{i} AS (SELECT walk_id, MIN(b) AS mb FROM nv_c{i} GROUP BY walk_id)"
        )
        parts.append(
            f"""nv_s{i} AS (
            SELECT c.walk_id, MIN(c.cur) AS prev, MIN(c.dst) AS node
            FROM nv_c{i} c JOIN nv_m{i} m ON m.walk_id = c.walk_id AND c.b = m.mb
            GROUP BY c.walk_id
        )"""
        )
    final = "\nUNION ALL ".join(
        f"SELECT walk_id, CAST({i} AS INTEGER) AS step, node FROM nv_s{i}"
        for i in range(steps + 1)
    )
    return ", " + ",\n".join(parts) + "\n" + final


@register(
    "node2vec_walks",
    _graph_cte(_node2vec_oracle_sql(steps=4, walks_per_node=2, return_mult=4, inout_mult=2)),
)
def node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Second-order biased walk corpus (node2vec p/q semantics): return
    # candidates penalized 4x, out-of-neighborhood 2x, distance-1 free —
    # the deterministic analogue of the alpha-weighted draw, replayed
    # exactly by the oracle. Two keyed edge joins per step (candidate
    # fan-out + the (prev, dst) distance-1 probe).
    from eve_graph_spark.operators.graph_analytics import node2vec_walks as nv

    jumps = build_jumps(spark, sf_dir)
    systems = build_systems(spark, sf_dir)
    return nv(jumps, walks_per_node=2, steps=4, return_mult=4, inout_mult=2,
              nodes=systems.select("system_id"))


@register(
    "graph_diameter_estimate",
    _graph_cte(
        f"""
        , {CHOKE_SQL_CTE}
        , dd1(node, dist) AS (
            SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            UNION
            SELECT e.dst, w.dist + 1
            FROM dd1 w JOIN fix_choke e ON e.src = w.node
            WHERE w.dist < 30
        ),
        dd1m AS (SELECT node, MIN(dist) AS d FROM dd1 GROUP BY node),
        dd1peak AS (SELECT node, d FROM dd1m ORDER BY d DESC, node ASC LIMIT 1),
        dd2(node, dist) AS (
            SELECT (SELECT node FROM dd1peak), CAST(0 AS BIGINT)
            UNION
            SELECT e.dst, w.dist + 1
            FROM dd2 w JOIN fix_choke e ON e.src = w.node
            WHERE w.dist < 30
        ),
        dd2m AS (SELECT node, MIN(dist) AS d FROM dd2 GROUP BY node)
        SELECT CAST(0 AS BIGINT) AS sweep_start,
               (SELECT node FROM dd1peak) AS sweep_peak,
               (SELECT d FROM dd1peak) AS ecc_start,
               (SELECT MAX(d) FROM dd2m) AS diameter_lb
        """
    ),
)
def graph_diameter_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Double-sweep diameter lower bound (Magnien et al.): BFS from a fixed
    # start, re-BFS from the farthest node (ties to min id) — exact on
    # trees, near-exact in practice, TWO O(diameter) frontier loops instead
    # of |V| sweeps. The composition scalars (peak node, two maxima) are
    # O(1) driver values; the sweeps themselves are the engine's sssp.
    # Runs on the chokepoint subgraph: the full fixture's hub ring keeps
    # its diameter at a signal-free 3. r13 (guide §5.3): both sweeps from
    # ONE edge collect below the driver threshold (double_sweep_local —
    # the sssp composition collected the same edge set twice and ran two
    # extra scalar jobs); the distributed composition is unchanged above.
    from eve_graph_spark.operators.graph import (
        DRIVER_SSSP_MAX_EDGES, _collect_adj, double_sweep_local, fits_driver, sssp,
    )
    from eve_graph_spark.sources.graph_fixture import build_choke_edges

    choke = build_choke_edges(spark, sf_dir).withColumn("cost", F.lit(1).cast("long"))
    en = choke.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("cost").cast("double").alias("weight"),
    )
    if fits_driver(en, DRIVER_SSSP_MAX_EDGES):
        peak_node, peak_dist, lb = double_sweep_local(_collect_adj(en), 0)
    else:
        d1 = sssp(choke, [0], weight_col="cost", src_col="src", dst_col="dst")
        peak = (
            d1.orderBy(F.desc("dist"), F.asc("node")).limit(1).collect()[0]
        )
        d2 = sssp(choke, [int(peak["node"])], weight_col="cost",
                  src_col="src", dst_col="dst")
        peak_node, peak_dist = int(peak["node"]), float(peak["dist"])
        lb = d2.agg(F.max("dist").alias("m")).collect()[0]["m"]
    return spark.createDataFrame(
        [(0, int(peak_node), int(peak_dist), int(lb))],
        "sweep_start long, sweep_peak long, ecc_start long, diameter_lb long",
    )


@register(
    "risk_robustness",
    _graph_cte(
        f"""
        , {CHOKE_SQL_CTE}
        , rr_rank AS (
            SELECT dst_system_id AS node,
                   ROW_NUMBER() OVER (ORDER BY risk DESC, dst_system_id) AS rn
            FROM fix_sys_risk
        ),
        rr_k AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8)) t(k)),
        rr_seed AS (
            SELECT k.k, MIN(rk.node) AS seed
            FROM rr_k k JOIN rr_rank rk ON rk.rn > k.k
            GROUP BY k.k
        ),
        rr_reach(k, node) AS (
            SELECT k, seed FROM rr_seed
            UNION
            SELECT r.k, e.dst
            FROM rr_reach r
            JOIN fix_choke e ON e.src = r.node
            JOIN rr_rank rk ON rk.node = e.dst
            WHERE rk.rn > r.k
        )
        SELECT k AS removed, COUNT(*) AS reachable FROM rr_reach GROUP BY k
        """
    ),
)
def risk_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Percolation curve: remove the k most dangerous systems (risk DESC,
    # id tiebreak) for k = 0..8 and measure the component around the
    # lowest-id survivor — "how much of the map stays navigable as the
    # riskiest systems fall". The fixture curve is linear (25-k) until the
    # first hub enters the removal set at k=6, where the navigable set
    # collapses 20 -> 6 (hub 1 strands its region; only wormhole-linked 21
    # survives) — the percolation cliff the analysis exists to find.
    # All 9 scenarios ride ONE keyed frontier loop
    # (set_exclusion_reach); the exclusion test is a per-scenario
    # anti-join, so the shuffle carries (k, node) pairs only. Runs on the
    # chokepoint subgraph — the full fixture's ring absorbs any 4 removals
    # (curve would be a signal-free 25-k); here falling hubs strand whole
    # regions.
    from eve_graph_spark.operators.graph_analytics import set_exclusion_reach
    from eve_graph_spark.sources.graph_fixture import build_choke_edges

    systems = build_systems(spark, sf_dir)
    choke = build_choke_edges(spark, sf_dir)
    totals = systems.agg(F.sum("kills").alias("tk"), F.sum("jumps").alias("tj")).select(
        F.when(F.col("tj") > 0, F.col("tk") / F.col("tj")).otherwise(F.lit(0.01)).alias("baseline")
    )
    risk = systems.crossJoin(F.broadcast(totals)).select(
        "system_id", risk_expr(F.col("kills"), F.col("jumps"), F.col("baseline")).alias("risk")
    )
    # r13 (guide §5 — the driver does O(k) work, never O(V)): the scenario
    # sets are top-k objects by construction — excl(k) ⊆ the 8 riskiest
    # systems, and seed(k) = the smallest id not excluded, which with ≤ 8
    # exclusions always lies within the 9 smallest ids. Two bounded
    # top-k collects (orderBy().limit() = TakeOrdered — driver traffic is
    # 8 + 9 rows at ANY corpus scale) replace the old all-distributed
    # derivation (global row_number window + 3 joins + groupBy over
    # vertex-sized frames: 10+ AQE exchange jobs per run, measured as the
    # registry's worst job count, 27). Values are identical: the same
    # (risk DESC, id ASC) order ranks the top-8, and MIN(id ∉ excl) is
    # integer arithmetic.
    top8 = [
        r["system_id"]
        for r in risk.orderBy(F.desc("risk"), F.asc("system_id")).limit(8).collect()
    ]
    low9 = [
        r["system_id"]
        for r in systems.select("system_id").orderBy("system_id").limit(9).collect()
    ]
    excl_rows = [(k, int(n)) for k in range(9) for n in top8[:k]]
    # a k that excludes every system has no seed — the old groupBy simply
    # emitted no row for it (and the oracle's rr_seed MIN over zero rows
    # does the same); skip it rather than min() over an empty set
    seed_rows = [
        (k, int(min(rest)))
        for k in range(9)
        if (rest := [n for n in low9 if n not in set(top8[:k])])
    ]
    excl = spark.createDataFrame(excl_rows, "k long, node long")
    seeds = spark.createDataFrame(seed_rows, "k long, node long")
    return set_exclusion_reach(choke, seeds, excl, src_col="src", dst_col="dst").select(
        F.col("k").alias("removed"), "reachable"
    )


@register(
    "bigram_logprob_quality",
    """
    WITH bs AS (
        SELECT doc_id, string_split(lower(text), ' ') AS s
        FROM documents WHERE text IS NOT NULL
    ),
    b AS (
        SELECT doc_id, s[i] AS w1, s[i + 1] AS w2
        FROM bs, unnest(range(1, len(s))) AS u(i)
    ),
    bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_bg FROM b GROUP BY w1, w2),
    lc AS (SELECT w1, CAST(SUM(n_bg) AS BIGINT) AS n_left FROM bc GROUP BY w1),
    lp AS (
        SELECT c.w1, c.w2,
               CAST(floor(ln(CAST(c.n_bg AS DOUBLE) / CAST(l.n_left AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT) AS lp
        FROM bc c JOIN lc l USING (w1)
    )
    SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp.lp) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_logprob
    FROM b JOIN lp USING (w1, w2)
    GROUP BY b.doc_id
    """,
)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Second-order LM quality (the perplexity proxy one rung above
    # unigram_logprob_quality): per-doc mean log p(w_i | w_{i-1}), MLE
    # conditional = bigram count / left-token continuation count. Bigrams
    # are extracted SCAN-SIDE by zipping the token array with its own
    # shift (arrays_zip of two slices) — no positional self-join, no
    # second tokenize pass. Counts ride the one-pass windowed-sum shape
    # the unigram query established: per-(doc, bigram) counts carry both
    # the corpus LM (window over the bigram / left-token partitions) and
    # the per-doc aggregation (multiplicity c), so the corpus shuffles
    # once. ln() fixed-pointed at 1e-6 as usual; one-word/NULL docs have
    # no bigrams and drop symmetrically on both engines.
    docs = spread(load_table(spark, sf_dir, "documents"))
    s = F.split(F.lower("text"), " ")
    pairs = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(s, F.lit(1), F.size(s) - 1).alias("w1"),
                F.slice(s, F.lit(2), F.size(s) - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    cw = pairs.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    n_bg = F.sum("c").over(Window.partitionBy("w1", "w2"))
    n_left = F.sum("c").over(Window.partitionBy("w1"))
    lp = F.floor(
        F.log(n_bg.cast("double") / n_left.cast("double")) * 1000000.0 + F.lit(0.5)
    ).cast("long")
    return (
        cw.withColumn("lp", lp)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            (F.sum(F.col("c") * F.col("lp")).cast("double") / F.sum("c") / 1000000.0).alias("avg_logprob"),
        )
    )


@register(
    "perplexity_buckets",
    """
    WITH bs AS (
        SELECT doc_id, string_split(lower(text), ' ') AS s
        FROM documents WHERE text IS NOT NULL
    ),
    b AS (
        SELECT doc_id, s[i] AS w1, s[i + 1] AS w2
        FROM bs, unnest(range(1, len(s))) AS u(i)
    ),
    bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_bg FROM b GROUP BY w1, w2),
    lc AS (SELECT w1, CAST(SUM(n_bg) AS BIGINT) AS n_left FROM bc GROUP BY w1),
    lp AS (
        SELECT c.w1, c.w2,
               CAST(floor(ln(CAST(c.n_bg AS DOUBLE) / CAST(l.n_left AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT) AS lp
        FROM bc c JOIN lc l USING (w1)
    ),
    scored AS (
        SELECT b.doc_id,
               CAST(SUM(lp.lp) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_logprob
        FROM b JOIN lp USING (w1, w2)
        GROUP BY b.doc_id
    ),
    ranked AS (
        SELECT doc_id, avg_logprob,
               ROW_NUMBER() OVER (ORDER BY avg_logprob DESC, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM scored
    )
    SELECT doc_id, avg_logprob,
           CASE WHEN rn <= (n + 2) // 3 THEN 'head'
                WHEN rn <= (2 * n + 2) // 3 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """,
)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet-style head/middle/tail split (Wenzek et al. 2020): rank docs
    # by LM score (the bigram logprob proxy above — higher logprob =
    # lower perplexity = head) and cut at exact tertile ranks, ties by
    # doc_id so the split is deterministic. The ranking window runs over
    # a NARROW (doc_id, score) frame — the wide text never enters the
    # sort. At 100 TB the exact global rank becomes GK quantile
    # thresholds + a map-side assign (the winsorize_events_approx
    # pattern); the exact form is the oracle-checkable fixture contract,
    # and both forms share the score pass, which is where the actual
    # corpus-sized work (one bigram shuffle) lives.
    scored = bigram_logprob_quality(spark, sf_dir).select("doc_id", "avg_logprob")
    w = Window.orderBy(F.desc("avg_logprob"), F.asc("doc_id"))
    ranked = scored.select(
        "doc_id", "avg_logprob",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.select(
        "doc_id", "avg_logprob",
        F.when(
            F.col("rn") <= F.floor((F.col("n") + F.lit(2)) / 3), F.lit("head")
        ).when(
            F.col("rn") <= F.floor((F.lit(2) * F.col("n") + F.lit(2)) / 3),
            F.lit("middle"),
        ).otherwise(F.lit("tail")).alias("bucket"),
    )


@register(
    "winsorize_events",
    """
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    bounds AS (
        SELECT event_type,
               MAX(CASE WHEN rn = GREATEST(1, (n * 5 + 99) // 100) THEN value END) AS lo,
               MAX(CASE WHEN rn = GREATEST(1, (n * 95 + 99) // 100) THEN value END) AS hi,
               CAST(MAX(n) AS BIGINT) AS n
        FROM ranked GROUP BY event_type
    )
    SELECT r.event_type, b.n, b.lo, b.hi,
           CAST(SUM(CASE WHEN r.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN r.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
    FROM ranked r JOIN bounds b USING (event_type)
    GROUP BY r.event_type, b.n, b.lo, b.hi
    """,
)
def winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Outlier clipping report (the winsorization pass a feature/reward
    # pipeline runs before normalization): exact p05/p95 per group by
    # DISCRETE rank — the bound is an input datum, never an interpolated
    # float, so it is engine-portable like the median queries. Rank index
    # is pure integer arithmetic (ceil(p*n) as (n*p+99)//100). One shuffle
    # keyed by event_type; the clip counts ride the same partition.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    rn05 = F.greatest(F.lit(1).cast("long"), ((F.col("n") * 5 + 99) / 100).cast("long"))
    rn95 = F.greatest(F.lit(1).cast("long"), ((F.col("n") * 95 + 99) / 100).cast("long"))
    bounds = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == rn05, F.col("value"))).alias("lo"),
        F.max(F.when(F.col("rn") == rn95, F.col("value"))).alias("hi"),
        F.max("n").cast("long").alias("grp_n"),
    )
    return (
        ranked.select("event_type", "value").join(bounds, "event_type")
        .groupBy("event_type", "grp_n", "lo", "hi")
        .agg(
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).cast("long").alias("n_clipped_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).cast("long").alias("n_clipped_high"),
        )
        .select("event_type", F.col("grp_n").alias("n"), "lo", "hi",
                "n_clipped_low", "n_clipped_high")
    )


@register(
    "robust_anomaly_mad",
    """
    WITH med AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    gmed AS (
        SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS median
        FROM med GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.event_id, ABS(e.value - g.median) AS adev, g.median
        FROM events e JOIN gmed g USING (event_type)
    ),
    devranked AS (
        SELECT event_type, adev, median,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
    ),
    gmad AS (
        SELECT event_type, MAX(median) AS median,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad
        FROM devranked GROUP BY event_type
    )
    SELECT d.event_type, g.median, g.mad,
           CAST(SUM(CASE WHEN g.mad > 0 AND d.adev > 3 * g.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM dev d JOIN gmad g USING (event_type)
    GROUP BY d.event_type, g.median, g.mad
    """,
)
def robust_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Median/MAD anomaly detection — the robust twin of the mean/stddev
    # z-score query (event_anomaly_zscore): outliers cannot poison their
    # own detection threshold. Both medians are exact lower-medians by
    # rank (input data, no interpolation — portable); the 3-sigma-
    # equivalent test is |v - median| > 3*MAD with exact float products
    # of identical operands. Two rank passes = two event_type-keyed
    # window shuffles; counts ride the second.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    # ONE scan, one exchange: every window below shares the event_type
    # partition key, so Catalyst plans a single shuffle and chains the
    # sorts — the join-back formulation re-planned the events scan 3x
    # (test_plan_scan_budget pins this at 1).
    mid = F.floor((F.count(F.lit(1)).over(wc) + 1) / 2).cast("long")
    staged = (
        ev.select("event_type", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("median",
                    F.max(F.when(F.col("rn") == mid, F.col("value"))).over(wc))
        .withColumn("adev", F.abs(F.col("value") - F.col("median")))
    )
    wd = Window.partitionBy("event_type").orderBy("adev", "event_id")
    staged = staged.withColumn("rn2", F.row_number().over(wd)).withColumn(
        "mad", F.max(F.when(F.col("rn2") == mid, F.col("adev"))).over(wc)
    )
    return (
        staged.groupBy("event_type", "median", "mad")
        .agg(
            F.sum(
                F.when((F.col("mad") > 0) & (F.col("adev") > 3 * F.col("mad")), 1).otherwise(0)
            ).cast("long").alias("n_anomalies")
        )
        .select("event_type", "median", "mad", "n_anomalies")
    )


# --- approx-quantile twins (r10 verdict item 4) -------------------------------
# The exact-rank family above (exact_median_price / winsorize_events /
# robust_anomaly_mad) shuffles and SORTS the full fact table per group —
# correct, oracle-exact, and the documented 100 TB trade in SCALE.md. These
# twins make the documented swap real: percentile_approx (Spark's
# Greenwald-Khanna summary, O(accuracy) memory per group, partial-merge
# map-side, NO sort shuffle) replaces the rank pass. The sketch estimate
# can't hash-match any other engine, so correctness follows the `sketches`
# precedent: `quantile_approx_check` pins the GK guarantee itself (rank
# error ≤ n/accuracy) against exact ranks, and `winsorize_events_approx`
# is the production-shaped bench twin whose clip boundaries carry their
# own in-bound booleans (r10 verdict item 2 — no longer rows-only).


@register(
    "quantile_approx_check",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p05_within_bound,
           TRUE AS p50_within_bound,
           TRUE AS p95_within_bound
    FROM events GROUP BY event_type
    """,
)
def quantile_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bound check for the approx-quantile swap: percentile_approx(value,
    # p, accuracy=10000) guarantees an element whose RANK is within
    # n/accuracy of ceil(p*n) (Greenwald-Khanna invariant). The check
    # recomputes each estimate's true rank window with one conditional
    # aggregation pass (count of value < v / value <= v) and asserts
    # ceil(p*n) falls inside [cnt_lt + 1 - err, cnt_le + err],
    # err = n/accuracy. The oracle emits the group keys, exact counts and
    # TRUE literals — a wrong estimate flips a boolean and breaks the
    # hash, exactly the `sketches` contract. (The check pass is why this
    # query costs MORE than the exact form; the production twin below is
    # the one the bench compares.)
    acc = 10000
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    est = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.05, 0.5, 0.95], acc).alias("q"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "event_type", "n",
        F.col("q")[0].alias("q05"), F.col("q")[1].alias("q50"), F.col("q")[2].alias("q95"),
    )
    j = ev.join(F.broadcast(est), "event_type")
    checks = j.groupBy("event_type", "n", "q05", "q50", "q95").agg(
        *[
            agg.alias(name)
            for p, qc in ((5, "q05"), (50, "q50"), (95, "q95"))
            for name, agg in (
                (f"lt{p}", F.sum(F.when(F.col("value") < F.col(qc), 1).otherwise(0))),
                (f"le{p}", F.sum(F.when(F.col("value") <= F.col(qc), 1).otherwise(0))),
            )
        ]
    )
    err = (F.col("n") / F.lit(acc)) + F.lit(1.0)  # +1 absorbs rank-rounding
    def _ok(p: int) -> F.Column:
        target = F.ceil(F.col("n") * F.lit(p / 100.0))
        return (
            (target >= F.col(f"lt{p}") + 1 - err) & (target <= F.col(f"le{p}") + err)
        )
    return checks.select(
        "event_type", F.col("n").cast("long").alias("n"),
        _ok(5).alias("p05_within_bound"),
        _ok(50).alias("p50_within_bound"),
        _ok(95).alias("p95_within_bound"),
    )


@register(
    "winsorize_events_approx",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS low_clip_within_bound,
           TRUE AS high_clip_within_bound
    FROM events GROUP BY event_type
    """,
)
def winsorize_events_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Production twin of winsorize_events: p05/p95 via percentile_approx
    # instead of the exact rank window. Two narrow scans (GK partial-agg
    # bounds, then broadcast-join clip counts) and ZERO sort shuffles —
    # at 100 TB this replaces the full-fact window sort with two
    # map-combined passes. The wall-clock delta vs the exact form is
    # recorded per-round in SCALE.md.
    #
    # r10 verdict item 2: the OUTPUT is now bound-pinned, not rows-only.
    # The sketch clip values themselves are engine-specific, so instead of
    # emitting them raw, the clip pass additionally counts value<=lo and
    # value<=hi (same single aggregation, two more conditional sums — no
    # extra pass) and asserts each clip boundary's true rank window
    # contains the target rank within the GK guarantee (± n/accuracy,
    # exactly the quantile_approx_check contract). A clip value drifting
    # OUTSIDE rank tolerance flips a boolean and fails the hash.
    acc = 10000
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.05, 0.95], acc).alias("q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select(
        "event_type", "n", F.col("q")[0].alias("lo"), F.col("q")[1].alias("hi")
    )
    clips = (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "n", "lo", "hi")
        .agg(
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long").alias("lt_lo"),
            F.sum(F.when(F.col("value") <= F.col("lo"), 1).otherwise(0))
            .cast("long").alias("le_lo"),
            F.sum(F.when(F.col("value") < F.col("hi"), 1).otherwise(0))
            .cast("long").alias("lt_hi"),
            F.sum(F.when(F.col("value") <= F.col("hi"), 1).otherwise(0))
            .cast("long").alias("le_hi"),
        )
    )
    err = (F.col("n") / F.lit(acc)) + F.lit(1.0)  # +1 absorbs rank-rounding

    def _ok(p: float, lt: str, le: str) -> F.Column:
        target = F.ceil(F.col("n") * F.lit(p))
        return (target >= F.col(lt) + 1 - err) & (target <= F.col(le) + err)

    return clips.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        _ok(0.05, "lt_lo", "le_lo").alias("low_clip_within_bound"),
        _ok(0.95, "lt_hi", "le_hi").alias("high_clip_within_bound"),
    )


@register(
    "route_avoiding_risky",
    _graph_cte(
        """
        , av_excl AS (
            SELECT dst_system_id AS node FROM fix_sys_risk
            ORDER BY risk DESC, dst_system_id LIMIT 2
        ),
        av_edges AS (
            SELECT src_system_id AS src, dst_system_id AS dst FROM fix_jumps
            WHERE src_system_id NOT IN (SELECT node FROM av_excl)
              AND dst_system_id NOT IN (SELECT node FROM av_excl)
        ),
        av_d(node, dist) AS (
            SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            UNION
            SELECT e.dst, w.dist + 1
            FROM av_d w JOIN av_edges e ON e.src = w.node WHERE w.dist < 30
        ),
        av_m AS (SELECT node, MIN(dist) AS d FROM av_d GROUP BY node),
        av_pred AS (
            SELECT m.node, MIN(e.src) AS pred
            FROM av_m m
            JOIN av_edges e ON e.dst = m.node
            JOIN av_m u ON u.node = e.src
            WHERE u.d + 1 = m.d AND m.node <> 0
            GROUP BY m.node
        ),
        av_back(hop, node) AS (
            SELECT 0, CAST(13 AS BIGINT)
            UNION ALL
            SELECT b.hop + 1, p.pred FROM av_back b JOIN av_pred p ON p.node = b.node
            WHERE b.hop < 30
        ),
        av_len AS (SELECT MAX(hop) AS mx FROM av_back)
        SELECT CAST(l.mx - b.hop AS BIGINT) AS pos, b.node AS system_id, s.name,
               m.d AS dist
        FROM av_back b CROSS JOIN av_len l
        JOIN fix_systems s ON s.system_id = b.node
        JOIN av_m m ON m.node = b.node
        """
    ),
)
def route_avoiding_risky(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Avoid-list routing (the EVE navigation staple the reference's API
    # lacks): shortest 0 -> 13 route over the graph MINUS the 2 riskiest
    # systems — edges touching the avoid set are filtered in the scan
    # (pushdown-friendly predicate), then the normal target-pruned SSSP +
    # dist-table path reconstruction run unchanged. pred(v) := MIN(src)
    # among dist(src)+1 = dist(v) — unit costs make every optimal pred
    # settle in the same BFS layer, so the loop's (dist, pred) struct-min
    # tie-break IS the oracle's MIN(src) (cf. safest_route_path's float
    # argument). GraphEngine.shortest_route(avoid=[...]) ships the same
    # semantics as an API flag.
    # r13: dist + preds + walk via sssp_route (same rewrite as
    # safest_route_path — unit weights cast to double 1.0, so
    # dist(src) + 1.0 == dist(v) is the identical IEEE compare the old
    # (u_dist + 1) filter ran).
    from eve_graph_spark.operators.graph import sssp_route

    jumps = build_jumps(spark, sf_dir)
    systems = build_systems(spark, sf_dir)
    avoid = [
        r["system_id"]
        for r in jumps.select(
            F.col("dst_system_id").alias("system_id"), "risk"
        ).distinct().orderBy(F.desc("risk"), F.asc("system_id")).limit(2).collect()
    ]
    e = jumps.filter(
        ~F.col("src_system_id").isin(avoid) & ~F.col("dst_system_id").isin(avoid)
    ).select(F.col("src_system_id").alias("src"), F.col("dst_system_id").alias("dst"))
    dist, path = sssp_route(
        e.withColumn("cost", F.lit(1).cast("long")), 0, 13, weight_col="cost"
    )
    order = spark.createDataFrame(list(enumerate(path)), "pos long, system_id long")
    return (
        dist.withColumnRenamed("node", "system_id")
        .join(F.broadcast(order), "system_id")
        .join(F.broadcast(systems.select("system_id", "name")), "system_id")
        .select("pos", "system_id", "name", F.col("dist").cast("long").alias("dist"))
    )


@register(
    "skipgram_pairs",
    _graph_cte(
        _random_walk_oracle_sql(steps=4, walks_per_node=2, as_cte="rw_all")
        + """
        SELECT a.node AS center, b.node AS context, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM rw_all a JOIN rw_all b
          ON a.walk_id = b.walk_id
         AND a.step <> b.step
         AND ABS(a.step - b.step) <= 2
        GROUP BY a.node, b.node
        """
    ),
)
def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The consumer of the walk corpus: (center, context) skip-gram pairs
    # within a +-2 window, aggregated with multiplicity — what a word2vec-
    # style embedding trainer actually ingests (walks -> pairs is the
    # node2vec paper's next stage). One self-join keyed on walk_id: walks
    # are short, so the per-key group is tiny and the join co-partitions
    # on the walk's hash — no corpus-sized blowup (pairs = walks x
    # window x steps). The oracle replays the identical walk corpus via
    # the shared generator (as_cte form) and the same window logic.
    from eve_graph_spark.operators.graph_analytics import random_walks as rw

    jumps = build_jumps(spark, sf_dir)
    systems = build_systems(spark, sf_dir)
    walks = rw(jumps, walks_per_node=2, steps=4, nodes=systems.select("system_id"))
    a = walks.select("walk_id", F.col("step").alias("sa"), F.col("node").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("sb"), F.col("node").alias("context"))
    return (
        a.join(b, "walk_id")
        .filter((F.col("sa") != F.col("sb")) & (F.abs(F.col("sa") - F.col("sb")) <= 2))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "route_alternatives_k3",
    _graph_cte(
        """
        , ra_edges AS MATERIALIZED (
            SELECT src_system_id AS src, dst_system_id AS dst,
                   CAST(FLOOR(risk * 1000000 + 0.5) AS BIGINT) AS w
            FROM fix_jumps
        ),
        ra_walk(node, cost, path) AS (
            SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), [CAST(1 AS BIGINT)]
            UNION ALL
            SELECT e.dst, p.cost + e.w, list_append(p.path, e.dst)
            FROM ra_walk p JOIN ra_edges e ON e.src = p.node
            WHERE p.node <> 13
              AND NOT list_contains(p.path, e.dst)
              AND p.cost + e.w < 16000000
        ),
        ra_top AS (
            SELECT cost, path,
                   ROW_NUMBER() OVER (ORDER BY cost, path) AS rank
            FROM ra_walk WHERE node = 13
            ORDER BY cost, path LIMIT 3
        )
        SELECT CAST(r.rank AS BIGINT) AS rank, CAST(u.i - 1 AS BIGINT) AS pos,
               r.path[u.i] AS system_id, r.cost AS total_cost_fp
        FROM ra_top r, unnest(range(1, len(r.path) + 1)) AS u(i)
        """
    ),
)
def route_alternatives_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Yen's k=3 shortest loop-free routes 1 -> 13 under fixed-point risk
    # weights (GDS gds.shortestPath.yens parity — the route-family operator
    # past database.rs:484-544's single Dijkstra). Weights are
    # floor(risk*1e6+0.5) longs so path costs are exact integers:
    # associative, oracle-replayable, and on THIS fixture the top-4
    # simple-path costs are strictly distinct (verified: 9441717 <
    # 9697133 < 14013145 < 15890593), which makes Yen's output
    # implementation-independent — no tie-break can change the returned
    # paths. Notably rank 1 is a 4-hop route that beats the 3-hop rank 2
    # on total risk: genuinely weighted ranking, not hop count.
    # The oracle enumerates ALL simple paths with prefix cost < 16e6 (a
    # bound strictly above the rank-3 cost, so monotone positive weights
    # guarantee completeness) and takes the top 3 by (cost, path).
    # Engine side runs the SHIPPING k_shortest_paths_distributed, which
    # delegates to the driver twin below the SSSP threshold (this graph)
    # and batches spur sweeps through one banned multi-SSSP above it —
    # the parity test pins both modes equal here.
    from eve_graph_spark.operators.graph import k_shortest_paths_distributed

    jumps = build_jumps(spark, sf_dir)
    e = jumps.select(
        F.col("src_system_id").alias("src"),
        F.col("dst_system_id").alias("dst"),
        F.floor(F.col("risk") * 1_000_000 + F.lit(0.5)).cast("long").alias("w"),
    )
    routes = k_shortest_paths_distributed(e, 1, 13, k=3, weight_col="w")
    rows = [
        (r + 1, pos, int(n), int(cost))
        for r, (cost, path) in enumerate(routes)
        for pos, n in enumerate(path)
    ]
    return spark.createDataFrame(
        rows, "rank long, pos long, system_id long, total_cost_fp long"
    )


@register(
    "a_star_route",
    _graph_cte(
        """
        , ar_edges AS MATERIALIZED (
            SELECT src_system_id AS src, dst_system_id AS dst,
                   CAST(FLOOR(risk * 1000000 + 0.5) AS BIGINT) AS w
            FROM fix_jumps
        ),
        ar_walk(node, cost, path) AS (
            SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), [CAST(1 AS BIGINT)]
            UNION ALL
            SELECT e.dst, p.cost + e.w, list_append(p.path, e.dst)
            FROM ar_walk p JOIN ar_edges e ON e.src = p.node
            WHERE p.node <> 13
              AND NOT list_contains(p.path, e.dst)
              AND p.cost + e.w < 16000000
        ),
        ar_best AS (
            SELECT cost, path FROM ar_walk WHERE node = 13
            ORDER BY cost, path LIMIT 1
        )
        SELECT CAST(u.i - 1 AS BIGINT) AS pos, b.path[u.i] AS system_id,
               b.cost AS total_cost_fp
        FROM ar_best b, unnest(range(1, len(b.path) + 1)) AS u(i)
        """
    ),
)
def a_star_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A* single-pair route 1 -> 13 under 1e-6 fixed-point risk weights —
    # the one route variant that was unit/parity-pinned only (r12 verdict
    # item 5; operators/graph.py a_star, the coordinate-pruned arm of the
    # reference's shortest-route surface, database.rs:484-544 + the stored
    # x/y/z of database.rs:86-88). Weights are floor(risk*1e6+0.5) longs
    # carried in doubles, so path costs are exact integers, and on THIS
    # fixture the top simple-path costs are strictly distinct (see
    # route_alternatives_k3: 9441717 < 9697133 < ...), so the shortest
    # path is UNIQUE — no heap tie-break can change the answer and the
    # oracle's bounded simple-path enumeration replays (cost, path)
    # bit-for-bit. The ring coords make the heuristic informative
    # (admissibility pinned in tests/test_a_star.py); heuristic pruning
    # changes the expansion count, never the answer.
    from eve_graph_spark.operators.graph import a_star
    from eve_graph_spark.sources.graph_fixture import build_coords

    jumps = build_jumps(spark, sf_dir)
    e = jumps.select(
        F.col("src_system_id").alias("src"),
        F.col("dst_system_id").alias("dst"),
        F.floor(F.col("risk") * 1_000_000 + F.lit(0.5)).cast("double").alias("w"),
    )
    res = a_star(e, build_coords(spark, sf_dir), 1, 13, weight_col="w")
    cost, path = res
    rows = [(pos, int(n), int(cost)) for pos, n in enumerate(path)]
    return spark.createDataFrame(
        rows, "pos long, system_id long, total_cost_fp long"
    )


@register(
    "motif_two_hop_risky",
    _graph_cte(
        """
        , mt_edges AS (
            SELECT src_system_id AS src, dst_system_id AS dst,
                   CAST(FLOOR(risk * 1000000 + 0.5) AS BIGINT) AS risk_fp
            FROM fix_jumps
        )
        SELECT e1.src AS a_id, e1.dst AS b_id, e2.dst AS c_id,
               e1.risk_fp + e2.risk_fp AS total_risk_fp
        FROM mt_edges e1 JOIN mt_edges e2 ON e2.src = e1.dst
        WHERE e1.risk_fp > 2000000 AND e2.risk_fp > 2000000
          AND e1.src <> e2.dst
          AND NOT EXISTS (
              SELECT 1 FROM mt_edges d WHERE d.src = e1.src AND d.dst = e2.dst
          )
        """
    ),
)
def motif_two_hop_risky(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GraphFrames' flagship surface on the engine: motif finding
    # (PropertyGraph.find, graph_api.py) compiled to aliased equi-self-joins
    # + anti-join negation. Pattern: risky two-hop detours a->b->c (both
    # edges risk > 2.0 in 1e-6 fixed point) where NO direct edge a->c
    # exists and a != c — i.e. pairs you can only reach through a risky
    # middle system. Plan shape pinned in test_graph_api
    # (no CartesianProduct / BroadcastNestedLoopJoin); risk is fixed-point
    # so sums are exact and order-free.
    from eve_graph_spark.graph_api import PropertyGraph

    v = build_systems(spark, sf_dir).select(F.col("system_id").alias("id"), "name")
    e = build_jumps(spark, sf_dir).select(
        F.col("src_system_id").alias("src"),
        F.col("dst_system_id").alias("dst"),
        F.floor(F.col("risk") * 1_000_000 + F.lit(0.5)).cast("long").alias("risk_fp"),
    )
    m = PropertyGraph(v, e).find("(a)-[e1]->(b); (b)-[e2]->(c); !(a)-[]->(c)")
    return (
        m.filter(
            (F.col("e1.risk_fp") > 2_000_000)
            & (F.col("e2.risk_fp") > 2_000_000)
            & (F.col("a.id") != F.col("c.id"))
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("c.id").alias("c_id"),
            (F.col("e1.risk_fp") + F.col("e2.risk_fp")).alias("total_risk_fp"),
        )
    )


@register(
    "diameter_weighted",
    _graph_cte(
        f"""
        , {_bellman_ford_unrolled_sql(0, 24, "dw1")},
        dw_peak AS MATERIALIZED (
            SELECT node, dist FROM dw1_mindist ORDER BY dist DESC, node ASC LIMIT 1
        ),
        {_bellman_ford_unrolled_sql(0, 24, "dw2", source_sql="(SELECT node FROM dw_peak)")}
        SELECT CAST(0 AS BIGINT) AS sweep_start,
               (SELECT node FROM dw_peak) AS sweep_peak,
               (SELECT dist FROM dw_peak) AS ecc_start,
               (SELECT MAX(dist) FROM dw2_mindist) AS diameter_lb
        """
    ),
)
def diameter_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weighted double-sweep diameter lower bound over float risk weights —
    # the weight_col= generalization of graph_diameter_estimate (r8 verdict
    # item 8; GDS weighted-eccentricity parity). Runs on the full fixture
    # jumps graph: under NON-uniform weights the hub ring no longer pins
    # the diameter at 3, so the weighted sweep carries real signal where
    # the hop sweep is flat. Distances are min-plus fixpoints over
    # left-to-right float path sums — deterministic per path — so the
    # unrolled-Bellman-Ford oracle (24 rounds >= longest simple path on the
    # 25-node fixture) replays them bit-for-bit, second sweep seeded by the
    # computed peak via source_sql. Unit-weight == hop cross-check lives in
    # test_graph_analytics.
    from eve_graph_spark.operators.graph_analytics import diameter_estimate

    jumps = build_jumps(spark, sf_dir)
    return diameter_estimate(
        jumps, start=0, weight_col="risk",
        src_col="src_system_id", dst_col="dst_system_id",
    )


@register(
    "node_similarity_topk",
    _graph_cte(
        """
        , ns_nbrs AS (SELECT DISTINCT src_system_id AS s, dst_system_id AS d FROM fix_jumps),
        ns_deg AS (SELECT s, COUNT(*) AS deg FROM ns_nbrs GROUP BY s),
        ns_inter AS (
            SELECT a.s AS na, b.s AS nb, COUNT(*) AS inter
            FROM ns_nbrs a JOIN ns_nbrs b ON a.d = b.d AND a.s < b.s
            GROUP BY a.s, b.s
        ),
        ns_half AS (
            SELECT i.na, i.nb, i.inter,
                   da.deg + db.deg - i.inter AS un
            FROM ns_inter i
            JOIN ns_deg da ON da.s = i.na
            JOIN ns_deg db ON db.s = i.nb
        ),
        ns_sym AS (
            SELECT na AS node, nb AS other, inter, un FROM ns_half
            UNION ALL
            SELECT nb, na, inter, un FROM ns_half
        ),
        ns_rank AS (
            SELECT node, other, inter, un,
                   CAST(FLOOR(1000000 * inter / un) AS BIGINT) AS jaccard_fp,
                   ROW_NUMBER() OVER (
                       PARTITION BY node
                       ORDER BY CAST(FLOOR(1000000 * inter / un) AS BIGINT) DESC,
                                other ASC
                   ) AS rank
            FROM ns_sym
        )
        SELECT node, other, inter, CAST(un AS BIGINT) AS "union",
               jaccard_fp, CAST(rank AS BIGINT) AS rank
        FROM ns_rank WHERE rank <= 3
        """
    ),
)
def node_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.nodeSimilarity parity: Jaccard over OUT-neighbor sets,
    # top-3 most similar peers per system (ties to min id). Candidate
    # pairs come from the shared-neighbor wedge join (never |V|^2); the
    # Jaccard is 1e-6 fixed point so the single double division is the
    # identical IEEE op in both engines. The operator
    # (graph_analytics.node_similarity) is the same code path
    # PropertyGraph.nodeSimilarity exposes.
    from eve_graph_spark.operators.graph_analytics import node_similarity

    jumps = build_jumps(spark, sf_dir)
    return node_similarity(
        jumps, top_k=3, src_col="src_system_id", dst_col="dst_system_id"
    )


# =========================================================================
# GDS spectral / structure parity: eigenvector centrality, HITS, local
# clustering coefficient. All three ride the pagerank bit-reproducibility
# device — exact integer contribution sums per superstep, one sqrt + one
# division per node per step — so DuckDB replays raw doubles bit-for-bit.
# =========================================================================

_EV_STEP_SQL = """
ev{i}_s AS (
    SELECT n.node, COALESCE(c.s, 0) AS s
    FROM ev_nodes n LEFT JOIN (
        SELECT e.dst_system_id AS node,
               SUM(CAST(FLOOR(p.score * 1000000 + 0.5) AS BIGINT)) AS s
        FROM ev{prev} p JOIN fix_jumps e ON e.src_system_id = p.node
        GROUP BY 1
    ) c ON c.node = n.node
),
ev{i} AS (
    SELECT node,
           CASE WHEN (SELECT SUM(s * s) FROM ev{i}_s) > 0
                THEN CAST(s AS DOUBLE)
                     / SQRT(CAST((SELECT SUM(s * s) FROM ev{i}_s) AS DOUBLE))
                ELSE 0.0 END AS score
    FROM ev{i}_s
)"""


@register(
    "eigenvector_centrality",
    _graph_cte(
        """
        , ev_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src_system_id AS node FROM fix_jumps
                UNION ALL SELECT dst_system_id FROM fix_jumps
            )
        ),
        ev0 AS (SELECT node, 1.0 AS score FROM ev_nodes),
        """
        + ",".join(_EV_STEP_SQL.format(i=i, prev=i - 1) for i in (1, 2, 3))
        + """
        SELECT node, score FROM ev3
        """
    ),
)
def eigenvector_centrality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.eigenvector parity: 3-step power iteration, L2-normalized per
    # step (exact integer contribution sums; the norm's sum-of-squares is an
    # exact BIGINT, so sqrt+divide are the identical IEEE ops in both
    # engines). Completes the centrality family alongside pagerank /
    # closeness / harmonic / betweenness / degree.
    from eve_graph_spark.operators.graph_analytics import eigenvector_centrality

    jumps = build_jumps(spark, sf_dir, with_risk=False)
    return eigenvector_centrality(jumps, iterations=3)


_HITS_HALF_SQL = """
{out}_s AS (
    SELECT n.node, COALESCE(c.s, 0) AS s
    FROM ev_nodes n LEFT JOIN (
        SELECT e.{group_col} AS node,
               SUM(CAST(FLOOR(p.score * 1000000 + 0.5) AS BIGINT)) AS s
        FROM {src} p JOIN fix_jumps e ON e.{join_col} = p.node
        GROUP BY 1
    ) c ON c.node = n.node
),
{out} AS (
    SELECT node,
           CASE WHEN (SELECT SUM(s * s) FROM {out}_s) > 0
                THEN CAST(s AS DOUBLE)
                     / SQRT(CAST((SELECT SUM(s * s) FROM {out}_s) AS DOUBLE))
                ELSE 0.0 END AS score
    FROM {out}_s
)"""


def _hits_sql(iterations: int) -> str:
    parts = []
    for i in range(1, iterations + 1):
        parts.append(_HITS_HALF_SQL.format(
            out=f"ha{i}", src=f"hh{i - 1}",
            join_col="src_system_id", group_col="dst_system_id",
        ))
        parts.append(_HITS_HALF_SQL.format(
            out=f"hh{i}", src=f"ha{i}",
            join_col="dst_system_id", group_col="src_system_id",
        ))
    return ",".join(parts)


@register(
    "hits_hub_authority",
    _graph_cte(
        """
        , ev_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src_system_id AS node FROM fix_jumps
                UNION ALL SELECT dst_system_id FROM fix_jumps
            )
        ),
        hh0 AS (SELECT node, 1.0 AS score FROM ev_nodes),
        """
        + _hits_sql(2)
        + """
        SELECT h.node, h.score AS hub, a.score AS authority
        FROM hh2 h JOIN ha2 a ON a.node = h.node
        """
    ),
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.hits parity (Kleinberg): 2 full hub/authority rounds, each
    # half-step L2-normalized with the fixed-point recipe. On this
    # symmetric fixture hub == authority — the oracle checks the machinery,
    # the asymmetric-graph semantics are pinned by unit tests.
    from eve_graph_spark.operators.graph_analytics import hits

    jumps = build_jumps(spark, sf_dir, with_risk=False)
    return hits(jumps, iterations=2)


@register(
    "local_clustering",
    _graph_cte(
        """
        , """ + _MESH_BODY + """,
        lcc_und AS (
            SELECT DISTINCT LEAST(src_system_id, dst_system_id) AS a,
                            GREATEST(src_system_id, dst_system_id) AS b
            FROM fix_mesh WHERE src_system_id <> dst_system_id
        ),
        lcc_deg AS (
            SELECT node, COUNT(*) AS degree FROM (
                SELECT a AS node FROM lcc_und UNION ALL SELECT b FROM lcc_und
            ) GROUP BY node
        ),
        lcc_tri AS (
            SELECT e1.a, e1.b, e2.b AS c
            FROM lcc_und e1
            JOIN lcc_und e2 ON e2.a = e1.b
            JOIN lcc_und e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        lcc_pn AS (
            SELECT node, COUNT(*) AS triangles FROM (
                SELECT a AS node FROM lcc_tri
                UNION ALL SELECT b FROM lcc_tri
                UNION ALL SELECT c FROM lcc_tri
            ) GROUP BY node
        )
        SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
               CASE WHEN d.degree >= 2
                    THEN CAST(FLOOR(1000000 * 2 * COALESCE(t.triangles, 0)
                              / (d.degree * (d.degree - 1))) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS lcc_fp
        FROM lcc_deg d LEFT JOIN lcc_pn t ON t.node = d.node
        """
    ),
)
def local_clustering_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.localClusteringCoefficient parity: per-node triangle density
    # on the undirected projection, 1e-6 fixed point. Triangles enumerated
    # once (a<b<c wedge join — Σ wedges work, never |V|^3) and credited to
    # all three corners via one explode.
    from eve_graph_spark.operators.graph_analytics import (
        local_clustering_coefficient,
    )

    mesh = build_mesh_edges(spark, sf_dir)
    return local_clustering_coefficient(mesh)


@register(
    "community_conductance",
    _graph_cte(
        _lpa_cte_body(5)
        + """
        , cm_m AS (SELECT COUNT(*) AS m FROM fix_jumps),
        cm_edges AS (
            SELECT ls.community AS cs, ld.community AS cd
            FROM fix_jumps e
            JOIN lpa5 ls ON ls.node = e.src_system_id
            JOIN lpa5 ld ON ld.node = e.dst_system_id
        ),
        cm_nodes AS (SELECT community, COUNT(*) AS nodes FROM lpa5 GROUP BY community),
        cm_src AS (
            SELECT cs AS community,
                   COALESCE(SUM(CASE WHEN cs = cd THEN 1 ELSE 0 END), 0) AS internal,
                   COALESCE(SUM(CASE WHEN cs <> cd THEN 1 ELSE 0 END), 0) AS outgoing
            FROM cm_edges GROUP BY cs
        ),
        cm_dst AS (
            SELECT cd AS community, COUNT(*) AS incoming
            FROM cm_edges WHERE cs <> cd GROUP BY cd
        ),
        cm_joined AS (
            SELECT n.community, n.nodes,
                   COALESCE(s.internal, 0) AS internal,
                   COALESCE(s.outgoing, 0) AS outgoing,
                   COALESCE(d.incoming, 0) AS incoming
            FROM cm_nodes n
            LEFT JOIN cm_src s ON s.community = n.community
            LEFT JOIN cm_dst d ON d.community = n.community
        )
        SELECT community, CAST(nodes AS BIGINT) AS nodes,
               CAST(internal AS BIGINT) AS internal,
               CAST(outgoing AS BIGINT) AS outgoing,
               CAST(incoming AS BIGINT) AS incoming,
               CASE WHEN LEAST(internal + outgoing,
                               (SELECT m FROM cm_m) - (internal + outgoing)) > 0
                    THEN CAST(FLOOR(1000000 * outgoing
                              / LEAST(internal + outgoing,
                                      (SELECT m FROM cm_m) - (internal + outgoing)))
                         AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS conductance_fp,
               CAST(FLOOR(1000000 * (internal * (SELECT m FROM cm_m)
                                     - (internal + outgoing) * (internal + incoming))
                          / ((SELECT m FROM cm_m) * (SELECT m FROM cm_m)))
                    AS BIGINT) AS modularity_fp
        FROM cm_joined
        """
    ),
)
def community_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.conductance + gds.modularity parity: cut quality of the
    # LPA-5 partition (the same labels as label_propagation_communities).
    # Integer cut/volume counters, one double division per metric —
    # bit-replayable. Labels are vertex-sized: two label joins onto the
    # edge set + one community-keyed count shuffle.
    from eve_graph_spark.operators.graph_analytics import (
        community_metrics, label_propagation,
    )

    jumps = build_jumps(spark, sf_dir, with_risk=False)
    labels = label_propagation(jumps, iterations=5)
    return community_metrics(jumps, labels)


_PPR_ITER_SQL = """
ppr{i} AS (
    SELECT n.node,
           -- CAST: DuckDB evaluates bare 1.0 - 0.85 in exact DECIMAL
           -- (0.075); the engine computes IEEE doubles (0.075…01). Force
           -- the identical double op sequence.
           CASE WHEN n.node IN (2, 17)
                THEN (CAST(1.0 AS DOUBLE) - 0.85) / (SELECT k FROM ppr_k)
                ELSE 0.0 END
           + 0.85 * (COALESCE(c.s, 0) / 1000000000000.0) AS rank
    FROM ppr_nodes n LEFT JOIN (
        SELECT e.dst_system_id AS node,
               SUM(CAST(FLOOR(p.rank / d.deg * 1000000000000 + 0.5) AS BIGINT)) AS s
        FROM ppr{prev} p JOIN ppr_deg d ON d.node = p.node
                         JOIN fix_jumps e ON e.src_system_id = p.node
        GROUP BY 1
    ) c ON c.node = n.node
)"""


@register(
    "personalized_pagerank",
    _graph_cte(
        """
        , ppr_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src_system_id AS node FROM fix_jumps
                UNION ALL SELECT dst_system_id FROM fix_jumps
            )
        ),
        ppr_k AS (SELECT COUNT(*) AS k FROM ppr_nodes WHERE node IN (2, 17)),
        ppr_deg AS (SELECT src_system_id AS node, COUNT(*) AS deg FROM fix_jumps GROUP BY 1),
        ppr0 AS (
            SELECT node,
                   CASE WHEN node IN (2, 17) THEN 1.0 / (SELECT k FROM ppr_k)
                        ELSE 0.0 END AS rank
            FROM ppr_nodes
        ),
        """
        + ",".join(_PPR_ITER_SQL.format(i=i, prev=i - 1) for i in (1, 2, 3))
        + """
        SELECT node, rank FROM ppr3
        """
    ),
)
def personalized_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS personalized PageRank (sourceNodes) parity: teleport mass pinned
    # to the wormhole endpoints {2, 17} — random-walk-with-restart
    # proximity to the wormhole corridor. Same fixed-point superstep and
    # oracle device as pagerank; the source set is literals, never data.
    from eve_graph_spark.operators.graph_analytics import pagerank

    jumps = build_jumps(spark, sf_dir, with_risk=False)
    return pagerank(jumps, iterations=3, sources=[2, 17])


# =========================================================================
# GDS gds.spanningTree parity: minimum spanning forest via Borůvka,
# oracle = the same rounds unrolled (per-component argmin pick + recursive
# min-label contraction per round). All-integer after the one fixed-point
# rounding, so the edge set is engine-independent.
# =========================================================================

_MST_ROUND_SQL = """
mb{i}_live AS MATERIALIZED (
    SELECT la.comp AS ca, lb.comp AS cb, e.wfp, e.a, e.b
    FROM mst_und e
    JOIN mbl{prev} la ON la.node = e.a
    JOIN mbl{prev} lb ON lb.node = e.b
    WHERE la.comp <> lb.comp
),
mb{i}_pick AS MATERIALIZED (
    SELECT DISTINCT a, b, wfp FROM (
        SELECT wfp, a, b,
               ROW_NUMBER() OVER (PARTITION BY comp ORDER BY wfp, a, b) AS rn
        FROM (SELECT ca AS comp, wfp, a, b FROM mb{i}_live
              UNION ALL SELECT cb AS comp, wfp, a, b FROM mb{i}_live) s
    ) t WHERE rn = 1
),
mb{i}_acc AS MATERIALIZED (
    SELECT DISTINCT a, b, wfp FROM (
        SELECT a, b, wfp FROM mb{prev}_acc
        UNION ALL SELECT a, b, wfp FROM mb{i}_pick
    ) u
),
mb{i}_cedges AS MATERIALIZED (
    SELECT DISTINCT l.ca, l.cb
    FROM mb{i}_live l JOIN mb{i}_pick p ON p.a = l.a AND p.b = l.b
),
mb{i}_walk(comp, lbl) AS (
    SELECT comp, comp FROM (SELECT DISTINCT comp FROM mbl{prev}) c0
    UNION
    SELECT x.cb, w.lbl FROM mb{i}_walk w
    JOIN (SELECT ca, cb FROM mb{i}_cedges
          UNION ALL SELECT cb AS ca, ca AS cb FROM mb{i}_cedges) x
      ON x.ca = w.comp
),
mbl{i} AS MATERIALIZED (
    SELECT l.node, r.lbl AS comp
    FROM mbl{prev} l JOIN (SELECT comp, MIN(lbl) AS lbl FROM mb{i}_walk GROUP BY comp) r
      ON r.comp = l.comp
)"""


@register(
    "minimum_spanning_tree",
    _graph_cte(
        """
        , mst_und AS MATERIALIZED (
            SELECT a, b, MIN(wfp) AS wfp FROM (
                SELECT LEAST(src_system_id, dst_system_id) AS a,
                       GREATEST(src_system_id, dst_system_id) AS b,
                       CAST(FLOOR(risk * 1000000 + 0.5) AS BIGINT) AS wfp
                FROM fix_jumps WHERE src_system_id <> dst_system_id
            ) s GROUP BY a, b
        ),
        mst_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT a AS node FROM mst_und UNION ALL SELECT b FROM mst_und
            ) n
        ),
        mbl0 AS MATERIALIZED (SELECT node, node AS comp FROM mst_nodes),
        mb0_acc AS (
            SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b,
                   CAST(NULL AS BIGINT) AS wfp WHERE FALSE
        ),
        """
        + ",".join(_MST_ROUND_SQL.format(i=i, prev=i - 1) for i in range(1, 7))
        + """
        SELECT a AS src, b AS dst, wfp AS weight_fp FROM mb6_acc
        """
    ),
)
def minimum_spanning_tree_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.spanningTree parity: risk-weighted MST of the jump graph via
    # distributed Borůvka (per-component integer argmin + O(log V)
    # contraction rounds — no global sort, no sequential frontier). The
    # (weight_fp, src, dst) total order makes the forest unique, so the
    # over-unrolled oracle replays the exact edge set.
    from eve_graph_spark.operators.graph_analytics import minimum_spanning_forest

    jumps = build_jumps(spark, sf_dir)
    return minimum_spanning_forest(jumps, weight_col="risk")


@register(
    "dag_longest_path",
    _graph_cte(
        """
        , dagq_edges AS MATERIALIZED (
            SELECT src_system_id AS a, dst_system_id AS b,
                   CAST(FLOOR(risk * 1000000 + 0.5) AS BIGINT) AS wfp
            FROM fix_jumps WHERE src_system_id < dst_system_id
        ),
        dagq_nodes AS MATERIALIZED (
            SELECT DISTINCT node FROM (
                SELECT a AS node FROM dagq_edges UNION ALL SELECT b FROM dagq_edges
            ) n
        ),
        dagq_walk(node, lvl, dist) AS (
            SELECT node, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM dagq_nodes
            UNION
            SELECT e.b, w.lvl + 1, w.dist + e.wfp
            FROM dagq_walk w JOIN dagq_edges e ON e.a = w.node
        )
        SELECT node, MAX(lvl) AS topo_level, MAX(dist) AS longest_dist_fp
        FROM dagq_walk GROUP BY node
        """
    ),
)
def dag_longest_path_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.dag.topologicalSort + gds.dag.longestPath parity on the
    # low-id→high-id orientation of the jump graph (acyclic by
    # construction): per node, longest incoming path in hops (topo layer)
    # and in fixed-point risk. All-integer max-plus — no IEEE anywhere;
    # the oracle's recursive walk enumerates (node, lvl, dist) states and
    # takes the same maxima.
    from eve_graph_spark.operators.graph_analytics import dag_longest_paths

    jumps = build_jumps(spark, sf_dir).filter(
        F.col("src_system_id") < F.col("dst_system_id")
    )
    return dag_longest_paths(jumps, weight_col="risk")


@register(
    "node_similarity_metrics",
    _graph_cte(
        """
        , nsm_nbrs AS (SELECT DISTINCT src_system_id AS s, dst_system_id AS d FROM fix_jumps),
        nsm_deg AS (SELECT s, COUNT(*) AS deg FROM nsm_nbrs GROUP BY s),
        nsm_inter AS (
            SELECT a.s AS na, b.s AS nb, COUNT(*) AS inter
            FROM nsm_nbrs a JOIN nsm_nbrs b ON a.d = b.d AND a.s < b.s
            GROUP BY a.s, b.s
        ),
        nsm_half AS (
            SELECT i.na, i.nb, i.inter,
                   da.deg + db.deg - i.inter AS un,
                   LEAST(da.deg, db.deg) AS dmin,
                   da.deg * db.deg AS dprod
            FROM nsm_inter i
            JOIN nsm_deg da ON da.s = i.na
            JOIN nsm_deg db ON db.s = i.nb
        ),
        nsm_sym AS (
            SELECT na AS node, nb AS other, inter, un, dmin, dprod FROM nsm_half
            UNION ALL
            SELECT nb, na, inter, un, dmin, dprod FROM nsm_half
        )
        SELECT node, other, inter, CAST(un AS BIGINT) AS "union",
               CAST(FLOOR(1000000 * inter / un) AS BIGINT) AS jaccard_fp,
               CAST(FLOOR(1000000 * inter / dmin) AS BIGINT) AS overlap_fp,
               CAST(FLOOR(1000000 * inter / SQRT(CAST(dprod AS DOUBLE))) AS BIGINT)
                   AS cosine_fp
        FROM nsm_sym
        """
    ),
)
def node_similarity_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS nodeSimilarity similarityMetric=JACCARD|OVERLAP|COSINE parity:
    # all three neighbor-set similarities for every shared-neighbor pair,
    # 1e-6 fixed point (exact integer numerators, one division each plus
    # one sqrt for cosine). Same wedge-join candidate discipline as
    # node_similarity_topk.
    from eve_graph_spark.operators.graph_analytics import node_similarity

    jumps = build_jumps(spark, sf_dir)
    return node_similarity(
        jumps, src_col="src_system_id", dst_col="dst_system_id",
        include_all_metrics=True,
    )


@register(
    "weighted_degree",
    _graph_cte(
        """
        SELECT node,
               CAST(SUM(o) AS BIGINT) AS out_weight_fp,
               CAST(SUM(i) AS BIGINT) AS in_weight_fp
        FROM (SELECT src_system_id AS node,
                     CAST(FLOOR(risk * 1000000 + 0.5) AS BIGINT) AS o,
                     CAST(0 AS BIGINT) AS i
              FROM fix_jumps
              UNION ALL
              SELECT dst_system_id AS node, CAST(0 AS BIGINT),
                     CAST(FLOOR(risk * 1000000 + 0.5) AS BIGINT)
              FROM fix_jumps) d
        GROUP BY node
        """
    ),
)
def weighted_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.degree(relationshipWeightProperty) parity: per-node sum of
    # incident edge weights (risk, 1e-6 fixed point so the sums are exact
    # integers — order-free, engine-independent). One explode + one
    # node-keyed sum shuffle, same shape as the unweighted degree query.
    jumps = build_jumps(spark, sf_dir)
    w = F.floor(F.col("risk") * 1000000 + F.lit(0.5)).cast("long")
    exploded = jumps.select(
        F.col("src_system_id").alias("node"), w.alias("o"), F.lit(0).cast("long").alias("i")
    ).unionByName(
        jumps.select(
            F.col("dst_system_id").alias("node"), F.lit(0).cast("long").alias("o"),
            w.alias("i"),
        )
    )
    return exploded.groupBy("node").agg(
        F.sum("o").alias("out_weight_fp"), F.sum("i").alias("in_weight_fp")
    )


def _ktruss_unrolled_sql(k: int, rounds: int) -> str:
    """DuckDB replay of the k-truss edge peel: each round recomputes
    per-edge triangle support over the surviving canonical edge set
    (a<b<c wedge join, one credit per triangle side) and drops edges with
    support < k-2. Over-unrolling past the fixpoint is a no-op; the final
    support block re-counts on the last set for the output."""
    steps = [", " + _MESH_BODY + """, kt0 AS MATERIALIZED (
        SELECT DISTINCT LEAST(src_system_id, dst_system_id) AS a,
                        GREATEST(src_system_id, dst_system_id) AS b
        FROM fix_mesh WHERE src_system_id <> dst_system_id
    )"""]
    for i in range(1, rounds + 1):
        steps.append(f"""
    , kt{i}_tri AS MATERIALIZED (
        SELECT e1.a, e1.b, e2.b AS c
        FROM kt{i - 1} e1
        JOIN kt{i - 1} e2 ON e2.a = e1.b
        JOIN kt{i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    , kt{i}_sup AS MATERIALIZED (
        SELECT a, b, COUNT(*) AS sup FROM (
            SELECT a, b FROM kt{i}_tri
            UNION ALL SELECT b AS a, c AS b FROM kt{i}_tri
            UNION ALL SELECT a, c AS b FROM kt{i}_tri
        ) s GROUP BY a, b
    )
    , kt{i} AS MATERIALIZED (
        SELECT e.a, e.b FROM kt{i - 1} e
        JOIN kt{i}_sup s ON s.a = e.a AND s.b = e.b
        WHERE s.sup >= {k - 2}
    )""")
    steps.append(f"""
    , ktf_tri AS MATERIALIZED (
        SELECT e1.a, e1.b, e2.b AS c
        FROM kt{rounds} e1
        JOIN kt{rounds} e2 ON e2.a = e1.b
        JOIN kt{rounds} e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT e.a AS src, e.b AS dst, CAST(s.sup AS BIGINT) AS support
    FROM kt{rounds} e
    JOIN (
        SELECT a, b, COUNT(*) AS sup FROM (
            SELECT a, b FROM ktf_tri
            UNION ALL SELECT b AS a, c AS b FROM ktf_tri
            UNION ALL SELECT a, c AS b FROM ktf_tri
        ) s GROUP BY a, b
    ) s ON s.a = e.a AND s.b = e.b""")
    return _graph_cte("".join(steps))


@register("ktruss_edges", _ktruss_unrolled_sql(3, 6))
def ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.ktruss parity: the 3-truss of the jump graph — the maximal
    # subgraph where every edge closes a triangle WITHIN the subgraph —
    # with per-edge in-truss support. The k-core peel lifted from nodes to
    # edges: wedge-join support count + filter, repeated to fixpoint.
    from eve_graph_spark.operators.graph_analytics import k_truss

    mesh = build_mesh_edges(spark, sf_dir)
    return k_truss(mesh, k=3)


def _louvain_unrolled_sql(rounds: int, weighted: bool = False) -> str:
    """DuckDB replay of the deterministic synchronous Louvain rounds
    (operators/graph_analytics.louvain): per round — community degree
    sums, per-node neighbor-community edge counts (own community padded
    with kin=0), all-integer gain on the 2m² common denominator, argmax
    with min-id tie-break, move applied only on the (node + round) % 2
    parity and only on a STRICT improvement over staying. weighted=True
    runs on fix_jumps with fixed-point risk weights (MIN across collapsed
    directed edges) and weight-sum degrees — same integer contract."""
    if weighted:
        src_sql = ("SELECT LEAST(src_system_id, dst_system_id) AS a, "
                   "GREATEST(src_system_id, dst_system_id) AS b, "
                   "CAST(FLOOR(risk * 1000000 + 0.5) AS BIGINT) AS wfp "
                   "FROM fix_jumps WHERE src_system_id <> dst_system_id")
        prefix = ", "
    else:
        src_sql = ("SELECT LEAST(src_system_id, dst_system_id) AS a, "
                   "GREATEST(src_system_id, dst_system_id) AS b, "
                   "CAST(1 AS BIGINT) AS wfp "
                   "FROM fix_mesh WHERE src_system_id <> dst_system_id")
        prefix = ", " + _MESH_BODY + ","
    return _graph_cte(
        _louvain_rounds_cte(rounds, src_sql, prefix)
        + f" SELECT node, comm AS community FROM lv{rounds}"
    )


def _gamma_factors(gnum: int, gden: int) -> tuple[str, str]:
    """SQL factor strings for the resolution parameter γ = gnum/gden,
    multiplied through the integer gain exactly like the engine's
    `_gamma_rational` arm: g = gden·2m·kin − gnum·k·(Σtot − [own]k).
    Emitted only when ≠1 so the γ=1 oracle SQL stays byte-identical."""
    return (f"{gnum} * " if gnum != 1 else ""), (f"{gden} * " if gden != 1 else "")


def _louvain_rounds_cte(
    rounds: int, src_sql: str, prefix: str = ", ", gnum: int = 1, gden: int = 1
) -> str:
    """The Louvain round CTE chain (lv_und … lv{rounds}) over an arbitrary
    `src_sql` producing (a, b, wfp) rows — shared by the fixture-graph
    queries and the kNN-graph composite. (gnum, gden) is the resolution
    γ as an exact rational (the GDS gamma), replayed in integer
    arithmetic."""
    gn, gd = _gamma_factors(gnum, gden)
    steps = [prefix + f"""
    lv_und AS MATERIALIZED (
        SELECT a, b, MIN(wfp) AS wfp FROM ({src_sql}) s GROUP BY a, b
    ),
    lv_adj AS MATERIALIZED (
        SELECT a AS u, b AS v, wfp FROM lv_und
        UNION ALL SELECT b AS u, a AS v, wfp FROM lv_und
    ),
    lv_deg AS MATERIALIZED (SELECT u, SUM(wfp) AS k FROM lv_adj GROUP BY u),
    lv_m AS (SELECT SUM(wfp) AS m FROM lv_und),
    lv0 AS MATERIALIZED (SELECT u AS node, u AS comm FROM lv_deg)"""]
    for i in range(1, rounds + 1):
        it = i - 1
        steps.append(f"""
    , lv{i}_stot AS MATERIALIZED (
        SELECT l.comm AS c, SUM(d.k) AS stot
        FROM lv{it} l JOIN lv_deg d ON d.u = l.node GROUP BY 1
    ),
    lv{i}_nc AS MATERIALIZED (
        SELECT e.u AS node, l.comm AS c, SUM(e.wfp) AS kin
        FROM lv_adj e JOIN lv{it} l ON l.node = e.v GROUP BY 1, 2
    ),
    lv{i}_cand AS MATERIALIZED (
        SELECT node, c, kin FROM lv{i}_nc
        UNION ALL
        SELECT l.node, l.comm, CAST(0 AS BIGINT) FROM lv{it} l
        WHERE NOT EXISTS (
            SELECT 1 FROM lv{i}_nc n WHERE n.node = l.node AND n.c = l.comm
        )
    ),
    lv{i}_gain AS MATERIALIZED (
        SELECT cand.node, cand.c, l.comm,
               {gd}2 * (SELECT m FROM lv_m) * cand.kin
               - {gn}d.k * (s.stot - CASE WHEN cand.c = l.comm THEN d.k ELSE 0 END) AS g
        FROM lv{i}_cand cand
        JOIN lv{it} l ON l.node = cand.node
        JOIN lv_deg d ON d.u = cand.node
        JOIN lv{i}_stot s ON s.c = cand.c
    ),
    lv{i} AS MATERIALIZED (
        SELECT g0.node,
               CASE WHEN (g0.node + {it}) % 2 = 0 AND b.g > g0.g
                    THEN b.c ELSE g0.comm END AS comm
        FROM (SELECT node, comm, g FROM lv{i}_gain WHERE c = comm) g0
        JOIN (
            SELECT node, c, g FROM (
                SELECT node, c, g,
                       ROW_NUMBER() OVER (PARTITION BY node ORDER BY g DESC, c) AS rn
                FROM lv{i}_gain
            ) r WHERE rn = 1
        ) b ON b.node = g0.node
    )""")
    return "".join(steps)


def _louvain_sl_rounds_cte(
    rounds: int, src_sql: str, n: str, gnum: int = 1, gden: int = 1
) -> str:
    """Self-loop-aware Louvain round chain (r10, the aggregated-graph
    form): like _louvain_rounds_cte but `src_sql` may carry a == b rows —
    self-loops contribute to a node's degree (×2) and to m, never to any
    kin (they move with the node, so their internal mass cancels out of
    the argmax). CTE names are prefixed with `n` so a multilevel query
    can stack chains. (gnum, gden) replays the resolution γ exactly as in
    _louvain_rounds_cte."""
    gn, gd = _gamma_factors(gnum, gden)
    steps = [f"""
    {n}_und AS MATERIALIZED (
        SELECT a, b, MIN(wfp) AS wfp FROM ({src_sql}) s WHERE a <> b GROUP BY a, b
    ),
    {n}_self AS MATERIALIZED (
        SELECT a AS node, MIN(wfp) AS wself FROM ({src_sql}) s WHERE a = b GROUP BY a
    ),
    {n}_adj AS MATERIALIZED (
        SELECT a AS u, b AS v, wfp FROM {n}_und
        UNION ALL SELECT b AS u, a AS v, wfp FROM {n}_und
    ),
    {n}_deg AS MATERIALIZED (
        SELECT COALESCE(d.u, sl.node) AS u,
               COALESCE(d.k, 0) + 2 * COALESCE(sl.wself, 0) AS k
        FROM (SELECT u, SUM(wfp) AS k FROM {n}_adj GROUP BY u) d
        FULL OUTER JOIN {n}_self sl ON sl.node = d.u
    ),
    {n}_m AS (
        SELECT (SELECT COALESCE(SUM(wfp), 0) FROM {n}_und)
             + (SELECT COALESCE(SUM(wself), 0) FROM {n}_self) AS m
    ),
    {n}0 AS MATERIALIZED (SELECT u AS node, u AS comm FROM {n}_deg)"""]
    for i in range(1, rounds + 1):
        it = i - 1
        steps.append(f"""
    , {n}{i}_stot AS MATERIALIZED (
        SELECT l.comm AS c, SUM(d.k) AS stot
        FROM {n}{it} l JOIN {n}_deg d ON d.u = l.node GROUP BY 1
    ),
    {n}{i}_nc AS MATERIALIZED (
        SELECT e.u AS node, l.comm AS c, SUM(e.wfp) AS kin
        FROM {n}_adj e JOIN {n}{it} l ON l.node = e.v GROUP BY 1, 2
    ),
    {n}{i}_cand AS MATERIALIZED (
        SELECT node, c, kin FROM {n}{i}_nc
        UNION ALL
        SELECT l.node, l.comm, CAST(0 AS BIGINT) FROM {n}{it} l
        WHERE NOT EXISTS (
            SELECT 1 FROM {n}{i}_nc x WHERE x.node = l.node AND x.c = l.comm
        )
    ),
    {n}{i}_gain AS MATERIALIZED (
        SELECT cand.node, cand.c, l.comm,
               {gd}2 * (SELECT m FROM {n}_m) * cand.kin
               - {gn}d.k * (st.stot - CASE WHEN cand.c = l.comm THEN d.k ELSE 0 END) AS g
        FROM {n}{i}_cand cand
        JOIN {n}{it} l ON l.node = cand.node
        JOIN {n}_deg d ON d.u = cand.node
        JOIN {n}{i}_stot st ON st.c = cand.c
    ),
    {n}{i} AS MATERIALIZED (
        SELECT g0.node,
               CASE WHEN (g0.node + {it}) % 2 = 0 AND b.g > g0.g
                    THEN b.c ELSE g0.comm END AS comm
        FROM (SELECT node, comm, g FROM {n}{i}_gain WHERE c = comm) g0
        JOIN (
            SELECT node, c, g FROM (
                SELECT node, c, g,
                       ROW_NUMBER() OVER (PARTITION BY node ORDER BY g DESC, c) AS rn
                FROM {n}{i}_gain
            ) r WHERE rn = 1
        ) b ON b.node = g0.node
    )""")
    return "".join(steps)


# ring of 25 triangles derived from nation (clique c of nationkey c owns
# nodes 3c..3c+2; one ring edge 3c -> 3((c+1) mod 25)): m = 100 puts the
# clique count past the sqrt(2m) ~ 14 resolution limit, so level-2
# community merges provably activate (Fortunato & Barthelemy) — the shape
# where maxLevels=1 and maxLevels=2 MUST differ.
_ML_RING_SRC = """
    SELECT LEAST(3*n + i, 3*n + j) AS a, GREATEST(3*n + i, 3*n + j) AS b,
           CAST(1 AS BIGINT) AS wfp
    FROM (SELECT CAST(n_nationkey AS BIGINT) AS n FROM nation),
         (VALUES (0, 1), (0, 2), (1, 2)) t(i, j)
    UNION ALL
    SELECT LEAST(3*n, 3*((n + 1) % (SELECT COUNT(*) FROM nation))) AS a,
           GREATEST(3*n, 3*((n + 1) % (SELECT COUNT(*) FROM nation))) AS b,
           CAST(1 AS BIGINT) AS wfp
    FROM (SELECT CAST(n_nationkey AS BIGINT) AS n FROM nation)
"""

# level-2 input: the level-1 graph aggregated by the lv4 labels — inter-
# community mass on (LEAST, GREATEST), intra-community mass on the
# diagonal as self-loops
_ML_AGG_SRC = """
    SELECT LEAST(la.comm, lb.comm) AS a, GREATEST(la.comm, lb.comm) AS b,
           SUM(u.wfp) AS wfp
    FROM lv_und u
    JOIN lv4 la ON la.node = u.a
    JOIN lv4 lb ON lb.node = u.b
    GROUP BY 1, 2
"""


@register(
    "louvain_multilevel_ring",
    _graph_cte(
        _louvain_rounds_cte(4, _ML_RING_SRC)
        + ", " + _louvain_sl_rounds_cte(4, _ML_AGG_SRC, "mv").lstrip().lstrip(",")
        + """
        SELECT l1.node, l2.comm AS community
        FROM lv4 l1 JOIN mv4 l2 ON l2.node = l1.comm
        """
    ),
)
def louvain_multilevel_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.louvain maxLevels=2 parity (r10): local moves -> community
    # aggregation (intra-community mass becomes SELF-LOOPS; degree x2 / m
    # contributions, never kin — they cancel out of the argmax) -> local
    # moves on the super-graph -> map back. The ring of 25 triangles sits
    # past the sqrt(2m) resolution limit, so level 2 provably merges
    # cliques a flat pass cannot (25 -> fewer communities; pinned
    # non-equal to louvain over the same edges in tests). All-integer
    # arithmetic end to end — the oracle replays both levels exactly.
    from eve_graph_spark.operators.graph_analytics import louvain_multilevel

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("n")
    )
    cnt = nation.groupBy().agg(F.count(F.lit(1)).alias("cnt"))
    pairs = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "i long, j long")
    intra = nation.crossJoin(F.broadcast(pairs)).select(
        (F.col("n") * 3 + F.col("i")).alias("src_system_id"),
        (F.col("n") * 3 + F.col("j")).alias("dst_system_id"),
    )
    ring = nation.crossJoin(F.broadcast(cnt)).select(
        (F.col("n") * 3).alias("src_system_id"),
        (((F.col("n") + 1) % F.col("cnt")) * 3).alias("dst_system_id"),
    )
    return louvain_multilevel(intra.unionByName(ring), levels=2, rounds=4)


@register(
    "louvain_gamma4_ring",
    _graph_cte(
        _louvain_rounds_cte(4, _ML_RING_SRC, gnum=4)
        + ", "
        + _louvain_sl_rounds_cte(4, _ML_AGG_SRC, "mv", gnum=4).lstrip().lstrip(",")
        + """
        SELECT l1.node, l2.comm AS community
        FROM lv4 l1 JOIN mv4 l2 ON l2.node = l1.comm
        """
    ),
)
def louvain_gamma4_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS resolution parameter in the hash-checked registry (r11 verdict
    # "missing" item 1): the SAME two-level ring as louvain_multilevel_ring
    # but at gamma=4 — the community-mass penalty is scaled 4x, which
    # suppresses exactly the resolution-limit merges level 2 performs at
    # gamma=1 (25 communities here vs 23 there; pinned different in
    # tests/test_round12_ops.py). gamma rides the integer gain as an
    # exact rational (g = gden*2m*kin - gnum*k*(stot - [own]k)), so the
    # unrolled oracle replays both levels bit-for-bit with gnum=4.
    from eve_graph_spark.operators.graph_analytics import louvain_multilevel

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("n")
    )
    cnt = nation.groupBy().agg(F.count(F.lit(1)).alias("cnt"))
    pairs = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "i long, j long")
    intra = nation.crossJoin(F.broadcast(pairs)).select(
        (F.col("n") * 3 + F.col("i")).alias("src_system_id"),
        (F.col("n") * 3 + F.col("j")).alias("dst_system_id"),
    )
    ring = nation.crossJoin(F.broadcast(cnt)).select(
        (F.col("n") * 3).alias("src_system_id"),
        (((F.col("n") + 1) % F.col("cnt")) * 3).alias("dst_system_id"),
    )
    return louvain_multilevel(
        intra.unionByName(ring), levels=2, rounds=4, gamma=4.0
    )


def _refine_cte(name: str, und: str, labels: str) -> str:
    """Leiden refinement replay: min-label connected components over the
    intra-community edges of `und` under `labels` (node, comm) — members
    with no intra edge become singletons. Emits `{name}` = (node, comm)."""
    return f"""
    {name}_intra AS MATERIALIZED (
        SELECT u.a, u.b FROM {und} u
        JOIN {labels} la ON la.node = u.a
        JOIN {labels} lb ON lb.node = u.b
        WHERE la.comm = lb.comm
    ),
    {name}_dir AS (
        SELECT a, b FROM {name}_intra
        UNION ALL SELECT b AS a, a AS b FROM {name}_intra
    ),
    {name}_seeds AS (
        SELECT DISTINCT a AS node FROM {name}_dir
    ),
    {name}_walk(node, label) AS (
        SELECT node, node FROM {name}_seeds
        UNION
        SELECT d.b, w.label FROM {name}_walk w JOIN {name}_dir d ON d.a = w.node
    ),
    {name} AS MATERIALIZED (
        SELECT node, MIN(label) AS comm FROM {name}_walk GROUP BY node
        UNION ALL
        SELECT l.node, l.node FROM {labels} l
        WHERE NOT EXISTS (SELECT 1 FROM {name}_seeds sd WHERE sd.node = l.node)
    )"""


# level-2 leiden input: the level-1 graph aggregated by the REFINED labels
_LEIDEN_AGG_SRC = """
    SELECT LEAST(la.comm, lb.comm) AS a, GREATEST(la.comm, lb.comm) AS b,
           SUM(u.wfp) AS wfp
    FROM lv_und u
    JOIN rf1 la ON la.node = u.a
    JOIN rf1 lb ON lb.node = u.b
    GROUP BY 1, 2
"""


@register(
    "leiden_communities",
    _graph_cte(
        _louvain_rounds_cte(4, _ML_RING_SRC)
        + ", " + _refine_cte("rf1", "lv_und", "lv4").lstrip()
        + ", " + _louvain_sl_rounds_cte(4, _LEIDEN_AGG_SRC, "mv").lstrip().lstrip(",")
        + ", " + _refine_cte("rf2", "mv_und", "mv4").lstrip()
        + """
        SELECT l1.node, r2.comm AS community
        FROM rf1 l1 JOIN rf2 r2 ON r2.node = l1.comm
        """
    ),
)
def leiden_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.leiden counterpart (r10), deterministic: per level, louvain
    # local moves -> REFINEMENT (split internally-disconnected communities
    # via min-label CC over intra-community edges — the Leiden guarantee
    # Louvain cannot make) -> self-loop aggregation; two levels on the
    # resolution-limit ring of 25 triangles. Fully unrolled: both louvain
    # chains plus BOTH refinement passes replay as recursive CTEs.
    from eve_graph_spark.operators.graph_analytics import leiden

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("n")
    )
    cnt = nation.groupBy().agg(F.count(F.lit(1)).alias("cnt"))
    pairs = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "i long, j long")
    intra = nation.crossJoin(F.broadcast(pairs)).select(
        (F.col("n") * 3 + F.col("i")).alias("src_system_id"),
        (F.col("n") * 3 + F.col("j")).alias("dst_system_id"),
    )
    ring = nation.crossJoin(F.broadcast(cnt)).select(
        (F.col("n") * 3).alias("src_system_id"),
        (((F.col("n") + 1) % F.col("cnt")) * 3).alias("dst_system_id"),
    )
    return leiden(intra.unionByName(ring), levels=2, rounds=4)


@register("louvain_communities", _louvain_unrolled_sql(4))
def louvain_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.louvain (maxLevels=1) parity on the mesh graph (regions are
    # real communities there: hub + members + intra-region ring). Fully
    # deterministic synchronous variant — all-integer modularity gains,
    # min-id tie-break, alternating move parity — so the unrolled SQL
    # oracle replays every round exactly.
    from eve_graph_spark.operators.graph_analytics import louvain

    mesh = build_mesh_edges(spark, sf_dir)
    return louvain(mesh, rounds=4)


_AR_ITER_SQL = """
ar{i} AS (
    SELECT n.node,
           (CAST(1.0 AS DOUBLE) - 0.85) / (SELECT n FROM ar_n)
           + 0.85 * (COALESCE(c.s, 0) / 1000000000000.0) AS rank
    FROM ar_nodes n LEFT JOIN (
        SELECT e.dst_system_id AS node,
               SUM(CAST(FLOOR(p.rank * (SELECT n FROM ar_n)
                              / (d.deg * (SELECT n FROM ar_n) + (SELECT m FROM ar_m))
                              * 1000000000000 + 0.5) AS BIGINT)) AS s
        FROM ar{prev} p JOIN ar_deg d ON d.node = p.node
                        JOIN fix_jumps e ON e.src_system_id = p.node
        GROUP BY 1
    ) c ON c.node = n.node
)"""


@register(
    "article_rank",
    _graph_cte(
        """
        , ar_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src_system_id AS node FROM fix_jumps
                UNION ALL SELECT dst_system_id FROM fix_jumps
            )
        ),
        ar_n AS (SELECT COUNT(*) AS n FROM ar_nodes),
        ar_m AS (SELECT COUNT(*) AS m FROM fix_jumps),
        ar_deg AS (SELECT src_system_id AS node, COUNT(*) AS deg FROM fix_jumps GROUP BY 1),
        ar0 AS (SELECT node, 1.0 / (SELECT n FROM ar_n) AS rank FROM ar_nodes),
        """
        + ",".join(_AR_ITER_SQL.format(i=i, prev=i - 1) for i in (1, 2, 3))
        + """
        SELECT node, rank FROM ar3
        """
    ),
)
def article_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.articleRank parity: pagerank with contributions damped by
    # (deg + avgDeg). avgDeg stays the exact rational m/n (multiplied
    # through to an integer denominator), so the per-step single division
    # is the identical IEEE op in both engines.
    from eve_graph_spark.operators.graph_analytics import article_rank

    jumps = build_jumps(spark, sf_dir, with_risk=False)
    return article_rank(jumps, iterations=3)


def _fastrp_unrolled_sql(dim: int, iterations: int) -> str:
    """DuckDB replay of deterministic FastRP
    (operators/graph_analytics.fastrp_embeddings): portable-md5 sparse
    init, per-iteration mean aggregation (fixed-point integer sums, two
    divisions in fixed order), per-node ℓ2 norm with left-to-right column
    order, final ℓ2-normalized sum of iterates."""
    js = list(range(dim))

    def init_expr(j: int) -> str:
        h = (f"(('0x' || substr(md5(CAST(u AS VARCHAR) || ':' || '{j}'), 1, 14))"
             f"::BIGINT % 6)")
        return (f"CAST(CASE WHEN {h} = 0 THEN 1.0 WHEN {h} = 1 THEN -1.0 "
                f"ELSE 0.0 END AS DOUBLE) AS x{j}")

    def norm2(prefix: str) -> str:
        return " + ".join(f"{prefix}{j} * {prefix}{j}" for j in js)

    steps = ["""
    , fr_und AS MATERIALIZED (
        SELECT DISTINCT LEAST(src_system_id, dst_system_id) AS a,
                        GREATEST(src_system_id, dst_system_id) AS b
        FROM fix_jumps WHERE src_system_id <> dst_system_id
    ),
    fr_adj AS MATERIALIZED (
        SELECT a AS u, b AS v FROM fr_und UNION ALL SELECT b AS u, a AS v FROM fr_und
    ),
    fr_deg AS MATERIALIZED (SELECT u, COUNT(*) AS deg FROM fr_adj GROUP BY u),
    fr0 AS MATERIALIZED (SELECT u AS node, """
             + ", ".join(init_expr(j) for j in js)
             + " FROM fr_deg)"]
    for i in range(1, iterations + 1):
        sums = ", ".join(
            f"SUM(CAST(FLOOR(x.x{j} * 1000000.0 + 0.5) AS BIGINT)) AS s{j}"
            for j in js
        )
        means = ", ".join(
            f"CAST(s.s{j} AS DOUBLE) / d.deg / 1000000.0 AS m{j}" for j in js
        )
        outs = ", ".join(
            f"CASE WHEN SQRT({norm2('m')}) > 0 THEN m{j} / SQRT({norm2('m')}) "
            f"ELSE 0.0 END AS x{j}"
            for j in js
        )
        steps.append(f"""
    , fr{i}_s AS MATERIALIZED (
        SELECT a.u AS node, {sums}
        FROM fr_adj a JOIN fr{i - 1} x ON x.node = a.v GROUP BY 1
    ),
    fr{i}_m AS MATERIALIZED (
        SELECT s.node, {means} FROM fr{i}_s s JOIN fr_deg d ON d.u = s.node
    ),
    fr{i} AS MATERIALIZED (SELECT node, {outs} FROM fr{i}_m)""")
        accs = ", ".join(
            (f"x.x{j} AS a{j}" if i == 1 else f"p.a{j} + x.x{j} AS a{j}") for j in js
        )
        prev_join = "" if i == 1 else f" JOIN fr_acc{i - 1} p ON p.node = x.node"
        steps.append(f"""
    , fr_acc{i} AS MATERIALIZED (
        SELECT x.node, {accs} FROM fr{i} x{prev_join}
    )""")
    finals = ", ".join(
        f"CASE WHEN SQRT({norm2('a')}) > 0 THEN a{j} / SQRT({norm2('a')}) "
        f"ELSE 0.0 END AS e{j}"
        for j in js
    )
    steps.append(f" SELECT node, {finals} FROM fr_acc{iterations}")
    return _graph_cte("".join(steps))


@register("fastrp_embeddings", _fastrp_unrolled_sql(8, 2))
def fastrp_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.fastRP parity: 8-dim structural node embeddings — sparse
    # portable-md5 random projection, two mean-aggregation + ℓ2-normalize
    # iterations, final normalized iterate sum. Flat e0..e7 columns (SQL-
    # expressible, Parquet-prunable). Raw doubles replay bit-for-bit: the
    # only float ops are divisions and sqrts over exact integers in a
    # pinned expression order.
    from eve_graph_spark.operators.graph_analytics import fastrp_embeddings

    jumps = build_jumps(spark, sf_dir, with_risk=False)
    return fastrp_embeddings(jumps, dim=8, iterations=2)


@register(
    "degree_assortativity",
    _graph_cte(
        """
        , da_deg AS (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT src_system_id AS node FROM fix_jumps
                UNION ALL SELECT dst_system_id FROM fix_jumps
            ) d GROUP BY node
        ),
        da_pairs AS (
            SELECT a.deg AS x, b.deg AS y
            FROM fix_jumps e
            JOIN da_deg a ON a.node = e.src_system_id
            JOIN da_deg b ON b.node = e.dst_system_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                    - SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT)) AS DOUBLE)
                 / sqrt(CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                             - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT)) AS DOUBLE))
                 / sqrt(CAST(COUNT(*) * SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                             - SUM(CAST(y AS HUGEINT)) * SUM(CAST(y AS HUGEINT)) AS DOUBLE))
                 AS assortativity
        FROM da_pairs
        """
    ),
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Newman's degree assortativity: Pearson correlation of (total) degree
    # across the directed edge list — do high-degree systems link to other
    # high-degree systems? Same exact-integer sufficient-statistics device
    # as price_quantity_corr (Σx, Σy, Σxy, Σx², Σy² in 128-bit, two sqrts
    # + two divisions on identical doubles). One degree shuffle + one
    # broadcast-degree edge join + one partial-agg shuffle.
    jumps = build_jumps(spark, sf_dir, with_risk=False)
    deg = (
        jumps.select(F.col("src_system_id").alias("node"))
        .unionByName(jumps.select(F.col("dst_system_id").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    )
    pairs = (
        jumps.join(deg.select(F.col("node").alias("src_system_id"),
                              F.col("deg").alias("x")), "src_system_id")
        .join(deg.select(F.col("node").alias("dst_system_id"),
                         F.col("deg").alias("y")), "dst_system_id")
        .select("x", "y")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)"))).alias("sxy"),
        F.sum((F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)"))).alias("sxx"),
        F.sum((F.col("y").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)"))).alias("syy"),
    )
    nD = F.col("n").cast("decimal(38,0)")
    cov = (nD * F.col("sxy") - F.col("sx").cast("decimal(38,0)")
           * F.col("sy").cast("decimal(38,0)")).cast("double")
    vx = (nD * F.col("sxx") - F.col("sx").cast("decimal(38,0)")
          * F.col("sx").cast("decimal(38,0)")).cast("double")
    vy = (nD * F.col("syy") - F.col("sy").cast("decimal(38,0)")
          * F.col("sy").cast("decimal(38,0)")).cast("double")
    return agg.select(
        F.col("n").alias("n_edges"),
        (cov / F.sqrt(vx) / F.sqrt(vy)).alias("assortativity"),
    )


@register(
    "graph_stats",
    _graph_cte(
        """
        , gs_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src_system_id AS node FROM fix_jumps
                UNION ALL SELECT dst_system_id FROM fix_jumps
            ) s
        ),
        gs_deg AS (
            SELECT n.node, COALESCE(d.deg, 0) AS deg
            FROM gs_nodes n LEFT JOIN (
                SELECT src_system_id AS node, COUNT(*) AS deg
                FROM fix_jumps GROUP BY 1
            ) d ON d.node = n.node
        ),
        gs_m AS (SELECT COUNT(*) AS m FROM fix_jumps),
        gs_n AS (SELECT COUNT(*) AS n FROM gs_nodes)
        SELECT (SELECT n FROM gs_n) AS n_nodes,
               (SELECT m FROM gs_m) AS n_edges,
               CAST(FLOOR(1000000 * (SELECT m FROM gs_m)
                          / ((SELECT n FROM gs_n) * ((SELECT n FROM gs_n) - 1)))
                    AS BIGINT) AS density_fp,
               CAST(MIN(deg) AS BIGINT) AS min_out_degree,
               CAST(MAX(deg) AS BIGINT) AS max_out_degree,
               CAST(FLOOR(1000000 * (SELECT m FROM gs_m) / (SELECT n FROM gs_n))
                    AS BIGINT) AS avg_out_degree_fp
        FROM gs_deg
        """
    ),
)
def graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gds.graph.list-style summary: node/edge counts, directed density,
    # out-degree min/max/mean — the sanity panel a graph operator reads
    # before picking algorithms (label vs star CC, landmark counts).
    # Integer counters + two fixed-point divisions; one degree shuffle.
    jumps = build_jumps(spark, sf_dir, with_risk=False)
    nodes = (
        jumps.select(F.col("src_system_id").alias("node"))
        .unionByName(jumps.select(F.col("dst_system_id").alias("node")))
        .distinct()
    )
    deg = nodes.join(
        jumps.groupBy(F.col("src_system_id").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg")),
        "node", "left",
    ).select("node", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
    m = jumps.count()
    n = nodes.count()
    return deg.agg(
        F.lit(n).cast("long").alias("n_nodes"),
        F.lit(m).cast("long").alias("n_edges"),
        F.floor(F.lit(1000000) * F.lit(m) / F.lit(n * (n - 1))).cast("long").alias("density_fp"),
        F.min("deg").cast("long").alias("min_out_degree"),
        F.max("deg").cast("long").alias("max_out_degree"),
        F.floor(F.lit(1000000) * F.lit(m) / F.lit(n)).cast("long").alias("avg_out_degree_fp"),
    )


@register("louvain_weighted", _louvain_unrolled_sql(4, weighted=True))
def louvain_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weighted Louvain (GDS relationshipWeightProperty) on the
    # risk-weighted jump graph: modularity over fixed-point edge weights —
    # k / Σtot / k_in / m are weight sums, gains stay all-integer. Same
    # deterministic synchronous rounds as louvain_communities.
    from eve_graph_spark.operators.graph_analytics import louvain

    jumps = build_jumps(spark, sf_dir)
    return louvain(jumps, rounds=4, weight_col="risk")


_K1_ROUND_SQL = """
k1u{i} AS MATERIALIZED (
    SELECT p.node, p.prio FROM k1_prio p
    WHERE NOT EXISTS (SELECT 1 FROM kcol{prev} c WHERE c.node = p.node)
),
k1r{i} AS MATERIALIZED (
    SELECT u.node FROM k1u{i} u WHERE NOT EXISTS (
        SELECT 1 FROM k1_adj a JOIN k1u{i} w ON w.node = a.v
        WHERE a.u = u.node
          AND (w.prio > u.prio OR (w.prio = u.prio AND w.node > u.node))
    )
),
k1m{i} AS MATERIALIZED (
    SELECT cand.node, MIN(cand.k) AS color FROM (
        SELECT r.node, g.k FROM k1r{i} r
        JOIN k1_deg d ON d.node = r.node
        JOIN k1_ks g ON g.k <= d.deg
    ) cand
    WHERE NOT EXISTS (
        SELECT 1 FROM k1_adj a JOIN kcol{prev} c ON c.node = a.v
        WHERE a.u = cand.node AND c.color = cand.k
    )
    GROUP BY cand.node
),
kcol{i} AS MATERIALIZED (
    SELECT node, color FROM kcol{prev}
    UNION ALL SELECT node, color FROM k1m{i}
)"""


@register(
    "k1_coloring",
    _graph_cte(
        ", " + _MESH_BODY + """,
        k1_und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src_system_id, dst_system_id) AS a,
                            GREATEST(src_system_id, dst_system_id) AS b
            FROM fix_mesh WHERE src_system_id <> dst_system_id
        ),
        k1_adj AS MATERIALIZED (
            SELECT a AS u, b AS v FROM k1_und
            UNION ALL SELECT b AS u, a AS v FROM k1_und
        ),
        k1_deg AS MATERIALIZED (SELECT u AS node, COUNT(*) AS deg FROM k1_adj GROUP BY u),
        k1_prio AS MATERIALIZED (
            SELECT node,
                   CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 14)) AS BIGINT)
                       AS prio
            FROM k1_deg
        ),
        k1_ks AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
        kcol0 AS (
            SELECT CAST(NULL AS BIGINT) AS node, CAST(NULL AS BIGINT) AS color
            WHERE FALSE
        ),
        """
        + ",".join(_K1_ROUND_SQL.format(i=i, prev=i - 1) for i in range(1, 13))
        + """
        SELECT node, color FROM kcol12
        """
    ),
)
def k1_coloring_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.beta.k1coloring parity on the mesh graph (triangles force a
    # chromatic number >= 3): deterministic Jones-Plassmann — portable-md5
    # hash priorities, mex colors, O(log n) expected rounds. The unrolled
    # oracle replays each round's independent ready set and mex exactly;
    # over-unrolled rounds past completion are no-ops.
    from eve_graph_spark.operators.graph_analytics import k1_coloring

    mesh = build_mesh_edges(spark, sf_dir)
    return k1_coloring(mesh, max_rounds=12)


_SLLPA_ROUND_SQL = """
sl{i}_spoken AS MATERIALIZED (
    SELECT node AS v, label AS spoken FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
        FROM slmem{prev}
    ) t WHERE rn = 1
),
sl{i}_listen AS MATERIALIZED (
    SELECT node, label FROM (
        SELECT a.u AS node, s.spoken AS label, {vote} AS c,
               ROW_NUMBER() OVER (PARTITION BY a.u
                                  ORDER BY {vote} DESC, s.spoken {tie}) AS rn
        FROM sl_adj a JOIN sl{i}_spoken s ON s.v = a.v
        GROUP BY a.u, s.spoken
    ) t WHERE rn = 1
),
slmem{i} AS MATERIALIZED (
    SELECT node, label, SUM(cnt) AS cnt FROM (
        SELECT node, label, cnt FROM slmem{prev}
        UNION ALL SELECT node, label, CAST(1 AS BIGINT) FROM sl{i}_listen
    ) u GROUP BY node, label
)"""


@register(
    "sllpa_overlapping",
    _graph_cte(
        ", " + _MESH_BODY + """,
        sl_und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src_system_id, dst_system_id) AS a,
                            GREATEST(src_system_id, dst_system_id) AS b
            FROM fix_mesh WHERE src_system_id <> dst_system_id
        ),
        sl_adj AS MATERIALIZED (
            SELECT a AS u, b AS v FROM sl_und
            UNION ALL SELECT b AS u, a AS v FROM sl_und
        ),
        slmem0 AS MATERIALIZED (
            SELECT u AS node, u AS label, CAST(1 AS BIGINT) AS cnt
            FROM (SELECT DISTINCT u FROM sl_adj) n
        ),
        """
        + ",".join(
            _SLLPA_ROUND_SQL.format(i=i, prev=i - 1, vote="COUNT(*)",
                                    tie="ASC" if (i - 1) % 2 == 0 else "DESC")
            for i in range(1, 6)
        )
        + """
        SELECT node, label, CAST(cnt AS BIGINT) AS cnt FROM slmem5 WHERE cnt >= 2
        """
    ),
)
def sllpa_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS gds.sllpa parity: speaker-listener label propagation with
    # OVERLAPPING memberships — a node evenly pulled between communities
    # keeps both labels (the alternating tie-break device; fixed min-tie
    # would starve the second membership). 5 deterministic rounds on the
    # mesh graph, memberships = memory counts >= 2.
    from eve_graph_spark.operators.graph_analytics import sllpa

    mesh = build_mesh_edges(spark, sf_dir)
    return sllpa(mesh, rounds=5, min_count=2)


@register(
    "sllpa_weighted",
    _graph_cte(
        """,
        slw_und AS MATERIALIZED (
            SELECT LEAST(src_system_id, dst_system_id) AS a,
                   GREATEST(src_system_id, dst_system_id) AS b,
                   MIN(CAST(FLOOR(risk * 1000000 + 0.5) AS BIGINT)) AS wfp
            FROM fix_jumps WHERE src_system_id <> dst_system_id
            GROUP BY 1, 2
        ),
        sl_adj AS MATERIALIZED (
            SELECT a AS u, b AS v, wfp FROM slw_und
            UNION ALL SELECT b AS u, a AS v, wfp FROM slw_und
        ),
        slmem0 AS MATERIALIZED (
            SELECT u AS node, u AS label, CAST(1 AS BIGINT) AS cnt
            FROM (SELECT DISTINCT u FROM sl_adj) n
        ),
        """
        + ",".join(
            _SLLPA_ROUND_SQL.format(i=i, prev=i - 1, vote="SUM(a.wfp)",
                                    tie="ASC" if (i - 1) % 2 == 0 else "DESC")
            for i in range(1, 6)
        )
        + """
        SELECT node, label, CAST(cnt AS BIGINT) AS cnt FROM slmem5 WHERE cnt >= 2
        """
    ),
)
def sllpa_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weighted SLLPA (r9 verdict item 8): the LISTEN step votes with 1e-6
    # fixed-point risk weights (undirected weight = MIN across collapsed
    # directed edges, the louvain/MST convention) on the risk-weighted
    # jump graph — the weighted SLPA form (Xie & Szymanski); memory
    # increments stay 1, memberships = memory counts >= 2. Same
    # deterministic synchronous rounds/tie devices as sllpa_overlapping,
    # so the unrolled SQL oracle replays every round exactly.
    from eve_graph_spark.operators.graph_analytics import sllpa

    jumps = build_jumps(spark, sf_dir)
    return sllpa(jumps, rounds=5, min_count=2, weight_col="risk")


_KNN_EDGES_SQL = """
    , pos AS (SELECT unnest(range(1, 65)) AS pos),
    kg_emb AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id < 100 AND embedding IS NOT NULL AND len(embedding) = 64
    ),
    kg_cand AS MATERIALIZED (
        SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS cval FROM kg_emb, pos
    ),
    kg_dots AS MATERIALIZED (
        SELECT q.vec_id AS query_id, c.vec_id,
               SUM(CAST(FLOOR(c.cval * q.cval * 1000000000 + 0.5) AS BIGINT))
                   / 1000000000.0 AS dot
        FROM kg_cand c JOIN kg_cand q USING (pos)
        WHERE c.vec_id <> q.vec_id
        GROUP BY q.vec_id, c.vec_id
    ),
    kg_norms AS MATERIALIZED (
        SELECT vec_id AS nid,
               SUM(CAST(FLOOR(cval * cval * 1000000000 + 0.5) AS BIGINT))
                   / 1000000000.0 AS sqnorm
        FROM kg_cand GROUP BY vec_id
    ),
    kg_top AS MATERIALIZED (
        SELECT query_id, vec_id FROM (
            SELECT d.query_id, d.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.query_id
                       ORDER BY d.dot / (sqrt(qn.sqnorm) * sqrt(cn.sqnorm)) DESC,
                                d.vec_id
                   ) AS rank
            FROM kg_dots d
            JOIN kg_norms qn ON qn.nid = d.query_id
            JOIN kg_norms cn ON cn.nid = d.vec_id
        ) t WHERE rank <= 5
    ),
    knn_edges AS MATERIALIZED (
        SELECT DISTINCT LEAST(query_id, vec_id) AS a,
                        GREATEST(query_id, vec_id) AS b,
                        CAST(1 AS BIGINT) AS wfp
        FROM kg_top
    )"""


@register(
    "knn_graph_communities",
    _graph_cte(
        _KNN_EDGES_SQL
        + _louvain_rounds_cte(4, "SELECT a, b, wfp FROM knn_edges")
        + " SELECT node, comm AS community FROM lv4"
    ),
)
def knn_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The composite the ANN and graph stacks exist for: semantic document
    # clustering. Exact-fixed-point cosine top-5 over the first 100
    # embedding vectors builds a kNN similarity graph (the GDS gds.knn →
    # graph pattern); deterministic Louvain then finds the semantic
    # communities. At scale the brute-force stage swaps for ann_ivf /
    # ann_lsh (same output contract: (query_id, vec_id) pairs) — the
    # graph stage is unchanged.
    from eve_graph_spark.operators.graph_analytics import louvain
    from eve_graph_spark.operators.similarity import brute_force_topk

    emb = spread(load_table(spark, sf_dir, "embeddings")).filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
        & (F.col("vec_id") < 100)
    )
    topk = brute_force_topk(emb, list(range(100)), k=5, exact_fixed_point=True)
    edges = topk.select(F.col("query_id").alias("src"), F.col("vec_id").alias("dst"))
    return louvain(edges, rounds=4, src_col="src", dst_col="dst")
