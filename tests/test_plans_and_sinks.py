"""Plan-shape regression suite + sink round-trips.

Correctness says what a query returns; these tests pin HOW it executes —
the properties that decide whether the same plan survives a 100 TB input:
filters pushed into the parquet scan, dimensions broadcast instead of
shuffled, projections pruned to the read schema, codegen engaged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eve_graph_spark import queries as registry
from eve_graph_spark.sinks import read_back, write_partitioned
from eve_graph_spark.sources.graph_fixture import build_jumps
from eve_graph_spark.sources.tables import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(registry.q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_q1_whole_stage_codegen(spark, sf_dir):
    # AQE defers the physical plan, hiding codegen pre-execution — turn it
    # off just to assert the aggregation pipeline compiles to one stage
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = registry.q1_pricing_summary(spark, sf_dir)
        s = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
        )
        assert "WholeStageCodegen subtrees" in s and "Found 0" not in s
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_point_lookup_pushes_equality(spark, sf_dir):
    plan = plan_of(registry.queries()["point_lookup"](spark, sf_dir))
    assert "EqualTo(s_suppkey,7)" in plan.replace(" ", "")


def test_projection_scan_prunes_columns(spark, sf_dir):
    plan = plan_of(registry.queries()["projection_scan"](spark, sf_dir))
    # ReadSchema carries only the projected column — no full-width read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read_schema
    assert "o_totalprice" not in read_schema and "o_custkey" not in read_schema


def test_q3_q5_broadcast_dimensions(spark, sf_dir):
    for name in ("q3_shipping_priority", "q5_local_supplier_volume"):
        plan = plan_of(registry.queries()[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        # the fact table must NOT be broadcast: lineitem feeds the probe side
        assert "SortMergeJoin" in plan or plan.count("BroadcastHashJoin") >= 1


def test_top_k_plans_take_ordered(spark, sf_dir):
    # orderBy().limit() must plan TakeOrderedAndProject — a full sort of
    # the table at 100 TB would be the bug this test exists to catch
    plan = plan_of(registry.queries()["top_k_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_anti_join_delete_is_broadcast(spark, sf_dir):
    plan = plan_of(registry.queries()["anti_join_remove"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_dedup_partial_aggregation(spark, sf_dir):
    # dropDuplicates must partial-aggregate before the shuffle (two
    # HashAggregate nodes around the Exchange), not ship raw rows
    plan = plan_of(
        load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").dropDuplicates()
    )
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_registry_wide_no_cartesian_products(spark, sf_dir):
    """Every registered query's physical plan must be free of
    CartesianProduct, and any BroadcastNestedLoopJoin must be marked
    Cross — the two intentional shapes: a 1-row scalar broadcast, or a
    broadcast query-batch x corpus scan (hard_negatives_topk's brute
    force). An Inner/Outer BNLJ means an equi-join failed to plan as
    one, which is the O(n·m) bug this test exists to catch at review
    time instead of at 100 TB."""
    offenders = {}
    for name, fn in sorted(registry.queries().items()):
        plan = plan_of(fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
            continue
        for seg in plan.split("BroadcastNestedLoopJoin")[1:]:
            # tree form: "... Cross BuildRight (6)"; detail form follows
            # with "Join type: Cross" — either marks the scalar broadcast
            head = seg[:80]
            if "Cross" not in head:
                offenders[name] = f"non-Cross BNLJ: {head!r}"
                break
    assert not offenders, offenders


@pytest.mark.parametrize(
    "name", ["dedup_pipeline_documents", "dedup_survivors_quality"]
)
def test_dedup_cluster_join_not_forced_broadcast(spark, sf_dir, name, monkeypatch):
    """Cluster membership (cc output) is O(corpus) at crawl scale — the
    member join must NOT carry a broadcast hint. With the auto-broadcast
    threshold off, the plan must fall back to a keyed shuffle join; a
    BroadcastExchange surviving threshold=-1 can only come from a hint,
    which is exactly the 100 TB OOM this test pins out.

    r14: near_dup_clusters gained a driver-local branch that absorbs the
    fixture into a LocalRelation — this test pins the DISTRIBUTED plan,
    so it runs under the forced-distributed switch."""
    from eve_graph_spark.operators.graph import clear_probe_cache

    monkeypatch.setenv("SPARK_GRAFT_FORCE_DISTRIBUTED", "1")
    clear_probe_cache()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(registry.queries()[name](spark, sf_dir))
        assert "BroadcastExchange" not in plan, name
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        monkeypatch.delenv("SPARK_GRAFT_FORCE_DISTRIBUTED")
        clear_probe_cache()


def _single_partition_inputs(plan: str) -> list[str]:
    """The `Input [...]` column list of every physical node that exchanges
    to SinglePartition — the columns tell whether the node is data-sized
    (customer rows) or K-row metadata (per-partition counts/sums)."""
    inputs = []
    for block in plan.split("\n\n"):
        if "SinglePartition" in block:
            for line in block.splitlines():
                if line.startswith("Input"):
                    inputs.append(line)
    return inputs


@pytest.mark.parametrize(
    ("name", "meta_cols"),
    [
        ("customer_spend_quartiles", ("__cnt",)),
        ("token_budget_sample", ("__s",)),
        ("quality_deciles", ("__cnt",)),
    ],
)
def test_global_rank_queries_no_data_sized_single_partition(spark, sf_dir, name, meta_cols):
    """The global prefix-sum/rank must be computed distributed: range
    shuffle + per-partition offsets, with the offsets a K-row frame
    (K = range partitions) broadcast-joined back. A global Window.orderBy
    over the DATA would plan an Exchange SinglePartition of every row
    through one task at 100 TB. The only SinglePartition allowed is the
    K-row offsets branch — pinned by its column set (per-partition
    count/sum, never the data columns)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(registry.queries()[name](spark, sf_dir))
        assert "rangepartitioning" in plan.lower()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        for inp in _single_partition_inputs(plan):
            # K-row metadata branch only: carries the per-partition agg
            # column and never a data column (text, o_custkey, doc_id)
            assert any(c in inp for c in meta_cols), inp
            assert "o_custkey" not in inp and "doc_id" not in inp, inp
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_partitioned_sink_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "jumps_by_kind")
    jumps = build_jumps(spark, sf_dir)
    write_partitioned(jumps, path, ["kind"])
    back = read_back(spark, path)
    assert back.count() == jumps.count()
    # partition pruning: a kind= filter must read only that directory
    pruned = back.filter(F.col("kind") == "wormhole")
    files = pruned.select(F.input_file_name()).distinct().collect()
    assert all("kind=wormhole" in r[0] for r in files)
    assert pruned.count() == jumps.filter(F.col("kind") == "wormhole").count()


def test_dynamic_partition_overwrite_touches_one_partition(spark, sf_dir, tmp_path):
    path = str(tmp_path / "jumps_dyn")
    jumps = build_jumps(spark, sf_dir)
    write_partitioned(jumps, path, ["kind"])
    gate_rows = jumps.filter(F.col("kind") == "gate").count()
    # overwrite ONLY the wormhole partition with an empty-ish refresh
    refresh = jumps.filter(F.col("kind") == "wormhole").limit(1)
    write_partitioned(refresh, path, ["kind"])
    back = read_back(spark, path)
    assert back.filter(F.col("kind") == "gate").count() == gate_rows  # untouched
    assert back.filter(F.col("kind") == "wormhole").count() == 1


def test_bucketed_table_join_avoids_shuffle(spark, sf_dir, tmp_path):
    from eve_graph_spark.sinks import write_bucketed

    spark.sql("DROP TABLE IF EXISTS jumps_bucketed")
    spark.sql("DROP TABLE IF EXISTS jumps_bucketed_b")
    jumps = build_jumps(spark, sf_dir)
    write_bucketed(jumps, "jumps_bucketed", "src_system_id", 4)
    write_bucketed(jumps, "jumps_bucketed_b", "src_system_id", 4)
    a = spark.table("jumps_bucketed")
    b = spark.table("jumps_bucketed_b").select(
        F.col("src_system_id"), F.col("dst_system_id").alias("d2")
    )
    with pytest.MonkeyPatch.context() as mp:
        # disable broadcast so the join would need an exchange if the
        # bucketing were ignored
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = plan_of(a.join(b, "src_system_id"))
            sections = plan.split("== Physical Plan ==")[1]
            assert "SortMergeJoin" in sections
            # bucketed-bucketed join on the bucket key: no Exchange
            assert "Exchange hashpartitioning(src_system_id" not in sections
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS jumps_bucketed")
    spark.sql("DROP TABLE IF EXISTS jumps_bucketed_b")


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    from eve_graph_spark import queries as registry

    plan = plan_of(registry.queries()["decontaminate_documents"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_curation_topk_plans_take_ordered_or_window(spark, sf_dir):
    from eve_graph_spark import queries as registry

    # the final sample is a bounded window (rn<=100) — the plan must not
    # contain a global Sort over the full corpus without a limit
    plan = plan_of(registry.queries()["corpus_curation_pipeline"](spark, sf_dir))
    assert "Window" in plan


def test_q21_single_fact_scan(spark, sf_dir):
    # The EXISTS/NOT-EXISTS decorrelation scanned lineitem 3x (late set +
    # semi probe + anti probe). The aggregate rewrite pins: ONE lineitem
    # scan, no semi/anti joins, supplier on the broadcast side, and no
    # Expand (the multi-countDistinct form would triple the shuffle).
    from eve_graph_spark import queries as registry

    plan = plan_of(registry.queries()["q21_waiting_suppliers"](spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, plan.count("lineitem.parquet")
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Expand" not in plan


def test_rolling_30d_uses_range_frame(spark, sf_dir):
    from eve_graph_spark import queries as registry

    plan = plan_of(registry.queries()["rolling_30d_customer_spend"](spark, sf_dir))
    assert "RANGE BETWEEN" in plan or "specifiedwindowframe(RangeFrame" in plan


def test_fuzzy_match_is_equi_join_not_cartesian(spark, sf_dir):
    from eve_graph_spark import queries as registry

    plan = plan_of(registry.queries()["fuzzy_match_customers"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_exact_ann_corpus_subtrees_planned_once(spark, sf_dir):
    # The exact fixed-point ANN pipelines touch the corpus through three
    # posexplode subtrees: candidate dot products, the query batch, and
    # corpus norms. Two past regressions multiplied that: (a) ann_ivf's
    # recall harness branched the brute-force result, re-planning the whole
    # pipeline per branch; (b) query-side norms were a RENAMED COPY of the
    # corpus-norms aggregate — planned twice AND broadcast corpus-sized.
    # Pinning "exactly the 3 structural explodes" catches both shapes, and
    # the no-corpus-broadcast assert catches (b)'s scale hazard directly.
    for name in ("ann_ivf_topk", "hard_negatives_topk"):
        plan = plan_of(registry.queries()[name](spark, sf_dir))
        assert plan.count("posexplode") <= 3, (name, plan.count("posexplode"))
