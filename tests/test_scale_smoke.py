"""Scale smoke: the distributed Pregel paths on a 200k-edge graph.

The unit tests exercise the distributed loops on toy graphs; this proves
they hold up (converge, stay correct, don't blow lineage) at a size where
the iteration count and shuffle volume are real — and pins them against
the driver-local fast path, which is the bit-identical reference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eve_graph_spark.operators.graph import sssp
from eve_graph_spark.operators.graph_analytics import connected_components

N_NODES, N_EDGES = 50_000, 200_000


def _random_graph(spark):
    # deterministic hash-derived edge list (no rand(): reproducible)
    return (
        spark.range(N_EDGES)
        .select(
            F.abs(F.xxhash64("id") % N_NODES).alias("src"),
            F.abs(F.xxhash64("id", F.lit(1)) % N_NODES).alias("dst"),
        )
        .withColumn("w", F.lit(1.0))
    )


def test_distributed_sssp_matches_local_at_200k_edges(spark):
    e = _random_graph(spark)
    local = {r["node"]: r["dist"] for r in sssp(e, [0], weight_col="w",
                                                src_col="src", dst_col="dst").collect()}
    dist = {r["node"]: r["dist"] for r in sssp(e, [0], weight_col="w", src_col="src",
                                               dst_col="dst", driver_threshold=0).collect()}
    assert dist == local
    assert len(dist) > N_NODES * 0.9  # giant component reached


def test_distributed_components_match_local_at_200k_edges(spark):
    e = _random_graph(spark)
    sym = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    local = {r["node"]: r["component"] for r in
             connected_components(sym, src_col="src", dst_col="dst").collect()}
    dist = {r["node"]: r["component"] for r in
            connected_components(sym, src_col="src", dst_col="dst",
                                 driver_threshold=0).collect()}
    assert dist == local
