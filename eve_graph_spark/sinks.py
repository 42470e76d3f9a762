"""Sinks — how engine tables land on storage at 100 TB.

The reference's only sink is Neo4j CREATE/SET over Bolt (reference:
src/database.rs:98-135, :256-292); the Spark engine's durable form is
parquet with an explicit layout contract:

- **systems** (vertices): partition by `constellation_id` region bucket —
  point lookups prune to one partition, full scans stay parallel.
- **jumps** (edges): bucket by `src_system_id` — the SSSP frontier join
  and any edge-keyed upsert co-locate without a shuffle when both sides
  share the bucketing (Spark SQL bucketed join).
- **mutations**: the engine's keyed updates (W6-W8) produce a full new
  snapshot DataFrame; `overwrite_snapshot` writes it atomically via a
  staging directory + rename, the parquet analogue of the reference's
  transactional SET.

`dynamic` partition overwrite only rewrites partitions present in the
incoming DataFrame — the 100 TB-friendly mode for incremental refresh
(only regions whose systems changed are touched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite", dynamic: bool = True) -> None:
    """Partitioned parquet write; `dynamic=True` limits an overwrite to the
    partitions present in `df` (incremental refresh, W6-W8 overwrite)."""
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if dynamic and mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str, num_buckets: int = 32,
                   sort_col: str | None = None, mode: str = "overwrite") -> None:
    """Bucketed managed table (saveAsTable — bucketing metadata needs the
    catalog). Joins/aggregations keyed on `bucket_col` between two tables
    bucketed the same way run shuffle-free; this is the layout for the
    edge table keyed by src_system_id."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table, format="parquet")


def overwrite_snapshot(df: DataFrame, path: str) -> None:
    """Full-snapshot overwrite for un-partitioned tables (small dims)."""
    df.write.mode("overwrite").parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_ivf_index(index: DataFrame, model: dict, path: str) -> None:
    """Persist an ANN index as a CELL-PARTITIONED parquet table plus a
    model.json sidecar (SCALE.md layout: "embeddings bucketed by IVF cell
    id"). `index` is ivf_pq_index's (id, cell, codes) or ivf_index's
    (id, vec, cell); `model` carries the centroids/codebooks the query
    path needs driver-side.

    Partitioning by cell is what makes the probe stage's literal
    cell-filter (ivf_topk_from_index / ivf_pq_topk) STATIC partition
    pruning: a query scans n_probe directories of the index, never the
    corpus — the FAISS deployment shape expressed as a parquet layout.
    The model sidecar is centroid-sized (KBs); on an object store it
    rides next to the partition directories.
    """
    write_ann_index(index, model, path, partition_col="cell")


def write_ann_index(index: DataFrame, model: dict, path: str,
                    partition_col: str) -> None:
    """Shared ANN-index layout: `partition_col`-partitioned parquet plus a
    model.json sidecar. IVF/IVF-PQ partition by coarse `cell`
    (write_ivf_index), hyperplane LSH by `bucket` (write_lsh_index) —
    either way a probe's literal partition-key filter is static partition
    pruning, the property both query-from-index paths plan-pin."""
    import json
    from pathlib import Path

    index.write.mode("overwrite").partitionBy(partition_col).parquet(f"{path}/index")
    p = Path(path) / "model.json"
    # "_"-prefixed keys are session-only carry (e.g. ivf_pq_index's
    # _corpus_rows collect reuse) — not part of the persisted contract,
    # and not JSON-serializable
    p.write_text(json.dumps({k: v for k, v in model.items() if not k.startswith("_")}))


def write_lsh_index(index: DataFrame, model: dict, path: str) -> None:
    """Persist a hyperplane-LSH ANN index (similarity.lsh_index) as a
    BUCKET-PARTITIONED parquet table + model.json (the hyperplanes) —
    the "embeddings bucketed by LSH bucket" layout promise. A query
    reads exactly its bucket's directory (`lsh_topk_from_index`)."""
    write_ann_index(index, model, path, partition_col="bucket")


def read_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Load a write_ivf_index layout: (index DataFrame, model dict). The
    returned frame is partition-pruned by any literal `cell` predicate —
    the probe paths rely on that."""
    import json
    from pathlib import Path

    index = spark.read.parquet(f"{path}/index")
    model = json.loads((Path(path) / "model.json").read_text())
    return index, model


# the read path is layout-agnostic (parquet dir + model sidecar): the same
# loader serves every write_ann_index layout
read_ann_index = read_ivf_index
read_lsh_index = read_ivf_index
