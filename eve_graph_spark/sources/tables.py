"""Loaders for the driver-generated parquet tables (TESTDATA.md).

One function per table so call sites stay declarative; Spark's parquet
source gives predicate pushdown + column pruning for free, so callers
should select/filter directly on these DataFrames rather than collecting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read nanos as long (epoch nanos) — callers use
        # `ts_seconds`/`ts` helpers below. Runtime-settable, so this works
        # under any caller-provided SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame whose scan yields fewer
    partitions than cores.

    Single-row-group parquet files read as ONE task, which serializes any
    compute-heavy per-row operator (shingling, hashing, vector math) that
    runs before the first shuffle. At 100 TB the scan has thousands of
    splits and this is a no-op — the conditional keeps the extra shuffle
    out of plans that don't need it.
    """
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts_ns` (long), `ts_sec` (long) and `ts` (timestamp, µs
    truncation) — the timestamp view downstream window ops expect.

    Handles both on-disk encodings the driver has shipped: parquet
    TIMESTAMP(NANOS) read as epoch-nano longs (via nanosAsLong), and
    TIMESTAMP(MICROS) read as timestamp/timestamp_ntz. The session TZ is
    pinned to UTC (session.py), so the NTZ→epoch conversion agrees with
    DuckDB's tz-free epoch_*() semantics in the oracles.
    """
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        ev = ev.withColumnRenamed("ts", "ts_ns")
        return ev.withColumn("ts_sec", F.expr("ts_ns div 1000000000")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    # timestamp / timestamp_ntz (micros precision on disk)
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev.withColumn("ts_ns", F.expr("unix_micros(ts) * 1000L")).withColumn(
        "ts_sec", F.expr("unix_micros(ts) div 1000000")
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql() can reach them."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
