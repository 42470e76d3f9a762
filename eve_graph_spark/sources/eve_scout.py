"""EVE-Scout-style wormhole signature source — SURVEY.md §2.1 (S6, S8).

The reference GETs a signature list and keeps only `signature_type ==
"wormhole"` (reference: src/eve_scout.rs:46-50, src/sync.rs:80-90). The
wire carries ISO-8601 timestamp strings (`expires_at`, eve_scout.rs:31) —
parsed here to real timestamps, which is what the streaming expiry
analogue (eve_graph_spark/streaming/) watermarks on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eve_graph_spark import schemas


def read_signatures_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(schemas.EVE_SCOUT_SIGNATURE).json(path)


def parse_signatures(wire: DataFrame) -> DataFrame:
    """Typed view: ISO strings → timestamps, used columns only."""
    return wire.select(
        "id",
        "signature_type",
        "in_system_id",
        "out_system_id",
        F.to_timestamp("created_at").alias("created_at"),
        F.to_timestamp("expires_at").alias("expires_at"),
        F.coalesce(F.col("completed"), F.lit(False)).alias("completed"),
    )


def active_wormholes(signatures: DataFrame, now=None) -> DataFrame:
    """D3 filter + expiry: wormhole-typed, not yet expired."""
    out = signatures.filter(F.col("signature_type") == "wormhole")
    if now is not None:
        out = out.filter(F.col("expires_at") > F.lit(now))
    return out
