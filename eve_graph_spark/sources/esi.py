"""ESI-style source connector — SURVEY.md §2.1 (S1-S5, S7) re-expressed for
Spark's execution model.

The reference fetches per-entity JSON with 50-way bounded concurrency
(reference: src/sync.rs:96-119, Semaphore(50)) and converts nullable wire
structs to model structs client-side (src/sync.rs:25-64). Here:

- **batch path**: fetched snapshots land as JSON files; `read_*_json` reads
  them with explicit wire schemas (spark.read.json + PERMISSIVE mode, bad
  records kept in `_corrupt_record` — the S7 error-policy analogue);
- **fan-out path**: `fetch_details` distributes per-id HTTP GETs across
  executor partitions via mapInPandas — partition count IS the concurrency
  cap, the Spark-native form of the reference's semaphore. The HTTP call
  is injected (`fetcher`), so tests run hermetically and the container
  needs no network.
- **conversion**: `systems_from_wire` / `stargates_from_wire` are the
  F3-F5 null-coalescing / nested-flatten expressions.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eve_graph_spark import schemas

Fetcher = Callable[[int], str]  # id -> raw JSON text (raises on HTTP error)


def read_system_ids_json(spark: SparkSession, path: str) -> DataFrame:
    """S1 get_system_ids (esi.rs:79-83): the full universe id list."""
    return spark.read.schema("system_id long").json(path)


def read_systems_json(spark: SparkSession, path: str) -> DataFrame:
    """S2 system detail snapshots with the nullable wire schema."""
    return spark.read.schema(schemas.ESI_SYSTEM_RESPONSE).json(path)


def read_stargates_json(spark: SparkSession, path: str) -> DataFrame:
    """S3 stargate detail snapshots."""
    return spark.read.schema(schemas.ESI_STARGATE_RESPONSE).json(path)


def read_activity_json(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """S4/S5 kills / jumps activity arrays (esi.rs:85-101)."""
    schema = schemas.SYSTEM_KILLS if kind == "kills" else schemas.SYSTEM_JUMPS
    return spark.read.schema(schema).json(path)


def systems_from_wire(wire: DataFrame) -> DataFrame:
    """Wire → model conversion (sync.rs:25-48): null-coalescing defaults
    (F3), nested planet flatten (F4), position struct flatten (F5).
    Pure column expressions — the whole conversion is one projection."""
    return wire.select(
        F.col("system_id"),
        F.coalesce(F.col("name"), F.lit("undefined")).alias("name"),
        F.coalesce(F.col("constellation_id"), F.lit(-1)).alias("constellation_id"),
        F.coalesce(F.col("security_status"), F.lit(0.0)).alias("security_status"),
        F.coalesce(F.col("security_class"), F.lit("undefined")).alias("security_class"),
        F.coalesce(F.col("star_id"), F.lit(-1)).alias("star_id"),
        F.coalesce(F.col("position.x"), F.lit(0.0)).alias("x"),
        F.coalesce(F.col("position.y"), F.lit(0.0)).alias("y"),
        F.coalesce(F.col("position.z"), F.lit(0.0)).alias("z"),
        F.coalesce(
            F.transform(F.col("planets"), lambda p: p["planet_id"]),
            F.array().cast("array<long>"),
        ).alias("planets"),
        F.coalesce(F.col("stargates"), F.array().cast("array<long>")).alias("stargates"),
        F.lit(0).cast("int").alias("kills"),
        F.lit(0).cast("int").alias("jumps"),
    )


def stargates_from_wire(wire: DataFrame) -> DataFrame:
    """Wire → model (sync.rs:50-64): destination struct flatten (F5)."""
    return wire.select(
        F.col("stargate_id"),
        F.coalesce(F.col("system_id"), F.lit(-1)).alias("system_id"),
        F.coalesce(F.col("destination.stargate_id"), F.lit(-1)).alias("destination_stargate_id"),
        F.coalesce(F.col("destination.system_id"), F.lit(-1)).alias("destination_system_id"),
        F.coalesce(F.col("name"), F.lit("undefined")).alias("name"),
        F.coalesce(F.col("position.x"), F.lit(0.0)).alias("x"),
        F.coalesce(F.col("position.y"), F.lit(0.0)).alias("y"),
        F.coalesce(F.col("position.z"), F.lit(0.0)).alias("z"),
        F.coalesce(F.col("type_id"), F.lit(-1)).alias("type_id"),
    )


def fetch_details(
    ids: DataFrame,
    fetcher: Fetcher,
    concurrency: int = 50,
    on_not_found: str = "skip",
) -> DataFrame:
    """D5/D6/D8 fan-out fetch: one HTTP GET per id, executor-side.

    `repartition(concurrency)` makes the task count the rate cap — the
    Spark-native Semaphore(50) (sync.rs:106). Per-item error policy
    (sync.rs:323-350): KeyError/404-style misses are skipped (status
    'not_found'), rate-limit errors re-raise to fail the stage (the
    reference aborts the whole batch on 420/429 — Spark's task→stage
    failure gives the same fail-fast semantics).

    Returns (id long, payload string, status string); payload is raw JSON
    to be parsed with the wire schema by the caller.
    """
    import pandas as pd

    id_col = ids.columns[0]

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, payloads, statuses = [], [], []
            for i in pdf[id_col]:
                try:
                    payloads.append(fetcher(int(i)))
                    statuses.append("ok")
                except KeyError:
                    if on_not_found != "skip":
                        raise
                    payloads.append(None)
                    statuses.append("not_found")
                out_ids.append(int(i))
            yield pd.DataFrame({"id": out_ids, "payload": payloads, "status": statuses})

    return ids.repartition(concurrency).mapInPandas(
        _fetch, "id long, payload string, status string"
    )


def parse_payloads(fetched: DataFrame, wire_schema) -> DataFrame:
    """Parse fetched JSON payloads with the wire schema (PERMISSIVE —
    undecodable payloads yield nulls rather than failing the job, S7)."""
    ok = fetched.filter(F.col("status") == "ok")
    return ok.select(F.from_json("payload", wire_schema).alias("w")).select("w.*")


def make_dict_fetcher(data: dict[int, dict]) -> Fetcher:
    """Test/replay fetcher over an in-memory snapshot (no network)."""

    def _fetch(i: int) -> str:
        return json.dumps(data[i])

    return _fetch
