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


class RateLimitError(Exception):
    """HTTP 420/429: the reference aborts the WHOLE sync on rate limiting
    (sync.rs:323-350) — never retried per-item; re-raised to fail the
    stage fast."""


class TransientFetchError(Exception):
    """Retryable failure (5xx / connection reset): retried per-item with
    bounded backoff, the analogue of the reference's 10x5s connect budget
    (main.rs:25, database.rs:50)."""


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
    retries: int = 3,
    backoff_sec: float = 0.5,
    sleeper: Callable[[float], None] | None = None,
) -> DataFrame:
    """D5/D6/D8 fan-out fetch: one HTTP GET per id, executor-side.

    `repartition(concurrency)` makes the task count the rate cap — the
    Spark-native Semaphore(50) (sync.rs:106). Per-item error policy
    (sync.rs:323-350):

    - KeyError (404): skipped, status 'not_found' — never retried;
    - RateLimitError (420/429): re-raised immediately to fail the stage —
      the reference aborts the whole batch on rate limiting, and Spark's
      task→stage failure gives the same fail-fast semantics;
    - TransientFetchError (5xx/resets): retried up to `retries` times with
      exponential backoff (the reference's bounded connect budget,
      main.rs:25 10x5s); exhausting the budget re-raises.

    `sleeper` is injectable for hermetic tests. Returns (id long, payload
    string, status string); payload is raw JSON for the wire-schema parse.
    """
    import time as _time

    import pandas as pd

    id_col = ids.columns[0]
    sleep = sleeper or _time.sleep

    def _fetch_one(i: int) -> str:
        attempt = 0
        while True:
            try:
                return fetcher(i)
            except TransientFetchError:
                if attempt >= retries:
                    raise
                sleep(backoff_sec * (2 ** attempt))
                attempt += 1

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, payloads, statuses = [], [], []
            for i in pdf[id_col]:
                try:
                    payloads.append(_fetch_one(int(i)))
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
