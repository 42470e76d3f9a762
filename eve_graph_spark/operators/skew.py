"""Skew mitigation for hot keys — salting + AQE notes.

At 100 TB a handful of hot keys (the Jita problem: one system with 100×
the traffic of any other; one empty-document hash in dedup) serialize a
shuffle join or aggregation onto one reducer. Two remedies, used together:

- **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on in
  `session.get_spark`) splits oversized shuffle partitions at runtime —
  free, but only for sort-merge joins.
- **Salting** (this module) works for any join/agg shape: replicate the
  small side R times, scatter the big side's hot keys across R salt
  buckets, join on (key, salt). Deterministic — the salt is a hash of
  stable columns, not rand() — so results are reproducible run to run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str, salt_buckets: int = 8,
                salt_on: Sequence[str] | None = None, how: str = "inner") -> DataFrame:
    """Join where `big` has skewed values of `key`.

    `big` gets salt = xxhash64(salt_on or all non-key cols) % R, scattering
    each hot key's rows over R partitions; `small` is exploded ×R so every
    (key, salt) pair finds its match. The shuffle then distributes by
    (key, salt) — a hot key occupies R reducers instead of one.
    Cost: small side replicated R times — keep R modest and `small` small
    (when `small` is broadcastable, broadcast instead; salting is for the
    case where BOTH sides are too big to broadcast and `big` is skewed).
    """
    salt_cols = [c for c in (salt_on or big.columns) if c != key]
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    )
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def salted_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for a skewed groupBy key: count per
    (key, salt) first (spreads the hot key across reducers), then sum the
    partials per key. For algebraic aggregates Spark's own partial
    aggregation usually suffices — this pattern matters when the first
    shuffle would still concentrate one key's groups (e.g. after an
    explode that multiplies the hot key's rows)."""
    partial = (
        df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(key).agg(F.sum("__c").alias("cnt"))
