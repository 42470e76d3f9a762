"""Entity resolution: blocked fuzzy matching by edit distance.

The canonical ER pipeline shape (blocking -> candidate pairs -> scoring ->
best-match-per-entity) expressed as DataFrame ops:

- **blocking** turns the O(N*M) all-pairs comparison into an equi-join on a
  cheap deterministic block key (here: a key digest / id residue). At 100 TB
  this is THE scale lever — candidate generation is a shuffle-partitioned
  hash join whose cost is sum of per-block |dirty|x|clean|, never N*M.
- **scoring** is JVM-side `levenshtein` (whole-stage codegen; identical
  semantics in DuckDB's `levenshtein`, so the oracle is exact).
- **best match** is one window per dirty entity (min distance, then min
  candidate key as a total tie-break) — same shape as keep-first dedup.

The reference has no fuzzy matching (its only dedup is exact id-based,
reference: src/database.rs:241-254); this is part of the north-star
training-data-pipeline set (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocked_fuzzy_match(
    dirty: DataFrame,
    clean: DataFrame,
    *,
    key_col: str = "key",
    name_col: str = "name",
    block_col: str = "block",
    max_distance: int = 4,
) -> DataFrame:
    """Match each `dirty` row to its best `clean` candidate within a block.

    Inputs both carry (key_col, name_col, block_col). Returns one row per
    matched dirty entity: (dirty_key, clean_key, distance) with
    distance <= max_distance, best = (min distance, min clean key).
    """
    d = dirty.select(
        F.col(key_col).alias("dirty_key"),
        F.col(name_col).alias("dirty_name"),
        F.col(block_col).alias("block"),
    )
    c = clean.select(
        F.col(key_col).alias("clean_key"),
        F.col(name_col).alias("clean_name"),
        F.col(block_col).alias("block"),
    )
    scored = (
        d.join(c, "block")  # candidate generation: equi-join, never N*M
        .withColumn("distance", F.levenshtein("dirty_name", "clean_name"))
        .filter(F.col("distance") <= max_distance)
    )
    w = Window.partitionBy("dirty_key").orderBy("distance", "clean_key")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("dirty_key", "clean_key", F.col("distance").cast("long").alias("distance"))
    )
