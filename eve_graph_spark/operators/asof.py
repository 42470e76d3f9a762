"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Matches each left row to the right row with the greatest timestamp ≤ the
left row's timestamp within the same key group (DuckDB/kdb ASOF JOIN,
pandas merge_asof). Spark has no built-in; the naive theta-join
(l.ts >= r.ts then window-max) explodes to O(|L|·|R|) per key.

This implementation is the scalable union-scan idiom:
union both sides tagged, ONE shuffle partitioned by key ordered by
(ts, side), then a running `last(ignorenulls)` carries the most recent
right payload forward into each left row. Cost: one shuffle + one sort —
the same plan shape as a window aggregate, independent of match fan-out.

`right` must be unique per (keys, ts) — pre-aggregate it otherwise
(the ambiguity is inherent to as-of semantics, not this implementation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    how: str = "left",
) -> DataFrame:
    """As-of join: left columns + right's non-key columns (null when no
    right row at-or-before the left timestamp exists; `how='inner'` drops
    those rows). Right rows at the SAME timestamp do match (>= semantics,
    like DuckDB `ASOF JOIN ... ON l.ts >= r.ts`)."""
    by = list(by)
    payload_cols = [c for c in right.columns if c not in by and c != on]
    l_tagged = left.select(
        *by, F.col(on), F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in by and c != on],
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("__p")).schema["__p"].dataType
        ).alias("__p"),
    )
    r_tagged = right.select(
        *by, F.col(on), F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(zip(left.columns, left.schema.fields))[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on],
        F.struct(*payload_cols).alias("__p"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at the same ts (side 0 < 1), so a
    # same-timestamp right row is visible to the left row — >= semantics
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__p", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col("__match")[c].alias(c) for c in payload_cols],
    )
    if how == "inner":
        out = out.filter(F.col(payload_cols[0]).isNotNull()) if payload_cols else out
    return out
