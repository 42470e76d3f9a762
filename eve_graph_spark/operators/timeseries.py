"""Time-series smoothing: EWMA as an order-pinned fold.

EWMA is non-associative (acc' = acc*(1-a) + x*a), so it cannot be a plain
aggregate — the fold order must be the event order. Spark-first form:

    collect_list(struct(order_key, value)) -> array_sort -> F.aggregate

One shuffle (the groupBy), then the fold runs JVM-side inside the
aggregate expression — no Python, no window self-joins. Group state is
the entity's own event list, which is the natural unit for per-entity
smoothing (bounded per user/device/series); for unbounded single-series
data the streaming analogue is applyInPandasWithState
(streaming/stateful.py).

The fold sequence is a fixed chain of IEEE doubles, so DuckDB's
`list_reduce(list(value ORDER BY ...), ...)` reproduces it bit-for-bit —
this is what makes EWMA oracle-checkable at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_by_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.25,
) -> DataFrame:
    """(group, n_obs, ewma): fold the group's values in order_col order,
    acc0 = first value, acc' = acc*(1-alpha) + x*alpha."""
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v")))
    )
    return (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(arr.alias("__arr"))
        .select(
            F.col("grp").alias(group_col),
            F.size("__arr").cast("long").alias("n_obs"),
            F.aggregate(
                F.slice("__arr", 2, F.greatest(F.size("__arr") - 1, F.lit(0))),
                F.element_at("__arr", 1)["v"],
                lambda acc, x: acc * F.lit(1.0 - alpha) + x["v"] * F.lit(alpha),
            ).alias("ewma"),
        )
    )
