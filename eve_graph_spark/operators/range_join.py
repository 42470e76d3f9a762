"""Range join (point-in-interval) — the bucketized equi-join idiom.

Spark plans `l.v BETWEEN r.lo AND r.hi` as BroadcastNestedLoopJoin (or a
cartesian + filter when neither side broadcasts): O(|L|·|R|) comparisons.
The scalable form bins the value domain: intervals explode into the bins
they overlap, points land in exactly one bin, and the join becomes an
equi-join on the bin id followed by the exact BETWEEN filter. Cost is
O(|L| + |R|·bins_per_interval) shuffled rows — linear, hash-partitioned,
AQE-skew-splittable. Pick `bin_width` ≈ the typical interval width so
intervals explode into O(1) bins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    by: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= value <= hi
    (optionally also matching on `by` keys). Interval bounds inclusive."""
    by = list(by)
    p = points.withColumn("__bin", F.floor(F.col(value_col) / F.lit(bin_width)).cast("long"))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    joined = p.join(i, by + ["__bin"], how="inner").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
    )
    out = joined.drop("__bin")
    if how == "left":
        matched_keys = out.select(*points.columns).dropDuplicates(points.columns)
        unmatched = points.join(matched_keys, points.columns, "left_anti")
        for c in [c for c in out.columns if c not in points.columns]:
            unmatched = unmatched.withColumn(c, F.lit(None))
        out = out.unionByName(unmatched.select(*out.columns))
    return out
