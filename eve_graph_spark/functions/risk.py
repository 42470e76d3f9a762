"""Risk scoring — F1/F2 from SURVEY.md §2.4, as pure Column expressions.

Reference semantics (src/database.rs:324-332): total risk of a system is
``kills²/jumps + baseline``; when ``jumps == 0`` the ratio degrades to
``kills²`` (not division by zero). Baseline (src/sync.rs:303-307) is
``galaxy_kills / galaxy_jumps`` with a 0.01 fallback when there were no
jumps galaxy-wide.

Golden values (reference unit tests, src/database.rs:619-644):
risk(0,0,0.1)=0.1 · risk(5,0,0.1)=25.1 · risk(0,100,0.1)=0.1 ·
risk(10,200,0.1)=0.6
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def risk_expr(kills: Column, jumps: Column, baseline: Column) -> Column:
    """F1: kills²/jumps + baseline, jumps==0 → kills² + baseline.

    ``kills*kills`` (not pow) keeps the math integer-exact before the single
    float division, so results are bit-identical across engines.
    """
    kills_d = kills.cast("double")
    ratio = F.when(jumps > 0, kills_d * kills / jumps).otherwise(kills_d * kills)
    return ratio + baseline


def baseline_expr(total_kills: Column, total_jumps: Column) -> Column:
    """F2: galaxy_kills/galaxy_jumps, fallback 0.01 when jumps == 0."""
    return F.when(
        total_jumps > 0, total_kills.cast("double") / total_jumps.cast("double")
    ).otherwise(F.lit(0.01))


def galaxy_baseline(kills_df: DataFrame, jumps_df: DataFrame) -> DataFrame:
    """Single-row DataFrame with the galaxy baseline (D4 + F2).

    The reference computes the two sums client-side over fetched arrays
    (src/sync.rs:256, :277); here they are one aggregate each — map-side
    partial aggregation makes this a near-free full scan at any scale.
    """
    tk = kills_df.agg(F.sum("ship_kills").alias("tk"))
    tj = jumps_df.agg(F.sum("ship_jumps").alias("tj"))
    return tk.crossJoin(tj).select(
        baseline_expr(F.coalesce(F.col("tk"), F.lit(0)), F.coalesce(F.col("tj"), F.lit(0))).alias(
            "baseline"
        )
    )
