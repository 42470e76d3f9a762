"""Golden-value tests for F1/F2 — mirrors the reference's only unit tests
(reference: src/database.rs:615-645)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eve_graph_spark.functions.risk import baseline_expr, galaxy_baseline, risk_expr

GOLDEN = [
    (0, 0, 0.1, 0.1),     # no activity → baseline
    (5, 0, 0.1, 25.1),    # kills without jumps → kills² + baseline
    (0, 100, 0.1, 0.1),   # jumps without kills → baseline
    (10, 200, 0.1, 0.6),  # normal → kills²/jumps + baseline
]


@pytest.mark.parametrize("kills,jumps,baseline,expected", GOLDEN)
def test_risk_golden(spark, kills, jumps, baseline, expected):
    df = spark.createDataFrame([(kills, jumps, baseline)], "kills int, jumps int, baseline double")
    got = df.select(risk_expr(F.col("kills"), F.col("jumps"), F.col("baseline")).alias("r")).collect()[0]["r"]
    assert got == pytest.approx(expected, abs=1e-9)


def test_baseline_fallback(spark):
    df = spark.createDataFrame([(100, 0)], "tk long, tj long")
    got = df.select(baseline_expr(F.col("tk"), F.col("tj")).alias("b")).collect()[0]["b"]
    assert got == 0.01


def test_galaxy_baseline(spark):
    kills = spark.createDataFrame([(1, 30), (2, 20)], "system_id long, ship_kills int")
    jumps = spark.createDataFrame([(1, 100), (2, 400)], "system_id long, ship_jumps int")
    got = galaxy_baseline(kills, jumps).collect()[0]["baseline"]
    assert got == pytest.approx(50 / 500)
