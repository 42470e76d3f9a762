"""range_join: bucketized equi-join equals the naive theta-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from eve_graph_spark.operators.range_join import range_join


def test_range_join_matches_theta_join(spark):
    pts = spark.range(0, 500).select(F.col("id").alias("pid"), (F.col("id") % 97).alias("val"))
    iv = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 30), (3, 90, 96), (4, 200, 300)],
        "iid long, lo long, hi long",
    )
    naive = pts.join(iv, (F.col("val") >= F.col("lo")) & (F.col("val") <= F.col("hi")))
    fast = range_join(pts, iv, "val", "lo", "hi", bin_width=8)
    n = naive.select("pid", "iid")
    f = fast.select("pid", "iid")
    assert n.exceptAll(f).isEmpty() and f.exceptAll(n).isEmpty()
    assert fast.filter(F.col("iid") == 4).count() == 0  # empty interval band


def test_range_join_left_keeps_unmatched(spark):
    pts = spark.createDataFrame([(1, 5), (2, 50)], "pid long, val long")
    iv = spark.createDataFrame([(1, 0, 10)], "iid long, lo long, hi long")
    out = {r["pid"]: r["iid"] for r in range_join(pts, iv, "val", "lo", "hi", 8, how="left").collect()}
    assert out == {1: 1, 2: None}
