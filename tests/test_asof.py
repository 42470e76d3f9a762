"""asof_join semantics: >= tie matching, no-match nulls, inner mode."""

from __future__ import annotations

from eve_graph_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (1, 50, "c"), (2, 300, "d")],
        "user_id long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (3, 1, 99.0)],
        "user_id long, ts long, price double",
    )
    out = {(r["user_id"], r["ts"]): r["price"] for r in asof_join(left, right).collect()}
    assert out[(1, 100)] == 10.0   # same-ts right row matches (>=)
    assert out[(1, 205)] == 20.0   # most recent prior, not just any prior
    assert out[(1, 50)] is None    # nothing at-or-before
    assert out[(2, 300)] is None   # key with no right rows at all
    inner = asof_join(left, right, how="inner").collect()
    assert {(r["user_id"], r["ts"]) for r in inner} == {(1, 100), (1, 205)}
