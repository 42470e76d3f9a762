"""Round-13 optimization pins: every plan/expression rewrite this round is
value-preserving by construction — these tests pin that property against a
naive reference implementation on adversarial inputs, so a future edit to
the optimized form cannot silently drift the values the oracles hash.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _naive_shingles_sql(text_col: str, k: int) -> str:
    """The pre-r13 form (split re-evaluated inside the per-position lambda):
    the semantic reference the optimized let-bound form must match."""
    t = f"coalesce({text_col}, '')"
    return (
        f"array_distinct(CASE WHEN size(split(lower({t}), ' ')) >= {k} THEN "
        f"transform(sequence(0, size(split(lower({t}), ' ')) - {k}), "
        f"i -> concat_ws(' ', slice(split(lower({t}), ' '), i + 1, {k}))) "
        f"ELSE array(lower({t})) END)"
    )


ADVERSARIAL_TEXTS = [
    (0, None),  # null text: one '' shingle
    (1, ""),  # empty
    (2, "one"),  # shorter than k
    (3, "two words"),
    (4, "exactly three words"),
    (5, "a  b   c d e"),  # consecutive spaces → empty-string words
    (6, " leading and trailing spaces "),
    (7, "UPPER Case MiXeD tokens repeat repeat repeat repeat"),
    (8, "Ünïcode tökens ünïcode tökens ünïcode tökens"),
    (9, "tab\tand\nnewline are not split delimiters here"),
    (10, "x " * 200),  # long doc, duplicate shingles collapse
]


@pytest.mark.parametrize("k", [2, 3, 5])
def test_let_bound_shingles_match_naive_form(spark, k):
    from eve_graph_spark.operators.dedup import _shingles_sql

    df = spark.createDataFrame(ADVERSARIAL_TEXTS, "doc_id long, text string")
    mism = (
        df.select(
            F.expr(_shingles_sql("text", k)).alias("opt"),
            F.expr(_naive_shingles_sql("text", k)).alias("ref"),
        )
        .filter("opt <> ref OR (opt IS NULL) <> (ref IS NULL)")
        .count()
    )
    assert mism == 0


def test_let_bound_shingles_single_split_in_lambda(spark):
    """The optimization itself: the per-position lambda must reference the
    let-bound word array, never re-split the text. A regression to the
    naive form is O(words x text) per doc (measured 3.6x the expression
    cost at sf0.1)."""
    from eve_graph_spark.operators.dedup import _shingles_sql

    sql = _shingles_sql("text", 3)
    body = sql.split("__ws ->", 1)
    assert len(body) == 2, "shingles must let-bind the word array as __ws"
    # inside the binder body the only split() is gone — slice works on __ws
    assert "slice(__ws" in body[1]
    assert "slice(split" not in body[1]
