"""Round-6 hardening: span-digest width knob, production IVF row.
Oracle parity stays covered by test_oracle_parity.py (registry-driven)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eve_graph_spark import queries as registry

SF_DIR = "/root/testdata/sf0.001"


def _span_rows(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_shingles"])
        for r in df.collect()
    )


def test_duplicate_spans_widened_digest_agrees_with_56bit(spark):
    """The widen-on-demand knob (ADVICE r5): the full-md5 digest form (zero
    practical false positives) must produce the same spans as the 56-bit
    long form on real data — i.e. at this corpus size the 56-bit digest
    has no collisions, and the knob changes only the shuffle payload."""
    from eve_graph_spark.operators.dedup import duplicate_spans
    from eve_graph_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    narrow = duplicate_spans(docs, ngram=5, digest_hex_chars=14)
    wide = duplicate_spans(docs, ngram=5, digest_hex_chars=None)
    sixty = duplicate_spans(docs, ngram=5, digest_hex_chars=15)
    assert _span_rows(narrow) == _span_rows(wide)
    assert _span_rows(sixty) == _span_rows(wide)
    assert _span_rows(wide)  # non-empty: the fixture contains cross-doc dups


def test_duplicate_spans_query_matches_operator_default(spark):
    got = _span_rows(registry.queries()["duplicate_text_spans"](spark, SF_DIR))
    from eve_graph_spark.operators.dedup import duplicate_spans
    from eve_graph_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    assert got == _span_rows(duplicate_spans(docs))


def test_ann_ivf_production_shape_and_determinism(spark):
    """Since r11 the production query is oracle-pinned: one row per query
    id carrying integrity booleans (k distinct ranks, monotone cosines,
    self-exclusion, fixed-point cosine recompute) that must all hold, and
    the result must be deterministic across runs (seeded Lloyd + id
    tie-breaks)."""
    q = registry.queries()["ann_ivf_production"]
    rows1 = sorted(map(tuple, q(spark, SF_DIR).collect()))
    rows2 = sorted(map(tuple, q(spark, SF_DIR).collect()))
    assert rows1 == rows2
    assert [r[0] for r in rows1] == [0, 1, 2, 3, 4]
    for (qid, n_results, distinct, wellformed, monotone, self_ex, cos_ok) in rows1:
        assert n_results == 10, qid
        assert distinct and wellformed and monotone and self_ex and cos_ok, qid


def test_boilerplate_strip_removes_repeated_blocks(spark, tmp_path):
    """Crafted corpus: a shared 20-word header block + unique bodies.
    The transform must drop the header from every doc, keep each unique
    body, and preserve block order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    header = " ".join(f"h{i}" for i in range(20))
    bodies = [" ".join(f"b{d}w{i}" for i in range(20)) for d in range(3)]
    texts = [f"{header} {b}" for b in bodies] + [bodies[0] + " " + bodies[0]]
    tbl = pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    got = {
        r["doc_id"]: (r["n_blocks"], r["n_removed"], r["clean_text"])
        for r in registry.queries()["boilerplate_strip_documents"](
            spark, str(d)
        ).collect()
    }
    # header removed everywhere (shared 3x); doc 0's body also appears
    # twice inside doc 3, so that block is removed everywhere too
    assert got[0] == (2, 2, "")
    assert got[1] == (2, 1, bodies[1])
    assert got[2] == (2, 1, bodies[2])
    assert got[3] == (2, 2, "")
