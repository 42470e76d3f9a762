"""NULL-text documents must flow through the shingle-based dedup queries
identically on Spark and DuckDB.

The Spark side coalesces NULL text to '' (one ('') shingle keeps the doc
in the dedup universe — see operators/dedup.py:_shingles_sql); the oracle
CTEs mirror the coalesce. The driver fixtures contain no NULL text, so
this is the only place that keeps the two engines honest about it
(ADVICE r2).
"""

from __future__ import annotations

import duckdb
import pytest

# slow tier: text-query sweep over injected NULL texts vs DuckDB — deselected from the driver-window default run
pytestmark = pytest.mark.slow

from eve_graph_spark import queries as registry

SRC = "/root/testdata/sf0.001/documents.parquet"

# Queries that read ONLY the documents table through the shingle pipeline.
SHINGLE_QUERIES = [
    "ngram_jaccard_pairs",
    "minhash_near_dups_portable",
    "simhash_portable",
    "dedup_pipeline_documents",
    "dedup_survivors_quality",
]


@pytest.fixture(scope="module")
def null_doc_dir(tmp_path_factory):
    """sf0.001 documents plus two NULL-text rows (ids past the real range
    so they form their own exact-dup pair — exercising NULL through the
    candidate stage, not just the scan)."""
    d = tmp_path_factory.mktemp("nulldocs")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM '{SRC}'
            UNION ALL
            SELECT 900001, NULL, 'en', 'null-src', 0
            UNION ALL
            SELECT 900002, NULL, 'en', 'null-src', 0
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", SHINGLE_QUERIES)
def test_shingle_query_null_text_parity(spark, null_doc_dir, name):
    qfn = registry.queries()[name]
    sdf = qfn(spark, null_doc_dir)
    cols = sdf.columns
    srows = sorted((tuple(r) for r in sdf.collect()), key=repr)
    # the NULL-text docs must NOT be silently dropped from doc-level outputs
    if name in ("dedup_pipeline_documents", "simhash_portable"):
        ids = {r[0] for r in srows}
        assert {900001, 900002} <= ids

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{null_doc_dir}/documents.parquet'"
        )
        res = con.execute(registry.oracle_sql()[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        con.close()
    assert sorted(cols) == sorted(ocols), name
    if cols != ocols:
        idx = [ocols.index(c) for c in cols]
        orows = [tuple(r[i] for i in idx) for r in orows]
    orows = sorted((tuple(r) for r in orows), key=repr)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
