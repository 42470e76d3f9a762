"""NULL / wrong-width embeddings must flow through every embeddings-reading
query identically on Spark and DuckDB.

The driver fixtures contain no NULL or short vectors today, but the schema
permits them and a fixture regen could introduce them (the round-3 events
dtype drift was exactly this class of breakage). Spark's posexplode of a
NULL array emits no rows while DuckDB's unnest-range cross keeps NULL-value
rows, so an unguarded query diverges the moment such a row exists — every
embeddings query therefore filters `embedding IS NOT NULL AND len = 64`
symmetrically on both sides (ADVICE r4). This test injects both hazards and
re-runs the full oracle comparison.
"""

from __future__ import annotations

import duckdb
import pytest

# slow tier: embeddings-query sweep over injected NULL/short vectors vs DuckDB — deselected from the driver-window default run
pytestmark = pytest.mark.slow

from eve_graph_spark import queries as registry

SRC = "/root/testdata/sf0.001/embeddings.parquet"
DOCS = "/root/testdata/sf0.001/documents.parquet"

EMBEDDING_QUERIES = [
    "embedding_near_dups",
    "ann_brute_force_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "label_centroids",
    "semantic_bucket_dedup",
    "hard_negatives_topk",
    # r8: clustering + quantization drop NULL/short vectors symmetrically
    "kmeans_embeddings",
    "embedding_quantization",
]


@pytest.fixture(scope="module")
def null_emb_dir(tmp_path_factory):
    """sf0.001 embeddings plus a NULL vector and a 3-wide vector (ids past
    the real range; 900001 is also `id_a` of a consecutive near-dup pair so
    the NULL flows into the pair join, not just the scan)."""
    d = tmp_path_factory.mktemp("nullemb")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM '{SRC}'
            UNION ALL
            SELECT 900001, NULL, 7
            UNION ALL
            SELECT 900002, [1.0, 2.0, 3.0]::FLOAT[], 8
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    # queries resolve every table they read against sf_dir
    import shutil

    shutil.copy(DOCS, f"{d}/documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", EMBEDDING_QUERIES)
def test_embedding_query_null_parity(spark, null_emb_dir, name):
    qfn = registry.queries()[name]
    sdf = qfn(spark, null_emb_dir)
    cols = sdf.columns
    srows = sorted((tuple(r) for r in sdf.collect()), key=repr)
    assert srows, name  # the guard must drop 2 rows, not the whole table

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{null_emb_dir}/embeddings.parquet'"
        )
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{null_emb_dir}/documents.parquet'"
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
