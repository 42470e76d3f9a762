"""Every documents-reading query must survive NULL text / NULL lang /
NULL source / empty text identically on Spark and DuckDB.

The shingle-family null-text tripwire (test_null_text_parity) covers the
dedup pipeline; this extends the same guarantee to the WHOLE documents
surface, and keeps itself complete: the reader set is discovered by
instrumenting `load_table`, so a new documents query is pulled into the
hostile comparison automatically.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

# slow tier: full documents-query sweep over adversarial texts vs DuckDB — deselected from the driver-window default run
pytestmark = pytest.mark.slow

from eve_graph_spark import queries as registry
from eve_graph_spark.sources.tables import TABLE_NAMES

SF = "/root/testdata/sf0.001"


def _documents_readers() -> list[str]:
    """Oracle-backed queries that read the documents table (discovered by
    wrapping registry.load_table during plan construction)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[2]"
    ).getOrCreate()
    readers: list[str] = []
    orig = registry.load_table
    seen: set[str] = set()

    def recording(s, sf_dir, name):
        seen.add(name)
        return orig(s, sf_dir, name)

    registry.load_table = recording
    try:
        for name in sorted(registry.oracle_sql()):
            seen.clear()
            try:
                registry.queries()[name](spark, SF)  # plan only, no execution
            except Exception:  # noqa: BLE001 - non-doc queries may need more
                pass
            if "documents" in seen:
                readers.append(name)
    finally:
        registry.load_table = orig
    return readers


DOC_READERS = _documents_readers()


def test_reader_discovery_found_the_known_surface():
    # sanity: the instrumented discovery must see the known heavy hitters —
    # an import-path change that bypassed registry.load_table would
    # otherwise silently empty this module's coverage
    assert {"dedup_exact_documents", "bm25_topk", "quality_scores"} <= set(DOC_READERS)
    assert len(DOC_READERS) >= 20


@pytest.fixture(scope="module")
def hostile_doc_dir(tmp_path_factory):
    """sf0.001 with three hostile documents rows appended: NULL text,
    empty text + NULL lang, and NULL source."""
    d = tmp_path_factory.mktemp("hostiledocs")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM '{SF}/documents.parquet'
            UNION ALL SELECT 900101, NULL, 'en', 'src0', 0
            UNION ALL SELECT 900102, '', NULL, 'src1', 0
            UNION ALL SELECT 900103, 'some ordinary filler words appear here today', 'de', NULL, 44
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    for t in TABLE_NAMES:
        if t != "documents":
            shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")
    return str(d)


@pytest.mark.parametrize("name", DOC_READERS)
def test_documents_query_hostile_parity(spark, hostile_doc_dir, name):
    sdf = registry.queries()[name](spark, hostile_doc_dir)
    cols = sdf.columns
    srows = sorted((tuple(r) for r in sdf.collect()), key=repr)

    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{hostile_doc_dir}/{t}.parquet'"
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
