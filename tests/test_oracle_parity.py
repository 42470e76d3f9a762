"""Mirror of the driver's correctness gate: run every registered query on
Spark AND its oracle SQL on DuckDB at sf0.001, compare row sets exactly.

Stricter than the driver in one way: floats must match bit-for-bit (the
determinism rules in eve_graph_spark/queries.py exist to make that true),
so any nondeterminism shows up here before the driver sees it.
"""

from __future__ import annotations

import math

import duckdb
import pytest

# slow tier: full-registry DuckDB replay at sf0.001 (~the driver's own gate, re-run locally) — deselected from the driver-window default run
pytestmark = pytest.mark.slow

from eve_graph_spark import queries as registry
from eve_graph_spark.sources.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rows(rows):
    # key=repr: total order even with None/mixed types (rollup NULLs)
    return sorted((tuple(_norm(v) for v in r) for r in rows), key=repr)


ORACLED = sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = registry.queries()[name]
    spark_df = q(spark, SF_DIR)
    cols = spark_df.columns
    spark_rows = _rows([tuple(r) for r in spark_df.collect()])

    res = ddb.execute(registry.oracle_sql()[name])
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = _rows(res.fetchall())

    assert sorted(cols) == sorted(oracle_cols), f"{name}: column names differ"
    # align column order by name before comparing values
    if cols != oracle_cols:
        idx = [oracle_cols.index(c) for c in cols]
        oracle_rows = _rows([tuple(r[i] for i in idx) for r in oracle_rows])
    assert len(spark_rows) == len(oracle_rows), f"{name}: row counts differ"
    mismatches = [
        (a, b) for a, b in zip(spark_rows, oracle_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_kcore_oracle_unroll_covers_fixpoint(sf_dir):
    """The kcore_membership oracle unrolls the peel a fixed 8 rounds with
    no fixpoint check; if a fixture change ever deepened the peel past 8
    the oracle would silently become a pre-fixpoint superset. Pin that the
    last unrolled round is a no-op (round 8 == round 7), i.e. the unroll
    depth covers the fixpoint on every fixture the driver uses."""
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        r7 = sorted(con.execute(registry._kcore_unrolled_sql(3, 7)).fetchall())
        r8 = sorted(con.execute(registry._kcore_unrolled_sql(3, 8)).fetchall())
        assert r7 == r8, "k-core peel not at fixpoint by round 7 — deepen the unroll"
    finally:
        con.close()


def test_all_queries_run(spark):
    """Queries without oracles must still execute and return a DataFrame."""
    for name, q in registry.queries().items():
        df = q(spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()
