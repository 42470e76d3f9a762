"""Tripwire for driver-side testdata schema drift.

The driver regenerates /root/testdata between rounds and has changed
column types without notice (events.ts went TIMESTAMP(NANOS) →
TIMESTAMP(MICROS) between rounds 3 and 4, silently breaking every
events-window query until CORRECTNESS flagged it). This test pins the
dtypes every query assumes, so a regeneration that drifts again fails
HERE with the exact table/column named — not as 10 cryptic plan errors.

Columns with known-variable encodings (events.ts) assert the accepted
set instead of one type.
"""

from __future__ import annotations

import pytest

from eve_graph_spark.sources.tables import TABLE_NAMES, load_table

SF = "/root/testdata/sf0.001"

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
                 "c_acctbal": "double", "c_mktsegment": "string"},
    "supplier": {"s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
                 "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_name": "string", "p_brand": "string",
             "p_type": "string", "p_size": "int", "p_retailprice": "double"},
    "orders": {"o_orderkey": "bigint", "o_custkey": "bigint", "o_orderstatus": "string",
               "o_totalprice": "double", "o_orderdate": "timestamp_ntz",
               "o_orderpriority": "string"},
    "lineitem": {"l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
                 "l_linenumber": "int", "l_quantity": "double", "l_extendedprice": "double",
                 "l_discount": "double", "l_tax": "double", "l_returnflag": "string",
                 "l_linestatus": "string", "l_shipdate": "timestamp_ntz"},
    "events": {"event_id": "bigint", "user_id": "bigint", "event_type": "string",
               "value": "double", "props": "string"},
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string",
                  "source": "string", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}

# encodings the loaders explicitly handle (tables.py:events_with_ts)
EVENTS_TS_ACCEPTED = {"bigint", "timestamp", "timestamp_ntz"}


@pytest.mark.parametrize("table", TABLE_NAMES)
def test_table_schema_pinned(spark, table):
    dtypes = dict(load_table(spark, SF, table).dtypes)
    for col, want in EXPECTED[table].items():
        assert col in dtypes, (
            f"testdata drift: {table}.{col} disappeared (driver regenerated "
            f"the fixtures?) — present: {sorted(dtypes)}"
        )
        assert dtypes[col] == want, (
            f"testdata drift: {table}.{col} is {dtypes[col]!r}, queries assume "
            f"{want!r} — audit every consumer before adapting the loader"
        )
    if table == "events":
        assert dtypes["ts"] in EVENTS_TS_ACCEPTED, (
            f"events.ts encoding {dtypes['ts']!r} is NEW — extend "
            f"events_with_ts (tables.py) and its oracle conventions"
        )
