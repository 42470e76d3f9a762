"""Diff one registered query against its DuckDB oracle, pandas-mediated
like the driver. Usage: python scripts/diff_query.py <name> [sf_dir]"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as contract  # noqa: E402
from scripts.drive_contract import TABLES, norm  # noqa: E402

name = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

spark = SparkSession.builder.master("local[8]").appName("diff").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

df = contract.queries()[name](spark, SF_DIR)
cols = df.columns
rows = [tuple(r) for r in df.collect()]
opdf = con.execute(contract.oracle_sql()[name]).fetchdf()
ocols = list(opdf.columns)
orows = list(opdf.itertuples(index=False, name=None))

print("spark cols:", cols)
print("oracle cols:", ocols, [str(d) for d in opdf.dtypes])


def canon(cs, rs):
    order = sorted(range(len(cs)), key=lambda i: cs[i])
    return sorted("|".join(norm(r[i]) for i in order) for r in rs)


a, b = canon(cols, rows), canon(ocols, orows)
only_a = [x for x in a if x not in set(b)]
only_b = [x for x in b if x not in set(a)]
print(f"spark-only ({len(only_a)}):")
for x in only_a[:10]:
    print("  S", x)
print(f"oracle-only ({len(only_b)}):")
for x in only_b[:10]:
    print("  O", x)
