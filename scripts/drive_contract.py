"""Drive the driver contract end-to-end, the way the driver does.

Fresh vanilla SparkSession (NOT eve_graph_spark.session defaults), import
__spark_entry__ from the repo root, run entry() + every queries() entry at
the given SF, compare against oracle_sql() via DuckDB with an
order-insensitive value hash. Usage:

    python scripts/drive_contract.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as contract  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# extra args = query-name substrings to check (e.g. `drive_contract.py
# /root/testdata/sf0.01 dedup sssp`); no extras = the full registry.
ONLY = sys.argv[2:]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Round-10 guard (r9 verdict item 1): an empty result hash-matches an empty
# oracle trivially — sha256("") == sha256("") — so a query that never
# produces a row is "green" while its logic is untested (q11's fate for 9
# rounds). Zero rows at sf>=0.01 is now a FAILURE unless the query is
# explicitly allowlisted here with a reason.
ZERO_ROWS_OK: dict[str, str] = {
    # (none — every registered query currently yields rows at sf0.01)
}
_SMALL_SF = any(s in SF_DIR for s in ("sf0.001",))  # tiny fixtures may thin out


# DRIVE_STRICT_NAN=1 keeps NaN distinct from NULL so a genuine Spark-NULL
# vs oracle-NaN semantic drift is still catchable locally even though the
# default mode mirrors the real driver's NaN≡NULL folding.
STRICT_NAN = os.environ.get("DRIVE_STRICT_NAN", "") == "1"


def norm(v):
    # Mirror the driver's pandas-mediated canonicalization: DuckDB HUGEINT
    # (e.g. SUM over a window) materializes as float64 in fetchdf(), so a
    # Spark bigint 4 vs oracle 4.0 must MISMATCH here like it does there.
    import numpy as np

    # NaN ≡ NULL: a DuckDB NULL in a float64 column surfaces as NaN through
    # fetchdf, and the real driver hash-matched such rows against Spark
    # None in round 1 (wormhole_refresh) — so both map to "NULL".
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN" if STRICT_NAN else "NULL"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    spark = SparkSession.builder.master("local[8]").appName("contract-drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    t0 = time.time()
    edf = contract.entry(spark)
    erows = edf.collect()
    print(f"entry(): {len(erows)} rows, schema={edf.columns} [{time.time()-t0:.1f}s]")
    assert len(erows) > 0

    qs, oracles = contract.queries(), contract.oracle_sql()
    if ONLY:
        qs = {n: f for n, f in qs.items() if any(s in n for s in ONLY)}
    failed = []
    ledger: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:
            print(f"  {name:35s} ERROR {exc}")
            failed.append(name)
            ledger[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            continue
        took = time.time() - t0
        if len(rows) == 0 and not _SMALL_SF and name not in ZERO_ROWS_OK:
            print(f"  {name:35s} EMPTY: 0 rows — vacuous result, failing "
                  f"(allowlist in ZERO_ROWS_OK if intentional) [{took:.1f}s]")
            failed.append(name)
            ledger[name] = {"err": "zero rows at sf>=0.01 (vacuous hash)"}
            continue
        if name not in oracles:
            print(f"  {name:35s} rows-only: {len(rows)} rows [{took:.1f}s]")
            ledger[name] = {"no_oracle": True, "spark_rows": len(rows),
                            "err": None}
            continue
        opdf = con.execute(oracles[name]).fetchdf()
        ocols = list(opdf.columns)
        orows = list(opdf.itertuples(index=False, name=None))
        sh, oh = value_hash(cols, rows), value_hash(ocols, orows)
        ok = sh == oh and sorted(cols) == sorted(ocols) and len(rows) == len(orows)
        print(f"  {name:35s} {'OK ' if ok else 'MISMATCH'} rows={len(rows)}/{len(orows)} hash={sh}/{oh} [{took:.1f}s]")
        if not ok:
            failed.append(name)
        ledger[name] = {
            "rows_match": len(rows) == len(orows),
            "schema_match": sorted(cols) == sorted(ocols),
            "hash_match": sh == oh,
            "spark_rows": len(rows),
            "oracle_rows": len(orows),
            "err": None,
        }
    # Self-recorded full-registry ledger (r7 verdict item 6): the grading
    # driver samples ~50 queries per round, so most queries' last driver
    # verdict can be rounds old. DRIVE_ARTIFACT=path writes the driver-
    # format per-query verdicts for THIS checkout so every query has a
    # current hash verdict regardless of sampling.
    artifact = os.environ.get("DRIVE_ARTIFACT", "")
    if artifact:
        import json

        Path(artifact).write_text(json.dumps(
            {"sf_dir": SF_DIR, "n_queries": len(ledger),
             "n_failed": len(failed), "queries": ledger}, indent=1) + "\n")
        print(f"ledger -> {artifact} ({len(ledger)} queries, {len(failed)} failed)")
    print(f"{'FAIL: ' + ', '.join(failed) if failed else 'ALL MATCH'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
