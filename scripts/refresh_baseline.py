#!/usr/bin/env python
"""Promote a bench run to BENCH_BASELINE.json, stripping result-only fields.

A baseline is a reference point, not a result dump: fields that describe a
specific run's outcome against the *previous* baseline ('regressions',
'failed', 'baseline_total_sec', 'warmup_sec') must not ride along, or the
next comparison silently self-references (ADVICE r4).

Usage: python scripts/refresh_baseline.py /tmp/bench_out.json [min_of ...]
With several input files, takes the per-query MIN across runs — the
standard way to strip scheduler noise from a single-machine measurement.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

BASELINE_FIELDS = ("metric", "unit", "sf", "queries")


def promote(paths: list[str], out: str = "BENCH_BASELINE.json") -> dict:
    runs = [json.loads(Path(p).read_text()) for p in paths]
    for p, r in zip(paths, runs):
        # r13: stdout went compact (slowest-K only) — promotion must read
        # the ARTIFACT files (BENCH_SELF_rN.json / BENCH_DETAIL_LAST.json),
        # or the next baseline silently shrinks to 20 queries
        if r.get("n_queries") and len(r.get("queries", {})) < r["n_queries"]:
            raise SystemExit(
                f"{p} is a compact stdout capture ({len(r.get('queries', {}))} "
                f"of {r['n_queries']} queries) — promote from the bench "
                "artifact file instead"
            )
    head = runs[0]
    queries: dict[str, float] = dict(head["queries"])
    for r in runs[1:]:
        for name, sec in r["queries"].items():
            queries[name] = min(queries.get(name, sec), sec)
    # shuffle WRITE RECORDS per query (r7): deterministic plan signature —
    # min across runs strips probe-memoization variation, nothing else
    # varies on a healthy plan
    # Since r8 bench.py writes the map to BENCH_SHUFFLE_ROWS.json (side
    # file) instead of stdout, so the driver's tail-capture keeps the
    # timings; fall back to it when the run JSON carries no map. The side
    # file reflects the LAST bench run on this checkout — promote right
    # after benching, as this script's usage already assumes.
    side = Path(__file__).resolve().parent.parent / "BENCH_SHUFFLE_ROWS.json"
    fallback = {}
    if side.exists():
        sdoc = json.loads(side.read_text())
        if sdoc.get("sf") == head.get("sf"):
            fallback = sdoc.get("shuffle_rows", {})
    # r13: bench stdout went compact; promotion inputs are now the full
    # artifact files, which carry the raw map as "shuffle_rows_raw"
    def _rows(r: dict) -> dict:
        return r.get("shuffle_rows") or r.get("shuffle_rows_raw") or {}

    shuffle_rows: dict[str, int] = dict(_rows(head) or fallback)
    for r in runs[1:]:
        for name, n in _rows(r).items():
            shuffle_rows[name] = min(shuffle_rows.get(name, n), n)
    base = {k: head[k] for k in BASELINE_FIELDS if k in head}
    base["queries"] = dict(sorted(queries.items()))
    base["value"] = round(sum(queries.values()), 3)
    if shuffle_rows:
        base["shuffle_rows"] = dict(sorted(shuffle_rows.items()))
    base["n_runs"] = len(runs)
    Path(out).write_text(json.dumps(base, indent=1) + "\n")
    return base


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    b = promote(sys.argv[1:])
    print(f"baseline: {b['value']}s over {len(b['queries'])} queries from {b['n_runs']} run(s)")
