"""PySpark worker daemon with the heavyweight imports pre-loaded.

Drop-in replacement for ``pyspark.daemon`` (wired via
``spark.python.daemon.module``). The stock daemon process imports only
pyspark; every *forked worker* that unpickles a pandas UDF or a package
function then pays the numpy/pandas/pyarrow (+ this package) import chain
itself — measured ~0.3-0.5 s per worker on a quiet host, amplified under
CPU saturation.

That cost matters because Spark's ``PythonWorkerFactory`` reaps the ENTIRE
idle worker pool after 60 s without a Python task (a hard-coded
``IDLE_WORKER_TIMEOUT_NS`` constant — not configurable as of Spark 4.1),
so any workload that interleaves JVM-only queries with Python-path queries
re-pays a full pool re-fork+import at unpredictable points. Round 13
band-aided this in the bench harness (an untimed pool re-warm before every
python-path query); the engine-level fix is to make the re-fork cheap:
import the heavy modules ONCE in the daemon, before it starts forking —
children inherit the warm modules via copy-on-write, so a worker fork
costs milliseconds instead of an import chain.

Imports are best-effort: a worker environment without pandas must behave
exactly like the stock daemon (the import failure then surfaces, as
before, only when a UDF actually needs the module).
"""

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    # the package module whose functions ship to workers by reference
    # (multimodal's mapInArrow kernels) — importing it here means a forked
    # worker's unpickle is a dict lookup, not an import chain
    "eve_graph_spark.operators.multimodal",
):
    try:  # pragma: no cover — exercised via the daemon subprocess
        __import__(_mod)
    except Exception:  # noqa: BLE001 — missing optional dep ≡ stock daemon
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
