from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")

SF_SMALL = "/root/testdata/sf0.001"


def pytest_ignore_collect(collection_path, config):
    """Skip IMPORTING the slow-marked modules whose COLLECTION itself is
    expensive when the slow tier is deselected (the default, pytest.ini):
    test_hostile_documents_parity discovers its parametrize list by
    constructing every registered query plan — minutes of work (and a
    SparkSession) that a `-m "not slow"` run would throw away, since
    marker deselection happens only after import. The full-tier run
    (scripts/run_full_tests.sh) collects it normally."""
    if collection_path.name == "test_hostile_documents_parity.py":
        if config.getoption("-m", default="").strip() == "not slow":
            return True  # fast tier: don't even import it
    return None


@pytest.fixture(scope="session")
def spark():
    from eve_graph_spark.session import get_spark

    s = get_spark("eve-graph-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(autouse=True, scope="module")
def _reclaim_spark_blocks():
    """Per-module block-manager hygiene for the shared session (r7 verdict
    item 6): 550 tests in ONE session accumulate persisted projections,
    localCheckpoint blocks, and broadcast variables faster than the JVM
    GC-driven ContextCleaner reaps them — by minute ~40 the r7 suite hit a
    broadcast OOM that no individual test reproduces. After each module,
    drop every cached frame (the memoized graph fixtures re-persist
    lazily on next use — they are 25-row frames, the rebuild is free) and
    nudge the JVM so the cleaner processes the newly unreachable blocks.
    """
    yield
    from pyspark.sql import SparkSession

    s = SparkSession._instantiatedSession  # don't CREATE one just to clean
    if s is None:
        return
    try:
        s.catalog.clearCache()
        from eve_graph_spark.sources import graph_fixture

        graph_fixture._FIXTURE_CACHE.clear()
        s.sparkContext._jvm.System.gc()
    except Exception:
        pass  # a stopped/broken session must not fail unrelated modules
