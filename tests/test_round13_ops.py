"""Round-13 pins: eve_scout writer hardening (ADVICE r12 + verdict item 8).

- landing-dir sequence derives from max existing poll number + 1, so a
  gap from an externally deleted poll can never cause a silent overwrite
  of a published file;
- racing appends to one landing dir each publish a DISTINCT poll
  (claim-by-hardlink, never os.replace over an existing name);
- the writer fails fast on a non-local master unless the caller asserts
  a shared filesystem, because staging uses plain open() on executors
  and the driver-side commit() re-reads those paths.
"""

from __future__ import annotations

import json
import os

import pytest

from eve_graph_spark.sources.custom_datasource import (
    SIGNATURE_DDL,
    _EveScoutWriter,
    register_eve_scout,
)

_SIG_RECS = [
    {"id": "sig-1", "signature_type": "wormhole", "out_system_id": 31000005,
     "out_signature": "ABC-123", "in_system_id": 30000142,
     "in_signature": "DEF-456", "max_ship_size": "large",
     "expires_at": "2024-01-01T12:00:00Z", "remaining_hours": 10},
    {"id": "sig-2", "signature_type": "gas", "out_system_id": 31000006,
     "out_signature": "GGG-777", "in_system_id": 30000144,
     "in_signature": "HHH-888", "max_ship_size": "small",
     "expires_at": "2024-01-01T13:00:00Z", "remaining_hours": 5},
]


def _feed_frame(spark, tmp_path):
    register_eve_scout(spark)
    src = tmp_path / "in.json"
    src.write_text(json.dumps(_SIG_RECS))
    return spark.read.format("eve_scout").option("path", str(src)).load()


def test_poll_seq_survives_gaps_never_overwrites(spark, tmp_path):
    """ADVICE r12: seq must be max(existing)+1, not len(existing) — after
    an early poll is deleted externally (retention), the next save must
    mint a NEW name, not reuse (and replace) the highest published one."""
    df = _feed_frame(spark, tmp_path)
    land = tmp_path / "polls"
    save = lambda d: d.write.format("eve_scout").option("path", str(land)).mode("append").save()
    save(df)          # poll-000000 (2 records)
    save(df.limit(1)) # poll-000001 (1 record)
    os.unlink(land / "poll-000000.json")  # retention gap
    save(df)          # must become poll-000002, NOT clobber poll-000001
    files = sorted(f for f in os.listdir(land) if f.endswith(".json"))
    assert files == ["poll-000001.json", "poll-000002.json"]
    assert len(json.load(open(land / "poll-000001.json"))) == 1  # intact
    assert len(json.load(open(land / "poll-000002.json"))) == 2


def test_racing_appends_each_publish_a_distinct_poll(spark, tmp_path):
    """Verdict r12 item 8: concurrent writers to one landing dir. Each of
    N racing saves must land in its own poll file with every record
    accounted for — the hardlink claim turns a same-seq race into a
    sequence bump instead of a silent overwrite."""
    # pinned-thread mode (default since 3.2) maps each Python thread to a
    # JVM thread with NO inherited active session, and Python data source
    # lookup is active-session-scoped — so each racing thread re-activates
    # the session first (test plumbing, not writer behavior under test)
    from pyspark import InheritableThread

    df = _feed_frame(spark, tmp_path)
    land = tmp_path / "polls"
    n_writers = 6
    errors: list[BaseException] = []

    def save() -> None:
        try:
            spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
                spark._jsparkSession
            )
            df.write.format("eve_scout").option("path", str(land)).mode("append").save()
        except BaseException as exc:  # threads swallow exceptions silently
            errors.append(exc)

    threads = [InheritableThread(target=save) for _ in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    files = sorted(f for f in os.listdir(land) if f.endswith(".json"))
    assert files == [f"poll-{i:06d}.json" for i in range(n_writers)]
    for f in files:
        assert len(json.load(open(land / f))) == len(_SIG_RECS)
    assert not [f for f in os.listdir(land) if f.endswith(".tmp")]
    assert not [p for p in os.listdir(tmp_path) if "__stage" in p]


def test_writer_fails_fast_on_non_local_master(spark, tmp_path, monkeypatch):
    """ADVICE r12: the local/shared-FS staging requirement must surface at
    plan time (__init__), not as a FileNotFoundError at commit after every
    task already ran; .option('sharedFs','true') asserts a shared mount."""
    from pyspark.sql import SparkSession
    from pyspark.sql.types import StructType

    class _FakeConf:
        def get(self, key, default=None):
            return "spark://cluster:7077" if key == "spark.master" else default

    class _FakeSession:
        conf = _FakeConf()

    monkeypatch.setattr(
        SparkSession, "getActiveSession", staticmethod(lambda: _FakeSession())
    )
    schema = StructType.fromDDL(SIGNATURE_DDL)
    with pytest.raises(ValueError, match="shared"):
        _EveScoutWriter(schema, {"path": str(tmp_path / "polls")}, False)
    # the shared-FS assertion unlocks cluster masters
    _EveScoutWriter(
        schema, {"path": str(tmp_path / "polls"), "sharedfs": "true"}, False
    )
