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


# --- max_bucket_size="auto" (r12 verdict item 6) ---------------------------


def _planted_corpus(spark, n_mega: int = 120, n_bg: int = 60):
    """n_mega DISTINCT near-identical docs (shared boilerplate + one unique
    trailing word — exact-dup collapse can't remove them, LSH buckets
    them together) over a background of unrelated docs."""
    from pyspark.sql import functions as F

    base = " ".join(f"boiler{i}" for i in range(40))
    mega = spark.range(n_mega).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base + " unique"), F.col("id").cast("string")).alias("text"),
    )
    bg = spark.range(n_mega, n_mega + n_bg).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[(F.col("id") * (i + 3) % 997).cast("string") for i in range(30)]
        ).alias("text"),
    )
    return mega.unionByName(bg)


def test_auto_cap_is_noop_on_healthy_corpus(spark, sf_dir):
    """auto's cap is max(16, 8x p99.9 of bucket sizes) — far above any
    natural bucket on the fixture corpus (a handful of docs), so the
    emitted pairs must be IDENTICAL to the uncapped kernel."""
    from eve_graph_spark.operators.dedup import minhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = sorted(
        map(tuple, minhash_dedup(docs, threshold=0.5).collect())
    )
    auto = sorted(
        map(tuple, minhash_dedup(docs, threshold=0.5, max_bucket_size="auto").collect())
    )
    assert auto == plain and len(plain) > 0


@pytest.mark.slow  # >3s: full-tier only (r14 test tiers)
def test_auto_cap_bounds_planted_megabucket(spark):
    """On a planted boilerplate mega-bucket, auto must (a) collapse the
    O(B^2) candidate blowup without being told a cap, and (b) preserve the
    UNCAPPED cluster structure end-to-end: chain links are near-identical,
    so consecutive pairs pass the Jaccard verify and CC bridges every
    member the uncapped all-pairs join would have linked. (Whether LSH
    surfaces a given doc at all is the signature's probabilistic recall —
    measured identical here: one planted doc misses every shared band
    under BOTH settings.)"""
    from eve_graph_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        near_dup_clusters,
    )

    # auto is a HISTOGRAM rule: the degenerate bucket must be an outlier
    # among many buckets (the 100 TB regime) — with a handful of
    # background buckets the mega bucket IS the p99.9 and auto correctly
    # declines to chain. 2000 background docs ≈ 8000 size-1 buckets, so
    # p99.9 is 1 and the planted 120-doc bucket sits far past the cap.
    n_mega = 120
    docs = _planted_corpus(spark, n_mega=n_mega, n_bg=2000).localCheckpoint(eager=True)
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)
    n_uncapped = lsh_candidate_pairs(sigs).count()
    n_auto = lsh_candidate_pairs(sigs, max_bucket_size="auto").count()
    # C(120,2)=7140-ish uncapped; auto must cut it by >5x, not just trim
    assert n_auto * 5 < n_uncapped, (n_auto, n_uncapped)
    assert n_auto >= n_mega - 1  # chain keeps every planted doc linked

    plain = {
        (r["doc_id"], r["cluster"])
        for r in near_dup_clusters(docs, threshold=0.5).collect()
        if r["doc_id"] < n_mega
    }
    auto = {
        (r["doc_id"], r["cluster"])
        for r in near_dup_clusters(docs, threshold=0.5, max_bucket_size="auto").collect()
        if r["doc_id"] < n_mega
    }
    assert auto == plain
    # and the planted group really did cluster (dominant cluster holds
    # all but the signature-recall stragglers)
    from collections import Counter

    top = Counter(c for _, c in auto).most_common(1)[0][1]
    assert top >= n_mega - 2, top


def test_bucket_cap_rejects_unknown_string(spark):
    import pytest

    from eve_graph_spark.operators.dedup import minhash_signatures, lsh_candidate_pairs

    docs = _planted_corpus(spark, n_mega=4, n_bg=4)
    sigs = minhash_signatures(docs)
    with pytest.raises(ValueError, match="auto"):
        lsh_candidate_pairs(sigs, max_bucket_size="automatic").count()
