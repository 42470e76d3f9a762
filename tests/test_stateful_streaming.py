"""applyInPandasWithState operators: state persists across micro-batches,
timeouts fire on watermark advance."""

from __future__ import annotations

import pytest

import json

from pyspark.sql import functions as F


def _stream_dir(tmp_path, name, batches):
    import os
    import time

    p = tmp_path / name
    p.mkdir()
    base = time.time() - len(batches)
    for i, rows in enumerate(batches):
        f = p / f"b{i}.jsonl"
        f.write_text("\n".join(json.dumps(r) for r in rows))
        # FileStreamSource orders files by MODIFICATION TIME, not name:
        # files written within the same ms get processed in arbitrary
        # order, so pin strictly increasing mtimes for batch determinism
        os.utime(f, (base + i, base + i))
    return str(p)


def _run(stream_df, qname, tmp_path, mode="update"):
    import time

    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    # availableNow queries whose stateful operator uses a PROCESSING-TIME
    # timeout (the near-dup roster's idle TTL) never self-terminate: after
    # the file backlog drains, Spark keeps scheduling wall-clock timeout
    # batches forever (each processes 0 input rows), so a blind
    # awaitTermination(120) always burns the full 2 minutes. Wait for
    # termination in 2 s slices; once the query HAS processed data and the
    # last two completed batches were 0-input (pure timeout batches), the
    # backlog is drained — stop it.
    deadline = time.time() + 120
    zero_input = 0
    seen_data = False
    last_batch = None
    while time.time() < deadline:
        if q.awaitTermination(2):
            return q
        prog = q.lastProgress
        if prog is None or prog["batchId"] == last_batch:
            # same completed batch observed across two polls — counting it
            # twice would stop the query prematurely (ADVICE r8)
            continue
        last_batch = prog["batchId"]
        if prog["numInputRows"] > 0:
            seen_data = True
            zero_input = 0
        elif seen_data:
            zero_input += 1
            if zero_input >= 2:
                break
    q.stop()
    q.awaitTermination(30)
    return q


def test_running_user_stats_accumulates_across_batches(spark, tmp_path):
    from eve_graph_spark.streaming.stateful import running_user_stats

    base = 1_700_000_000
    b0 = [{"user_id": 1, "ts": base + i, "value": 2.0} for i in range(3)]
    b1 = [{"user_id": 1, "ts": base + 10 + i, "value": 4.0} for i in range(2)]
    path = _stream_dir(tmp_path, "ev", [b0, b1])
    raw = (
        spark.readStream.schema("user_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(path)
        .withColumn("ts", F.timestamp_seconds("ts"))
    )
    _run(running_user_stats(raw), "stats", tmp_path)
    rows = spark.sql("SELECT * FROM stats").collect()
    # memory sink in update mode appends each batch's emission: the LAST
    # row per user carries the final running totals
    final = sorted(rows, key=lambda r: r["n_events"])[-1]
    assert final["n_events"] == 5
    assert final["sum_value"] == 3 * 2.0 + 2 * 4.0
    assert final["ewma_value"] is not None


def test_wormhole_ttl_open_then_closed(spark, tmp_path):
    from eve_graph_spark.streaming.stateful import wormhole_ttl_stream

    base_ms = 1_700_000_000_000
    # batch 0: wormhole A expiring soon; batch 1: later-expiring B advances
    # the watermark past A's expiry -> A times out and closes
    b0 = [{"id": "A", "in_system_id": 1, "out_system_id": 2, "expires_at": base_ms}]
    b1 = [{"id": "B", "in_system_id": 3, "out_system_id": 4,
           "expires_at": base_ms + 3_600_000}]
    path = _stream_dir(tmp_path, "sigs", [b0, b1])
    raw = (
        spark.readStream.schema(
            "id string, in_system_id long, out_system_id long, expires_at long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(path)
        .withColumn("expires_at", F.timestamp_millis("expires_at"))
    )
    _run(wormhole_ttl_stream(raw), "ttl", tmp_path, mode="append")
    rows = spark.sql("SELECT * FROM ttl").collect()
    got = {(r["sig_id"], r["status"]) for r in rows}
    assert ("A", "open") in got
    assert ("B", "open") in got
    assert ("A", "closed") in got  # timed out once watermark passed expiry
    assert ("B", "closed") not in got


def test_near_dup_hits_stream_across_batches(spark, tmp_path):
    from eve_graph_spark.streaming.stateful import near_dup_hits_stream

    text_a = "the quick brown fox jumps over the lazy dog and runs far away"
    b0 = [
        {"doc_id": 1, "text": text_a},
        {"doc_id": 2, "text": "completely different content about spark execution plans"},
    ]
    b1 = [
        {"doc_id": 3, "text": text_a},  # matches doc 1 FROM STATE (prev batch)
        {"doc_id": 4, "text": "yet another unrelated blob of words entirely"},
        {"doc_id": 5, "text": text_a},  # matches 1 (state) AND 3 (same batch)
    ]
    path = _stream_dir(tmp_path, "docs", [b0, b1])
    raw = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(path)
    _run(near_dup_hits_stream(raw, threshold=0.5), "near_hits", tmp_path, mode="append")
    rows = spark.sql("SELECT * FROM near_hits").collect()
    pairs = {(r["doc_id"], r["matched_doc_id"]) for r in rows}
    # identical text -> identical signature -> est 1.0 in every colliding band
    assert (3, 1) in pairs  # state persisted across micro-batches
    assert (5, 1) in pairs and (5, 3) in pairs  # intra-batch roster append
    assert all(r["est_jaccard"] >= 0.5 for r in rows)
    assert {r["doc_id"] for r in rows} <= {3, 5}  # unrelated docs never flagged
    for r in rows:
        if (r["doc_id"], r["matched_doc_id"]) == (3, 1):
            assert r["est_jaccard"] == 1.0


@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_near_dup_stream_redelivery_keeps_single_roster_entry(spark, tmp_path):
    """ADVICE r5: a re-delivered doc_id (micro-batch replay, duplicate
    source rows) must refresh its roster entry in place, not append a
    duplicate — or a later match would emit duplicate hit rows for the
    same (doc, matched) pair in the same band."""
    from eve_graph_spark.streaming.stateful import near_dup_hits_stream

    text_a = "the quick brown fox jumps over the lazy dog and runs far away"
    b0 = [{"doc_id": 1, "text": text_a}]
    b1 = [{"doc_id": 1, "text": text_a}]  # re-delivery of doc 1
    b2 = [{"doc_id": 2, "text": text_a}]  # matches doc 1 exactly once
    path = _stream_dir(tmp_path, "docs_redeliver", [b0, b1, b2])
    raw = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(path)
    _run(near_dup_hits_stream(raw, threshold=0.5), "near_redeliver", tmp_path,
         mode="append")
    rows = spark.sql("SELECT * FROM near_redeliver").collect()
    # self-redelivery emits nothing (mid == did guard)
    assert not [r for r in rows if r["doc_id"] == 1]
    # doc 2 hits doc 1 exactly ONCE per colliding band — duplicate roster
    # entries would double every (2, 1, band) row
    per_band: dict = {}
    for r in rows:
        assert (r["doc_id"], r["matched_doc_id"]) == (2, 1)
        per_band[r["band"]] = per_band.get(r["band"], 0) + 1
    assert per_band and all(n == 1 for n in per_band.values()), per_band


@pytest.mark.slow  # >10s: full-tier only (r14 test tiers)
def test_near_dup_stream_redelivery_refreshes_roster_recency(spark, tmp_path):
    """r6 verdict item 5: a refreshed doc_id moves to the roster END, so
    the state_cap truncation (keep newest) honors recency — a just-seen
    doc must not be evicted as if it were the oldest entry."""
    from eve_graph_spark.streaming.stateful import near_dup_hits_stream

    text_a = "the quick brown fox jumps over the lazy dog and runs far away"
    b0 = [{"doc_id": 1, "text": text_a}, {"doc_id": 2, "text": text_a}]
    b1 = [{"doc_id": 1, "text": text_a}]  # refresh 1: roster order -> [2, 1]
    b2 = [{"doc_id": 3, "text": text_a}]  # cap 2 evicts the OLDEST -> [1, 3]
    b3 = [{"doc_id": 4, "text": text_a}]  # probes the surviving roster
    path = _stream_dir(tmp_path, "docs_recency", [b0, b1, b2, b3])
    raw = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(path)
    _run(near_dup_hits_stream(raw, threshold=0.5, state_cap=2), "near_recency",
         tmp_path, mode="append")
    rows = spark.sql("SELECT * FROM near_recency").collect()
    probe_hits = {r["matched_doc_id"] for r in rows if r["doc_id"] == 4}
    # refreshed doc 1 survived the cap; stale doc 2 was the one evicted
    # (the old refresh-in-place form kept 1 at position 0 and evicted it)
    assert probe_hits == {1, 3}, probe_hits


def test_near_dup_state_fn_restores_empty_roster(spark):
    """ADVICE r6: a persisted EMPTY roster restores as a 1-D (0,) array;
    the state fn must normalize it to 2-D before roster.shape[1]."""
    import pandas as pd

    from eve_graph_spark.streaming.stateful import _make_near_dup_fn

    class FakeState:
        exists = True
        hasTimedOut = False
        get = ([], [])

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            pass

    fn = _make_near_dup_fn(threshold=0.5, state_cap=4, idle_ttl_ms=1000)
    batch = pd.DataFrame({"doc_id": [7], "__sig": [[1, 2, 3, 4, 5, 6, 7, 8]]})
    st = FakeState()
    out = list(fn((0, 0), iter([batch]), st))
    assert len(out) == 1 and len(out[0]) == 0  # nothing to match against
    assert st.updated[0] == [7]  # doc entered the roster without raising
