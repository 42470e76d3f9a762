"""Round-12 additions: resolution-parameter query, gamma-CTE plumbing."""

from __future__ import annotations

import pytest

from eve_graph_spark import queries as registry


def test_louvain_gamma4_ring_suppresses_resolution_limit_merges(spark, sf_dir):
    """The reason gamma exists (Fortunato & Barthelemy): at gamma=1 the
    two-level pass on the 25-triangle ring merges cliques past the
    sqrt(2m) resolution limit (23 communities); at gamma=4 the scaled
    community-mass penalty keeps every triangle its own community (25).
    Both queries must run on the SAME edge fixture, differing only in
    gamma."""
    g1 = {
        r["node"]: r["community"]
        for r in registry.queries()["louvain_multilevel_ring"](spark, sf_dir).collect()
    }
    g4 = {
        r["node"]: r["community"]
        for r in registry.queries()["louvain_gamma4_ring"](spark, sf_dir).collect()
    }
    assert sorted(g1) == sorted(g4)  # same node set
    assert len(set(g1.values())) == 23
    assert len(set(g4.values())) == 25
    # gamma=4 must keep each triangle {3c, 3c+1, 3c+2} intact — higher
    # resolution splits MERGES, never the cliques themselves
    for c in range(25):
        assert g4[3 * c] == g4[3 * c + 1] == g4[3 * c + 2]


def test_gamma_factors_identity_is_byte_stable():
    """gamma=1 must emit NO factor strings, so every pre-existing gamma=1
    oracle's SQL is byte-identical to what shipped before the gamma
    plumbing (their committed hashes stay valid)."""
    from eve_graph_spark.queries import _gamma_factors

    assert _gamma_factors(1, 1) == ("", "")
    assert _gamma_factors(4, 1) == ("4 * ", "")
    assert _gamma_factors(3, 2) == ("3 * ", "2 * ")


def test_gamma4_oracle_sql_threads_gamma_through_both_levels():
    """The registered oracle must carry the gnum=4 factor in the gain of
    EVERY round of BOTH levels — a level that silently drops back to
    gamma=1 would still happen to hash-match on some fixtures."""
    sql = registry.oracle_sql()["louvain_gamma4_ring"]
    # 4 rounds at level 1 (lv1..lv4) + 4 rounds at level 2 (mv1..mv4)
    assert sql.count("- 4 * d.k * (") == 8


def _planted_bucket_docs(spark, n=30, base_words=40):
    """n DISTINCT near-identical docs (shared prefix + one unique word):
    exact-dup pre-collapse can't remove them, yet most land in the same
    LSH bucket(s) — the degenerate-bucket shape."""
    base = " ".join(f"w{i}" for i in range(base_words))
    rows = [(i, f"{base} unique{i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_max_bucket_size_bounds_pairs_and_keeps_clusters(spark):
    from eve_graph_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_dedup,
        minhash_signatures,
    )

    docs = _planted_bucket_docs(spark, n=30)
    sigs = minhash_signatures(docs)

    uncapped = lsh_candidate_pairs(sigs).collect()
    capped = lsh_candidate_pairs(sigs, max_bucket_size=8).collect()
    # the planted bucket must actually be degenerate for this test to
    # mean anything: all-pairs emits hundreds of candidates
    assert len(uncapped) > 100
    # capped: any bucket does at most C(8,2) pairs or a B-1 chain; with
    # 4 bands the total must collapse by an order of magnitude
    assert len(capped) < len(uncapped) / 3
    assert len(capped) >= 29  # connectivity floor: a spanning set exists

    # chain pairs are canonical and deterministic
    assert all(r["id_a"] < r["id_b"] for r in capped)
    assert sorted(map(tuple, capped)) == sorted(
        map(tuple, lsh_candidate_pairs(sigs, max_bucket_size=8).collect())
    )

    # CLUSTER recall is preserved end-to-end: after verification, the
    # capped pipeline still links all 30 docs into one component
    # (consecutive docs share base_words of ~base_words+1 shingles, so
    # every chain link passes the 0.5 threshold)
    verified = minhash_dedup(docs, threshold=0.5, max_bucket_size=8).collect()
    parent = {i: i for i in range(30)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in verified:
        parent[find(r["id_a"])] = find(r["id_b"])
    assert len({find(i) for i in range(30)}) == 1


def test_lsh_no_cap_is_byte_identical_to_before(spark):
    """max_bucket_size=None (every registered query) must keep the exact
    pre-r12 pair set — the cap is opt-in."""
    from eve_graph_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _planted_bucket_docs(spark, n=12)
    sigs = minhash_signatures(docs)
    pairs = sorted(map(tuple, lsh_candidate_pairs(sigs).collect()))
    # all-pairs over each bucket, canonical, distinct
    assert pairs == sorted(set(pairs))
    assert all(a < b for a, b in pairs)


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


@pytest.mark.slow  # >3s: full-tier only (r14 test tiers)
def test_eve_scout_writer_snapshot_roundtrip(spark, tmp_path):
    """r11 verdict item 8: source/sink symmetry. Write a signature frame
    through the registered writer, read it back through the registered
    reader — same rows; overwrite replaces, append without overwrite on
    an existing snapshot refuses."""
    import json

    import pytest

    from eve_graph_spark.sources.custom_datasource import register_eve_scout

    register_eve_scout(spark)
    src = tmp_path / "in.json"
    src.write_text(json.dumps(_SIG_RECS))
    df = spark.read.format("eve_scout").option("path", str(src)).load()

    out = tmp_path / "out.json"
    df.write.format("eve_scout").option("path", str(out)).mode("overwrite").save()
    back = spark.read.format("eve_scout").option("path", str(out)).load()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    # wormhole-only overwrite replaces the snapshot in place
    df.filter(df.signature_type == "wormhole").write.format("eve_scout").option(
        "path", str(out)
    ).mode("overwrite").save()
    again = spark.read.format("eve_scout").option("path", str(out)).load()
    assert {r["id"] for r in again.collect()} == {"sig-1"}

    # existing snapshot + no overwrite -> refused, snapshot intact
    with pytest.raises(Exception, match="use mode\\('overwrite'\\)"):
        df.write.format("eve_scout").option("path", str(out)).mode("append").save()
    assert {r["id"] for r in spark.read.format("eve_scout").option("path", str(out)).load().collect()} == {"sig-1"}


def test_eve_scout_writer_landing_dir_feeds_stream_reader(spark, tmp_path):
    """Landing-dir mode: each save publishes one new monotonically named
    poll file — exactly what the streaming reader consumes in filename
    order — and a failed publish never leaves a half-written poll."""
    import json
    import os

    from eve_graph_spark.sources.custom_datasource import register_eve_scout

    register_eve_scout(spark)
    src = tmp_path / "in.json"
    src.write_text(json.dumps(_SIG_RECS))
    df = spark.read.format("eve_scout").option("path", str(src)).load()

    land = tmp_path / "polls"
    df.write.format("eve_scout").option("path", str(land)).mode("overwrite").save()
    df.filter(df.signature_type == "wormhole").write.format("eve_scout").option(
        "path", str(land)
    ).mode("append").save()
    files = sorted(f for f in os.listdir(land) if f.endswith(".json"))
    assert files == ["poll-000000.json", "poll-000001.json"]
    assert len(json.load(open(land / "poll-000000.json"))) == 2
    assert len(json.load(open(land / "poll-000001.json"))) == 1
    # no stage/tmp residue — the two-phase commit cleaned up
    assert not [p for p in os.listdir(tmp_path) if "__stage" in p]
    assert not [f for f in os.listdir(land) if f.endswith(".tmp")]

    # the streaming reader replays the written polls in order
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("eve_scout")
        .schema("id string, signature_type string, out_system_id long, "
                "out_signature string, in_system_id long, in_signature string, "
                "max_ship_size string, expires_at string, remaining_hours long, "
                "poll_id long")
        .option("path", str(land))
        .load()
        .writeStream.format("memory")
        .queryName("writer_polls")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM writer_polls").collect()
    by_poll = {}
    for r in rows:
        by_poll.setdefault(r["poll_id"], []).append(r["id"])
    # poll 0 = full feed (+ sentinel None), poll 1 = wormhole only
    assert sorted(x for x in by_poll[0] if x) == ["sig-1", "sig-2"]
    assert sorted(x for x in by_poll[1] if x) == ["sig-1"]
