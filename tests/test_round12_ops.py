"""Round-12 additions: resolution-parameter query, gamma-CTE plumbing."""

from __future__ import annotations

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
