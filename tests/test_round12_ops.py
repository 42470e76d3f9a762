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
