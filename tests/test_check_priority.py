"""The driver oracle-checks the first 50 entries of queries() per round.

These tests pin the derived ordering contract (VERDICT r2 item 1 / ADVICE):
never-driver-checked queries always lead the window, queries modified this
round follow immediately, and queries() / oracle_sql() agree on the order —
so no query can ship a round of changes with local-only verification.
"""

from __future__ import annotations

import json

from eve_graph_spark import queries as registry

DRIVER_WINDOW = 50


def test_tier_derivation_from_correctness_files(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "green_q": {"hash_match": True, "err": None},
        "red_then_green": {"hash_match": False, "err": None},
        "rows_only_q": {"hash_match": None, "err": "no_oracle"},
        "crashed_q": {"hash_match": None, "err": "AnalysisException: boom"},
    }))
    # a later round supersedes the earlier row for the same query
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "red_then_green": {"hash_match": True, "err": None},
    }))
    tiers = registry._correctness_tiers(root=tmp_path)
    assert tiers["green_q"] == 2
    assert tiers["red_then_green"] == 2      # latest round wins
    assert tiers["rows_only_q"] == 2         # rows-only-by-design is not red
    assert tiers["crashed_q"] == 1
    assert "never_seen" not in tiers         # absent => tier 0 by default


def test_tier_derivation_survives_missing_or_corrupt_files(tmp_path):
    assert registry._correctness_tiers(root=tmp_path) == {}
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    assert registry._correctness_tiers(root=tmp_path) == {}


def test_never_checked_queries_lead_the_driver_window():
    names = list(registry.queries())
    tiers = registry._correctness_tiers()
    never = [n for n in names if tiers.get(n, 0) == 0]
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in never if n not in window]
    assert not missing, f"never-driver-checked queries outside window: {missing}"
    # and they come before every previously-green query
    if never:
        last_never = max(names.index(n) for n in never)
        first_green = min(
            (names.index(n) for n in names if tiers.get(n, 0) == 2
             and n not in registry._MODIFIED_THIS_ROUND),
            default=len(names),
        )
        assert last_never < first_green


def test_modified_this_round_queries_in_driver_window():
    names = list(registry.queries())
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in registry._MODIFIED_THIS_ROUND
               if n in names and n not in window]
    assert not missing, f"modified-this-round queries outside window: {missing}"


def test_queries_and_oracles_agree_on_order():
    qnames = list(registry.queries())
    onames = list(registry.oracle_sql())
    # oracle_sql() is a subsequence of queries() in the same relative order
    positions = {n: i for i, n in enumerate(qnames)}
    assert all(n in positions for n in onames)
    assert [positions[n] for n in onames] == sorted(positions[n] for n in onames)
