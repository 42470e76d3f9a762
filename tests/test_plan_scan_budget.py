"""Registry-wide scan budget: every registered query's physical plan may
scan each BIG table at most as many times as its committed budget.

Catalyst does not fuse or cache common subplans — a DataFrame consumed by
two downstream branches is PLANNED (and at run time, EXECUTED) twice. On
the local fixtures that is milliseconds; at 100 TB each extra count below
is a full fact/corpus scan. The round-5 sweep caught five operators
re-planning their expensive subtree this way (ann_ivf's recall harness,
exact-ANN query norms, Q21's EXISTS decorrelation, bm25/tfidf/unigram
vocab stats, diff_sync's anti-join pair); this test freezes the post-fix
counts so the class of regression can't silently return.

Dims (nation/region/supplier/part/customer-as-dim) are excluded: they are
broadcast-sized by layout contract (SCALE.md "Input layout"), and several
queries derive the local graph fixture from nation many times over —
9 scans of a 25-row table is not a scale hazard.

Regenerate after an intentional plan change:
    counts = re.findall(r"/(\\w+)\\.parquet", explain_formatted)
and update the entry with a comment saying why the new count is right.
"""

from __future__ import annotations

import collections
import re

import pytest

# slow tier: registry-wide scan-count sweep
pytestmark = pytest.mark.slow

from eve_graph_spark import queries as registry

BIG_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")

# Max scans per big table; queries not listed fall back to DEFAULT_CAP.
# Entries above 2 carry their justification inline.
DEFAULT_CAP = 2
BUDGET: dict[str, dict[str, int]] = {
    # exact-ANN family: candidate posexplode + corpus norms, plus TWO
    # pushdown-pruned scans of the |Q|-row query batch (isin filter
    # reaches the scan) — 2 full passes, not 4.
    "ann_brute_force_topk": {"embeddings": 4},
    "ann_ivf_topk": {"embeddings": 4},
    "hard_negatives_topk": {"embeddings": 4},
    # pair generation + two verification sides of the pair join; the
    # recompute-over-materialize tradeoff is documented in SCALE.md
    # ("MinHash dedup": signatures/shingles recompute scan-side rather
    # than persisting O(corpus) arrays).
    # r12 boolean-pinned form: the 4 pipeline scans + 2 exact-string
    # re-verify sides (the precision contract) + the doc_id spine of the
    # per-document verdict rows; the pair-sized verdict frame is
    # checkpointed so the two-endpoint explode cannot double the pipeline.
    "minhash_near_dups": {"documents": 7},
    "minhash_near_dups_portable": {"documents": 4},
    "ngram_jaccard_pairs": {"documents": 4},
    "containment_pairs": {"documents": 4},
    "containment_pairs_lsh": {"documents": 4},
    # consecutive-id pair source (2 pruned id scans) + two cosine sides
    "embedding_near_dups": {"embeddings": 4},
    # recall harness = exact-fixed-point side (same 4 as ann_ivf_topk:
    # candidates + norms + 2 pushdown-pruned query fetches) + the PQ
    # re-rank's shortlist id fetch. The PQ index itself is
    # localCheckpoint-materialized in ivf_pq_topk, so the encode scan
    # does NOT appear — the ADC probe stage reads zero embeddings.
    "ann_ivf_pq_topk": {"embeddings": 5},
    # benchmark side (doc_id<20 pushed down) + corpus side + zero-hit
    # left join back — the bench scans are eval-suite-sized after pushdown
    "bloom_decontaminate": {"documents": 3},
    "decontaminate_documents": {"documents": 3},
    # cluster pipeline (reps + member map-back) + quality column
    "dedup_survivors_quality": {"documents": 3},
    # expected set = union of two filtered scans, + current side
    "diff_sync": {"customer": 3},
    # union/intersect/except demo: one scan per set operand by definition
    "set_ops": {"customer": 3, "supplier": 3},
    # sketch agg + exact-rank check vs the broadcast estimates (the check
    # IS the second pass — documented in the query docstring); +1 from
    # the events_with_ts dtype branch
    "sketches": {"events": 3},
    # tighter than the default: the windowed-max/min rewrites guarantee a
    # single fact pass — pin it so the agg+join-back form can't return
    "q15_top_supplier": {"lineitem": 1},
    "q2_min_cost_supplier": {"lineitem": 1},
}


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_scan_budget(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    counts = collections.Counter(re.findall(r"/(\w+)\.parquet", plan))
    budget = BUDGET.get(name, {})
    for table in BIG_TABLES:
        cap = budget.get(table, DEFAULT_CAP)
        assert counts.get(table, 0) <= cap, (
            f"{name} scans {table} {counts[table]}x (budget {cap}) — a "
            "subtree is being planned more than once; see module docstring"
        )
