"""Unit tests for the round-4 curation operators: paragraph-level dedup
rate, token-budget selection, semantic sign-grid dedup, and incremental
snapshot dedup — synthetic corpora with hand-checked ground truth.
(Oracle parity over the fixture tables is covered by the driver contract;
these pin the semantics on shapes the fixtures don't contain.)"""

from __future__ import annotations

import pytest

from eve_graph_spark import queries as registry


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_paragraph_dedup_rate_hand_checked(spark, tmp_path):
    block_a = " ".join(f"w{i}" for i in range(20))
    block_b = " ".join(f"b{i}" for i in range(20))
    block_c = " ".join(f"c{i}" for i in range(20))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, f"{block_a} {block_b}", "en", "s", 0),  # chunks [A, B]
            (2, f"{block_a} {block_c}", "en", "s", 0),  # chunks [A, C]
            (3, "solo text", "en", "s", 0),  # one short chunk
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in registry.paragraph_dedup_rate(spark, sf).collect()}
    assert (got[1]["n_chunks"], got[1]["n_dup_chunks"], got[1]["dup_frac"]) == (2, 1, 0.5)
    assert (got[2]["n_chunks"], got[2]["n_dup_chunks"], got[2]["dup_frac"]) == (2, 1, 0.5)
    assert (got[3]["n_chunks"], got[3]["n_dup_chunks"], got[3]["dup_frac"]) == (1, 0, 0.0)


def test_token_budget_sample_boundary(spark, tmp_path, monkeypatch):
    # Identical 2-token docs whose quality is driven purely by word length:
    # selection must proceed best-quality-first and stop AT the budget.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "aa bb", "en", "s", 0),        # quality 2.5, 2 tokens
            (2, "aaaaaa bbbbbb", "en", "s", 0),  # quality 6.5, 2 tokens
            (3, "aaaa bbbb", "en", "s", 0),    # quality 4.5, 2 tokens
        ],
    )
    monkeypatch.setattr(registry, "TOKEN_BUDGET", 4)
    rows = {r["doc_id"]: r.asDict() for r in registry.token_budget_sample(spark, sf).collect()}
    # best two qualities (docs 2 then 3) fit the 4-token budget; doc 1 not
    assert set(rows) == {2, 3}
    assert rows[2]["cum_tokens"] == 2 and rows[3]["cum_tokens"] == 4
    assert all(r["n_tokens"] == 2 for r in rows.values())


def test_semantic_bucket_dedup_orthants(spark, tmp_path):
    emb = spark.createDataFrame(
        [
            (1, [1.0] * 64, 0),           # all-positive orthant: bucket 255
            (2, [0.5] * 64, 0),           # same orthant -> dup of 1
            (3, [-1.0] + [1.0] * 63, 0),  # dim0 negative: bucket 254
        ],
        "vec_id long, embedding array<float>, label int",
    )
    emb.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = {r["vec_id"]: r.asDict() for r in
           registry.semantic_bucket_dedup(spark, str(tmp_path)).collect()}
    assert got[1]["bucket"] == 255 and not got[1]["is_dup"]
    assert got[2]["bucket"] == 255 and got[2]["is_dup"]
    assert got[2]["survivor_vec_id"] == 1 and got[2]["n_members"] == 2
    assert got[3]["bucket"] == 254 and not got[3]["is_dup"] and got[3]["n_members"] == 1


def test_incremental_snapshot_dedup_matches_and_misses(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "same text", "en", "s", 0),   # old corpus
            (2, "other old", "en", "s", 0),   # old corpus
            (1, "same text", "en", "s", 0),   # new: dup of 0
            (3, "brand new", "en", "s", 0),   # new: unique
            (5, None, "en", "s", 0),          # new: NULL text never matches
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in
           registry.incremental_snapshot_dedup(spark, sf).collect()}
    assert got[1]["dup_of"] == 0 and got[1]["is_dup"]
    assert got[3]["dup_of"] is None and not got[3]["is_dup"]
    assert got[5]["dup_of"] is None and not got[5]["is_dup"]


def test_new_queries_have_oracles():
    oracles = registry.oracle_sql()
    for name in (
        "paragraph_dedup_rate",
        "token_budget_sample",
        "semantic_bucket_dedup",
        "incremental_snapshot_dedup",
    ):
        assert name in registry.queries() and name in oracles


@pytest.mark.parametrize("name", ["paragraph_dedup_rate", "token_budget_sample"])
def test_new_doc_queries_null_text_safe(spark, tmp_path, name):
    # A NULL-text doc must not crash the plan; it simply contributes no
    # chunks/tokens (oracle behaves identically: unnest(NULL) -> 0 rows).
    sf = _write_docs(spark, tmp_path, [(1, "some real text here", "en", "s", 0),
                                       (2, None, "en", "s", 0)])
    rows = registry.queries()[name](spark, sf).collect()
    assert {r["doc_id"] for r in rows} <= {1, 2}


def test_near_dup_clusters_precollapse_equivalence(spark):
    """The exact-dup pre-collapse must give the SAME clusters as direct
    member-level LSH+CC — including exact-dup groups, near-dup satellites
    bridging groups, and true singletons."""
    from pyspark.sql import functions as F

    from eve_graph_spark.operators.dedup import (
        near_dup_clusters,
        portable_minhash_near_dups,
    )
    from eve_graph_spark.operators.graph_analytics import connected_components

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    # exact group A: ids 0..4 identical; satellite 5 near-dups A
    rows += [(i, base) for i in range(5)]
    rows += [(5, base + " tail")]
    # exact group B: ids 10..12 identical, unrelated text
    other = "completely different words about spark shuffles and parquet files"
    rows += [(10 + i, other) for i in range(3)]
    # singletons
    rows += [(20, "unique text one of a kind entirely"), (21, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {r["doc_id"]: r["cluster"] for r in near_dup_clusters(docs).collect()}

    # direct member-level reference
    pairs = portable_minhash_near_dups(docs, threshold=0.5).select("id_a", "id_b")
    sym = pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d")).union(
        pairs.select(F.col("id_b").alias("s"), F.col("id_a").alias("d"))
    )
    cc = connected_components(sym, src_col="s", dst_col="d")
    direct = {
        r["doc_id"]: r["cluster"]
        for r in docs.join(cc, docs.doc_id == cc.node, "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("cluster"))
        .collect()
    }
    assert got == direct
    # and the shape is what we designed: A∪satellite one cluster rooted at 0
    assert {got[i] for i in range(6)} == {0}
    assert {got[i] for i in (10, 11, 12)} == {10}
    assert got[20] == 20 and got[21] == 21


def test_hard_negatives_topk_excludes_same_label(spark, tmp_path):
    # 1-d embeddings make cosine degenerate (all 1.0), so rank falls to the
    # vec_id tie-break — what matters here: same-label vectors are NEVER
    # negatives, the query itself is excluded, rank caps at 3.
    emb = spark.createDataFrame(
        [(0, [1.0] * 64, 7), (1, [1.0] * 64, 7), (2, [1.0] * 64, 8),
         (3, [1.0] * 64, 8), (4, [1.0] * 64, 9), (5, [1.0] * 64, 9)],
        "vec_id long, embedding array<float>, label int",
    )
    emb.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    rows = registry.hard_negatives_topk(spark, str(tmp_path)).collect()
    got = {(r["query_id"], r["negative_vec_id"]) for r in rows}
    # only query is vec_id 0 (label 7): negatives are 2,3,4 (tie-break by id)
    assert got == {(0, 2), (0, 3), (0, 4)}
    assert {r["rank"] for r in rows} == {1, 2, 3}
    assert all(r["cosine"] == pytest.approx(1.0) for r in rows)


def test_lang_temperature_resample_rates(spark, tmp_path):
    # en: 4 docs, zh: 1 doc -> min_n = 1, keep rate sqrt(1/4) = 0.5 for en,
    # 1.0 for zh. Knuth-hash threshold is deterministic: recompute it here.
    rows = [(i, f"text {i}", "en", "s", 0) for i in range(4)]
    rows += [(10, "rare", "zh", "s", 0)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r["keep_fp"] for r in
           registry.lang_temperature_resample(spark, sf).collect()}
    M = registry.RESAMPLE_MOD
    import math
    fp_en = math.floor(math.sqrt(1 / 4) * M + 0.5)
    expect = {i for i in range(4) if (i % M) * 2654435761 % M < fp_en} | {10}
    assert set(got) == expect
    assert got[10] == M  # rate 1.0 keeps every rare-lang doc


def test_containment_pairs_subset_detection(spark, tmp_path):
    # doc 2 is a strict prefix of doc 1: containment_b = 1.0 even though
    # Jaccard is well below any near-dup threshold.
    long = " ".join(f"w{i}" for i in range(30))
    short = " ".join(f"w{i}" for i in range(8))
    sf = _write_docs(spark, tmp_path, [(1, long, "en", "s", 0), (2, short, "en", "s", 0)])
    [r] = registry.containment_pairs(spark, sf).collect()
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment_b"] == 1.0  # every shingle of the short doc is in the long one
    assert r["containment_a"] < 0.3
    assert r["is_contained"]


def test_self_repetition_spans_looping_doc(spark, tmp_path):
    loop = " ".join(["a b c d e"] * 4)          # "a b c d e" 5-gram repeats
    clean = " ".join(f"u{i}" for i in range(10))  # all spans unique
    sf = _write_docs(spark, tmp_path, [(1, loop, "en", "s", 0),
                                       (2, clean, "en", "s", 0),
                                       (3, "too short", "en", "s", 0)])
    got = {r["doc_id"]: r.asDict() for r in registry.self_repetition_spans(spark, sf).collect()}
    assert 3 not in got  # <5 words -> no spans
    assert got[1]["top_span_n"] == 4  # the looped 5-gram appears 4 times
    assert got[1]["repeated_span_frac"] > 0.5
    assert got[2]["top_span_n"] == 1 and got[2]["repeated_span_frac"] == 0.0


def test_quality_deciles_partition_and_order(spark, tmp_path):
    # 20 docs with strictly increasing quality (word length) -> each decile
    # holds exactly 2 docs and min_q/max_q are non-decreasing across bins.
    rows = [(i, " ".join(["a" * (i + 2)] * 2), "en", "s", 0) for i in range(20)]
    sf = _write_docs(spark, tmp_path, rows)
    got = sorted((r["decile"], r.asDict()) for r in registry.quality_deciles(spark, sf).collect())
    assert [d for d, _ in got] == list(range(1, 11))
    assert all(r["n_docs"] == 2 for _, r in got)
    qs = [(r["min_q"], r["max_q"]) for _, r in got]
    assert all(qs[i][1] <= qs[i + 1][0] for i in range(9))


def test_event_anomaly_zscore_flags_and_guard(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # type "a": 20 values at 1.0 plus one at 100.0 -> outlier z >> 3;
    # type "b": constant -> zero variance -> NULL z, FALSE flag.
    vals = [("a", 1.0)] * 20 + [("a", 100.0)] + [("b", 5.0)] * 5
    base = 1_704_067_200_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array([base + i for i in range(len(vals))], pa.timestamp("us")),
        "user_id": pa.array([1] * len(vals), pa.int64()),
        "event_type": pa.array([t for t, _ in vals]),
        "value": pa.array([v for _, v in vals], pa.float64()),
        "props": pa.array(["{}"] * len(vals)),
    }), tmp_path / "events.parquet")
    got = {r["event_id"]: r.asDict() for r in
           registry.event_anomaly_zscore(spark, str(tmp_path)).collect()}
    assert got[20]["is_anomaly"] and got[20]["z"] > 4
    assert not got[0]["is_anomaly"] and got[0]["z"] < 0
    assert got[21]["z"] is None and got[21]["is_anomaly"] is False
