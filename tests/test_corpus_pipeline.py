"""CorpusPipeline facade: stage semantics on synthetic docs, plan shape
of the composed chain, and parity of the chained form with the registry's
standalone curation query stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eve_graph_spark.pipeline import CorpusPipeline

EN = "the cat and the dog play in the park and it is a good day for all of them"
ES = "el perro y la casa de la familia es un lugar que se ve en la foto no"
DUP = EN
NEAR = "The cat" + EN[len("the cat"):]  # case variant: md5 differs, shingle set identical
SHORT = "tiny text"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, EN, "web"),
        (2, ES, "web"),
        (3, DUP, "web"),
        (4, NEAR, "books"),
        (5, SHORT, "books"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_filter_lang(docs):
    ids = {r["doc_id"] for r in CorpusPipeline(docs).filter_lang("en").df().collect()}
    assert 1 in ids and 3 in ids
    assert 2 not in ids


def test_dedup_exact_keeps_min_id(docs):
    ids = {r["doc_id"] for r in CorpusPipeline(docs).dedup_exact().df().collect()}
    assert 1 in ids and 3 not in ids
    assert {2, 4, 5} <= ids


def test_dedup_near_drops_higher_id_of_pair(docs):
    out = CorpusPipeline(docs).dedup_exact().dedup_near(threshold=0.5).df()
    ids = {r["doc_id"] for r in out.collect()}
    # NEAR differs only in case: survives exact dedup (md5), but its
    # lowercased shingle set is identical (jaccard 1.0 -> every LSH band
    # collides, so detection is deterministic, not hash-lottery)
    assert 1 in ids and 4 not in ids


def test_decontaminate_drops_overlapping(spark, docs):
    bench = spark.createDataFrame([(100, EN)], "doc_id long, text string")
    ids = {r["doc_id"] for r in CorpusPipeline(docs).decontaminate(bench).df().collect()}
    assert 1 not in ids and 3 not in ids and 4 not in ids  # share 5-grams with EN
    assert 2 in ids and 5 in ids


def test_sample_fraction_is_deterministic(docs):
    a = {r["doc_id"] for r in CorpusPipeline(docs).sample_fraction(0.5).df().collect()}
    b = {r["doc_id"] for r in CorpusPipeline(docs).sample_fraction(0.5).df().collect()}
    assert a == b


def test_pack_sequences_schema_and_bins(docs):
    out = CorpusPipeline(docs).pack_sequences(capacity=10)
    assert set(out.columns) == {"doc_id", "source", "n_tokens", "bin", "bin_offset"}
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["bin"] == 0  # first doc of its shard starts bin 0


def test_stats_counts_tokens(docs):
    r = CorpusPipeline(docs).stats().collect()[0]
    assert r["n_docs"] == 5
    assert r["n_tokens"] > 0


def test_chain_composes_into_one_plan(docs):
    # filters chained after dedup still reach the scan: the whole chain is
    # one Catalyst plan, not per-stage materialization
    df = (
        CorpusPipeline(docs)
        .filter_lang("en")
        .filter_quality(0.0)
        .dedup_exact()
        .sample_fraction(1.0)
        .df()
    )
    plan = df._jdf.queryExecution().toString()
    assert "Exchange" in plan  # dedup's one shuffle
    # and it still evaluates correctly end-to-end: EN survives its exact
    # dup (3); NEAR (4) is not an exact dup so exact-dedup keeps it
    assert {r["doc_id"] for r in df.collect()} == {1, 4}


def test_full_curation_matches_registry_query(spark):
    # the fluent chain over real data reproduces the standalone pipeline's
    # lang+quality+dedup stages (before shuffle/top-k, which the registry
    # query adds)
    from eve_graph_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    chained = (
        CorpusPipeline(docs).filter_lang("en").filter_quality(5.2).dedup_exact().df()
    )
    from eve_graph_spark.operators.text_analysis import lang_id_expr, quality_score_expr

    manual = docs.filter(lang_id_expr(F.col("text")) == "en").filter(
        quality_score_expr(F.col("text")) > 5.2
    )
    keep = manual.groupBy(F.md5(F.encode("text", "utf-8")).alias("d")).agg(
        F.min("doc_id").alias("doc_id")
    )
    manual_ids = {r["doc_id"] for r in keep.collect()}
    assert {r["doc_id"] for r in chained.select("doc_id").collect()} == manual_ids
