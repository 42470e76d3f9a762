"""Round-5 operators: Bloom decontamination, BM25 retrieval, duplicate
spans. Oracle parity is covered by test_oracle_parity.py (registry-driven);
these tests pin the semantic properties the hash can't see."""

from __future__ import annotations

import pytest

import hashlib

from pyspark.sql import functions as F

from eve_graph_spark import queries as registry

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_has_no_false_negatives(spark):
    """Bloom guarantee: every doc the exact decontaminator flags must be
    flagged by the Bloom path (false positives allowed, negatives not)."""
    exact = registry.queries()["decontaminate_documents"](spark, SF_DIR)
    bloom = registry.queries()["bloom_decontaminate"](spark, SF_DIR)
    missed = (
        exact.filter(F.col("contaminated"))
        .select("doc_id")
        .join(bloom.filter(F.col("flagged")).select("doc_id"), "doc_id", "left_anti")
    )
    assert missed.count() == 0


def test_bloom_hits_bounded_by_shingles(spark):
    rows = registry.queries()["bloom_decontaminate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_bloom_hits"] <= r["n_shingles"]
        assert r["flagged"] == (r["n_bloom_hits"] > 0)


def test_bm25_ranking_properties(spark):
    rows = registry.queries()["bm25_topk"](spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in registry.BM25_QUERIES}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= registry.BM25_TOPK
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_bm25_matches_brute_force_on_one_query(spark):
    """Cross-check query 1 against an independently-computed BM25 in
    plain Python over collected text (sf0.001 is small enough)."""
    import math

    docs = {
        r["doc_id"]: (r["text"] or "").lower().split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / float(n)
    terms = [t for qid, t in registry.BM25_QUERIES if qid == 1]
    scores = {}
    for did, ws in docs.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if not tf:
                continue
            df = sum(1 for w in docs.values() if t in w)
            idf = math.floor(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 0.5) / 1e6
            part = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (len(ws) / avgdl)))
            s += math.floor(idf * part * 1e9 + 0.5)
        if s:
            scores[did] = s
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: registry.BM25_TOPK]
    got = (
        registry.queries()["bm25_topk"](spark, SF_DIR)
        .filter(F.col("query_id") == 1)
        .orderBy("rank")
        .collect()
    )
    assert [(r["doc_id"], round(r["score"] * 1e9)) for r in got] == [
        (d, round(s)) for d, s in expected
    ]


def test_duplicate_spans_are_maximal_and_in_bounds(spark):
    spans = registry.queries()["duplicate_text_spans"](spark, SF_DIR).collect()
    assert spans
    lens = {
        r["doc_id"]: len((r["text"] or "").lower().split(" "))
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in spans:
        assert r["span_end"] - r["span_start"] >= 4
        assert r["n_shingles"] == r["span_end"] - 4 - r["span_start"] + 1
        assert 0 <= r["span_start"] and r["span_end"] <= lens[r["doc_id"]] - 1
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    # islands are maximal: spans in a doc can't touch (gap >= 1 shingle pos)
    for sp in by_doc.values():
        sp.sort()
        for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
            assert s2 > e1 - 4 + 1, "adjacent duplicated positions were not merged"


def test_duplicate_spans_shingles_really_cross_doc(spark):
    """Each reported span's first 5-gram must occur in >= 2 distinct docs."""
    texts = {
        r["doc_id"]: (r["text"] or "").lower().split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    occurs: dict[str, set] = {}
    for did, ws in texts.items():
        for i in range(len(ws) - 4):
            occurs.setdefault(" ".join(ws[i : i + 5]), set()).add(did)
    spans = registry.queries()["duplicate_text_spans"](spark, SF_DIR).collect()
    for r in spans[:200]:
        g = " ".join(texts[r["doc_id"]][r["span_start"] : r["span_start"] + 5])
        assert len(occurs[g]) >= 2


def test_curate_document_stream(spark, tmp_path):
    """Streaming curation: quality filter, cross-batch digest dedup within
    the watermark, stream-static contamination flag."""
    import json

    from eve_graph_spark.streaming.windows import curate_document_stream

    good = "the quick brown fox jumps over the lazy dog near the river bank today"
    bench = "benchmark eval suite question answer pair held out for testing models"
    base = 1_700_000_000
    b0 = [
        {"doc_id": 1, "ts": base, "text": good},
        {"doc_id": 2, "ts": base + 1, "text": "x"},          # low quality -> dropped
        {"doc_id": 3, "ts": base + 2, "text": bench},
    ]
    b1 = [
        {"doc_id": 4, "ts": base + 10, "text": good},        # dup of doc 1 -> dropped
        {"doc_id": 5, "ts": base + 11, "text": good + " extra words here"},
    ]
    p = tmp_path / "docs"
    p.mkdir()
    for i, rows in enumerate([b0, b1]):
        (p / f"b{i}.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    raw = (
        spark.readStream.schema("doc_id long, ts long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(p))
        .withColumn("ts", F.timestamp_seconds("ts"))
    )
    bench_dim = spark.createDataFrame(
        [(hashlib.md5(bench.encode()).hexdigest(),)], "digest string"
    )
    out = curate_document_stream(raw, bench_dim, min_quality=2.0)
    q = (
        out.writeStream.format("memory")
        .queryName("curated")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_curated"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM curated").collect()}
    assert set(rows) == {1, 3, 5}, rows           # 2 low-quality, 4 dup
    assert rows[3]["contaminated"] is True
    assert rows[1]["contaminated"] is False
    assert rows[1]["quality"] >= 2.0 and rows[1]["lang_guess"] is not None


# --- duplicate_text_spans fuzz vs a brute-force Python oracle ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# tiny vocabulary forces frequent cross-doc 5-gram collisions
_doc = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14).map(" ".join)
_corpora = st.lists(_doc, min_size=2, max_size=6)


def _py_duplicate_spans(texts: list[str]):
    occurs: dict[str, set] = {}
    grams: dict[int, list] = {}
    for did, t in enumerate(texts):
        ws = t.lower().split(" ")
        grams[did] = [" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)] if len(ws) >= 5 else []
        for g in grams[did]:
            occurs.setdefault(g, set()).add(did)
    spans = set()
    for did, gs in grams.items():
        dup = [i for i, g in enumerate(gs) if len(occurs[g]) >= 2]
        start = None
        prev = None
        for i in dup + [None]:
            if i is not None and prev is not None and i == prev + 1:
                prev = i
                continue
            if prev is not None:
                spans.add((did, start, prev + 4, prev - start + 1))
            start = prev = i
    return spans


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_corpora)
@pytest.mark.slow  # >3s: full-tier only (r14 test tiers)
def test_duplicate_spans_match_brute_force(spark, tmp_path_factory, texts):
    tmp = tmp_path_factory.mktemp("spans_fuzz")
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_shingles"])
        for r in registry.queries()["duplicate_text_spans"](spark, str(tmp)).collect()
    }
    assert got == _py_duplicate_spans(texts)
