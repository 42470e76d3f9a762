"""CorpusPipeline — the data-side engine facade (GraphEngine's sibling).

The reference exposes its graph surface as a handful of HTTP routes
(reference: src/main.rs:60-78); `api.py:GraphEngine` mirrors that. The
north-star extension is a training-data engine, and this is its front
door: a fluent, lazy builder over the `documents` table that chains the
curation operators the way a production corpus job does —

    CorpusPipeline(docs)
        .filter_lang("en")
        .filter_quality(5.2)
        .dedup_exact()
        .decontaminate(benchmark)
        .sample_fraction(0.1)
        .df()

Every stage returns a NEW pipeline over a lazily-composed DataFrame —
nothing executes until an action; Catalyst sees the WHOLE chain as one
plan, so filters still push into the scan even when stages were added in
"wrong" order by the caller. No stage collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eve_graph_spark.operators.dedup import shingles_expr
from eve_graph_spark.operators.text_analysis import (
    lang_id_expr,
    quality_score_expr,
    token_count,
)


_KNUTH = 2654435761


def _knuth_mod(col, m: int):
    """(id * 2654435761) % m without int64 overflow.

    Reduce both factors mod m first: identical residue for id >= 0, and the
    product is bounded by m * (2654435761 % m) < ~7e17 for any m <= ~1e9 —
    safe under Spark 4 ANSI mode for arbitrary int64 ids (the naive product
    overflows at id >= ~3.5e9). Ports verbatim to the DuckDB oracles.
    """
    return (col % m) * (_KNUTH % m) % m


class CorpusPipeline:
    """Lazy curation chain over a documents DataFrame with columns
    (doc_id long, text string, ...)."""

    def __init__(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        self._df = docs
        self._id = id_col
        self._text = text_col

    def _with(self, df: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(df, self._id, self._text)

    def df(self) -> DataFrame:
        return self._df

    # --- filters (pure column predicates: run in the scan stage) ---------

    def filter_lang(self, lang: str) -> "CorpusPipeline":
        return self._with(self._df.filter(lang_id_expr(F.col(self._text)) == lang))

    def filter_quality(self, min_score: float) -> "CorpusPipeline":
        return self._with(
            self._df.filter(quality_score_expr(F.col(self._text)) > min_score)
        )

    def filter_length(self, min_tokens: int = 0, max_tokens: int = 1 << 31) -> "CorpusPipeline":
        t = token_count(F.col(self._text))
        return self._with(self._df.filter((t >= min_tokens) & (t <= max_tokens)))

    # --- dedup ------------------------------------------------------------

    def dedup_exact(self) -> "CorpusPipeline":
        """Keep the min-id row per distinct text digest (W11 generalized)."""
        d = self._df
        keep = d.groupBy(F.md5(F.encode(self._text, "utf-8")).alias("__dg")).agg(
            F.min(self._id).alias(self._id)
        )
        return self._with(d.join(keep.select(self._id), self._id, "left_semi"))

    def dedup_near(self, threshold: float = 0.8,
                   max_bucket_size: int | str | None = "auto") -> "CorpusPipeline":
        """MinHash-LSH near-dup removal: drop every doc that is the
        higher id of a verified near-dup pair (greedy keep-min; for
        transitive cluster semantics see `dedup_pipeline_documents`,
        which runs connected components over the pair graph).

        ``max_bucket_size`` defaults to "auto" HERE (r12 verdict item 6):
        the pipeline facade is what a 100 TB curation job drives, and a
        degenerate LSH bucket (template spam, boilerplate) must not
        require the operator to know about the hazard in advance — the
        histogram-derived cap (see dedup._bucket_pairs) never fires on a
        healthy corpus and bounds the blowup on a degenerate one. Pass
        None for the raw uncapped kernel, or an int to pin the cap."""
        from eve_graph_spark.operators.dedup import minhash_dedup

        pairs = minhash_dedup(self._df, text_col=self._text, id_col=self._id,
                              threshold=threshold,
                              max_bucket_size=max_bucket_size)
        losers = pairs.select(F.col("id_b").alias(self._id)).distinct()
        return self._with(self._df.join(losers, self._id, "left_anti"))

    # --- decontamination --------------------------------------------------

    def decontaminate(self, benchmark: DataFrame, k: int = 5) -> "CorpusPipeline":
        """Drop docs sharing any k-gram with the (small, broadcast)
        benchmark set."""
        bench_sh = (
            benchmark.select(F.explode(shingles_expr(self._text, k)).alias("__sh"))
            .distinct()
        )
        d = self._df
        hit_ids = (
            d.select(self._id, F.explode(shingles_expr(self._text, k)).alias("__sh"))
            .join(F.broadcast(bench_sh), "__sh")
            .select(self._id)
            .distinct()
        )
        return self._with(d.join(hit_ids, self._id, "left_anti"))

    # --- sampling / ordering ---------------------------------------------

    def sample_fraction(self, fraction: float) -> "CorpusPipeline":
        """Deterministic hash sample (reproducible across runs/engines)."""
        bound = int(fraction * 1000000)
        return self._with(
            self._df.filter(_knuth_mod(F.col(self._id), 1000000) < bound)
        )

    def shuffle(self) -> "CorpusPipeline":
        """Attach a deterministic pseudo-random position (training order)."""
        return self._with(
            self._df.withColumn(
                "shuffle_pos", _knuth_mod(F.col(self._id), 1000000007)
            )
        )

    # --- terminal transforms ----------------------------------------------

    def pack_sequences(self, capacity: int = 2048, shard_col: str = "source") -> DataFrame:
        """Sequential token-packing into context bins, one stream per shard."""
        d = self._df
        toks = d.select(
            self._id, shard_col, token_count(F.col(self._text)).cast("long").alias("n_tokens")
        )
        w = (
            Window.partitionBy(shard_col)
            .orderBy(self._id)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = toks.withColumn("prev_cum", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        return cum.select(
            self._id,
            shard_col,
            "n_tokens",
            F.floor(F.col("prev_cum") / F.lit(capacity)).cast("long").alias("bin"),
            (F.col("prev_cum") % capacity).alias("bin_offset"),
        )

    def stats(self) -> DataFrame:
        """One-row corpus summary (docs, tokens) — exact fixed counts."""
        return self._df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(self._text)).cast("long")).alias("n_tokens"),
        )
