"""Streaming window operators over event streams.

The reference has no streaming — refresh is poll-based POST (SURVEY.md
§2.8) — so this module is the Structured-Streaming analogue the north star
asks for: the same aggregations as the batch `tumbling_window_events` /
`sessionize_events` queries, but incremental, watermarked for late data,
and runnable on `readStream` sources.

All functions take an already-streaming DataFrame (spark.readStream...)
with an event-time column and return the transformed streaming DataFrame;
callers pick the sink (`writeStream`, `foreachBatch`, memory for tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, ts_col: str = "ts",
                    window: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window: count + sum per (window, event_type).
    Watermark bounds state: late rows beyond it are dropped, which is what
    lets this run forever at 100 TB/day."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, ts_col: str = "ts",
                   window: str = "10 minutes", slide: str = "5 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Sliding window variant (overlapping windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(events: DataFrame, ts_col: str = "ts",
                   gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows per user with an inactivity gap — the streaming twin
    of the batch gaps-and-islands `sessionize_events` query."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, keys: list[str], ts_col: str = "ts",
                           watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key within the
    watermark horizon — state is bounded by the watermark, unlike a global
    dropDuplicates which would grow forever."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def interval_join(left: DataFrame, right: DataFrame, key: str = "user_id",
                  ts_col: str = "ts", lookback: str = "10 minutes",
                  watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream inner join: each left event matched to right events of
    the same key within [left.ts - lookback, left.ts]. Both sides are
    watermarked so the join state store evicts rows once they can no
    longer match — the condition that makes a stream-stream join runnable
    forever (an unbounded-state stream join is a memory leak, not a join).
    """
    l_ = left.withWatermark(ts_col, watermark).alias("l")
    r_ = right.withWatermark(ts_col, watermark).alias("r")
    return l_.join(
        r_,
        F.expr(
            f"l.{key} = r.{key} AND "
            f"r.{ts_col} >= l.{ts_col} - INTERVAL {lookback} AND "
            f"r.{ts_col} <= l.{ts_col}"
        ),
    )


def wormhole_expiry_stream(signatures: DataFrame, ts_col: str = "expires_at",
                           watermark: str = "1 hour") -> DataFrame:
    """Streaming analogue of POST /wormholes/refresh (reference:
    src/sync.rs:66-94 + eve_scout.rs:31 `expires_at`): each micro-batch
    emits the currently-valid wormhole edge set (bidirectional), watermarked
    on expiry so state ages out exactly when the wormhole does."""
    wh = (
        signatures.withWatermark(ts_col, watermark)
        .filter(F.col("signature_type") == "wormhole")
        .dropDuplicatesWithinWatermark(["id"])
    )
    fwd = wh.select(
        F.col("in_system_id").alias("src_system_id"),
        F.col("out_system_id").alias("dst_system_id"),
        F.lit(1).cast("long").alias("cost"),
        F.lit("wormhole").alias("kind"),
        F.col(ts_col),
    )
    bwd = wh.select(
        F.col("out_system_id").alias("src_system_id"),
        F.col("in_system_id").alias("dst_system_id"),
        F.lit(1).cast("long").alias("cost"),
        F.lit("wormhole").alias("kind"),
        F.col(ts_col),
    )
    return fwd.unionByName(bwd)


def enrich_with_static(stream: DataFrame, static_dim: DataFrame, key: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (broadcast) static dimension — the streaming analogue of the star-join
    dims. The static side is re-read per micro-batch by Spark, so a
    dimension backed by a path picks up slowly-changing updates without
    restarting the query; no watermark needed (the static side holds no
    stream state)."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(static_dim), key, "left")


def curate_document_stream(docs: DataFrame, benchmark_digests: DataFrame,
                           ts_col: str = "ts", text_col: str = "text",
                           min_quality: float = 2.0,
                           watermark: str = "1 hour") -> DataFrame:
    """Streaming corpus curation: the batch `corpus_curation_pipeline`
    re-expressed incrementally for a document firehose — score quality,
    drop below-threshold docs, exact-dedup on text digest within the
    watermark horizon, and flag benchmark contamination via a stream-static
    broadcast join against the (small, eval-suite-sized) digest dimension.

    State story at 100 TB/day: the only stream state is the dedup digest
    store, bounded by the watermark (a global dropDuplicates would grow
    with stream length and eventually OOM the state store); quality and
    lang-id are stateless column expressions evaluated in the micro-batch
    scan; the contamination dim re-reads per micro-batch so a refreshed
    benchmark set is picked up without restarting the query.
    """
    from eve_graph_spark.operators.text_analysis import lang_id_expr, quality_score_expr

    scored = (
        docs.withColumn("__digest", F.md5(F.coalesce(F.col(text_col), F.lit(""))))
        .withColumn("quality", quality_score_expr(F.col(text_col)))
        .withColumn("lang_guess", lang_id_expr(F.col(text_col)))
        .filter(F.col("quality") >= min_quality)
    )
    deduped = (
        scored.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__digest"])
    )
    bench = F.broadcast(benchmark_digests.select(
        F.col("digest").alias("__digest"), F.lit(True).alias("contaminated")
    ))
    return (
        deduped.join(bench, "__digest", "left")
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))
        .drop("__digest")
    )


def assign_embedding_stream(stream: DataFrame, centroids: dict[int, list[int]],
                            k: int, id_col: str = "vec_id",
                            vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Online cluster assignment: score a streaming embedding firehose
    against a batch-trained k-means model (clustering.kmeans_fit). The
    model is k*dim literals baked into one stateless scan-side projection
    — no shuffle, no state store, works at any micro-batch rate; the
    streaming half of the train-batch / score-stream pattern (SemDeDup
    routing, online corpus bucketing)."""
    from eve_graph_spark.operators.clustering import assign_with_centroids

    return assign_with_centroids(stream, centroids, k, id_col, vec_col, dim)
