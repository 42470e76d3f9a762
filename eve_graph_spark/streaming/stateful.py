"""Custom stateful streaming operators (applyInPandasWithState).

The windowed operators in `windows.py` cover what built-in watermarked
aggregation can express; these cover what it can't:

- `running_user_stats`: unbounded running aggregates per key (count, sum,
  EWMA) emitted every micro-batch — the streaming form of the reference's
  mutable per-system `kills`/`jumps` counters (reference:
  src/database.rs:256-292), which are running totals, not windows.
- `wormhole_ttl_stream`: a per-signature state machine with event-time
  timeout — wormholes OPEN on first sighting and CLOSE when the watermark
  passes their `expires_at` (reference models expiry client-side from
  eve_scout.rs:31; here the state store owns the lifecycle).

State lives in the Spark state store (per-key, checkpointed, sized by the
number of distinct keys — not by stream length), which is what makes both
run forever at scale.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_ALPHA = 0.3


def _user_stats_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, total, ewma = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        for v in pdf.sort_values("ts")["value"]:
            ewma = float(v) if ewma is None else EWMA_ALPHA * float(v) + (1 - EWMA_ALPHA) * ewma
    state.update((n, total, ewma))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "sum_value": total, "ewma_value": ewma}]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Running (not windowed) per-user count/sum/EWMA, one row per key per
    micro-batch. Input needs columns (user_id, ts, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType="user_id long, n_events long, sum_value double, ewma_value double",
        stateStructType="n long, total double, ewma double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _wormhole_ttl_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    rows: list[dict[str, Any]] = []
    if state.hasTimedOut:
        src, dst, expires_ms = state.get
        rows.append({"sig_id": key[0], "src_system_id": src, "dst_system_id": dst,
                     "status": "closed"})
        state.remove()
    else:
        first = not state.exists
        src = dst = expires_ms = None
        for pdf in pdfs:
            for _, r in pdf.iterrows():
                src, dst = int(r["in_system_id"]), int(r["out_system_id"])
                expires_ms = int(r["expires_at"].value // 1_000_000)
        if src is not None:
            if first:
                rows.append({"sig_id": key[0], "src_system_id": src,
                             "dst_system_id": dst, "status": "open"})
            state.update((src, dst, expires_ms))
            # the state store fires the timeout when the event-time
            # watermark passes expires_at — exactly the wormhole's TTL
            state.setTimeoutTimestamp(expires_ms)
    yield pd.DataFrame(rows, columns=["sig_id", "src_system_id", "dst_system_id", "status"])


def wormhole_ttl_stream(signatures: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Signature lifecycle: emits (sig_id, src, dst, 'open') on first
    sighting, re-arms the TTL on re-sighting, and emits 'closed' when the
    event-time watermark passes `expires_at`. Input needs columns
    (id, in_system_id, out_system_id, expires_at[timestamp])."""
    return (
        signatures.withWatermark("expires_at", watermark)
        .groupBy("id")
        .applyInPandasWithState(
            _wormhole_ttl_fn,
            outputStructType=(
                "sig_id string, src_system_id long, dst_system_id long, status string"
            ),
            stateStructType="src long, dst long, expires_ms long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


NEAR_DUP_STATE_CAP = 64


def _make_near_dup_fn(threshold: float, state_cap: int, idle_ttl_ms: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = ["doc_id", "matched_doc_id", "band", "bucket", "est_jaccard"]
        if state.hasTimedOut:
            # idle bucket: drop its signature roster, emit nothing
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        if state.exists:
            ids = [int(i) for i in state.get[0]]
            roster = np.array([list(s) for s in state.get[1]], dtype=np.int64)
            if roster.ndim == 1:
                # a persisted EMPTY roster restores as shape (0,), not
                # (0, 0) — normalize or roster.shape[1] below raises
                roster = roster.reshape(0, 0)
        else:
            ids, roster = [], np.empty((0, 0), dtype=np.int64)
        id_pos = {v: i for i, v in enumerate(ids)}
        band, bucket = int(key[0]), int(key[1])
        rows: list[dict] = []
        for pdf in pdfs:
            # doc_id order makes intra-batch hits deterministic: the later
            # id matches against the earlier one, same as across batches
            if not len(pdf):
                continue
            pdf = pdf.sort_values("doc_id")
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            sig_block = np.array(
                [list(s) for s in pdf["__sig"]], dtype=np.int64
            ).reshape(len(doc_ids), -1)
            if roster.shape[1] == 0 and sig_block.shape[1]:
                roster = roster.reshape(0, sig_block.shape[1])
            for j in range(len(doc_ids)):
                did, sig = int(doc_ids[j]), sig_block[j]
                if len(ids):
                    # vectorized roster compare (was an O(cap) Python loop
                    # per doc): est = fraction of equal signature rows —
                    # np.mean over the bool row is the same exact
                    # count/len division as the scalar form
                    est = (roster == sig).mean(axis=1)
                    ids_arr = np.asarray(ids, dtype=np.int64)
                    for i in np.nonzero((est >= threshold) & (ids_arr != did))[0]:
                        rows.append({
                            "doc_id": did, "matched_doc_id": int(ids_arr[i]),
                            "band": band, "bucket": bucket,
                            "est_jaccard": float(est[i]),
                        })
                if did in id_pos:
                    # re-delivered doc_id (micro-batch replay after failure,
                    # duplicate source rows): refresh the stored signature and
                    # MOVE the entry to the roster end — appending a second
                    # entry would emit duplicate hit rows, while refreshing in
                    # place would leave the doc in its old position and let
                    # the state_cap truncation below evict a just-seen doc as
                    # if it were the oldest (r6 verdict: cap honors recency)
                    i = id_pos[did]
                    ids.pop(i)
                    ids.append(did)
                    roster = np.concatenate([roster[:i], roster[i + 1:], sig[None, :]], axis=0)
                    id_pos = {v: j for j, v in enumerate(ids)}
                else:
                    id_pos[did] = len(ids)
                    ids.append(did)
                    roster = np.concatenate([roster, sig[None, :]], axis=0)
        if len(ids) > state_cap:  # keep the newest roster entries
            ids, roster = ids[-state_cap:], roster[-state_cap:]
        state.update((ids, [[int(x) for x in s] for s in roster]))
        state.setTimeoutDuration(idle_ttl_ms)
        yield pd.DataFrame(rows, columns=cols)

    return fn


def near_dup_hits_stream(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    state_cap: int = NEAR_DUP_STATE_CAP,
    idle_ttl_ms: int = 3_600_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming near-dup detection: the stateful form of the batch
    MinHash-LSH pipeline (`operators/dedup.py:portable_lsh_candidates`),
    extending `curate_document_stream`'s exact digest dedup to NEAR dups.

    The portable MinHash signature and band buckets are computed in the
    micro-batch SCAN (JVM expressions — the Python state fn never touches
    text); each (band, bucket) group keeps a roster of the last
    `state_cap` (doc_id, signature) pairs in the state store and emits a
    hit row per roster match with estimated Jaccard = fraction of equal
    signature rows, `threshold`-filtered. Consumers aggregate hits per
    doc (a doc colliding in several bands emits one row per band) or join
    them back to drop/canonicalize.

    State story at firehose scale: the store holds
    active_buckets x state_cap signatures — bounded per key by the cap
    (an adversarial mega-bucket cannot grow past it; oldest entries
    retire first) and globally by the idle TTL (processing-time timeout
    drops buckets nothing has hashed into lately). Exact duplicates are
    caught upstream by the watermark-bounded digest dedup; this operator
    exists for the j >= threshold near-miss band the digest cannot see.
    """
    from eve_graph_spark.operators.dedup import (
        portable_band_buckets_sql,
        portable_minhash_sql,
    )
    from pyspark.sql import functions as F

    banded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(portable_minhash_sql(text_col, num_hashes, k)).alias("__sig"),
    ).select(
        "doc_id",
        "__sig",
        F.posexplode(
            F.expr(portable_band_buckets_sql("__sig", bands, rows_per_band))
        ).alias("band", "bucket"),
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _make_near_dup_fn(threshold, state_cap, idle_ttl_ms),
        outputStructType=(
            "doc_id long, matched_doc_id long, band int, bucket long, est_jaccard double"
        ),
        stateStructType="ids array<long>, sigs array<array<long>>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
