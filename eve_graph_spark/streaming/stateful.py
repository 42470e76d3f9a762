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
