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


def register_eve_scout(spark) -> None:
    # the reader implements pushFilters(); Spark refuses to instantiate it
    # unless Python-source pushdown is switched on (runtime-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EveScoutDataSource)
