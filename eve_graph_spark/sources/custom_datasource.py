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
    InputPartition,
)
from pyspark.sql.types import StructType

SIGNATURE_DDL = (
    "id string, signature_type string, out_system_id long, "
    "out_signature string, in_system_id long, in_signature string, "
    "max_ship_size string, expires_at string, remaining_hours long"
)


class _EveScoutReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("eve_scout source requires .option('path', <json file>)")
        self._n_parts = int(options.get("numPartitions", "4"))
        self._pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept equality filters on scalar columns; everything else is
        returned to Spark to evaluate post-scan (the API contract)."""
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self._pushed.append(f)
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
            if any(rec.get(f.attribute[0]) != f.value for f in self._pushed):
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
