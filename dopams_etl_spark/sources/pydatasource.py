"""Custom Python data source (Spark 4 DataSource API).

The reference ingests from systems Spark has no built-in connector for
(a REST API with session auth, a Mongo dump service —
`etl-crimes/etl_crimes.py:381–450`); Spark 4's Python DataSource API is
the native way to wrap such systems as first-class scan nodes: the
source declares its schema and partitions, each partition reads
independently on an executor, and the result composes with every
operator (pushdown-ready reads, no driver-side collect, no RDD glue).

``SyntheticEventsDataSource`` is the in-repo stand-in: a deterministic
generator (Knuth multiplicative-hash value stream over a partitioned id
range) so the scan is testable offline AND oracle-replicable — DuckDB
reproduces the exact rows from ``generate_series`` with the same integer
arithmetic. A real connector swaps ``read``'s loop for API pages/cursor
chunks; partition planning, schema declaration, and registration stay
identical.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Knuth's multiplicative hash constant (2654435761 = 2^32 / phi); the
# value stream is (id * KNUTH) mod 2^32 — exact in BIGINT on any engine.
KNUTH = 2654435761
MOD = 4294967296


class _RangePartition(InputPartition):
    def __init__(self, part_id: int, start: int, end: int):
        self.part_id = part_id
        self.start = start
        self.end = end


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` — options:
    ``partitions`` (default 4), ``rows_per_partition`` (default 250)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id BIGINT, part INT, value BIGINT"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("partitions", 4))
        self.rows = int(options.get("rows_per_partition", 250))

    def partitions(self) -> Sequence[_RangePartition]:
        return [
            _RangePartition(p, p * self.rows, (p + 1) * self.rows)
            for p in range(self.n_parts)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, partition.part_id, (i * KNUTH) % MOD)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticEventsDataSource)
