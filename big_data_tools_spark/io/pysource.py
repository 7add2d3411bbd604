"""Python DataSource API (Spark 4): a custom batch source in pure
Python, demonstrating how this engine extends the S-family (SURVEY.md
§2.1) beyond file formats — the reference is limited to what
``spark.read`` ships with; a pluggable source lets the same query
surface read from anything addressable from Python.

``SyntheticEventsDataSource`` is a deterministic partitioned generator
(seed-stable xorshift, one partition per slice) — the "load generator"
source every pipeline wants for soak-testing a 1000-executor job
without 100 TB of input. Partition planning happens in ``partitions()``
(driver, metadata only); each ``read(partition)`` runs on an executor
and yields only its slice, so the source scales out like any file scan.

Register per-session, then read with options::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 100_000).option("partitions", 32).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "refund")


def _xorshift(x: int) -> int:
    """Deterministic 64-bit xorshift step (engine-portable, no RNG
    module — same sequence everywhere, which is what makes the source
    testable to exact rows)."""
    x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 7
    x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return x & 0xFFFFFFFFFFFFFFFF


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.nparts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = max(1, -(-self.rows // self.nparts))  # ceil division
        return [
            _Slice(lo, min(lo + per, self.rows), self.seed)
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            h = _xorshift(i * 0x9E3779B97F4A7C15 + partition.seed + 1)
            yield (
                i,
                h % 10_000,  # user_id
                _EVENT_TYPES[h % len(_EVENT_TYPES)],
                round((h >> 16) % 100_000 / 100.0, 2),  # value
            )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("event_id", LongType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)
