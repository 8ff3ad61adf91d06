"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic event generator.

Demonstrates the extension point the reference cannot express at all: a
user-defined SOURCE that participates in Spark's scan planning — schema
declaration, partition planning (one ``InputPartition`` per shard, so a
1000-executor cluster reads 1000 shards concurrently), and per-partition
iteration — written entirely in Python. Real deployments use the same
four-method shape to wrap REST APIs, message queues, or proprietary file
formats; here the payload is a seedable LCG event stream so tests can
assert exact contents.

Register per session, then read by short name::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("n_rows", 1000).option("n_partitions", 8).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)

_TYPES = ("click", "view", "purchase", "error")
_MASK = (1 << 64) - 1


def _lcg(x: int) -> int:
    return (x * 6364136223846793005 + 1442695040888963407) & _MASK


def _gen_rows(start: int, end: int, seed: int):
    """Rows for ids [start, end). Per-row determinism: state depends only
    on (seed, row id), so contents are independent of partitioning AND of
    micro-batch boundaries — rereading any range regenerates identically."""
    for i in range(start, end):
        x = _lcg((seed << 32) ^ i)
        user = x % 100
        x = _lcg(x)
        etype = _TYPES[x % len(_TYPES)]
        x = _lcg(x)
        value = (x % 10_000) / 100.0
        yield (i, user, etype, value)


class _Shard(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 7))

    def partitions(self):
        step = max(1, self.n_rows // self.n_partitions)
        shards = []
        for i in range(self.n_partitions):
            start = i * step
            end = self.n_rows if i == self.n_partitions - 1 else (i + 1) * step
            if start < end:
                shards.append(_Shard(start, end, self.seed))
        return shards

    def read(self, partition: _Shard):
        return _gen_rows(partition.start, partition.end, partition.seed)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: each micro-batch advances a
    row-id offset cursor (`initialOffset`/`read` contract). Offsets make
    the source replayable — on recovery Spark re-asks for the same range
    and per-row seeding regenerates identical rows (exactly-once without
    any sink cooperation)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("n_rows", 1000))
        self.seed = int(options.get("seed", 7))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start: dict):
        lo = start["offset"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        rows = list(_gen_rows(lo, hi, self.seed))
        return (iter(rows), {"offset": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(_gen_rows(start["offset"], end["offset"], self.seed))
