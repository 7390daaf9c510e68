"""Custom Python Data Source (pyspark.sql.datasource, Spark 4.x) —
the S-surface for sources Spark has no built-in connector for.

The reference reaches its external feeds through hand-rolled relay
processes (kafka_fashion_producer.py polls an HTTP API and re-posts to
Kafka). The Spark-4-native answer is a first-class DataSource: the
planner sees a real relation with a schema and N input partitions, each
executor generates/fetches ONLY its partition, and every downstream
optimization (column pruning into the Arrow batches, AQE over the scan)
applies. This module ships a deterministic synthetic-orders source as
the reference implementation of that surface: row content is a pure
function of the row id (the portable Knuth-multiplicative bucket from
operators/bucketing.py), so a DuckDB oracle reproduces the ENTIRE scan
bit-for-bit — connector correctness is driver-checkable, not just
smoke-tested.

At scale: `partitions()` is the parallelism contract (one task per
InputPartition, no driver-side row materialization); a real HTTP/API
source returns one partition per page/shard token and `read()` fetches
inside the executor.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from multichannel_commerce_data_pipeline_spark.operators.bucketing import (
    KEY_REDUCER,
    KNUTH_MULTIPLIER,
)

CHANNELS = ("wholesale", "shopify", "livestreaming")


def _bucket(key: int, n_buckets: int) -> int:
    """Pure-Python twin of operators/bucketing.deterministic_bucket —
    same reduce-multiply-mod arithmetic, exact in int64 and in DuckDB."""
    reduced = ((key % KEY_REDUCER) + KEY_REDUCER) % KEY_REDUCER
    return ((reduced * KNUTH_MULTIPLIER) % n_buckets + n_buckets) % n_buckets


def _row(i: int) -> tuple:
    """The one row function both the batch and streaming readers share:
    order i → (order_id, channel, amount), a pure function of i."""
    return (i, CHANNELS[_bucket(i, 3)], _bucket(i, 10000) / 100.0)


class SyntheticOrdersDataSource(DataSource):
    """spark.read.format("synthetic_orders").option("rows", N) — a
    partition-parallel deterministic order feed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_orders"

    def schema(self) -> str:
        return "order_id bigint, channel string, amount double"

    def reader(self, schema) -> "SyntheticOrdersReader":
        return SyntheticOrdersReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticOrdersStreamReader":
        return SyntheticOrdersStreamReader(self.options)


class _Slice(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SyntheticOrdersReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        step = -(-self.rows // self.n_parts)  # ceil div
        return [
            _Slice(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.lo, partition.hi):
            yield _row(i)


class SyntheticOrdersStreamReader(SimpleDataSourceStreamReader):
    """The STREAMING form of the connector — the custom-source answer
    to the reference's Kafka relay chain, end-to-end testable with no
    broker. Offsets are plain row positions ({"pos": n}); each trigger
    emits the next ``batch_size`` rows up to the ``rows`` cap, after
    which read() stops advancing (so processAllAvailable() terminates).
    ``readBetweenOffsets`` re-derives any replayed batch from the same
    pure row function — deterministic replay IS the exactly-once story:
    a recovered micro-batch is regenerated bit-for-bit, which is the
    same contract Kafka replay gives on a real deployment."""

    def __init__(self, options):
        self.cap = int(options.get("rows", 1000))
        self.batch = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.batch, self.cap)
        return iter([_row(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["pos"], end["pos"])])


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticOrdersDataSource)
