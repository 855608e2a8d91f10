"""Custom Python DataSource (PySpark 4 ``pyspark.sql.datasource`` API):
the engine's counterpart of the reference's custom receiver surface
(socket receiver in ``/root/reference/src/main/java/com/soto/
WordCount.java:27-30``; Kafka receivers in ``KafkaReceiverWordCount.
java:34-39``) — but as a first-class, schema'd, partitioned source
instead of a line-stream socket.

``synthetic_events`` generates a deterministic event table derived
purely from the row index with integer arithmetic, which buys three
things:

* every field is reproducible in DuckDB from ``range(n)`` — so a query
  over this CUSTOM source still has an exact SQL oracle (the driver's
  correctness bar extends to the source layer);
* batch reads split into ``n_partitions`` index ranges — real
  parallelism, no driver materialization (each executor generates its
  own range);
* the streaming variant serves the same rows in offset-tracked
  micro-batches, so stream=batch equivalence is testable for a SOURCE,
  not just for operators.

Scale: a generator source is the degenerate case of any partitioned
external system (JDBC ranges, Kafka partitions, object-store listings):
``partitions()`` declares the split, ``read(partition)`` runs per
executor. Nothing here touches the driver except the tiny partition
list.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_TYPES = ["click", "view", "purchase"]

_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, "
    "value double, ts timestamp"
)


def _row(i: int):
    # ALL fields are integer-derived so an SQL oracle reproduces them
    # bit-for-bit (the /10.0 division is IEEE-identical on equal ints)
    return (
        i,
        i % 97,
        _TYPES[i % 3],
        (i * 37 % 1000) / 10.0,
        _EPOCH + timedelta(seconds=i),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        step = max(1, self.n_rows // self.n_partitions)
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class _SyntheticStreamReader(DataSourceStreamReader):
    """Offset-tracked micro-batches over the same deterministic rows.
    The offset is just the next row index — the same contract as a Kafka
    (partition, offset) pair collapsed to one dimension."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10000))
        self.rows_per_batch = int(options.get("rows_per_batch", 2500))
        self._pos = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._pos = min(self._pos + self.rows_per_batch, self.n_rows)
        return {"index": self._pos}

    def partitions(self, start, end):
        return [_RangePartition(start["index"], end["index"])]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end):
        pass


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _SyntheticReader(self.options)

    def streamReader(self, schema):
        return _SyntheticStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticEventsDataSource)


def load_events(spark, n_rows: int = 10000, n_partitions: int = 8):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n_rows", n_rows)
        .option("n_partitions", n_partitions)
        .load()
    )
