"""Broker-less Kafka wire-path: a custom Python DataSource that emits
the EXACT schema of Spark's Kafka source (``sources.KAFKA_WIRE_SCHEMA``:
key/value binary, topic, partition, offset, timestamp, timestampType),
batch and offset-tracked streaming.

Reference parity: ``KafkaDirectWordCount.java:37-43`` /
``KafkaReceiverWordCount.java:34-39`` consume (topic, line) pairs and
word-count them. The sandbox has no broker, so the TCP handshake cannot
be exercised — everything else can: piping THIS source through
``sources.decode_kafka`` (the same projection ``kafka_lines`` applies to
the real source) drives the full decode → tokenize → aggregate path
end-to-end in a real multi-micro-batch stream, and because every field
is integer-derived from the record index, the result has an exact DuckDB
oracle (``range(n)``-based SQL).

Wire-faithfulness choices:

* records round-robin over ``n_partitions`` TopicPartitions; ``offset``
  is the per-partition position (``i // n_partitions``) — monotone
  within a partition, exactly like a real consumer sees;
* ``timestampType`` = 0 (CreateTime);
* key/value are ``bytes`` (Spark binary), so the ``cast("string")`` in
  ``decode_kafka`` is doing real UTF-8 work, not a no-op.

Scale: the streaming reader's (start, end] index ranges are the
one-dimensional image of Kafka's per-partition offset ranges; on a real
cluster each partition range is one task, nothing touches the driver but
the offset bookkeeping — the same contract ``format("kafka")`` has.
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

# must stay byte-for-byte equal to sources.KAFKA_WIRE_SCHEMA (pinned by
# tests/test_fakekafka.py::test_wire_schema_matches_kafka_contract)
_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def record(i: int, topic: str, n_partitions: int):
    """Record ``i`` of the fake topic. All fields integer-derived so a
    DuckDB oracle reproduces the decoded stream from ``range(n)``."""
    value = f"a{(i * 7) % 23} b{(i * 3) % 11} c{(i * 5 + 1) % 13}"
    return (
        str(i % 97).encode(),          # key: a "user id" as bytes
        value.encode(),                # value: 3 space-separated words
        topic,
        i % n_partitions,              # round-robin TopicPartition
        i // n_partitions,             # per-partition monotone offset
        _EPOCH + timedelta(seconds=i),
        0,                             # CreateTime
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _FakeKafkaReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 12000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.topic = options.get("topic", "events")

    def partitions(self):
        # one split per fake TopicPartition — matches the real source's
        # task layout (partition p serves indices i ≡ p mod n_partitions)
        return [_Range(p, p + 1) for p in range(self.n_partitions)]

    def read(self, partition: _Range):
        p = partition.start
        for i in range(p, self.n_rows, self.n_partitions):
            yield record(i, self.topic, self.n_partitions)


class _FakeKafkaStreamReader(DataSourceStreamReader):
    """Offset-tracked micro-batches: the offset dict is the fake topic's
    high-water mark, advancing ``rows_per_batch`` records per trigger
    until ``n_rows`` — a finite topic, like a real one with no producer
    attached."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 12000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.rows_per_batch = int(options.get("rows_per_batch", 3000))
        self.topic = options.get("topic", "events")
        self._pos = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._pos = min(self._pos + self.rows_per_batch, self.n_rows)
        return {"index": self._pos}

    def partitions(self, start, end):
        return [_Range(start["index"], end["index"])]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield record(i, self.topic, self.n_partitions)

    def commit(self, end):
        pass


class FakeKafkaDataSource(DataSource):
    """``format("fake_kafka")`` after ``register(spark)``."""

    @classmethod
    def name(cls):
        return "fake_kafka"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _FakeKafkaReader(self.options)

    def streamReader(self, schema):
        return _FakeKafkaStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FakeKafkaDataSource)


def read_topic(spark, n_rows: int = 12000, n_partitions: int = 4,
               topic: str = "events"):
    register(spark)
    return (
        spark.read.format("fake_kafka")
        .option("n_rows", n_rows).option("n_partitions", n_partitions)
        .option("topic", topic).load()
    )


def stream_topic(spark, n_rows: int = 12000, rows_per_batch: int = 3000,
                 n_partitions: int = 4, topic: str = "events"):
    register(spark)
    return (
        spark.readStream.format("fake_kafka")
        .option("n_rows", n_rows).option("rows_per_batch", rows_per_batch)
        .option("n_partitions", n_partitions).option("topic", topic)
        .load()
    )
