"""Fake-Kafka wire path (sources/fakekafka.py): the Kafka source schema
contract, decode projection, offset semantics, and the polled
multi-micro-batch stream — everything ``KafkaDirectWordCount.java:37-43``
exercises except the TCP handshake, broker-less."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from spark_streaming_spark.sources import fakekafka
from spark_streaming_spark.streaming.sources import (
    KAFKA_WIRE_SCHEMA,
    decode_kafka,
)


def test_wire_schema_matches_kafka_contract(spark):
    """The fake source's schema is byte-for-byte the schema the real
    format("kafka") produces — so decode_kafka sees the same input."""
    df = fakekafka.read_topic(spark, 1000, 4)
    assert df.schema == _parse_datatype_string(KAFKA_WIRE_SCHEMA)


def test_offsets_monotone_per_partition(spark):
    """Offsets are dense and monotone within each TopicPartition —
    the invariant a real consumer (and the checkpoint's offset log)
    relies on."""
    df = fakekafka.read_topic(spark, 1000, 4)
    stats = (
        df.groupBy("partition")
        .agg(
            F.count("*").alias("n"),
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.countDistinct("offset").alias("distinct_offsets"),
        )
        .collect()
    )
    assert len(stats) == 4
    for r in stats:
        assert r.lo == 0
        assert r.hi == r.n - 1          # dense: no gaps
        assert r.distinct_offsets == r.n  # no duplicates


def test_decode_kafka_on_fake_wire(spark):
    """The SAME projection kafka_lines applies to the real source turns
    the binary frame into typed strings + metadata."""
    decoded = decode_kafka(fakekafka.read_topic(spark, 100, 4))
    rows = decoded.orderBy("partition", "offset").collect()
    assert len(rows) == 100
    r0 = rows[0]  # record 0: partition 0, offset 0
    assert r0.key == "0" and r0.value == "a0 b0 c1"
    assert r0.topic == "events"
    # every value decodes to exactly 3 space-separated tokens
    bad = decoded.filter(
        F.size(F.split(F.col("value"), " ")) != 3
    ).count()
    assert bad == 0


def test_polled_stream_wordcount_equals_batch(spark):
    """Multi-micro-batch stream through decode→tokenize→count equals the
    batch answer over the same topic (stream/batch equivalence for the
    wire path), via the polled runner (Python stream readers can't honor
    availableNow)."""
    from spark_streaming_spark.streaming import replay

    n = 4000

    def counts_of(df):
        return (
            decode_kafka(df)
            .select(F.explode(F.split(F.col("value"), " ")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
        )

    stream = counts_of(fakekafka.stream_topic(spark, n_rows=n,
                                              rows_per_batch=1000))
    streamed = {
        (r.word, r.cnt)
        for r in replay.run_polled_to_parquet(
            stream, target_input_rows=n, output_mode="complete",
            state_partitions=4,
        ).collect()
    }
    batch = {
        (r.word, r.cnt)
        for r in counts_of(fakekafka.read_topic(spark, n, 4)).collect()
    }
    assert streamed == batch
