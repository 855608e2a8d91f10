"""Salted aggregation equivalence + custom stateful operator parity."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_spark.operators.skew import salted_counts, salted_decimal_sum
from spark_streaming_spark.sources.batch import load_table
from spark_streaming_spark.streaming import replay
from spark_streaming_spark.streaming.stateful import running_totals_with_state
from tests.conftest import SF_DIR


def _sets(df):
    return {tuple(r) for r in df.collect()}


def test_salted_counts_equal_plain(spark):
    events = load_table(spark, SF_DIR, "events")
    plain = events.groupBy("event_type").agg(F.count("*").alias("cnt"))
    salted = salted_counts(events, "event_type")
    assert _sets(salted) == _sets(plain)


def test_salted_decimal_sum_bitwise_equal(spark):
    events = load_table(spark, SF_DIR, "events")
    plain = events.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("sum_value")
    )
    salted = salted_decimal_sum(events, "event_type", "value")
    assert _sets(salted) == _sets(plain)  # exact, incl. float bits


def test_stateful_running_totals_converge_to_batch(spark):
    """applyInPandasWithState totals across triggers must equal the batch
    per-key aggregate after the replay drains (updateStateByKey parity)."""
    events = load_table(spark, SF_DIR, "events").select("user_id", "value")
    d = replay.chunk_to_dir(events, 3)
    try:
        stream = replay.stream_from_dir(spark, d)
        out = replay.run_to_memory(
            running_totals_with_state(stream, "user_id", "value"),
            "update",
        )
        # last emission per key (n is monotone) = final state
        final = (
            out.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("key").orderBy(F.col("n").desc())
                ),
            )
            .filter(F.col("rk") == 1)
            .select("key", "total", "n")
        )
        batch = events.groupBy(
            F.col("user_id").cast("string").alias("key")
        ).agg(
            F.sum("value").alias("total"), F.count("*").alias("n")
        )
        got = {r.key: (r.n, round(r.total, 6)) for r in final.collect()}
        want = {r.key: (r.n, round(r.total, 6)) for r in batch.collect()}
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert abs(got[k][1] - want[k][1]) < 1e-6
    finally:
        replay.cleanup(d)


def test_salted_join_equals_plain_join(spark):
    """Salting must not change join semantics: same rows as the plain
    equi-join, any n_salts."""
    from spark_streaming_spark.operators.skew import salted_join

    events = load_table(spark, SF_DIR, "events")
    customer = load_table(spark, SF_DIR, "customer")
    plain = events.join(
        customer, events["user_id"] == customer["c_custkey"]
    ).select("event_id", "c_custkey")
    for n in (2, 16):
        salted = salted_join(
            events, customer, "user_id", "c_custkey",
            n_salts=n, salt_source="event_id",
        ).select("event_id", "c_custkey")
        assert {tuple(r) for r in salted.collect()} == \
               {tuple(r) for r in plain.collect()}
