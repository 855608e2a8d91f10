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


def _tws_skip():
    import pytest

    from spark_streaming_spark.streaming.stateful_v2 import tws_available

    if not tws_available():
        pytest.skip(
            "transformWithStateInPandas needs the protobuf package "
            "(Spark's TWS state-server protocol) — absent in this "
            "container; the v1 applyInPandasWithState twin covers the "
            "semantics (test_stateful_running_totals_converge_to_batch)"
        )


def test_transform_with_state_v2_matches_v1(spark):
    """transformWithStateInPandas (arbitrary state v2, RocksDB-backed)
    must produce the same final per-key state as the v1
    applyInPandasWithState spelling — same input, same output schema."""
    _tws_skip()
    from spark_streaming_spark.streaming.statestore import state_store_provider
    from spark_streaming_spark.streaming.stateful_v2 import (
        running_totals_with_state_v2,
    )

    events = load_table(spark, SF_DIR, "events").select("user_id", "value")
    d = replay.chunk_to_dir(events, 3)
    try:
        with state_store_provider(spark, "rocksdb"):
            stream = replay.stream_from_dir(spark, d)
            out = replay.run_to_memory(
                running_totals_with_state_v2(stream, "user_id", "value"),
                "update",
            )
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
        ).agg(F.sum("value").alias("total"), F.count("*").alias("n"))
        got = {r.key: (r.n, round(r.total, 6)) for r in final.collect()}
        want = {r.key: (r.n, round(r.total, 6)) for r in batch.collect()}
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert abs(got[k][1] - want[k][1]) < 1e-6
    finally:
        replay.cleanup(d)


def test_transform_with_state_v2_timer_expires_state(spark):
    """Timer-based expiry (the v2 primitive v1 lacks): with a short TTL
    timer, a key idle across a slow multi-batch replay fires
    handleExpiredTimer, which clears its state and emits the n = -1
    tombstone. Drive real wall-clock triggers via processingTime."""
    _tws_skip()
    import time

    from spark_streaming_spark.streaming.statestore import state_store_provider
    from spark_streaming_spark.streaming.stateful_v2 import (
        running_totals_with_state_v2,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "value").limit(50)
    d = replay.chunk_to_dir(events, 2)
    import tempfile
    import uuid

    name = f"mem_{uuid.uuid4().hex}"
    ckpt = tempfile.mkdtemp(prefix="spark_ckpt_")
    try:
        with state_store_provider(spark, "rocksdb"):
            stream = replay.stream_from_dir(spark, d)
            q = (
                running_totals_with_state_v2(
                    stream, "user_id", "value", ttl_ms=1500)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="1 second")
                .start()
            )
            try:
                # wait until all input is consumed, then let the TTL pass
                # and empty triggers fire the timers
                deadline = time.time() + 60
                while time.time() < deadline:
                    rows = spark.table(name).collect()
                    if any(r.n == -1 for r in rows):
                        break
                    time.sleep(0.5)
                rows = spark.table(name).collect()
            finally:
                q.stop()
        expired = {r.key for r in rows if r.n == -1}
        live_keys = {r.key for r in rows if r.n > 0}
        assert expired, "no timer fired within the wait budget"
        assert expired <= live_keys  # every tombstone had prior state
    finally:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
        replay.cleanup(d)


def test_rocksdb_state_store_provider_running_count(spark):
    """The same stateful pipeline under the RocksDB state store provider
    must produce the identical result as the default HDFS-backed
    provider — the provider is an execution detail, not semantics; at
    large keyed state RocksDB is the one that survives (disk-backed,
    bounded memory)."""
    from spark_streaming_spark.operators.wordcount import word_count
    from spark_streaming_spark.streaming.statestore import (
        _PROVIDER_KEY,
        state_store_provider,
    )

    docs = load_table(spark, SF_DIR, "documents")
    batch = word_count(docs)
    d = replay.chunk_to_dir(docs, 3)
    try:
        with state_store_provider(spark, "rocksdb"):
            assert "RocksDBStateStoreProvider" in spark.conf.get(_PROVIDER_KEY)
            stream = replay.stream_from_dir(spark, d)
            streamed = replay.run_to_memory(word_count(stream), "complete")
            assert _sets(streamed) == _sets(batch)
    finally:
        replay.cleanup(d)


def test_key_skew_report_gini_extremes(spark):
    """Uniform counts -> gini 0; near-total concentration -> gini near
    (k-1)/k; top1_share exact. The two poles of the salting decision."""
    from spark_streaming_spark.operators.skew import key_skew_report

    uniform = spark.createDataFrame(
        [(k, i) for k in range(4) for i in range(5)], "k long, i long")
    # one key has 97 rows, three keys have 1 each
    hot = spark.createDataFrame(
        [(0, i) for i in range(97)] + [(k, 0) for k in (1, 2, 3)],
        "k long, i long")
    out = {r["key_col"]: r for r in key_skew_report(
        [("uniform.k", uniform, "k"), ("hot.k", hot, "k")]).collect()}
    u, h = out["uniform.k"], out["hot.k"]
    assert u["gini_ppm"] == 0 and u["top1_share_ppm"] == 250000
    assert u["n_rows"] == 20 and u["n_keys"] == 4 and u["max_cnt"] == 5
    assert h["top1_share_ppm"] == 970000
    # G = (2*(1*1+2*1+3*1+4*97) - 5*100) / (4*100) = 288/400 = 0.72
    assert h["gini_ppm"] == 720000
