"""Grid-blocked band join: equality with the naive inequality join,
including timestamps EXACTLY on cell boundaries (the case where a
floor(double /) cell id can mis-bucket — pinned against integer div)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spark_streaming_spark.operators.asof import band_cooccurrence
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def _naive(events, eps_us):
    a = events.select(F.col("event_id").alias("event_a"),
                      F.unix_micros("ts").alias("ua"))
    b = events.select(F.col("event_id").alias("event_b"),
                      F.unix_micros("ts").alias("ub"))
    return (
        a.crossJoin(b)
        .filter((F.col("event_a") < F.col("event_b"))
                & (F.abs(F.col("ub") - F.col("ua")) <= eps_us))
        .select("event_a", "event_b",
                (F.col("ub") - F.col("ua")).alias("delta_us"))
    )


def test_band_join_equals_naive_on_driver_fixture(spark):
    events = load_table(spark, SF_DIR, "events")
    got = {tuple(r) for r in band_cooccurrence(events, 2).collect()}
    want = {tuple(r) for r in _naive(events, 2_000_000).collect()}
    assert got == want


def test_band_join_exact_cell_boundaries(spark):
    """Rows at exact eps multiples, eps apart, and eps+1us apart: the
    pair at exactly eps must be found (cells one apart), the one 1us
    over must not."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),                                      # cell k, on boundary
        (2, base + dt.timedelta(seconds=2)),            # exactly eps away
        (3, base + dt.timedelta(seconds=4, microseconds=1)),  # eps+1us from 2
        (4, base + dt.timedelta(seconds=6)),            # boundary again
    ]
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {(r.event_a, r.event_b) for r in
           band_cooccurrence(events, 2).collect()}
    assert (1, 2) in got            # |Δ| == eps exactly → kept
    assert (2, 3) not in got        # eps + 1us → excluded
    assert (3, 4) in got            # 2s - 1us → kept
    assert (1, 3) not in got and (2, 4) not in got


def _asof_pandas(lp, rp, direction, tol_sec):
    """pandas merge_asof ground truth with the engine's tie convention:
    stable-sort right by ts after pre-sorting by event_id, so equal-ts
    candidates resolve to highest id backward / lowest id forward."""
    import pandas as pd

    lp = lp.sort_values(["ts", "event_id"], kind="mergesort")
    rp = (rp.sort_values("event_id", kind="mergesort")
          .sort_values("ts", kind="mergesort"))
    m = pd.merge_asof(
        lp, rp.rename(columns={"event_id": "asof_id", "ts": "asof_ts"}),
        left_on="ts", right_on="asof_ts", by="user_id",
        direction=direction,
        tolerance=None if tol_sec is None else pd.Timedelta(seconds=tol_sec))
    return m


@pytest.mark.parametrize("direction,tol", [
    ("backward", None), ("forward", None),
    ("nearest", None), ("nearest", 300),
])
def test_asof_join_matches_pandas_merge_asof(spark, direction, tol):
    """The generic as-of join vs pandas.merge_asof (the public semantic
    reference) on real event data, all directions, with and without
    tolerance."""
    from spark_streaming_spark.operators.asof import asof_join

    ev = load_table(spark, SF_DIR, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id")
    got = asof_join(left, right, "user_id", "ts", "event_id",
                    direction=direction, tolerance_sec=tol).toPandas()
    want = _asof_pandas(left.toPandas(), right.toPandas(), direction, tol)
    key = ["event_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want[got.columns].sort_values(key).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_single_exchange(spark):
    """nearest needs BOTH direction windows but must plan exactly ONE
    Exchange on the key (second window is a partition-local re-sort)."""
    from spark_streaming_spark.operators.asof import asof_join

    ev = load_table(spark, SF_DIR, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id")
    df = asof_join(left, right, "user_id", "ts", "event_id",
                   direction="nearest", tolerance_sec=300)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


def test_asof_join_tie_and_tolerance_edges(spark):
    """Synthetic edge pins: equal-ts candidates both directions
    (backward takes highest id, forward lowest, nearest prefers
    backward at zero delta both ways), and tolerance is INCLUSIVE at
    the exact boundary."""
    import datetime as dt2

    from spark_streaming_spark.operators.asof import asof_join

    t = lambda s: dt2.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 1, t(10)), (2, 1, t(30)), (3, 2, t(10))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t(10), 100), (1, t(10), 101),   # equal-ts pair, both dirs
         (1, t(25), 102),                    # 5s before left#2
         (2, t(15), 103)],                   # 5s after left#3
        "user_id long, ts timestamp, event_id long")
    got = {r["event_id"]: (r["asof_id"],)
           for r in asof_join(left, right, "user_id", "ts", "event_id",
                              direction="nearest",
                              tolerance_sec=5).collect()}
    # zero-delta tie both directions -> backward -> highest id 101
    assert got[1] == (101,)
    # backward 5s (boundary-inclusive) beats nothing forward
    assert got[2] == (102,)
    # only a forward candidate, exactly at tolerance -> matched
    assert got[3] == (103,)
    # shrink tolerance: boundary matches drop to null, left rows survive
    got4 = {r["event_id"]: r["asof_id"]
            for r in asof_join(left, right, "user_id", "ts", "event_id",
                               direction="nearest",
                               tolerance_sec=4).collect()}
    assert got4[1] == 101 and got4[2] is None and got4[3] is None
