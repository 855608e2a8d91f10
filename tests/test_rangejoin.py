"""Shuffle-grid range join (operators/rangejoin.range_join): pair-exact
vs the naive BETWEEN join, bucket-width invariance, and the equi-join
plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_spark.operators import rangejoin as RJ
from spark_streaming_spark.plans import explain
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def _pts_iv(spark):
    pts = (
        load_table(spark, SF_DIR, "events")
        .select(F.col("event_id").alias("pid"),
                F.floor(F.col("value")).cast("long").alias("v"))
        .limit(500)
    )
    iv = (
        load_table(spark, SF_DIR, "orders")
        .select(
            F.col("o_orderkey").alias("ikey"),
            (F.col("o_orderkey") % 900).cast("long").alias("lo"),
            (F.col("o_orderkey") % 900 + F.col("o_custkey") % 37)
            .cast("long").alias("hi"))
        .limit(300)
    )
    return pts, iv


def test_range_join_matches_naive(spark):
    """Every qualifying (point, interval) pair exactly once — equal to
    the naive inequality join, independent of the bucket width (too-
    small buckets mean more replication, never missed or doubled
    pairs)."""
    pts, iv = _pts_iv(spark)
    naive = sorted(map(tuple, (
        pts.join(iv, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
        .select("pid", "ikey").collect()
    )))
    assert naive, "fixture selectivity collapsed — adjust moduli"
    for bucket in (3, 16, 1000):
        got = sorted(map(tuple, (
            RJ.range_join(pts, iv, "v", "lo", "hi", bucket)
            .select("pid", "ikey").collect()
        )))
        assert got == naive, f"bucket={bucket}"


def test_range_join_rejects_column_collision(spark):
    pts, iv = _pts_iv(spark)
    with pytest.raises(ValueError, match="collision"):
        RJ.range_join(pts.withColumnRenamed("pid", "ikey"), iv,
                      "v", "lo", "hi", 8)


def test_ship_window_plans_shuffle_equi_join(spark):
    """The flagship query must plan the containment as an EQUI join on
    the grid cell (SortMergeJoin/ShuffledHashJoin — AQE may pick
    either), never a nested loop or cartesian, and the count must
    partial-aggregate map-side."""
    df = RJ.ship_window_order_counts(
        load_table(spark, SF_DIR, "orders"),
        load_table(spark, SF_DIR, "lineitem"))
    text = explain.explain_text(df, "simple")
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text
    assert ("SortMergeJoin" in text or "ShuffledHashJoin" in text
            or "BroadcastHashJoin" in text)
    assert explain.has_partial_aggregate(df)


def test_interval_join_grid_is_cost_not_correctness(spark):
    """interval_join explodes each range to every touched cell, so an
    undersized grid inflates the broadcast but never drops matches —
    results are grid-invariant."""
    from spark_streaming_spark.operators.rangejoin import (
        interval_join, value_tier_totals, value_tiers)

    ev = load_table(spark, SF_DIR, "events")
    tiers = value_tiers(spark)
    ref = sorted(map(tuple, value_tier_totals(ev, tiers).collect()))
    for grid in (2.0, 5.0, 1000.0):
        got = sorted(map(tuple, (
            interval_join(ev, tiers, "value", "lo", "hi", grid=grid)
            .groupBy("tier").count().collect()
        )))
        ref_counts = sorted((t[0], t[1]) for t in ref)
        assert got == ref_counts, f"grid={grid}"
