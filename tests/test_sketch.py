"""Count-Min sketch guarantees: the estimate is an upper bound on the
true frequency, each grid row conserves total mass, and the grid stays
fixed-size regardless of key cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_spark.operators import sketch as SKC
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_countmin_upper_bound_and_mass(spark):
    events = load_table(spark, SF_DIR, "events")
    grid = SKC.countmin_build(events, "user_id").cache()
    n = events.count()

    # every row of the grid sums to the total input mass
    per_row = grid.groupBy("d").agg(F.sum("cnt").alias("mass")).collect()
    assert len(per_row) == SKC.DEPTH
    assert all(r.mass == n for r in per_row)

    # grid is bounded by depth × width whatever the key cardinality
    assert grid.count() <= SKC.DEPTH * SKC.WIDTH

    # estimates dominate true counts (CM never underestimates)
    truth = events.groupBy("user_id").count()
    est = SKC.countmin_estimate(grid, truth.select("user_id"), "user_id")
    joined = truth.join(est, "user_id").collect()
    assert len(joined) == truth.count()
    assert all(r.est >= r["count"] for r in joined)
    grid.unpersist()
