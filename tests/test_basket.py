"""Market-basket mining: Apriori-pruned frequent pairs and
degree-ordered triangle counting (operators/basket.py)."""

import pyspark.sql.functions as F
import pytest

from spark_streaming_spark.operators.basket import (
    frequent_pairs, triangle_counts)
from spark_streaming_spark.sources.batch import load_table

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def pairs(spark):
    return frequent_pairs(load_table(spark, SF_DIR, "lineitem"))


def test_frequent_pairs_respects_thresholds(pairs):
    rows = pairs.collect()
    assert rows, "expected frequent pairs at test SF"
    for r in rows:
        assert r.part_a < r.part_b
        assert r.support_a >= 5 and r.support_b >= 5
        assert r.pair_support >= 2
        # pair support can never exceed either item's support
        assert r.pair_support <= min(r.support_a, r.support_b)
        assert r.lift_ppm > 0


def test_frequent_pairs_plan_broadcasts_pruned_items(pairs):
    """The Apriori frequent-item set must broadcast (map-side prune);
    the only big shuffle is the pair join on the basket key."""
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_counts_match_naive_enumeration(spark, pairs):
    """Degree-ordered orientation must count exactly the triangles the
    naive a<b<c enumeration finds, attributed to all three corners."""
    edges = pairs.select("part_a", "part_b").localCheckpoint(eager=True)
    out = {(r.part_id, r.n_triangles)
           for r in triangle_counts(edges).collect()}

    e1 = edges.select(F.col("part_a").alias("a"), F.col("part_b").alias("b"))
    e2 = edges.select(F.col("part_a").alias("b"), F.col("part_b").alias("c"))
    e3 = edges.select(F.col("part_a").alias("a"), F.col("part_b").alias("c"))
    naive = (e1.join(e2, "b").join(e3, ["a", "c"])
             .select(F.explode(F.array("a", "b", "c")).alias("part_id"))
             .groupBy("part_id").agg(F.count("*").alias("n")))
    assert out == {(r.part_id, r.n) for r in naive.collect()}
    assert out, "expected triangles at test SF"


def test_triangle_plan_no_nested_loop(pairs):
    plan = (triangle_counts(pairs.select("part_a", "part_b"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_item_cf_recommends_copurchased_unowned(spark):
    """Customer 900 owns only part 1. Part 2 co-occurs with part 1 in
    3 baskets, part 3 in 2 -> recommend 2 above 3; never recommend the
    owned part 1. Supports meet frequent_pairs' floors (items >= 5
    baskets, pairs >= 2)."""
    from spark_streaming_spark.operators.basket import (
        item_cf_recommendations)

    baskets = {
        1: [1, 2], 2: [1, 2], 3: [1, 2], 4: [1, 3], 5: [1, 3],
        6: [2, 3], 7: [2], 8: [3], 9: [2, 3], 10: [1], 11: [2], 12: [3],
        900: [1],
    }
    li = spark.createDataFrame(
        [(ok, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
          __import__("datetime").datetime(2024, 1, 1))
         for ok, parts in baskets.items()
         for i, p in enumerate(parts)],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp")
    orders = spark.createDataFrame(
        [(ok, 900 if ok == 900 else ok, "O", 1.0,
          __import__("datetime").datetime(2024, 1, 1), "1-URGENT")
         for ok in baskets],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string")
    recs = [r for r in item_cf_recommendations(li, orders).collect()
            if r["custkey"] == 900]
    assert [r["part"] for r in sorted(recs, key=lambda r: r["rnk"])] \
        == [2, 3]
    assert all(r["part"] != 1 for r in recs)
