"""Distributed exact global rank + RFM (operators/ranking.py)."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from spark_streaming_spark.operators.ranking import (
    _ntile_score, customer_rfm, with_global_rank)
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_global_rank_equals_single_partition_window(spark):
    orders = load_table(spark, SF_DIR, "orders")
    got = {r.o_orderkey: r.rank for r in with_global_rank(
        orders, ["o_totalprice", "o_orderkey"]).collect()}
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {r.o_orderkey: r.rank for r in orders.withColumn(
        "rank", F.row_number().over(w)).collect()}
    assert got == want


def test_global_rank_no_big_single_partition_exchange(spark):
    """The data path must range-partition; the only single-partition
    window is the cumsum over the #partitions-sized count table (the
    pack_sequences discipline)."""
    orders = load_table(spark, SF_DIR, "orders")
    df = with_global_rank(orders, ["o_totalprice", "o_orderkey"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_ntile_formula_matches_sql_ntile(spark):
    for n in (7, 10, 23, 100):
        ranks = spark.range(1, n + 1).select(
            F.col("id").alias("rank"))
        got = {r.rank: r.s for r in ranks.select(
            "rank", _ntile_score("rank", n, 5).alias("s")).collect()}
        want = {r.rank: r.s for r in ranks.select(
            "rank",
            F.ntile(5).over(Window.orderBy("rank")).alias("s")).collect()}
        assert got == want, n


def test_customer_rfm_scores_partition_into_quintiles(spark):
    orders = load_table(spark, SF_DIR, "orders")
    rows = customer_rfm(orders).collect()
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            sizes[getattr(r, col)] = sizes.get(getattr(r, col), 0) + 1
        assert set(sizes) == {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1
    best = min(rows, key=lambda r: (r.recency_days, r.c_custkey))
    assert best.r_score == 1
    assert sum(1 for r in rows if r.rfm_code == 111) >= 0  # well-formed


def test_global_cumsum_equals_single_partition_window(spark):
    from spark_streaming_spark.operators.ranking import with_global_cumsum

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", F.col("o_orderkey").alias("v"))
    got = {r.o_orderkey: r.cum for r in with_global_cumsum(
        orders, ["o_orderkey"], "v").collect()}
    w = (Window.orderBy("o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r.o_orderkey: r.cum for r in orders.withColumn(
        "cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_pareto_abc_monotone_and_complete(spark):
    from spark_streaming_spark.operators.ranking import pareto_parts

    li = load_table(spark, SF_DIR, "lineitem")
    rows = sorted(pareto_parts(li).collect(),
                  key=lambda r: (-r.revenue_c4, r.part_id))
    assert rows[-1].cum_share_ppm == 1_000_000  # full tape covered
    last = 0
    for r in rows:
        assert r.cum_share_ppm >= last   # cumulative share monotone
        last = r.cum_share_ppm
        want = ("A" if r.cum_share_ppm <= 700000
                else "B" if r.cum_share_ppm <= 900000 else "C")
        assert r.abc_class == want
    assert {r.abc_class for r in rows} == {"A", "B", "C"}
