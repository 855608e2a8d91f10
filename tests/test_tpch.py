"""Plan-quality checks for the extended TPC-H shapes (operators/tpch.py).

Value correctness is covered by the parametrized oracle sweep in
test_correctness.py; these assert the physical plans hold their 100 TB
posture — pushdown, broadcast choices, top-k strategy, no cartesians.
"""

from __future__ import annotations

from spark_streaming_spark.operators import tpch as TPC
from spark_streaming_spark.plans import explain
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def _t(spark, name):
    return load_table(spark, SF_DIR, name)


def test_q10_pushdown_broadcast_and_topk(spark):
    df = TPC.returned_items_report(
        _t(spark, "customer"), _t(spark, "orders"),
        _t(spark, "lineitem"), _t(spark, "nation"),
    )
    pushed = explain.pushed_filters(df)
    assert any("l_returnflag" in p for p in pushed), pushed
    assert any("o_orderdate" in p for p in pushed), pushed
    assert explain.has_broadcast_join(df)
    assert explain.has_take_ordered(df)
    assert not explain.has_cartesian_product(df)


def test_q12_shipdate_pushed(spark):
    df = TPC.priority_shipping_mix(_t(spark, "orders"), _t(spark, "lineitem"))
    pushed = explain.pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_q14_part_broadcast_and_narrow_scan(spark):
    df = TPC.promo_revenue(_t(spark, "lineitem"), _t(spark, "part"))
    assert explain.has_broadcast_join(df)
    schemas = explain.read_schema_columns(df)
    li = next(s for s in schemas if "l_partkey" in s)
    assert li == {"l_partkey", "l_shipdate", "l_extendedprice", "l_discount"}, li


def test_q17_no_cartesian_and_brand_broadcast(spark):
    df = TPC.small_qty_part_revenue(_t(spark, "lineitem"), _t(spark, "part"))
    assert explain.has_broadcast_join(df)
    assert not explain.has_cartesian_product(df)


def test_q18_agg_before_joins_and_topk(spark):
    df = TPC.large_volume_orders(
        _t(spark, "customer"), _t(spark, "orders"), _t(spark, "lineitem")
    )
    assert explain.has_take_ordered(df)
    # lineitem scan must read only the agg's two columns
    schemas = explain.read_schema_columns(df)
    assert {"l_orderkey", "l_quantity"} in schemas, schemas


def test_q19_scan_hull_pushed(spark):
    df = TPC.discounted_parts_revenue(_t(spark, "lineitem"), _t(spark, "part"))
    pushed = explain.pushed_filters(df)
    assert any("l_quantity" in p for p in pushed), pushed
    assert any("p_brand" in p for p in pushed), pushed
    assert explain.has_broadcast_join(df)


def test_q22_anti_join_no_cartesian_blowup(spark):
    df = TPC.idle_rich_customers(_t(spark, "customer"), _t(spark, "orders"))
    plan = explain.explain_text(df)
    assert "LeftAnti" in plan, plan
    pushed = explain.pushed_filters(df)
    assert any("o_orderdate" in p for p in pushed), pushed


def test_q7_double_nation_broadcast(spark):
    df = TPC.nation_trade_volume(
        _t(spark, "customer"), _t(spark, "orders"),
        _t(spark, "lineitem"), _t(spark, "supplier"), _t(spark, "nation"),
    )
    assert explain.has_broadcast_join(df)
    assert not explain.has_cartesian_product(df)


def test_q8_single_pass_share(spark):
    df = TPC.market_share(
        _t(spark, "customer"), _t(spark, "orders"), _t(spark, "lineitem"),
        _t(spark, "supplier"), _t(spark, "nation"), _t(spark, "region"),
        _t(spark, "part"),
    )
    # conditional + total sums in ONE aggregate: lineitem appears in
    # exactly one scan of the plan
    plan = explain.explain_text(df)
    assert plan.count("lineitem.parquet") <= 1, "lineitem scanned twice"
    assert explain.has_broadcast_join(df)


def test_q15_max_is_broadcast_not_resort(spark):
    df = TPC.top_supplier(_t(spark, "lineitem"), _t(spark, "supplier"))
    assert explain.has_broadcast_join(df)
    pushed = explain.pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_q13_outer_join_and_two_level_agg(spark):
    df = TPC.customer_order_distribution(
        _t(spark, "customer"), _t(spark, "orders"))
    txt = explain.explain_text(df)
    # outer join preserved (zero-order customers kept)
    assert "LeftOuter" in txt, txt
    # order-side filter pushed into the parquet scan
    pushed = explain.pushed_filters(df)
    assert any("o_orderpriority" in p for p in pushed), pushed
    assert explain.has_partial_aggregate(df)
    assert not explain.has_cartesian_product(df)


def test_q21_semi_anti_joins_no_cartesian(spark):
    df = TPC.waiting_suppliers(
        _t(spark, "supplier"), _t(spark, "lineitem"),
        _t(spark, "orders"), _t(spark, "nation"))
    txt = explain.explain_text(df)
    # the EXISTS / NOT EXISTS pair compiles to hash semi/anti joins on
    # the order key, never a correlated re-scan or cartesian
    assert "LeftSemi" in txt, txt
    assert "LeftAnti" in txt, txt
    assert explain.has_broadcast_join(df)
    assert explain.has_take_ordered(df)
    assert not explain.has_cartesian_product(df)
    # orders' status filter reaches the scan
    pushed = explain.pushed_filters(df)
    assert any("o_orderstatus" in p for p in pushed), pushed
