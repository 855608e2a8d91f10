"""Keyed / global aggregations (SURVEY.md §2.4) + the full-surface extras
the reference lacks (distinct aggs, rollup/cube, approx sketches).

Reference parity target is ``reduceByKey`` per-batch sums
(``/root/reference/src/main/java/com/soto/WordCount.java:48-53``) and the
``updateStateByKey`` running fold (``UpdateStateByKeyWordCount.java:54-78``).
Catalyst plans every groupBy here as partial (map-side) + final aggregation
— exactly the hand-tuned combiner behavior the reference relied on — with
one shuffle on the grouping key.

Scale posture: all money-column sums are decimal-quantized (see
functions/numeric.dsum) so results are order-independent → reproducible
across 1000-executor reruns, and comparable against external oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_spark.functions.numeric import davg, dsum


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary.
    Filter on l_shipdate is pushed to the parquet scan."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(38,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(38,6)")).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame,
                      region_name: str = "ASIA") -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier are
    co-located in one region. Exercises a 6-table join chain.

    Scale notes: lineitem is the fact; orders/customer shuffle on their
    keys, while supplier/nation/region are broadcast (small dims). AQE
    re-plans the middle joins if estimates are off.
    """
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,4)")
    return (
        region.filter(F.col("r_name") == region_name)
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(lineitem, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            customer,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: per priority, count orders having at least one line
    shipped after the order date — LEFT SEMI join (EXISTS)."""
    late_lines = lineitem.filter(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp"))
    return (
        orders.join(
            late_lines,
            orders["o_orderkey"] == late_lines["l_orderkey"],
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def top_revenue_orders(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: str = "BUILDING",
                       k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: top-k orders by revenue within a market segment.
    TakeOrderedAndProject keeps the driver transfer at k rows."""
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,4)")
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def lineitem_stats(lineitem: DataFrame) -> DataFrame:
    """Global (no-key) aggregate surface: count / distinct / min / max /
    decimal-stable avg."""
    return lineitem.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg("l_extendedprice").alias("avg_price"),
    )


def rollup_customer_nations(customer: DataFrame, nation: DataFrame,
                            region: DataFrame) -> DataFrame:
    """ROLLUP (region, nation): customer counts + decimal-stable acctbal
    sums at every level incl. grand total."""
    joined = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("sum_acctbal"))
    )


def cube_order_status(orders: DataFrame) -> DataFrame:
    """CUBE (status, priority): order counts + decimal-stable totals for
    every subset of the grouping keys."""
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price")
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """PIVOT: one row per user, one count column per event_type (the
    wide-format surface; fixed category list so the schema is static —
    an open-ended pivot would need a driver-side distinct pass first,
    which is exactly what you avoid at 100 TB).
    Columns: user_id, n_click, n_error, n_purchase, n_signup, n_view."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0)
        .select(
            "user_id",
            *[F.col(t).alias(f"n_{t}") for t in types],
        )
    )


def event_counts_unpivot(events: DataFrame) -> DataFrame:
    """UNPIVOT (melt): the wide per-user count matrix back to long form
    — the inverse surface of :func:`event_type_pivot`, used whenever a
    downstream operator wants (user, metric) keyed rows (plotting,
    sparse storage, per-metric joins). ``DataFrame.unpivot`` is a
    map-only Expand node: no shuffle beyond the pivot's own aggregation,
    row count multiplies by the fixed metric-list length.
    Columns: user_id, metric, cnt."""
    wide = event_type_pivot(events)
    metrics = [c for c in wide.columns if c != "user_id"]
    return wide.unpivot("user_id", metrics, "metric", "cnt")


def quantity_quantiles(lineitem: DataFrame) -> DataFrame:
    """Exact per-group quantiles (median/p90, linear interpolation —
    identical definition in DuckDB's quantile_cont, so bitwise
    oracle-checkable). Exact percentile sorts each group; at 100 TB
    reach for ``approx_percentile`` (t-digest, one pass, mergeable) and
    accept the sketch error instead — same query shape.
    Columns: l_returnflag, med_qty, p90_qty, med_price."""
    return lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price"),
    )


def approx_quantity_quantiles(lineitem: DataFrame,
                              accuracy: int = 10000) -> DataFrame:
    """The 100 TB twin of :func:`quantity_quantiles`: one-pass mergeable
    approx_percentile (Greenwald-Khanna sketch; partial aggregates merge
    map-side, no per-group sort, bounded memory at any cardinality).
    Sketch results are engine-specific → rows-only driver check; the
    accuracy bound vs the exact answer is asserted in tests.
    Columns: l_returnflag, med_qty, p90_qty, med_price."""
    return lineitem.groupBy("l_returnflag").agg(
        F.expr(f"approx_percentile(l_quantity, 0.5, {accuracy})")
        .alias("med_qty"),
        F.expr(f"approx_percentile(l_quantity, 0.9, {accuracy})")
        .alias("p90_qty"),
        F.expr(f"approx_percentile(l_extendedprice, 0.5, {accuracy})")
        .alias("med_price"),
    )


def forecast_revenue_change(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from discounted small-quantity
    lineitems in a date window. The query is one scan + one scalar agg —
    its entire 100 TB cost is the scan, so ALL THREE predicates must
    reach the parquet reader (asserted in tests/test_plans.py); with
    min/max row-group statistics the date filter prunes most of a
    time-partitioned table. Columns: revenue."""
    rev = F.col("l_extendedprice") * F.col("l_discount")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev.cast("decimal(38,4)")).cast("double").alias("revenue"))
    )


def grouping_sets_orders(orders: DataFrame) -> DataFrame:
    """GROUPING SETS ((status, priority), (status), ()) — the general form
    cube/rollup specialize; completes the multi-level aggregation surface
    (SURVEY.md §2.4 notes the reference has none of these).
    Columns: o_orderstatus, o_orderpriority, n_orders, sum_price."""
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price"))


def distinct_event_pairs(events: DataFrame) -> DataFrame:
    """DISTINCT surface (≡ dropDuplicates on all columns of a projection)."""
    return events.select("user_id", "event_type").distinct()


def approx_distinct_users(events: DataFrame) -> DataFrame:
    """HLL sketch count (rows-only check: sketches are engine-specific).
    The scale path for COUNT(DISTINCT) at 100 TB — one pass, no giant
    shuffle of distinct keys."""
    return events.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


def sampled_quantiles(lineitem: DataFrame, permille: int = 100,
                      salt: str = "q1") -> DataFrame:
    """Approximate per-group quantiles that the oracle CAN hash-check:
    exact quantiles over a DETERMINISTIC content-hash sample (md5 of the
    row key + salt, the sampling.py discipline). approx_percentile's
    Greenwald-Khanna sketch is engine-private (rows-only check forever);
    here every degree of freedom is pinned — the sample is a pure
    function of the data, and the interpolated percentile over it is the
    same value in Spark and DuckDB — so an APPROXIMATE answer gets an
    exact cross-engine twin (the HLL trade, applied to quantiles).

    Scale: the sample is a map-side filter pushed at the scan, the sort
    cost drops by 1000/permille, and the error is the usual sampling
    bound (pinned vs the exact quantiles in tests). Resampling with a
    new salt is a fresh independent draw — variance estimation for free.
    Columns: l_returnflag, med_qty, p90_qty, med_price."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(
                "#", F.lit(salt),
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"))),
            1, 15),
        16, 10,
    ).cast("long")
    return (
        lineitem.filter((h % 1000) < permille)
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("med_qty"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("med_price"),
        )
    )


def revenue_share_hierarchy(lineitem: DataFrame, orders: DataFrame,
                            customer: DataFrame, nation: DataFrame,
                            region: DataFrame) -> DataFrame:
    """Hierarchical revenue shares — the ratio-to-parent report a BI
    rollup serves ("nation's share of its region, region's share of
    world"), demand-side (customer nation, no supplier co-location
    filter). Revenue sums as exact DECIMAL(38,4); both shares are
    integer-exact ppm via decimal DIV, computed with windows over the
    |nations|-row aggregate (the sanctioned tiny-table window — the
    fact table shuffles once for the groupBy and never for the
    shares). Columns: region, nation, revenue, share_in_region_ppm,
    region_share_ppm."""
    from pyspark.sql import Window

    revenue = (F.col("l_extendedprice")
               * (1 - F.col("l_discount"))).cast("decimal(38,4)")
    per_nation = (
        lineitem
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region),
              F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("r_name").alias("region"),
                 F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).alias("rev"))
    )
    # integer-valued DECIMAL(38,0) before DIV: decimal DIV at scale 4
    # rounds the quotient before truncating (off-by-one vs DuckDB //);
    # the repo-wide rule is DIV only over integer-valued decimals
    per_nation = per_nation.withColumn(
        "revi", F.expr("CAST(rev * 10000 AS DECIMAL(38,0))"))
    shares = per_nation.select(
        "region", "nation",
        F.col("rev").cast("double").alias("revenue"),
        F.expr("CAST((1000000 * revi) DIV SUM(revi) OVER"
               " (PARTITION BY region) AS BIGINT)")
        .alias("share_in_region_ppm"),
    )
    region_shares = (
        per_nation.groupBy("region").agg(F.sum("revi").alias("rrev"))
        .select("region",
                F.expr("CAST((1000000 * rrev) DIV SUM(rrev) OVER ()"
                       " AS BIGINT)").alias("region_share_ppm"))
    )
    return shares.join(F.broadcast(region_shares), "region")


def market_hhi(customer: DataFrame, orders: DataFrame,
               nation: DataFrame) -> DataFrame:
    """Herfindahl-Hirschman concentration index of revenue by nation —
    the market-concentration gate (public formula; the antitrust
    standard): HHI = Σ share_i², reported in exact integer ppm WITHOUT
    ever materializing float shares — the identity
    HHI_ppm = (1e6 · Σ rev_i²) DIV (Σ rev_i)² clears the denominators,
    every term an exact DECIMAL(38,0) of BIGINT cents.

    Scale shape: one orders⋈customer join (customer scales with SF so
    it carries NO mandatory broadcast hint — AQE broadcasts it below
    threshold, shuffles it at 100 TB), one partial-agged nation groupBy
    (≤ 25 rows), driver-sized tail.
    Columns: n_markets, total_cents, hhi_ppm.
    """
    return hhi_from_market_cents(market_cents(customer, orders, nation))


def market_cents(customer: DataFrame, orders: DataFrame,
                 nation: DataFrame) -> DataFrame:
    """Per-nation revenue cents — exactly ADDITIVE under order
    partition (stream-static joins + a sum; only the ≤25-row nation
    dim is hint-broadcast — customer is size-dispatched by AQE), the
    streamed-HHI fold input. Columns: n_name, cents."""
    return (orders.join(customer,
                        orders["o_custkey"] == customer["c_custkey"])
            .join(F.broadcast(nation),
                  customer["c_nationkey"] == nation["n_nationkey"])
            .groupBy("n_name")
            .agg(F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))"
                        " * 100 AS BIGINT)").alias("cents")))


def hhi_from_market_cents(rev: DataFrame) -> DataFrame:
    """:func:`market_hhi`'s cleared-denominator tail from an
    already-built (or streamed-and-folded) market cents table."""
    return rev.agg(
        F.count("*").cast("long").alias("n_markets"),
        F.sum("cents").cast("decimal(38,0)").alias("sx"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents"))
        .alias("sx2"),
    ).select(
        "n_markets",
        F.col("sx").cast("long").alias("total_cents"),
        F.expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sx2)"
               " div (sx * sx) AS BIGINT)").alias("hhi_ppm"),
    )


MARKET_HHI_SQL = """
    WITH rev AS (
      SELECT n.n_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) * 100
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_markets,
             CAST(SUM(cents) AS HUGEINT) AS sx,
             SUM(CAST(cents AS HUGEINT) * cents) AS sx2
      FROM rev
    )
    SELECT n_markets, CAST(sx AS BIGINT) AS total_cents,
           CAST((CAST(1000000 AS HUGEINT) * sx2) // (sx * sx)
                AS BIGINT) AS hhi_ppm
    FROM m
"""
