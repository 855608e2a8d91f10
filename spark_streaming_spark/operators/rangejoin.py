"""Interval-containment join at scale (the IP-range→geo / value→tier
lookup shape): facts carry a point value, dims carry [lo, hi) ranges,
and the join wants every (fact, dim) pair with lo ≤ v < hi.

The naive spelling — ``facts.join(dims, (v >= lo) & (v < hi))`` — has no
equi-key, so Spark plans a BroadcastNestedLoopJoin: every fact row is
tested against every range, O(|facts|·|dims|) comparisons. Fine for 10
ranges, fatal at 100 TB of facts × 10⁵ ranges.

Grid blocking turns it into an EQUI join (the same trick as the keyless
band join in operators/asof.py and the grid cells of the stream-stream
activity join): pick a cell width ≥ the widest range, explode each dim
range to the ≤ 2 cells it touches, key facts by their single cell, hash-
join on the cell, and exact-filter the containment predicate. Each
(fact, overlapping-range) pair meets in exactly the fact's cell, so the
equi join produces no duplicates — the filter only removes same-cell
non-matches. Dims after explode are still tiny → broadcast; the fact
side is map-only end to end.

Cited reference scope: joins in the reference are keyed DStream joins
(``/root/reference/src/main/java/BlackListFilter.java:41-58``); interval
containment is part of the extension surface a training-data pipeline
needs (score→tier bucketing against learned, unaligned thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(facts: DataFrame, dims: DataFrame, value_col: str,
                  lo_col: str, hi_col: str, grid: float,
                  how: str = "inner") -> DataFrame:
    """Join fact rows to every dim range containing their value.
    ``grid`` is a COST knob, never a correctness one: each range
    explodes to ALL span/grid + 1 cells it touches (``F.sequence``), so
    a too-small grid only inflates the broadcast — matches are never
    dropped (pinned in tests/test_rangejoin.py). Pick grid ≥ the
    typical span so ranges replicate ~2×. Output: facts columns + dims
    columns.

    Plan: dims explode to (cell, range) rows and broadcast; facts
    compute their cell map-side; BroadcastHashJoin on cell + exact
    containment filter. The fact table never shuffles."""
    cells = F.sequence(
        F.floor(F.col(lo_col) / grid).cast("long"),
        F.floor(F.col(hi_col) / grid).cast("long"),
    )
    exploded = dims.withColumn("_dcell", F.explode(cells))
    keyed = facts.withColumn(
        "_fcell", F.floor(F.col(value_col) / grid).cast("long"))
    joined = keyed.join(
        F.broadcast(exploded),
        (F.col("_fcell") == F.col("_dcell"))
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col)),
        how,
    )
    return joined.drop("_fcell", "_dcell")


def value_tiers(spark, n_tiers: int = 24) -> DataFrame:
    """Deterministic unaligned tier table over the events value domain:
    tier i covers [20i + (i mod 4), lo + 14 + (7i mod 13)) — widths
    14–26, gaps between some tiers, overlaps between others, so the
    lookup exercises multi-match and no-match rows. Integer arithmetic
    cast to double, so the oracle rebuilds the identical table from
    ``range(n_tiers)``."""
    return spark.range(n_tiers).select(
        F.col("id").cast("int").alias("tier"),
        (F.col("id") * 20 + F.col("id") % 4).cast("double").alias("lo"),
        (F.col("id") * 20 + F.col("id") % 4 + 14 + (F.col("id") * 7) % 13)
        .cast("double").alias("hi"),
    )


def value_tier_totals(events: DataFrame, tiers: DataFrame) -> DataFrame:
    """Per-tier rollup of events through the interval join: n_events +
    decimal-exact value total. Grid 32 ≥ the widest tier (26), so every
    range spans ≤ 2 cells. Columns: tier, n_events, total_value."""
    from spark_streaming_spark.functions.numeric import dsum

    return (
        interval_join(events, tiers, "value", "lo", "hi", grid=32.0)
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


# --- Shuffle-grid range join (both sides large) ------------------------------
#
# interval_join above broadcasts the range side — right when ranges are
# a dim table. When BOTH sides are fact-sized (every order opens a time
# window, every shipment is a point: 10⁸ × 10⁹ at 100 TB) a broadcast is
# impossible and the bare BETWEEN would again be a nested loop. The same
# grid trick scales to a SHUFFLE equi join instead: intervals replicate
# into the span/B + 1 cells they touch, points key by their single
# cell, and an ordinary shuffled hash/sort-merge join on the cell id —
# with partial aggregation, AQE, and skew salting all available, because
# it IS an equi join. Each qualifying pair meets exactly once (in the
# point's cell), so no dedup pass. The public technique behind range-
# join binning hints (Databricks) and Flink's interval-join buckets.


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, lo_col: str, hi_col: str,
               bucket: int) -> DataFrame:
    """Inner join of ``points`` to ``intervals`` on
    ``lo_col <= point_col <= hi_col`` — all three INTEGER columns on the
    same axis (day numbers, epoch seconds, cents…). Returns all columns
    of both inputs (names must be disjoint; asserted), one row per
    qualifying pair, no duplicates.

    ``bucket`` is the grid width in axis units: interval replication is
    span/bucket + 1 rows, so pick bucket near the typical span (the
    classic rule: B ≈ the p90 span → ~2× replication). Temporal skew is
    bounded per-cell by the bucket width; a pathological hot cell salts
    like any hot equi key."""
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    p = points.withColumn("__cell", _grid_cell(point_col, bucket))
    i = intervals.withColumn(
        "__cell",
        F.explode(F.sequence(_grid_cell(lo_col, bucket),
                             _grid_cell(hi_col, bucket))),
    )
    return (
        p.join(i, "__cell")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__cell")
    )


def _grid_cell(col: str, bucket: int):
    # exact INTEGER floor division (ADVICE r8: int/int `/` promotes to
    # double, so cell ids lose precision past 2^53 and can mis-bucket
    # boundary points on generic int64 axes — epoch micros, cents).
    # DIV truncates toward zero, so negatives take the ceil-of-magnitude
    # form to keep the grid floor-aligned: floor(-9/8) = -2.
    b = int(bucket)
    if b <= 0:
        raise ValueError(f"bucket must be positive, got {bucket}")
    return F.expr(
        f"CAST(IF({col} >= 0, {col} DIV {b}, "
        f"-(((-({col})) + {b} - 1) DIV {b})) AS BIGINT)"
    )


def ship_window_order_counts(orders: DataFrame, lineitem: DataFrame,
                             window_days: int = 6,
                             max_qty: float = 2.0,
                             bucket: int = 8) -> DataFrame:
    """Flagship shuffle-range-join query: for every order's placement
    week (``[o_orderdate, o_orderdate + window_days]``), how many
    low-volume line items (``l_quantity <= max_qty``, ANY order) shipped
    inside the window — market activity around each order, a pure
    range predicate with NO equi key and both sides order-of-the-fact-
    table. Dates become exact integer day numbers (days since
    1970-01-01, identical in both engines) so the grid arithmetic is
    pure int64. Columns: o_orderkey, n_shipped, first_ship, last_ship."""
    day = lambda c: F.datediff(F.to_date(c), F.lit("1970-01-01"))
    pts = (
        lineitem.filter(F.col("l_quantity") <= max_qty)
        .select(F.to_date("l_shipdate").alias("ship_date"),
                day("l_shipdate").alias("ship_day"))
    )
    iv = orders.select(
        "o_orderkey",
        day("o_orderdate").alias("lo_day"),
        (day("o_orderdate") + window_days).alias("hi_day"),
    )
    return (
        range_join(pts, iv, "ship_day", "lo_day", "hi_day", bucket)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_shipped"),
            F.min("ship_date").alias("first_ship"),
            F.max("ship_date").alias("last_ship"),
        )
    )
