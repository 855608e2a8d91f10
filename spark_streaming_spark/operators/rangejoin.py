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
    ``grid`` must be ≥ the widest range (asserted cheaply on the dim
    side at plan time would need a scan, so it is the caller's
    contract; a too-small grid silently DROPS matches that span >2
    cells — prefer generous). Output: facts columns + dims columns.

    Plan: dims explode to ≤ 2 (cell, range) rows and broadcast; facts
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
