"""Hierarchical (continuous-aggregate) rollups: pre-aggregate fine time
buckets once, answer coarser queries by RE-aggregating the rollup —
never rescanning the raw table.

This is the hypertable/continuous-aggregate pattern: at 100 TB the raw
events table is scanned once a day to maintain the daily rollup
(~|keys|×365 rows/year), and every dashboard/monthly/yearly query runs
against the rollup at 1e-5 of the cost. The pattern is only CORRECT if
every aggregate is mergeable and the merge is exact — which is why the
sums here use the decimal-quantize contract (functions/numeric.dsum):
decimal sums are associative, so sum-of-daily-sums ≡ sum-over-raw
bitwise, and the oracle can verify the equivalence (monthly-from-daily
vs monthly-from-raw hash-match). count/min/max merge trivially; avg is
derived at READ time from (sum, count) — never stored, storing it would
break mergeability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_spark.functions.numeric import dsum


def daily_event_rollup(events: DataFrame) -> DataFrame:
    """The maintained fine-grain aggregate: per (day, event_type) counts
    and exact value sums + min/max. Columns: day, event_type, n_events,
    sum_value, min_value, max_value."""
    return (
        events.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def monthly_from_daily(daily: DataFrame) -> DataFrame:
    """Answer the monthly question FROM the daily rollup: counts and sums
    merge by addition (re-quantized — exact, since daily sums are already
    2-dp quantized), min/max by min/max, avg derived from merged
    (sum, count). Columns: month, event_type, n_events, sum_value,
    min_value, max_value, avg_value."""
    return (
        daily.groupBy(
            F.date_trunc("month", "day").alias("month"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            dsum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn(
            "avg_value", F.col("sum_value") / F.col("n_events")
        )
    )


def monthly_event_stats(events: DataFrame) -> DataFrame:
    """The rollup-backed monthly query the engine actually serves (daily
    rollup → monthly merge, composed). Oracle-checked against a direct
    monthly aggregation over raw events — proving the two-level
    re-aggregation is exact, not approximately right."""
    return monthly_from_daily(daily_event_rollup(events))
