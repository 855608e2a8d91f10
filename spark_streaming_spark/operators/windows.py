"""Time-window aggregations (SURVEY.md §2.4/§2.9).

The reference's windows are processing-time sliding windows:
``reduceByKeyAndWindow(sum, 60s, 10s)``
(``/root/reference/src/main/java/com/soto/WindowHotWord.java:52-57``,
``Top3HotProduct.java:52-57``). Ours are event-time windows over the
``events.ts`` column — the same 60s/10s geometry, but deterministic and
replayable (the reference's arrival-time windows can't be tested
reproducibly at all). The streaming twins in streaming/pipelines.py add
watermarks; here the same expressions run in batch for the oracle.

Scale notes: ``window()`` is a generator expression — a 60s/10s slide
emits 6 rows per input row *before* partial aggregation collapses them,
so the shuffle carries (n_keys × n_windows) rows, not (6 × n_rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_spark.functions.numeric import dsum


def _flatten_window(df: DataFrame, *extra: str) -> DataFrame:
    return df.select(
        F.col("window.start").alias("w_start"),
        F.col("window.end").alias("w_end"),
        *extra,
    )


def tumbling_counts(events: DataFrame, width: str = "60 seconds") -> DataFrame:
    """Per event_type counts in tumbling windows.
    Columns: w_start, w_end, event_type, cnt."""
    agg = (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(F.count("*").alias("cnt"), dsum("value").alias("sum_value"))
    )
    return _flatten_window(agg, "event_type", "cnt", "sum_value")


def sliding_counts(events: DataFrame, width: str = "60 seconds",
                   slide: str = "10 seconds") -> DataFrame:
    """Per event_type counts in 60s/10s sliding windows — the reference's
    exact window geometry. Columns: w_start, w_end, event_type, cnt."""
    agg = (
        events.groupBy(F.window("ts", width, slide), "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    return _flatten_window(agg, "event_type", "cnt")


def rank_top_k(counts: DataFrame, k: int = 3) -> DataFrame:
    """Partitioned top-k over (w_start, w_end) window-count rows:
    row_number ≤ k with deterministic tie-break. Shared by the batch
    query and the streaming foreachBatch ranking (the rank-over-streaming-
    aggregate workaround, SURVEY.md §4.3(2))."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("w_start", "w_end").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def hot_words_per_window(events: DataFrame, k: int = 3) -> DataFrame:
    """WindowHotWord, faithfully: within each sliding window, the top-k
    event_types by count (row_number ≤ k with deterministic tie-break).
    Columns: w_start, w_end, event_type, cnt, rank."""
    return rank_top_k(sliding_counts(events), k)


def inter_arrival_stats(events: DataFrame) -> DataFrame:
    """lag()-based inter-arrival analysis per user: gap to the previous
    event (exact integer microseconds — no float drift), count and mean.
    Completes the analytic-window surface beyond row_number (SURVEY.md
    §2.5 notes the reference's only window function). One shuffle on
    user_id; the sort is per-partition.
    Columns: user_id, n_gaps, sum_gap_us, avg_gap_us."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    gaps = events.select("user_id", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap_us").alias("sum_gap_us"),
        (F.sum("gap_us").cast("double") / F.count("*")).alias("avg_gap_us"),
    )


def sessionize(events: DataFrame, gap_minutes: int = 5) -> DataFrame:
    """Per-EVENT session assignment (the row-level twin of
    :func:`session_windows`, which only emits per-session aggregates):
    an event starts a new session when the gap to the user's previous
    event exceeds ``gap_minutes``; ``session_seq`` is the running count
    of session starts — the classic lag + cumulative-sum sessionizer
    every clickstream pipeline needs when downstream operators want the
    session id ON the event row (funnels, per-session features).

    One shuffle on user_id; both windows share the same (user_id | ts,
    event_id) sort, so Catalyst plans a single exchange + sort. Exact
    integer microsecond comparison — no float drift.
    Columns: event_id, user_id, ts, session_seq."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = (
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - prev) > F.lit(gap_us))
    ).cast("int")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.select(
        "event_id", "user_id", "ts",
        F.sum(new_sess).over(run).cast("int").alias("session_seq"),
    )


def session_windows(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge.
    A capability beyond the reference (DStreams have no session concept).
    Columns: user_id, w_start, w_end, n_events."""
    agg = (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return agg.select(
        "user_id",
        F.col("session_window.start").alias("w_start"),
        F.col("session_window.end").alias("w_end"),
        "n_events",
    )


def dynamic_session_windows(events: DataFrame) -> DataFrame:
    """Session windows with a PER-EVENT gap (Spark's dynamic
    ``session_window(ts, gap_expr)``, SPARK-36465): purchases close a
    session after 2 minutes, everything else after 5 — the
    engagement-dependent timeout real sessionizers use. Each event
    claims [ts, ts+gap); overlapping claims per user merge; the session
    end is the furthest reach of its members.

    Scale shape: identical to the static-gap session aggregate — one
    shuffle on the user key, per-key sort inside the session assignment;
    in streaming the state store holds only open sessions (watermark
    evicts closed ones).

    Columns: user_id, w_start, w_end, n_events."""
    gap = (F.when(F.col("event_type") == "purchase", F.lit("2 minutes"))
           .otherwise(F.lit("5 minutes")))
    agg = (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return agg.select(
        "user_id",
        F.col("session_window.start").alias("w_start"),
        F.col("session_window.end").alias("w_end"),
        "n_events",
    )
