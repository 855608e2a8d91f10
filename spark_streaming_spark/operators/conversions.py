"""Stream-stream interval join: click→purchase conversion funnel.

The reference has NO stream-stream joins (its only join is stream-static,
``/root/reference/src/main/java/com/soto/TransformBlacklist.java:48-53``;
SURVEY.md §2.3 notes the absence) — this operator is a Structured
Streaming capability the DStream API could not express at all: two
unbounded sides matched on key + event-time interval, with state evicted
by watermark.

As everywhere in this engine the operator is a pure DataFrame→DataFrame
function: run it on a batch DataFrame and it plans as an ordinary
equi-join + range filter (the DuckDB-checkable semantics); run it on a
streaming DataFrame and Catalyst plans StreamingSymmetricHashJoin keyed
on user_id.

Scale notes: the join shuffles both sides on ``user_id`` (symmetric hash
join buffers per-key state on each side). State is bounded by the
watermark + the join's time horizon — every buffered click can be
dropped once the purchase-side watermark passes ``click_ts + horizon``.
Without watermarks (the bounded-replay correctness entry) state grows
with the input, which is fine for a replay and wrong for production —
pass ``watermark=`` there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_conversions(
    events: DataFrame,
    horizon: str = "5 minutes",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Purchases attributed to a click by the same user within ``horizon``
    (click_ts ≤ purchase_ts ≤ click_ts + horizon).
    Columns: user_id, click_id, purchase_id, click_ts, purchase_ts.

    Works unchanged on a batch OR streaming ``events`` input (the
    streaming case is a stream-stream self-join; pass ``watermark`` to
    bound state).

    ``how="left_outer"``: clicks that convert keep their matches; clicks
    that never convert within the horizon emit ONE null-extended row —
    the funnel-drop-off side of the join. In streaming the outer modes
    are the strictest Structured Streaming offers: they REQUIRE
    watermarks on both sides plus the event-time interval condition,
    because an outer row can only be emitted once the watermark proves
    no matching row can still arrive (state eviction = result
    emission). The replayed twin is deterministic under the ordered-
    replay + sentinel harness — the sentinel advances the watermark past
    every real click's horizon, so the finalized append-mode output
    equals the batch answer exactly.

    ``how="right_outer"``: the mirror — purchases with no qualifying
    click (organic purchases) keep one null-extended row.
    ``how="full_outer"``: both unmatched sides survive — the complete
    attribution ledger (converted clicks + dead clicks + organic
    purchases) in one pass. The output ``user_id`` is coalesced across
    the two sides so it is never null in any mode.
    """
    src = events.withWatermark("ts", watermark) if watermark else events
    clicks = src.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = src.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"interval {horizon}")),
            how,
        )
        .select(
            F.coalesce("user_id", "p_user_id").alias("user_id"),
            "click_id", "purchase_id", "click_ts", "purchase_ts",
        )
    )


def time_to_convert_stats(events: DataFrame) -> DataFrame:
    """Time-to-convert distribution — the funnel-latency summary a
    growth dashboard leads with: per user, seconds from FIRST click to
    the first purchase AFTER it; then exact median and p90 over the
    converting users (values at global ranks ⌈n/2⌉ and ⌈9n/10⌉ under a
    total (delta, user) order — integer seconds, no interpolation, so
    the summary is engine-identical). Columns: n_converted, p50_s,
    p90_s (one row).

    Scale shape: two filtered per-user min-aggregates (click, then
    purchase-after-click via one join keyed on user), the rank pass is
    the two-phase range-partitioned global rank reduced to two
    broadcast scalars."""
    from spark_streaming_spark.operators.ranking import with_global_rank

    first_click = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id").agg(F.min("ts").alias("c_ts")))
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.min("c_ts").alias("c_ts"))
        # exact integer micros, then floor-DIV to seconds: second-
        # truncation semantics differ across engines on fractional ts
        .select("user_id",
                F.expr("(unix_micros(p_ts) - unix_micros(c_ts))"
                       " DIV 1000000").cast("long").alias("delta_s"))
    )
    n = conv.count()  # 1-row scalar
    r50, r90 = (n + 1) // 2, (9 * n + 9) // 10
    ranked = with_global_rank(conv, ["delta_s", "user_id"], "rk")
    # Percentile scalars as 1-row aggregates (max over the single
    # matching rank; NULL when no user converted) so the zero-
    # conversion case still yields ONE row (n_converted=0, NULL
    # percentiles) — a cross join against an empty percentile frame
    # would erase the count row.
    p50 = ranked.agg(F.max(F.when(F.col("rk") == r50,
                                  F.col("delta_s"))).alias("p50_s"))
    p90 = ranked.agg(F.max(F.when(F.col("rk") == r90,
                                  F.col("delta_s"))).alias("p90_s"))
    return (
        conv.agg(F.count("*").cast("long").alias("n_converted"))
        .join(F.broadcast(p50)).join(F.broadcast(p90))
    )
