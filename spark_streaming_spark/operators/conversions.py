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


def position_attribution(events: DataFrame,
                         horizon_days: int = 7) -> DataFrame:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution —
    the marketing-analytics standard (public method): each purchase's
    value is credited to the user's clicks in the preceding
    ``horizon_days``: 40 % to the first touch, 40 % to the last, 20 %
    split over the middle touches; 1 click → 100 %, 2 clicks → 50/50.
    Reported as attributed revenue per CLICK DAY — "which day's traffic
    earned this week's revenue".

    Exact integer contract: purchase value quantizes to cents; credit
    shares are ppm integers that sum to EXACTLY 1e6 per purchase (the
    middle 200000 ppm uses floor DIV with the remainder assigned to the
    FIRST middle click — the documented tie rule); attributed cents =
    (cents · ppm) DIV 1e6, floor. No float anywhere.

    Scale shape: one user-keyed interval join (the conversion-funnel
    shape — both sides shuffle once on user_id, state bounded by the
    horizon when streamed), one per-purchase window over the matched
    clicks (bounded by clicks-per-user-week), one final partial-agged
    day rollup. Columns: day, attributed_cents, n_credits."""
    from pyspark.sql.window import Window

    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"))
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"))
    matched = purchases.join(clicks, "u").filter(
        (F.col("cts") < F.col("pts"))
        & (F.col("cts") >= F.col("pts")
           - F.expr(f"INTERVAL {horizon_days} DAYS")))
    w = Window.partitionBy("pid").orderBy(
        F.col("cts").asc(), F.col("cid").asc())
    pos = matched.select(
        "pid", "cents", "cts",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("pid")).alias("cnt"))
    ppm = (
        F.when(F.col("cnt") == 1, F.lit(1000000))
        .when(F.col("cnt") == 2, F.lit(500000))
        .when(F.col("rn") == 1, F.lit(400000))
        .when(F.col("rn") == F.col("cnt"), F.lit(400000))
        .when(F.col("rn") == 2,
              F.expr("200000 div (cnt - 2) + 200000 % (cnt - 2)"))
        .otherwise(F.expr("200000 div (cnt - 2)"))
    )
    credited = pos.select(
        F.to_date("cts").alias("day"),
        F.expr("CAST(cents AS BIGINT)").alias("cents"),
        ppm.cast("long").alias("ppm"))
    return (
        credited.groupBy("day")
        .agg(F.sum(F.expr("(cents * ppm) div 1000000"))
             .cast("long").alias("attributed_cents"),
             F.count("*").cast("long").alias("n_credits"))
    )


POSITION_ATTRIBUTION_SQL = """
    WITH p AS (
      SELECT user_id AS u, event_id AS pid, ts AS pts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id AS u, event_id AS cid, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    m AS (
      SELECT p.pid, p.cents, c.cts,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY c.cts ASC, c.cid ASC) AS rn,
             count(*) OVER (PARTITION BY p.pid) AS cnt
      FROM p JOIN c ON c.u = p.u
      WHERE c.cts < p.pts AND c.cts >= p.pts - INTERVAL 7 DAY
    ),
    credited AS (
      SELECT CAST(date_trunc('day', cts) AS DATE) AS day, cents,
             CAST(CASE
               WHEN cnt = 1 THEN 1000000
               WHEN cnt = 2 THEN 500000
               WHEN rn = 1 THEN 400000
               WHEN rn = cnt THEN 400000
               WHEN rn = 2 THEN 200000 // (cnt - 2) + 200000 % (cnt - 2)
               ELSE 200000 // (cnt - 2)
             END AS BIGINT) AS ppm
      FROM m
    )
    SELECT day,
           CAST(SUM((cents * ppm) // 1000000) AS BIGINT)
             AS attributed_cents,
           CAST(count(*) AS BIGINT) AS n_credits
    FROM credited GROUP BY 1
"""
