"""As-of (nearest-preceding) join — a custom operator Spark lacks as a
primitive, built as a composition of existing DataFrame ops (union +
running window), per the engine's custom-operator policy (SURVEY.md §4.3:
prefer compositions; pandas UDFs only when composition can't express the
semantics). The reference has no as-of concept at all (its only join is
the stream-static blacklist equi-join,
``/root/reference/src/main/java/com/soto/TransformBlacklist.java:48-53``).

Semantics: for each LEFT row, attach the most recent RIGHT row of the
same key with ``right.ts <= left.ts`` (backward as-of, inclusive).

Why union+window and not a range join: the naive formulation
(equi-join on key + ``r.ts <= l.ts`` + argmax) explodes to O(L×R) rows
per key before the argmax prunes them. The union+window plan is
O((L+R) log(L+R)) per key — one shuffle on the key, one sort, one linear
``last(..., ignorenulls=True)`` sweep; no pair blowup, no second
shuffle. At 100 TB this is the difference between a feasible plan and a
quadratic one; skewed keys ride the same AQE/salting machinery as any
keyed sort.

Determinism: ties are broken by (ts, side, event_id) — right-side rows
sort before left-side rows at equal ts (so an exactly-simultaneous right
row *is* visible to the left row), and equal-ts right rows resolve to
the highest event_id. The DuckDB oracle spells the identical window, so
the match is exact even under ties. (DuckDB's native ``ASOF JOIN`` has
unspecified tie-breaks — that's why the oracle uses the window form.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_click_attribution(events: DataFrame) -> DataFrame:
    """Attribute every purchase to the user's most recent click at or
    before the purchase (backward as-of join on user_id/ts).
    Columns: user_id, purchase_id, purchase_ts, click_id, click_ts.
    Purchases with no preceding click are dropped (inner as-of).
    """
    from pyspark.sql.window import Window as W

    u = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id", "ts", "event_id",
            (F.col("event_type") == "purchase").alias("is_p"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click_id = F.last(
        F.when(~F.col("is_p"), F.col("event_id")), ignorenulls=True
    ).over(w)
    click_ts = F.last(
        F.when(~F.col("is_p"), F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        u.select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            click_id.alias("click_id"),
            click_ts.alias("click_ts"),
            "is_p",
        )
        .filter(F.col("is_p") & F.col("click_id").isNotNull())
        .drop("is_p")
    )
