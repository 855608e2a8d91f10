"""Stream-static blacklist join family.

Reference pipeline 6 (``TransformBlacklist.java:48-73``): per-batch
``leftOuterJoin`` against a driver-built blacklist, then a hand-written
filter keeping rows whose match is absent-or-false, then a projection —
i.e. a composed LEFT ANTI join, 26 lines of RDD code.

Ours: one declarative join each way. The blacklist side is tiny (derived
from ``customer``), so we ``broadcast()`` it — at 100 TB the fact side
never shuffles for this join; each task filters locally against the
broadcast hash table. That is the single most important scale property of
this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_blacklist(customer: DataFrame, modulo: int = 50) -> DataFrame:
    """Deterministic small dim: every customer whose key % modulo == 0 is
    flagged. Mirrors the reference's hardcoded ``("tom", true)`` seed
    (``TransformBlacklist.java:30-32``) at testable scale."""
    return customer.select(
        F.col("c_custkey").alias("user_id"),
        (F.col("c_custkey") % modulo == 0).alias("flag"),
    ).filter(F.col("c_custkey") % 10 == 0)


def blacklist_left_outer(events: DataFrame, blacklist: DataFrame) -> DataFrame:
    """The reference's literal shape: left-outer join, keep the flag.
    Columns: event_id, user_id, event_type, flag."""
    return (
        events.join(F.broadcast(blacklist), "user_id", "left_outer")
        .select("event_id", "user_id", "event_type", "flag")
    )


def blacklist_filter(events: DataFrame, blacklist: DataFrame) -> DataFrame:
    """The reference's *intent* (join → filter absent-or-false → project),
    expressed as a single LEFT ANTI join against flagged users.
    Columns: event_id, user_id, event_type."""
    flagged = blacklist.filter(F.col("flag")).select("user_id")
    return events.join(F.broadcast(flagged), "user_id", "left_anti").select(
        "event_id", "user_id", "event_type"
    )
