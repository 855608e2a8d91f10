"""Keyed upsert / SCD-type-1 merge — the table-maintenance primitive a
warehouse runs on every dimension refresh (MERGE INTO in engines with
ACID tables; the reference's closest surface is the per-row INSERT
... ON DUPLICATE KEY pattern of its JDBC sink, ``/root/reference/src/
main/java/com/soto/PersistWordCount.java:73-100`` — row-at-a-time,
driver-adjacent; ours is one distributed join).

Spark-first shape: a FULL OUTER join on the business key with
column-wise ``coalesce(updates, base)`` — updates win where both exist,
base rows survive untouched, pure inserts append. One shuffle per side
on the natural key; with bucketed/partitioned layouts the join
co-locates and the merge is shuffle-free. (On lakehouse tables this
compiles to MERGE INTO; the relational algebra is identical.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd1_merge(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Upsert ``updates`` into ``base`` on ``key`` (schemas must match).
    Update rows replace base rows wholesale (type-1: no history); new
    keys insert. Output schema = input schema."""
    if base.columns != updates.columns:
        raise ValueError(
            f"scd1_merge requires identical schemas: "
            f"{base.columns} vs {updates.columns}"
        )
    b, u = base.alias("b"), updates.alias("u")
    merged = b.join(u, F.col(f"b.{key}") == F.col(f"u.{key}"), "full_outer")
    return merged.select(*[
        F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
        for c in base.columns
    ])
