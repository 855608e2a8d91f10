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


def scd2_from_changes(changes: DataFrame, key: str, ts_col: str,
                      tracked: list[str]) -> DataFrame:
    """SCD-type-2 HISTORY from a change log: one row per (key, version)
    with ``valid_from`` / ``valid_to`` / ``is_current`` — the versioned-
    dimension primitive (Kimball type 2) the type-1 merge above
    deliberately discards. Consecutive change rows whose ``tracked``
    attributes are all unchanged collapse into one version
    (gaps-and-islands over the per-key timeline); ``valid_to`` is the
    next version's start (NULL = current).

    Plan: ONE shuffle on ``key`` feeds both windows (lag for the
    collapse, lead for the interval close — same partitioning and
    ordering, so Catalyst reuses the sort). Window order is
    (ts, *tracked) — a total order, so the history is deterministic
    even under same-timestamp changes. At 100 TB the change log is the
    append-only fact stream; this is the compaction that turns it into
    the serving dimension. Columns: key, *tracked, valid_from,
    valid_to, is_current."""
    from pyspark.sql.window import Window

    order = [F.col(ts_col), *[F.col(c) for c in tracked]]
    w = Window.partitionBy(key).orderBy(*order)
    unchanged = None
    d = changes.select(key, ts_col, *tracked)
    for c in tracked:
        same = F.lag(c).over(w).eqNullSafe(F.col(c))
        unchanged = same if unchanged is None else (unchanged & same)
    d = (
        d.withColumn("_n", F.count("*").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("_same", unchanged)
        .filter((F.col("_n") == 1) | ~F.col("_same"))
        .drop("_n", "_same")
    )
    return d.select(
        key, *tracked,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def scd2_merge(history: DataFrame, updates: DataFrame, key: str,
               ts_col: str, tracked: list[str]) -> DataFrame:
    """Apply a batch of new change rows to an existing SCD2 history.
    Keys untouched by the batch pass through UNCHANGED (anti join —
    never re-shuffled beyond the join); affected keys are rebuilt from
    (their compressed history ∪ the new rows).

    CONTRACT — updates must be FORWARD IN TIME for their key (every
    update ts ≥ that key's latest ``valid_from``): the normal streaming
    ingest case. Under that contract merge ≡ full-log rebuild exactly
    (test-pinned). It does NOT hold for backfills that land BETWEEN two
    previously-collapsed duplicate versions: the compression dropped
    the later duplicate (A@t1, A@t2 → one version), and an insert at
    t1 < t < t2 would need A@t2 back — information only the RAW change
    log still has. Backfills therefore rebuild from the raw log
    (scd2_from_changes); this merge is the cheap forward path.

    At scale the delta is small: ``updates`` broadcasts into both the
    semi and anti joins, so the big history shuffles only the affected
    sliver for the window rebuild. Output schema = scd2_from_changes."""
    upd_keys = updates.select(key).distinct()
    untouched = history.join(F.broadcast(upd_keys), key, "left_anti")
    affected_log = (
        history.join(F.broadcast(upd_keys), key, "left_semi")
        .select(key, F.col("valid_from").alias(ts_col), *tracked)
        .unionByName(updates.select(key, ts_col, *tracked))
    )
    rebuilt = scd2_from_changes(affected_log, key, ts_col, tracked)
    return untouched.unionByName(rebuilt)


def temporal_join(facts: DataFrame, history: DataFrame, key: str,
                  ts_col: str, how: str = "inner") -> DataFrame:
    """AS-OF-TIME dimension lookup (``FOR SYSTEM_TIME AS OF`` over an
    SCD2 history): each fact row joins the dimension VERSION that was
    valid at its event time — equi join on the business key with the
    interval-containment residual ``valid_from ≤ ts < valid_to``
    (NULL valid_to = current, open-ended).

    Plan note: unlike the keyless containment lookup
    (operators/rangejoin.interval_join, which needs grid blocking),
    this join HAS an equi key — Catalyst hash-joins on ``key`` and
    evaluates the interval predicate as a residual filter on the
    matched pairs, so there is no nested-loop anywhere and each side
    shuffles once on the natural key (or the history broadcasts when
    small). Each fact matches at most one version: versions of a key
    partition its timeline. Output: fact columns + the version's
    attributes + valid_from (the version identifier)."""
    h = history.select(
        F.col(key).alias("__hk"),
        *[c for c in history.columns
          if c not in (key, "valid_to", "is_current")],
        F.col("valid_to").alias("__vt"),
    )
    joined = facts.join(
        h,
        (facts[key] == h["__hk"])
        & (facts[ts_col] >= h["valid_from"])
        & (h["__vt"].isNull() | (facts[ts_col] < h["__vt"])),
        how,
    )
    return joined.drop("__hk", "__vt")


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  compare_cols: list[str]) -> DataFrame:
    """Change-data-capture derivation: diff two keyed snapshots into a
    change feed — the inverse of the SCD sinks above (they fold changes
    INTO state; this recovers the changes BETWEEN two states, the
    standard backfill path when a source system exposes only snapshots).

    op per key: ``I`` (only in new), ``D`` (only in old), ``U`` (in
    both, any compared column differs — NULL-safe). Unchanged keys are
    dropped. Output: key, op, old_<c>/new_<c> per compared column.

    Scale shape: one full-outer hash join on the natural key — each
    snapshot shuffles once; with bucketed snapshot layouts the join
    co-locates and the diff is shuffle-free. The change test is a
    map-side expression (no second pass)."""
    o = old.select(F.col(key).alias("__ok"),
                   *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(F.col(key).alias("__nk"),
                   *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    j = o.join(n, F.col("__ok") == F.col("__nk"), "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (
        F.when(F.col("__ok").isNull(), F.lit("I"))
        .when(F.col("__nk").isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return (
        j.filter(F.col("__ok").isNull() | F.col("__nk").isNull() | changed)
        .select(
            F.coalesce(F.col("__ok"), F.col("__nk")).alias(key),
            op.alias("op"),
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
