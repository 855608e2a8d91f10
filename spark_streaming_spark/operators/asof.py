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


def band_cooccurrence(events: DataFrame, eps_sec: int = 2) -> DataFrame:
    """Band (range) self-join WITHOUT an equality key: every pair of
    events, across ALL users, whose timestamps lie within ``eps_sec`` of
    each other — the temporal co-occurrence primitive (burst detection,
    cross-user correlation, coordinated-activity mining).

    Why not the direct spelling: a pure inequality predicate
    (``abs(a.ts - b.ts) <= eps``) gives Catalyst no equi-key, so it
    plans a BroadcastNestedLoop/Cartesian — O(n²) pairs scanned at any
    scale (the planner trap tests/test_plans.py sweeps every entry
    for). GRID BLOCKING restores an equi-key: quantize time into
    eps-wide cells; a qualifying pair is at most one cell apart, so
    joining A exploded to cells {c-1, c, c+1} against B on B's own cell
    finds every pair exactly once (B's cell is unique, so no dedup
    step), and the residual |Δts| <= eps filter runs inside the joined
    cell. The join is a plain shuffle/equi-join on the cell id — the
    standard spatial-grid decomposition, 1-D case (public technique;
    e.g. the bucketed spatial joins in GeoSpark/Sedona literature).

    Scale posture: the shuffle carries one row per (event, 3 cells) —
    linear; per-cell work is |cell_A|·|cell_B| where cell width is
    eps, so the quadratic is bounded by the event RATE within any eps
    window, not by corpus size; a rate spike is a hot cell — the same
    salting/AQE-skew machinery as any hot key applies. Arithmetic is
    exact BIGINT microseconds end to end (unix_micros ≡ DuckDB
    epoch_us); floor division for the cell id is integer-exact on both
    engines (F.floor of a positive integral divide).

    Columns: event_a, event_b (event_a < event_b by event_id),
    delta_us = micros(b) - micros(a) (signed).
    """
    eps_us = int(eps_sec) * 1_000_000
    # cell id via INTEGER division (`div`), not floor(double /): an
    # epoch-microsecond value sitting exactly on a cell boundary can
    # round a double quotient to just under the integer, mis-bucketing
    # the row 2 cells away from a partner < eps apart. us >= 0, so
    # truncating div == floor.
    base = events.select(
        "event_id", F.unix_micros("ts").alias("us"),
    ).withColumn("cell", F.expr(f"us div {eps_us}"))
    a = base.select(
        F.col("event_id").alias("event_a"), F.col("us").alias("us_a"),
        F.explode(F.array(F.col("cell") - 1, F.col("cell"),
                          F.col("cell") + 1)).alias("jcell"),
    )
    b = base.select(
        F.col("event_id").alias("event_b"), F.col("us").alias("us_b"),
        F.col("cell").alias("jcell"),
    )
    return (
        a.join(b, "jcell")
        .filter(
            (F.col("event_a") < F.col("event_b"))
            & (F.abs(F.col("us_b") - F.col("us_a")) <= eps_us)
        )
        .select(
            "event_a", "event_b",
            (F.col("us_b") - F.col("us_a")).alias("delta_us"),
        )
    )


def band_cooccurrence_stream(events: DataFrame, eps_sec: int = 2,
                             watermark: str = "4 seconds") -> DataFrame:
    """:func:`band_cooccurrence` as a STREAM-STREAM self-join: Spark
    cannot join streams without an equality key (state would be
    unbounded and unpartitionable) — the grid cell IS the key, so the
    keyless band join becomes a legal streaming plan: watermark on both
    sides + cell equality + an event-time range condition, with state
    evicted as the watermark passes each cell.

    ``watermark`` must exceed ``eps_sec``: a row's partner can be up to
    eps older, so the partner's state must survive until the watermark
    (driven by the newer row's time) passes it. State held is O(rows in
    the last watermark+eps of event time) per cell — bounded by event
    RATE, the same bound as the batch operator's per-cell quadratic.

    Inner-join append mode: each qualifying pair emits exactly once, on
    match; over an ordered bounded replay the emitted union equals the
    batch answer (shared oracle). Columns: event_a, event_b, delta_us.
    """
    eps_us = int(eps_sec) * 1_000_000
    src = events.withWatermark("ts", watermark).select(
        "event_id", "ts", F.unix_micros("ts").alias("us"),
    ).withColumn("cell", F.expr(f"us div {eps_us}"))
    a = src.select(
        F.col("event_id").alias("event_a"), F.col("ts").alias("ts_a"),
        F.col("us").alias("us_a"),
        F.explode(F.array(F.col("cell") - 1, F.col("cell"),
                          F.col("cell") + 1)).alias("jcell"),
    )
    b = src.select(
        F.col("event_id").alias("event_b"), F.col("ts").alias("ts_b"),
        F.col("us").alias("us_b"), F.col("cell").alias("jcell"),
    )
    eps_ival = F.expr(f"interval {eps_sec} seconds")
    return (
        a.join(
            b,
            (a["jcell"] == b["jcell"])
            # the event-time range bound on BOTH watermarked ts columns
            # is what lets the join evict state (coarse, second-level)
            & (F.col("ts_b") >= F.col("ts_a") - eps_ival)
            & (F.col("ts_b") <= F.col("ts_a") + eps_ival)
            & (F.col("event_a") < F.col("event_b")),
        )
        # exact microsecond band inside the coarse time bound
        .filter(F.abs(F.col("us_b") - F.col("us_a")) <= eps_us)
        .select("event_a", "event_b",
                (F.col("us_b") - F.col("us_a")).alias("delta_us"))
    )


def asof_join(left: DataFrame, right: DataFrame, key: str, ts_col: str,
              id_col: str, direction: str = "backward",
              tolerance_sec: int | None = None) -> DataFrame:
    """Generic as-of join — pandas ``merge_asof`` parity on the
    union+window plan (module docstring: O((L+R) log(L+R)) per key, one
    shuffle, no pair blowup).

    ``direction``:
      * ``backward`` — most recent right row with ``r.ts <= l.ts``
        (inclusive; equal-ts right rows resolve to the highest id);
      * ``forward`` — earliest right row with ``r.ts >= l.ts``
        (inclusive; equal-ts ties resolve to the lowest id);
      * ``nearest`` — whichever of the two is closer in time, backward
        winning exact ties (pandas' rule). Tolerance applies PER SIDE
        before the choice, also pandas' rule: a nearer-but-out-of-
        tolerance backward match loses to an in-tolerance forward one.

    ``tolerance_sec``: matches farther than this are nulled (left rows
    always survive — left-join semantics). Deltas are compared in exact
    integer microseconds (house rule: no float time math).

    ``right`` must be pre-projected to (key, ts_col, id_col, *values);
    value column names must not collide with ``left``'s. Output: every
    ``left`` column + ``asof_id``/``asof_ts`` + the right value columns.

    Plan note: both directions ride ONE Exchange on ``key`` (the two
    windows differ only in sort order → Exchange, Sort, Window, Sort,
    Window — no second shuffle), so ``nearest`` costs one extra
    partition-local sort, never a reshuffle."""
    from pyspark.sql.window import Window as W

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    rvals = [c for c in right.columns if c not in (key, ts_col, id_col)]
    # Internal working columns (ADVICE r8: these were unchecked — a left
    # column named e.g. __b_asof_ts would silently corrupt the join):
    internal = {"__ts", "__is_r", "__rid"}
    internal |= {f"{p}{d}" for p in ("__b_", "__f_")
                 for d in ("asof_ts", "asof_id", *rvals)}
    clash = (set(rvals) | {"asof_id", "asof_ts"} | internal) \
        & set(left.columns)
    if clash:
        raise ValueError(
            f"output columns collide with left columns: {sorted(clash)}")
    rclash = internal & set(rvals)
    if rclash:
        raise ValueError(
            f"right value columns use reserved names: {sorted(rclash)}")
    r = right.select(
        F.col(key),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__rid"),
        *[F.col(c) for c in rvals],
        F.lit(True).alias("__is_r"),
    )
    lf = (left.withColumn("__ts", F.col(ts_col))
          .withColumn("__is_r", F.lit(False)))
    u = lf.unionByName(r, allowMissingColumns=True)

    def pick(c):
        return F.when(F.col("__is_r"), c)

    # backward: right rows sort BEFORE left at equal ts (side 0 < 1), so
    # a simultaneous right row is inside [unbounded, current]
    side_b = F.when(F.col("__is_r"), 0).otherwise(1)
    wb = (W.partitionBy(key).orderBy("__ts", side_b, "__rid")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    # forward: right rows sort AFTER left at equal ts, so a simultaneous
    # right row is inside [current, unbounded following]
    side_f = F.when(F.col("__is_r"), 1).otherwise(0)
    wf = (W.partitionBy(key).orderBy("__ts", side_f, "__rid")
          .rowsBetween(W.currentRow, W.unboundedFollowing))

    cols = [("__ts", "asof_ts"), ("__rid", "asof_id")] + [
        (c, c) for c in rvals]
    out = u
    if direction in ("backward", "nearest"):
        for src, dst in cols:
            out = out.withColumn(
                f"__b_{dst}", F.last(pick(F.col(src)), True).over(wb))
    if direction in ("forward", "nearest"):
        for src, dst in cols:
            out = out.withColumn(
                f"__f_{dst}", F.first(pick(F.col(src)), True).over(wf))
    out = out.filter(~F.col("__is_r"))

    lus = F.unix_micros(F.col("__ts"))
    tol_us = None if tolerance_sec is None else tolerance_sec * 1_000_000

    def _gate(prefix, delta):
        """Null the side's match beyond tolerance (per side, pre-choice)."""
        if tol_us is None:
            return out
        ok = delta <= F.lit(tol_us)
        o = out
        for _, dst in cols:
            o = o.withColumn(
                f"{prefix}{dst}",
                F.when(ok, F.col(f"{prefix}{dst}")))
        return o

    if direction in ("backward", "nearest"):
        out = _gate("__b_", lus - F.unix_micros(F.col("__b_asof_ts")))
    if direction in ("forward", "nearest"):
        out = _gate("__f_", F.unix_micros(F.col("__f_asof_ts")) - lus)

    if direction == "backward":
        sel = {dst: F.col(f"__b_{dst}") for _, dst in cols}
    elif direction == "forward":
        sel = {dst: F.col(f"__f_{dst}") for _, dst in cols}
    else:
        d_b = lus - F.unix_micros(F.col("__b_asof_ts"))
        d_f = F.unix_micros(F.col("__f_asof_ts")) - lus
        use_b = F.col("__b_asof_ts").isNotNull() & (
            F.col("__f_asof_ts").isNull() | (d_b <= d_f))
        sel = {dst: F.when(use_b, F.col(f"__b_{dst}"))
               .otherwise(F.col(f"__f_{dst}")) for _, dst in cols}

    return out.select(
        *[F.col(c) for c in left.columns],
        *[sel[dst].alias(dst) for _, dst in cols],
    )
