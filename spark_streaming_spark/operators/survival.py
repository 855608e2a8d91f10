"""Survival analysis: the Kaplan-Meier product-limit estimator
(Kaplan & Meier 1958, "Nonparametric estimation from incomplete
observations"; public method) over right-censored time-to-event data —
the churn/retention curve every subscription and repurchase dashboard
plots, and the canonical answer to "how long until the customer comes
back" when many customers simply haven't yet (censoring, which naive
averages get wrong).

Engine-exact WITHOUT transcendentals (the house rule — no ln/exp in a
hash-matched column): the estimator is a running PRODUCT of rationals
S_k = Π (n_i - d_i)/n_i, which has no order-independent exact sum
form, so it is pinned as a LEFT FOLD over the event-time-ordered
factor list in fixed-point parts-per-million integer arithmetic:

    s_0 = 1_000_000;   s_k = (s_{k-1} · (n_k - d_k)) DIV n_k

Every step is exact BIGINT multiply + floor-divide — bit-identical on
any engine that folds left (Spark ``aggregate``, DuckDB
``list_reduce``), with no float in sight. The ≤ 1e-6 per-step
quantization is the estimator's published precision contract, not an
engine artifact.

Scale shape: the corpus-sized work is ONE distinct + two groupBys on
the customer key (partial-agged shuffles); everything after collapses
to the per-event-time table, which is CALENDAR-BOUNDED (≤ a few
thousand distinct day gaps at ANY corpus size) — the sanctioned
driver-sized window class (same as the global-rank offsets table and
the rolling-corr daily series). The K² slice-folds run over that
bounded table only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# factor encoding for the cross-engine fold: n_risk in the high digits,
# d_events in the low — one BIGINT per event time, so DuckDB's two-arg
# list_reduce (no explicit init) folds the same list after a
# list_prepend(1_000_000). n_risk stays < 1e9 per-SUBJECT-TABLE (the
# subject table is per-customer, not per-row), documented bound.
_ENC = 1_000_000_000


def repurchase_subjects(orders: DataFrame) -> DataFrame:
    """Per-customer right-censored observation of the FIRST-REPURCHASE
    gap: t_days = days from a customer's first order day to their
    second distinct order day (event = 1), or to the corpus's last
    order day for one-time customers (event = 0, censored).

    Plan: distinct (cust, day) — one shuffle; first/second day via two
    keyed aggregates (the second is a join-filter-min, not a window, so
    both stay partial-agged); the global max day is a 1-row broadcast.
    Columns: cust, t_days (int), event (int 0/1)."""
    d1 = (orders.select(F.col("o_custkey").alias("cust"),
                        F.to_date("o_orderdate").alias("day"))
          .distinct())
    first = d1.groupBy("cust").agg(F.min("day").alias("fday"))
    second = (d1.join(first, "cust")
              .filter(F.col("day") > F.col("fday"))
              .groupBy("cust").agg(F.min("day").alias("sday")))
    mx = d1.agg(F.max("day").alias("maxday"))
    return (
        first.join(second, "cust", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "cust",
            F.when(F.col("sday").isNotNull(),
                   F.datediff("sday", "fday"))
            .otherwise(F.datediff("maxday", "fday"))
            .cast("int").alias("t_days"),
            F.when(F.col("sday").isNotNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("int").alias("event"),
        )
    )


def km_curve_from_subjects(subjects: DataFrame) -> DataFrame:
    """The product-limit curve from a (cust, t_days, event) subject
    table: one row per distinct EVENT time t_k with the risk set size
    n_k = #{T_j >= t_k} (events and censored alike), the event count
    d_k, and the ppm survival fold (module docstring).

    The per-time table is calendar-bounded, so the unpartitioned
    cumulative window and the K² slice-fold are sanctioned driver-sized
    work; the only corpus-sized op is the groupBy(t_days).
    Columns: t_days, n_risk, d_events, survival_ppm."""
    per_t = subjects.groupBy("t_days").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("event").cast("long").alias("d"),
    )
    total = per_t.agg(F.sum("c").alias("n_total"))
    w = (Window.orderBy("t_days")
         .rangeBetween(Window.unboundedPreceding, -1))
    risk = (per_t.crossJoin(F.broadcast(total))
            .select(
                "t_days", "d",
                (F.col("n_total")
                 - F.coalesce(F.sum("c").over(w), F.lit(0)))
                .cast("long").alias("n_risk"))
            .filter(F.col("d") >= 1))
    arr = risk.agg(F.array_sort(F.collect_list(F.struct(
        F.col("t_days"), F.col("n_risk"), F.col("d")))).alias("arr"))
    return (
        arr.select(F.col("arr"), F.posexplode("arr").alias("i", "x"))
        .select(
            F.col("x.t_days").alias("t_days"),
            F.col("x.n_risk").alias("n_risk"),
            F.col("x.d").alias("d_events"),
            F.expr(
                "aggregate(slice(arr, 1, i + 1), CAST(1000000 AS BIGINT),"
                " (acc, e) -> (acc * (e.n_risk - e.d)) div e.n_risk)"
            ).alias("survival_ppm"),
        )
    )


def kaplan_meier_repurchase(orders: DataFrame) -> DataFrame:
    """Kaplan-Meier curve of the customer first-repurchase gap — the
    retention headline: S(t) = P(no second order within t days |
    still observable). Columns: t_days, n_risk, d_events,
    survival_ppm."""
    return km_curve_from_subjects(repurchase_subjects(orders))


def km_sql(subjects_cte: str) -> str:
    """DuckDB twin of :func:`km_curve_from_subjects` over a
    ``subjects_cte`` producing (cust, t_days, event) — the same
    per-time risk window and the same ppm left fold, via
    list_reduce(list_prepend(1e6, slice)); factors encode
    (n_risk, d) as n·1e9 + d (module _ENC)."""
    return f"""
        WITH subj AS ({subjects_cte}),
        pert AS (
          SELECT t_days, CAST(count(*) AS BIGINT) AS c,
                 CAST(SUM(event) AS BIGINT) AS d
          FROM subj GROUP BY 1
        ),
        tot AS (SELECT SUM(c) AS n_total FROM pert),
        risk AS (
          SELECT t_days, d,
                 CAST((SELECT n_total FROM tot)
                      - COALESCE(SUM(c) OVER (ORDER BY t_days
                          RANGE BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
          FROM pert
        ),
        ev AS (SELECT t_days, n_risk, d FROM risk WHERE d >= 1),
        arr AS (
          SELECT list(t_days ORDER BY t_days) AS ts,
                 list(n_risk ORDER BY t_days) AS ns,
                 list(d ORDER BY t_days) AS ds,
                 list(n_risk * {_ENC} + d ORDER BY t_days) AS enc
          FROM ev
        )
        SELECT CAST(ts[k] AS INTEGER) AS t_days,
               CAST(ns[k] AS BIGINT) AS n_risk,
               CAST(ds[k] AS BIGINT) AS d_events,
               list_reduce(
                 list_prepend(CAST(1000000 AS BIGINT),
                              list_slice(enc, 1, k)),
                 (acc, x) -> (acc * ((x // {_ENC}) - (x % {_ENC})))
                             // (x // {_ENC})) AS survival_ppm
        FROM arr, LATERAL (
          SELECT unnest(generate_series(1, len(ts))) AS k) kk
    """


REPURCHASE_SUBJECTS_SQL = """
          SELECT f.cust, CAST(CASE WHEN s.sday IS NOT NULL
                   THEN date_diff('day', f.fday, s.sday)
                   ELSE date_diff('day', f.fday,
                                  (SELECT max(day) FROM d1)) END
                 AS INTEGER) AS t_days,
                 CASE WHEN s.sday IS NOT NULL THEN 1 ELSE 0 END AS event
          FROM (SELECT cust, min(day) AS fday FROM d1 GROUP BY 1) f
          LEFT JOIN (
            SELECT d1.cust, min(d1.day) AS sday
            FROM d1 JOIN (SELECT cust, min(day) AS fday FROM d1
                          GROUP BY 1) ff
              ON ff.cust = d1.cust AND d1.day > ff.fday
            GROUP BY 1) s ON s.cust = f.cust
"""


def kaplan_meier_repurchase_sql() -> str:
    """Full DuckDB twin of :func:`kaplan_meier_repurchase`."""
    subjects = f"""
          WITH d1 AS (
            SELECT DISTINCT o_custkey AS cust,
                   CAST(date_trunc('day', o_orderdate) AS DATE) AS day
            FROM orders
          )
          {REPURCHASE_SUBJECTS_SQL}
    """
    return km_sql(subjects)


def subjects_from_day_pairs(d1: DataFrame) -> DataFrame:
    """:func:`repurchase_subjects` from an already-built (or
    streamed-and-folded) DISTINCT (cust, day) pair table — the pair
    set is a union-semilattice (per-batch distinct pairs union to the
    one-shot set), so a streamed fold of per-batch pair counts reaches
    this exact input and the streamed twin shares the batch oracle.
    Columns: cust, t_days, event."""
    d1 = d1.select("cust", "day").distinct()
    first = d1.groupBy("cust").agg(F.min("day").alias("fday"))
    second = (d1.join(first, "cust")
              .filter(F.col("day") > F.col("fday"))
              .groupBy("cust").agg(F.min("day").alias("sday")))
    mx = d1.agg(F.max("day").alias("maxday"))
    return (
        first.join(second, "cust", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "cust",
            F.when(F.col("sday").isNotNull(),
                   F.datediff("sday", "fday"))
            .otherwise(F.datediff("maxday", "fday"))
            .cast("int").alias("t_days"),
            F.when(F.col("sday").isNotNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("int").alias("event"),
        )
    )


def order_day_pairs(orders: DataFrame) -> DataFrame:
    """Per-batch (cust, day, cnt) builder for the streamed KM fold —
    counts are additive across batches; only pair EXISTENCE feeds the
    subject table, so the folded state reaches the one-shot distinct
    pair set regardless of how orders split across micro-batches.
    Columns: cust, day, cnt."""
    return (orders.select(F.col("o_custkey").alias("cust"),
                          F.to_date("o_orderdate").alias("day"))
            .groupBy("cust", "day")
            .agg(F.count("*").cast("long").alias("cnt")))
