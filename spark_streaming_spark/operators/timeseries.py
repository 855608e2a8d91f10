"""Time-series similarity search over event streams (north-star
extension; pattern from the retrieved literature on distributed
time-series similarity for streaming systems — PAPERS.md, EDBT 2019).
The reference aggregates streams but has no notion of comparing entities
BY their temporal behavior.

Pipeline: per-entity activity profile (24-dim hour-of-day count vector,
built with ONE conditional aggregation — no pivot, no UDF) → blocking on
the profile's dominant hour (an argmax-banded LSH: near-identical
profiles share their peak) → in-bucket cosine with the engine's
decimal-exact dot contract.

Scale notes: the profile build is a single groupBy("user_id") — one
shuffle over the events table, output is one fixed-width row per entity.
Blocking reduces the pair join from all-pairs O(U²) to Σ_b |b|² over 24
buckets; at larger scale widen the block key (top-2 hours, or sign-LSH
over the mean-centered profile) — same plan shape. The cosine reuses
hoisted per-vector norms (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HOURS = 24


def _int_dot(a: str, b: str):
    """Exact BIGINT dot product for integer-valued profile vectors.
    Hour-count profiles are whole numbers, so the full decimal-quantize
    contract (functions/vectors.py) is overkill — long multiply-add is
    exact, codegen-friendly (an order of magnitude cheaper to compile
    and run than the decimal HOF chain), and engine-identical."""
    return F.expr(
        f"cast(aggregate(zip_with({a}, {b},"
        f" (x, y) -> cast(x as bigint) * cast(y as bigint)),"
        f" cast(0 as bigint), (acc, v) -> acc + v) as double)"
    )


def user_hourly_profiles(events: DataFrame) -> DataFrame:
    """24-dim hour-of-day activity vector per user, one aggregation.
    Columns: user_id, profile (array<double>), peak_hour (first argmax —
    the blocking key)."""
    hour = F.hour("ts")
    counts = [
        F.count(F.when(hour == h, F.lit(1))).alias(f"h{h}")
        for h in range(N_HOURS)
    ]
    prof = events.groupBy("user_id").agg(*counts)
    arr = F.array(*[F.col(f"h{h}").cast("double") for h in range(N_HOURS)])
    return prof.select(
        "user_id",
        arr.alias("profile"),
        # 1-based first index of the max count — deterministic tie-break
        F.array_position(arr, F.array_max(arr)).cast("int").alias("peak_hour"),
    )


def similar_activity_pairs(events: DataFrame,
                           threshold: float = 0.9) -> DataFrame:
    """User pairs with cosine-similar hour-of-day activity, blocked on
    the TOP-2 hours (peak, second peak). One blocking hour leaves
    Σ_b |b|² over 24 buckets — quadratic blow-up the moment users grow
    100×; requiring both top hours to agree cuts candidates ~12× per
    added key while keeping near-identical profiles together (cosine ≥
     0.9 on 24-dim count vectors all but forces the same argmax pair).
    Norms are hoisted per user (not per pair); the dot is exact BIGINT.
    Columns: user_a, user_b, cosine (user_a < user_b)."""
    prof = (
        user_hourly_profiles(events)
        # second argmax: re-argmax with the peak position masked out;
        # first-index tie-break keeps it deterministic on both engines
        .withColumn(
            "arr2",
            F.expr(
                "transform(profile,"
                " (x, i) -> if(i + 1 = peak_hour, cast(-1 as double), x))"
            ),
        )
        .withColumn(
            "peak2_hour",
            F.array_position(F.col("arr2"), F.array_max("arr2")).cast("int"),
        )
        .select(
            "user_id", "profile", "peak_hour", "peak2_hour",
            F.sqrt(_int_dot("profile", "profile")).alias("nrm"),
        )
    )
    a = prof.alias("a")
    b = prof.alias("b")
    return (
        a.join(b, (F.col("a.peak_hour") == F.col("b.peak_hour"))
               & (F.col("a.peak2_hour") == F.col("b.peak2_hour"))
               & (F.col("a.user_id") < F.col("b.user_id")))
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            (
                _int_dot("a.profile", "b.profile")
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def gap_fill_daily(events: DataFrame) -> DataFrame:
    """Gap-filled per-user daily activity: every day in each user's
    [first_active, last_active] span materializes a row — absent days
    carry ``n_events = 0`` and the last seen event_type forward-fills
    (the time-bucket gap-fill + LOCF interpolation a continuous
    aggregate serves; TimescaleDB's ``time_bucket_gapfill``/``locf``
    shape expressed as sequence-explode + IGNORE NULLS window).

    Deterministic: the day's representative event_type is the latest by
    total (ts, event_id) order.

    Scale shape: one groupBy shuffle builds the daily table; the grid
    is a map-side ``explode(sequence(...))`` over the per-user span row
    (bounded by days-per-user, NOT corpus size); the fill join is keyed
    on (user, day) and the LOCF window re-uses the same user
    partitioning — no unkeyed operation anywhere.

    Columns: user_id, day, n_events, carried_type."""
    from pyspark.sql.window import Window

    with_day = events.withColumn("day", F.to_date("ts"))
    wd = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    daily = (
        with_day
        .withColumn("rn", F.row_number().over(wd))
        .withColumn("n_events",
                    F.count("*").over(Window.partitionBy("user_id", "day")))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "n_events",
                F.col("event_type").alias("day_type"))
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.expr(
            "sequence(d0, d1, interval 1 day)")).alias("day"))
    )
    locf = (Window.partitionBy("user_id").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id", "day",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last("day_type", ignorenulls=True).over(locf)
            .alias("carried_type"),
        )
    )


def rolling_activity(events: DataFrame, days: int = 7) -> DataFrame:
    """Rolling ``days``-day activity over the gap-filled daily series:
    because gap_fill_daily materializes a DENSE grid, the day-based
    rolling window is a plain ROWS frame (no range lookup), and the
    window re-uses the user partitioning the fill already shuffled on.

    Integer-exact: rolling_sum is a BIGINT sum; the mean is reported as
    ``avg_ppm = 1e6 · sum DIV window_rows`` so no float crosses the
    engine boundary. window_rows < ``days`` at the span head (growing
    frame), matching SQL window-frame semantics in both engines.

    Columns: user_id, day, n_events, rolling_sum, window_rows, avg_ppm.
    """
    from pyspark.sql.window import Window

    w = (Window.partitionBy("user_id").orderBy("day")
         .rowsBetween(-(days - 1), Window.currentRow))
    return (
        gap_fill_daily(events)
        .select(
            "user_id", "day", "n_events",
            F.sum("n_events").over(w).alias("rolling_sum"),
            F.count("*").over(w).alias("window_rows"),
        )
        .withColumn(
            "avg_ppm",
            F.expr("CAST((1000000 * rolling_sum) DIV window_rows"
                   " AS BIGINT)"),
        )
    )


def activity_trend(events: DataFrame) -> DataFrame:
    """Per-user OLS activity trend: slope of daily event count vs day
    index over the gap-filled dense series — group-wise linear
    regression as ONE aggregation of exact integer sums (n, Σx, Σy,
    Σxy, Σx²), the classic map-side-combinable normal-equations shape
    (no per-group iteration, no ML library).

    x is the 0-based day index within the user's span (small int), y
    the day's count — so every sum is BIGINT-exact and the slope's
    numerator/denominator are exact integers; only the final division
    is floating (then 7 dp-quantized, the house contract). Users with a
    single-day span (den = 0) are excluded.

    Scale shape: gap-fill's user shuffle is reused by both the index
    window and the aggregation (same partitioning → one exchange); the
    regression itself adds no shuffle beyond the final tiny per-user
    aggregate. Columns: user_id, n_days, avg_ppm, slope."""
    from pyspark.sql.window import Window

    daily = gap_fill_daily(events)
    w = Window.partitionBy("user_id")
    d = daily.select(
        "user_id",
        F.datediff("day", F.min("day").over(w)).cast("long").alias("x"),
        F.col("n_events").alias("y"))
    agg = d.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        agg.filter(den != 0)
        .select(
            "user_id", F.col("n").alias("n_days"),
            F.expr("CAST((1000000 * sy) DIV n AS BIGINT)").alias("avg_ppm"),
            F.round(num.cast("double") / den.cast("double"), 7)
            .alias("slope"),
        )
    )


def time_weighted_avg(events: DataFrame) -> DataFrame:
    """Per-user LOCF time-weighted mean of ``value`` — the hypertable
    rollup TimescaleDB ships as ``time_weight('LOCF', ts, value)``
    (public semantics): each observation holds until the next one, so
    the mean weights every value by how long it was current,
    Σ valueᵢ·(tᵢ₊₁−tᵢ) / (t_n−t_1). The right average for sampled
    gauges with irregular arrival (sensor readings, account balances),
    where the plain AVG over-weights busy periods.

    Engine-exact: timestamps as BIGINT microseconds (unix_micros ≡
    DuckDB epoch_us); each value·duration product is ONE IEEE multiply
    quantized to DECIMAL(38,7) before the order-independent exact sum
    (functions/numeric.py discipline); one final divide, 7 dp. Ties in
    ts break on event_id so lead() is a total order; the last event's
    null lead drops out of the sum on both engines. Users with a zero
    span (single event) are excluded.

    Scale shape: ONE shuffle on user_id shared by the lead() window and
    the aggregation (same partitioning); the window frame is a 1-row
    lookahead, no unbounded state. Columns: user_id, n_events, span_us,
    twa_value."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = events.select("user_id", "event_id",
                      F.unix_micros("ts").alias("us"), "value")
    t = d.withColumn("dur", F.lead("us").over(w) - F.col("us"))
    agg = t.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("span_us"),
        F.sum((F.col("value") * F.col("dur")).cast("decimal(38,7)"))
        .alias("s"),
    )
    return agg.filter("span_us > 0").select(
        "user_id", "n_events", "span_us",
        F.round(F.col("s").cast("double") / F.col("span_us"), 7)
        .alias("twa_value"),
    )


def dau_mau_stickiness(events: DataFrame, window_days: int = 28) -> DataFrame:
    """DAU / trailing-MAU stickiness per day — the growth metric every
    product dashboard tracks (what fraction of the monthly audience
    shows up on a given day). Exact distinct counts; the trailing
    28-day membership is the broadcast interval join
    (operators/rangejoin.interval_join): the day GRID is the tiny range
    side ([d-27, d] per day — O(days) rows, broadcastable forever),
    user-day points are the fact side, so the fact table never
    shuffles for the window — then one (day, user) distinct + count.
    stickiness_ppm = 10⁶·dau // mau, integer.
    Columns: day (DATE), dau, mau, stickiness_ppm."""
    from spark_streaming_spark.operators.rangejoin import interval_join

    day_int = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    user_days = (
        events.select(day_int.alias("uday"), "user_id").distinct()
    )
    dau = user_days.groupBy(F.col("uday").alias("rday")).agg(
        F.count("*").alias("dau"))
    grid = (
        user_days.select("uday").distinct()
        .select(F.col("uday").alias("rday"),
                (F.col("uday") - (window_days - 1)).cast("double")
                .alias("glo"),
                (F.col("uday") + 1).cast("double").alias("ghi"))
    )
    # interval_join is [lo, hi): ghi = day+1 makes the window inclusive
    mau = (
        interval_join(
            user_days.withColumn("upt", F.col("uday").cast("double")),
            grid, "upt", "glo", "ghi", grid=float(window_days + 4))
        .select("rday", "user_id").distinct()
        .groupBy("rday").agg(F.count("*").alias("mau"))
    )
    return (
        dau.join(mau, "rday")
        .select(
            F.date_add(F.lit("1970-01-01"), F.col("rday").cast("int"))
            .alias("day"),
            "dau", "mau",
            F.expr("CAST(dau * 1000000 DIV mau AS BIGINT)")
            .alias("stickiness_ppm"),
        )
    )


def rolling_daily_corr(events: DataFrame,
                       window_days: int = 30) -> DataFrame:
    """Rolling Pearson correlation between the two headline DAILY
    series — revenue proxy (Σ cents of ``value``) and traffic (event
    count) — over a trailing ``window_days`` calendar window: the
    does-revenue-still-track-traffic drift monitor on every ops
    dashboard, engine-exact.

    Exactness is the corr_matrix discipline windowed: the daily x
    (cents, BIGINT) and y (count) are exact integers; every windowed
    Σx, Σy, Σxy, Σx², Σy² accumulates as exact BIGINT/DECIMAL(38,0);
    the correlation is the frozen IEEE formula over doubles of those
    exact sums — bit-identical on any engine. Windows with zero
    variance on either side emit NULL.

    Scale shape: the corpus collapses to the DAILY table first (one
    partial-agged groupBy — the only corpus-sized operation); the
    rolling frame runs RANGE-based on the day number over that daily
    series, which is bounded by the calendar (≤ a few thousand rows at
    ANY corpus size) — the sanctioned driver-sized window, same class
    as the global-rank offsets table. Columns: day, n_days, corr."""
    return rolling_corr_from_daily(daily_value_series(events),
                                   window_days)


def daily_value_series(events: DataFrame) -> DataFrame:
    """The daily (day, x=cents, y=count) series under the rolling-corr
    monitor — EXACTLY ADDITIVE under event partition (the per-row
    DECIMAL(38,2) quantization is batch-independent, so per-micro-batch
    series sum cell-wise to the one-shot series: what counts_fold_sink
    folds for the streamed twin)."""
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        # the proven revenue idiom: per-value DECIMAL(38,2) cast (exact
        # in both engines), summed exactly, then scaled to integer cents
        F.expr("CAST(SUM(CAST(value AS DECIMAL(38,2))) * 100 AS BIGINT)")
        .alias("x"),
        F.count("*").cast("long").alias("y"),
    )


def rolling_corr_from_daily(daily: DataFrame,
                            window_days: int = 30) -> DataFrame:
    """:func:`rolling_daily_corr`'s window + frozen-IEEE tail, starting
    from an already-built (or streamed-and-folded) daily series."""
    from pyspark.sql.window import Window

    dnum = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (Window.orderBy(dnum)
         .rangeBetween(-(window_days - 1), Window.currentRow))
    r = daily.select(
        "day",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.expr("CAST(x * y AS DECIMAL(38,0))")).over(w).alias("sxy"),
        F.sum(F.expr("CAST(x * x AS DECIMAL(38,0))")).over(w).alias("sxx"),
        F.sum(F.expr("CAST(y * y AS DECIMAL(38,0))")).over(w).alias("syy"),
    )

    def d(name):
        return F.col(name).cast("double")

    num = d("n") * d("sxy") - d("sx") * d("sy")
    vx = d("n") * d("sxx") - d("sx") * d("sx")
    vy = d("n") * d("syy") - d("sy") * d("sy")
    den = F.sqrt(vx) * F.sqrt(vy)
    return r.select(
        "day",
        F.col("n").alias("n_days"),
        F.when(den != F.lit(0.0), num / den).alias("corr"),
    )


def daily_value_acf(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Autocorrelation function of the daily revenue series at lags
    1..``max_lag`` — the seasonality probe (a weekly cycle shows as a
    lag-7 spike) run before any forecasting model is trusted; public
    method (Box & Jenkins sample cross-correlation, here the Pearson
    variant over the lagged pairs, which keeps the corr_matrix
    exactness discipline instead of the global-mean estimator's
    shared-mean coupling).

    Exactness: the daily x (cents) is exact BIGINT
    (:func:`daily_value_series`); per-lag Σx, Σy, Σxy, Σx², Σy² are
    exact DECIMAL(38,0) sums over the pair set; the correlation is the
    frozen IEEE tail shared with :func:`rolling_corr_from_daily`.

    Scale shape: the corpus collapses to the daily table first (the
    one corpus-sized shuffle); the lag explode × self-join runs on the
    CALENDAR-BOUNDED daily series (≤ a few thousand rows at any corpus
    size — the sanctioned driver-sized window class).
    Columns: lag, n_pairs, acf."""
    return acf_from_daily(daily_value_series(events), max_lag)


def acf_from_daily(daily: DataFrame, max_lag: int = 7) -> DataFrame:
    """:func:`daily_value_acf`'s lag-pair tail, starting from an
    already-built (or streamed-and-folded) daily series — the daily
    (day, x) table is exactly additive under event partition, so the
    per-micro-batch fold reaches the one-shot series and the streamed
    twin shares the batch oracle verbatim."""
    daily = daily.select(
        F.datediff(F.col("day"), F.lit("1970-01-01")).alias("t"), "x")
    lagged = daily.select(
        "t", F.col("x").alias("xa"),
        F.explode(F.array(*[F.lit(l) for l in range(1, max_lag + 1)]))
        .alias("lag"))
    pairs = lagged.join(
        daily.select(F.col("t").alias("tb"), F.col("x").alias("xb")),
        F.col("tb") == F.col("t") - F.col("lag"))
    r = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xa").alias("sx"),
        F.sum("xb").alias("sy"),
        F.sum(F.expr("CAST(xa * xb AS DECIMAL(38,0))")).alias("sxy"),
        F.sum(F.expr("CAST(xa * xa AS DECIMAL(38,0))")).alias("sxx"),
        F.sum(F.expr("CAST(xb * xb AS DECIMAL(38,0))")).alias("syy"),
    )

    def d(name):
        return F.col(name).cast("double")

    num = d("n") * d("sxy") - d("sx") * d("sy")
    vx = d("n") * d("sxx") - d("sx") * d("sx")
    vy = d("n") * d("syy") - d("sy") * d("sy")
    den = F.sqrt(vx) * F.sqrt(vy)
    return r.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.when(den != F.lit(0.0), num / den).alias("acf"),
    )


DAILY_VALUE_ACF_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) * 100
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    dd AS (SELECT date_diff('day', DATE '1970-01-01', day) AS t, x
           FROM daily),
    pairs AS (
      SELECT l.lag, a.x AS xa, b.x AS xb
      FROM dd a
      JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l ON TRUE
      JOIN dd b ON b.t = a.t - l.lag
    ),
    r AS (
      SELECT CAST(lag AS INTEGER) AS lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(xa) AS HUGEINT) AS sx,
             CAST(SUM(xb) AS HUGEINT) AS sy,
             SUM(CAST(xa * xb AS HUGEINT)) AS sxy,
             SUM(CAST(xa * xa AS HUGEINT)) AS sxx,
             SUM(CAST(xb * xb AS HUGEINT)) AS syy
      FROM pairs GROUP BY 1
    )
    SELECT lag, n AS n_pairs,
      CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <> 0
        THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      END AS acf
    FROM r
"""


def user_value_ewma(events: DataFrame, window: int = 16) -> DataFrame:
    """Per-user exponentially-weighted engagement score — the EWMA
    (α = 1/2, adjust-normalized: y = Σ w_k·x_k / Σ w_k, w_k = 2⁻ᵏ over
    recency rank k) of event values, EXACT: the value quantizes to
    integer cents, the weights are powers of two over a BOUNDED
    ``window`` of each user's most recent events, so numerator and
    denominator are plain BIGINTs and the score is an integer DIV —
    bit-identical across engines, no float recursion. The "recent
    activity beats stale activity" user feature every churn/engagement
    model starts from; the bounded window is what makes exactness (and
    state-boundedness, were it folded) possible — weights below 2⁻¹⁶
    are beneath cent resolution anyway.

    Scale shape: one partitioned row_number window (per-user, never
    global), rank filter keeps ≤ ``window`` rows/user, one partial-
    agged groupBy. Columns: user_id, n_used, ewma_microcents
    (= 1e6 · weighted-avg cents).

    Precondition: value ≥ 0 (the events contract) — with a negative
    numerator Spark's DIV (truncate toward zero) and DuckDB's //
    (floor) would disagree by one."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    recent = (
        events.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= window)
        .select(
            "user_id",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
            F.expr(f"SHIFTLEFT(CAST(1 AS BIGINT), {window} - rk)")
            .alias("wt"),
        )
    )
    return (
        recent.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_used"),
             F.sum(F.expr("cents * wt")).alias("num"),
             F.sum("wt").alias("den"))
        .select(
            "user_id", "n_used",
            F.expr("CAST((1000000 * num) DIV den AS BIGINT)")
            .alias("ewma_microcents"),
        )
    )


def burst_days(events: DataFrame, factor: int = 3,
               trail_days: int = 7) -> DataFrame:
    """Burst detection on the per-(type, day) event series — flag days
    whose count exceeds ``factor``× the trailing ``trail_days``-day
    MEAN (the ops/trend-surfacing gate: traffic spikes, error storms,
    crawler bursts). Integer-exact: the compare is
    trail_days·n > factor·Σ_trailing (no float mean), days with an
    EMPTY trailing window never flag (cold starts aren't bursts).
    Columns: event_type, day, n, prev_total.

    Scale shape: one partial-agged (type, day) groupBy collapses the
    corpus to the daily table; the trailing window is a RANGE frame
    over integer day numbers PARTITIONED BY type (never global,
    calendar-bounded rows per partition)."""
    from pyspark.sql import Window

    daily = (
        events.groupBy("event_type",
                       F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("dnum", F.datediff("day", F.lit("1970-01-01")))
    )
    w = (Window.partitionBy("event_type").orderBy("dnum")
         .rangeBetween(-trail_days, -1))
    return (
        daily.withColumn("prev_total",
                         F.coalesce(F.sum("n").over(w), F.lit(0))
                         .cast("long"))
        .filter((F.col("prev_total") > 0)
                & (F.lit(trail_days) * F.col("n")
                   > F.lit(factor) * F.col("prev_total")))
        .select("event_type", "day", "n", "prev_total")
    )


def cusum_days(events: DataFrame, event_type: str = "error") -> DataFrame:
    """CUSUM change detection (Page 1954; public method) on the daily
    count series of one event type — the classic "did the error rate
    shift up" monitor. Spelled in CLOSED FORM so it's one windowed
    pass instead of a recursion: S_t = max(0, S_{t-1} + x_t − k)
    ≡ P_t − min_{j≤t} P_j with P_t = Σ_{i≤t}(x_i − k) — a cumulative
    sum plus a running min, both exact integers. The allowance k is
    the CEILING of the series mean (integer DIV), so an in-control
    series drifts down and only a sustained shift accumulates.
    Absent days count 0 (gap-filled spine — silence is signal for a
    rate monitor). Columns: day, n, cusum.

    Scale shape: one filtered partial-agged daily groupBy collapses
    the stream to the calendar-bounded day table; spine, k, and both
    windows live on that tiny series (the rolling_daily_corr
    sanctioned-window rationale)."""
    from pyspark.sql import Window

    d = (events.filter(F.col("event_type") == event_type)
         .groupBy(F.to_date("ts").alias("day"))
         .agg(F.count("*").cast("long").alias("n")))
    spine = (d.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
             .select(F.explode(F.expr(
                 "sequence(d0, d1, interval 1 day)")).alias("day")))
    g = (spine.join(d, "day", "left")
         .select("day", F.coalesce("n", F.lit(0)).cast("long").alias("n")))
    w = Window.partitionBy()
    g = g.withColumn(
        "k", F.expr("(SUM(n) OVER () + COUNT(*) OVER () - 1)"
                    " DIV COUNT(*) OVER ()"))
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    g = g.withColumn("pfx", F.sum(F.col("n") - F.col("k")).over(wc))
    # The identity's min ranges over 0 <= j <= t, and P_0 = 0 (empty
    # prefix) — so the subtrahend is min(0, min_{1<=j<=t} P_j). Without
    # the virtual zero, a series whose every prefix sum is positive
    # (starts above k) would understate S_t and miss an early shift.
    return g.select(
        "day", "n",
        (F.col("pfx") - F.least(F.lit(0), F.min("pfx").over(wc)))
        .cast("long").alias("cusum"))


def spearman_daily(events: DataFrame) -> DataFrame:
    """Spearman rank correlation between the daily revenue and traffic
    series — the monotone-association twin of the Pearson monitor
    (rolling_daily_corr): robust to the heavy-tailed revenue days that
    drag a Pearson estimate around; public method (Spearman 1904,
    average-rank tie handling per standard references).

    Engine-exact: ranks carry NO floats — the DOUBLED average rank of a
    tie block is 2·cnt_lt + cnt_eq + 1 (exact integers via two window
    aggregates over the CALENDAR-BOUNDED daily table — the sanctioned
    driver-sized window class); Spearman's ρ is then Pearson over the
    doubled ranks: exact DECIMAL(38,0) moments, frozen IEEE tail (the
    corr_matrix discipline — doubling both ranks cancels in ρ).
    Columns: n_days, rho."""
    return spearman_from_daily(daily_value_series(events))


def spearman_from_daily(daily: DataFrame) -> DataFrame:
    """:func:`spearman_daily`'s rank + Pearson tail from an
    already-built (or streamed-and-folded) daily series — same
    additive-fold sharing as acf_from_daily / rolling_corr_from_daily,
    so the streamed twin reads the rolling-corr fold state."""

    def r2(col):
        lt = (Window.orderBy(col)
              .rangeBetween(Window.unboundedPreceding, -1))
        eq = Window.partitionBy(col)
        return (F.lit(2) * F.coalesce(F.count(F.lit(1)).over(lt),
                                      F.lit(0))
                + F.count(F.lit(1)).over(eq) + F.lit(1)).cast("long")

    from pyspark.sql.window import Window

    ranked = daily.select(r2(F.col("x")).alias("rx"),
                          r2(F.col("y")).alias("ry"))
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").alias("sx"), F.sum("ry").alias("sy"),
        F.sum(F.expr("CAST(rx AS DECIMAL(38,0)) * ry")).alias("sxy"),
        F.sum(F.expr("CAST(rx AS DECIMAL(38,0)) * rx")).alias("sxx"),
        F.sum(F.expr("CAST(ry AS DECIMAL(38,0)) * ry")).alias("syy"),
    )

    def d(name):
        return F.col(name).cast("double")

    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = (F.sqrt(d("n") * d("sxx") - d("sx") * d("sx"))
           * F.sqrt(d("n") * d("syy") - d("sy") * d("sy")))
    return m.select(
        F.col("n").alias("n_days"),
        F.when(den != F.lit(0.0), num / den).alias("rho"),
    )


SPEARMAN_DAILY_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) * 100
                  AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT CAST(2 * COALESCE(count(*) OVER (ORDER BY x
                     RANGE BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0)
                  + count(*) OVER (PARTITION BY x) + 1 AS BIGINT) AS rx,
             CAST(2 * COALESCE(count(*) OVER (ORDER BY y
                     RANGE BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0)
                  + count(*) OVER (PARTITION BY y) + 1 AS BIGINT) AS ry
      FROM daily
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(rx) AS HUGEINT) AS sx,
             CAST(SUM(ry) AS HUGEINT) AS sy,
             SUM(CAST(rx AS HUGEINT) * ry) AS sxy,
             SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
             SUM(CAST(ry AS HUGEINT) * ry) AS syy
      FROM ranked
    )
    SELECT n AS n_days,
      CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <> 0
        THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      END AS rho
    FROM m
"""


def theil_sen_daily(events: DataFrame) -> DataFrame:
    """Theil-Sen robust trend of the daily revenue series — the median
    of all pairwise slopes (Theil 1950 / Sen 1968; public method): the
    trend estimate OLS can't have dragged around by a few whale days,
    the robust complement to regress.ols_price_model.

    Engine-exact selection: each pair's slope is the RATIONAL
    (dy, dx) = (cents_2 − cents_1, t_2 − t_1), dx > 0; pairs order by
    the IEEE double dy/dx (one correctly-rounded divide — deterministic
    cross-engine) with (dy, dx) tie-breaks, and the LOWER MEDIAN row
    (rn = (n+1) DIV 2) is reported with its exact rational — no
    floor-divide of a possibly-negative quantity ever happens (Spark's
    ``div`` truncates while DuckDB's ``//`` floors, so negative integer
    division is banned from the contract).

    Scale shape: the corpus collapses to the daily table first; the K²
    pair build and the rank run on the CALENDAR-BOUNDED series (the
    sanctioned driver-sized window class).
    Columns: n_pairs, dy, dx, slope_per_day."""
    from pyspark.sql.window import Window

    return theil_sen_from_daily(daily_value_series(events))


def theil_sen_from_daily(daily: DataFrame) -> DataFrame:
    """:func:`theil_sen_daily`'s pair-median tail from an already-built
    (or streamed-and-folded) daily series — the same additive-fold
    sharing as the Pearson/ACF/Spearman monitors.

    The pair rank runs through ``ranking.with_global_rank`` (two-phase
    range-partitioned global row_number), never an unpartitioned
    ``Window.orderBy``: K is calendar-bounded but K² compounds — a
    10-year corpus is ~13M pair rows, too many for one task (r11
    verdict item 4). The median row is then one rank-equality filter
    against the 1-row broadcast count."""
    from spark_streaming_spark.operators.ranking import with_global_rank

    daily = daily.select(
        F.datediff(F.col("day"), F.lit("1970-01-01")).alias("t"), "x")
    a = daily.select(F.col("t").alias("t1"), F.col("x").alias("x1"))
    b = daily.select(F.col("t").alias("t2"), F.col("x").alias("x2"))
    pairs = (a.crossJoin(b).filter(F.col("t2") > F.col("t1"))
             .select((F.col("x2") - F.col("x1")).alias("dy"),
                     (F.col("t2") - F.col("t1")).cast("long").alias("dx"))
             .withColumn("slope", F.col("dy").cast("double")
                         / F.col("dx").cast("double")))
    # n_pairs is exactly K·(K−1)/2 of the K-row daily table — counting
    # the tiny input instead of the K² pair table avoids a second full
    # evaluation of the cross-join subtree
    total = daily.agg(F.expr(
        "CAST(count(*) * (count(*) - 1) div 2 AS BIGINT)").alias("n"))
    ranked = with_global_rank(pairs, ["slope", "dy", "dx"], "rn")
    return (ranked.crossJoin(F.broadcast(total))
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select(F.col("n").alias("n_pairs"), "dy", "dx",
                    F.col("slope").alias("slope_per_day")))


THEIL_SEN_DAILY_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) * 100
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    dd AS (SELECT date_diff('day', DATE '1970-01-01', day) AS t, x
           FROM daily),
    pairs AS (
      SELECT CAST(b.x - a.x AS BIGINT) AS dy,
             CAST(b.t - a.t AS BIGINT) AS dx
      FROM dd a JOIN dd b ON b.t > a.t
    ),
    ranked AS (
      SELECT dy, dx,
             row_number() OVER (ORDER BY
               CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) ASC,
               dy ASC, dx ASC) AS rn,
             count(*) OVER () AS n
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_pairs, dy, dx,
           CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS slope_per_day
    FROM ranked WHERE rn = (n + 1) // 2
"""


def kendall_tau_daily(events: DataFrame) -> DataFrame:
    """Kendall rank correlation (tau-b, tie-corrected) between the daily
    revenue and traffic series — the third rank-association monitor next
    to Spearman and Theil-Sen (Kendall 1938; tau-b tie correction per
    standard references). Where Spearman scores rank DISPLACEMENT,
    Kendall scores pair ORDER agreement — more robust to a single wild
    rank and directly interpretable as P(concordant) − P(discordant).

    Engine-exact: every statistic is an integer pair count — concordant,
    discordant, x-ties, y-ties over the K² pairs of the CALENDAR-BOUNDED
    daily table (the sanctioned driver-sized window class; same shape as
    theil_sen_daily's pair build). Only sign comparisons touch the data,
    so no product overflow exists; tau-b is the one frozen-IEEE tail
    (nc − nd) / (sqrt(n0 − n1) · sqrt(n0 − n2)) with the same
    sqrt·sqrt spelling on both engines.

    Scale shape: the corpus collapses to the daily table first (one
    groupBy shuffle); the pair build runs on ≤ a few thousand calendar
    rows regardless of corpus size.
    Columns: n_days, nc, nd, ties_x, ties_y, tau_b."""
    return kendall_from_daily(daily_value_series(events))


def kendall_from_daily(daily: DataFrame) -> DataFrame:
    """:func:`kendall_tau_daily`'s pair-count tail from an already-built
    (or streamed-and-folded) daily series — the same additive-fold
    sharing as the Pearson/ACF/Spearman/Theil-Sen monitors."""
    d = daily.select(
        F.datediff(F.col("day"), F.lit("1970-01-01")).alias("t"),
        "x", "y")
    a = d.select(F.col("t").alias("t1"), F.col("x").alias("x1"),
                 F.col("y").alias("y1"))
    b = d.select(F.col("t").alias("t2"), F.col("x").alias("x2"),
                 F.col("y").alias("y2"))
    sx = F.when(F.col("x2") > F.col("x1"), F.lit(1)).when(
        F.col("x2") < F.col("x1"), F.lit(-1)).otherwise(F.lit(0))
    sy = F.when(F.col("y2") > F.col("y1"), F.lit(1)).when(
        F.col("y2") < F.col("y1"), F.lit(-1)).otherwise(F.lit(0))
    pairs = (a.crossJoin(b).filter(F.col("t2") > F.col("t1"))
             .select(sx.alias("sx"), sy.alias("sy")))
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when((F.col("sx") * F.col("sy")) == 1, 1)
              .otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when((F.col("sx") * F.col("sy")) == -1, 1)
              .otherwise(0)).cast("long").alias("nd"),
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0)).cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("sy") == 0, 1).otherwise(0)).cast("long")
        .alias("n2"),
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))

    def d_(name):
        return F.col(name).cast("double")

    den = (F.sqrt(d_("n0") - d_("n1")) * F.sqrt(d_("n0") - d_("n2")))
    return m.crossJoin(n_days).select(
        "n_days",
        F.col("nc"), F.col("nd"),
        F.col("n1").alias("ties_x"), F.col("n2").alias("ties_y"),
        F.when(den != F.lit(0.0), (d_("nc") - d_("nd")) / den)
        .alias("tau_b"),
    )


KENDALL_TAU_DAILY_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) * 100
                  AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    dd AS (SELECT date_diff('day', DATE '1970-01-01', day) AS t, x, y
           FROM daily),
    pairs AS (
      SELECT CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
                  ELSE 0 END AS sx,
             CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
                  ELSE 0 END AS sy
      FROM dd a JOIN dd b ON b.t > a.t
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nd,
             CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2
      FROM pairs
    ),
    nd_ AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
    SELECT n_days, nc, nd, n1 AS ties_x, n2 AS ties_y,
      CASE WHEN sqrt(CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
                * sqrt(CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE)) <> 0
        THEN (CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
             / (sqrt(CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
                * sqrt(CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE)))
      END AS tau_b
    FROM m, nd_
"""


def transit_daily_deltas(lineitem: DataFrame,
                         orders: DataFrame) -> DataFrame:
    """Sweep-line deltas for open-line-item concurrency: each line item
    is OPEN over the closed interval [order day, ship day] (placed but
    not yet shipped), contributing +1 at its order day and -1 the day
    AFTER its ship day. One stream-static equi-join recovers the order
    day (orders scales with the corpus, so it carries NO mandatory
    broadcast hint: below autoBroadcastJoinThreshold AQE broadcasts it,
    at 100 TB it shuffles on the key both tables are naturally
    clustered by), then one union + one
    groupBy shuffle collapses the corpus to a calendar-bounded
    (day, delta) table -- EXACTLY ADDITIVE under lineitem row partition,
    so per-micro-batch delta tables fold cell-wise to the one-shot
    table (what the streamed twin's counts_fold_sink keeps).
    Columns: day, delta."""
    od = orders.select(F.col("o_orderkey").alias("l_orderkey"),
                       F.to_date("o_orderdate").alias("open_day"))
    li = (lineitem.select("l_orderkey", F.to_date("l_shipdate")
                          .alias("ship_day"))
          .join(od, "l_orderkey"))
    ship = li.select(F.col("open_day").alias("day"), F.lit(1).alias("d"))
    recv = li.select(F.date_add(F.col("ship_day"), 1).alias("day"),
                     F.lit(-1).alias("d"))
    return (ship.unionAll(recv).groupBy("day")
            .agg(F.sum("d").cast("long").alias("delta")))


def transit_concurrency_peaks(lineitem: DataFrame,
                              orders: DataFrame) -> DataFrame:
    """Peak number of simultaneously-OPEN line items (ordered, not yet
    shipped) per month -- the classic sweep-line / interval-concurrency
    query (the "max overlapping intervals" shape every ops dashboard
    needs: concurrent sessions, open orders, active connections). No
    interval self-join ever happens: the corpus collapses to +/-1
    boundary deltas (one shuffle), a calendar-day spine gap-fills quiet
    days, and ONE running sum over the driver-sized day spine (the
    sanctioned bounded-window class) yields the concurrency series; the
    per-month peak and its first attaining day read off with a
    partitioned max.

    Scale shape: rows shuffled = 2*|lineitem| collapsing to <= a few
    thousand calendar days regardless of corpus size; everything after
    the first groupBy is driver-sized. Columns: month, peak_open,
    peak_day (first day of the month attaining the peak)."""
    return transit_peaks_from_deltas(transit_daily_deltas(lineitem,
                                                          orders))


def transit_peaks_from_deltas(deltas: DataFrame) -> DataFrame:
    """:func:`transit_concurrency_peaks`' spine + running-sum + monthly
    peak tail from an already-built (or streamed-and-folded) delta
    table."""
    from pyspark.sql.window import Window

    bounds = deltas.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(F.explode(F.expr(
        "sequence(d0, d1, interval 1 day)")).alias("day"))
    g = (spine.join(deltas, "day", "left")
         .select("day", F.coalesce("delta", F.lit(0)).alias("delta")))
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    g = g.select(
        F.trunc(F.col("day"), "month").alias("month"), "day",
        F.sum("delta").over(wc).cast("long").alias("n_open"))
    wm = Window.partitionBy("month")
    g = g.withColumn("pk", F.max("n_open").over(wm))
    return (g.filter(F.col("n_open") == F.col("pk"))
            .groupBy("month")
            .agg(F.max("pk").alias("peak_open"),
                 F.min("day").alias("peak_day")))


TRANSIT_CONCURRENCY_SQL = """
    WITH li AS (
      SELECT CAST(date_trunc('day', o.o_orderdate) AS DATE) AS open_day,
             CAST(date_trunc('day', l.l_shipdate) AS DATE) AS ship_day
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deltas AS (
      SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM (
        SELECT open_day AS day, 1 AS d FROM li
        UNION ALL
        SELECT ship_day + 1, -1 FROM li
      ) GROUP BY 1
    ),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM deltas),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                  AS DATE) AS day
      FROM bounds
    ),
    g AS (
      SELECT s.day, COALESCE(d.delta, 0) AS delta
      FROM spine s LEFT JOIN deltas d USING (day)
    ),
    c AS (
      SELECT CAST(date_trunc('month', day) AS DATE) AS month, day,
             CAST(SUM(delta) OVER (ORDER BY day) AS BIGINT) AS n_open
      FROM g
    ),
    p AS (
      SELECT month, day, n_open,
             max(n_open) OVER (PARTITION BY month) AS pk
      FROM c
    )
    SELECT month, CAST(max(pk) AS BIGINT) AS peak_open,
           min(day) AS peak_day
    FROM p WHERE n_open = pk GROUP BY 1
"""


def fano_daily(events: DataFrame) -> DataFrame:
    """Fano factor (index of dispersion) of the daily event-count
    series — variance-to-mean ratio, the burstiness number next to the
    Kleinberg burst days (= 1 for a Poisson arrival process, > 1 for
    bursty/overdispersed traffic, < 1 for regularized). All-integer:
    fano_ppm = 1e6·(n·Σy² − (Σy)²) DIV (n·Σy) — the variance numerator
    is nonnegative (Cauchy-Schwarz) and the denominator positive
    whenever any event exists, so the DIV never sees a negative.
    Columns: n_days, sum_events, fano_ppm."""
    return fano_from_daily(daily_value_series(events))


def fano_from_daily(daily: DataFrame) -> DataFrame:
    """:func:`fano_daily`'s dispersion tail from an already-built (or
    streamed-and-folded) daily series — the sixth reader of the one
    folded daily state (Pearson, ACF, Spearman, Theil-Sen, Kendall,
    Fano)."""
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.col("sy").alias("sum_events"),
        F.expr(
            "CASE WHEN sy > 0 THEN CAST("
            " (CAST(1000000 AS DECIMAL(38,0))"
            "  * (CAST(n AS DECIMAL(38,0)) * syy"
            "     - CAST(sy AS DECIMAL(38,0)) * sy))"
            " div (CAST(n AS DECIMAL(38,0)) * sy) AS BIGINT)"
            " END").alias("fano_ppm"),
    )


FANO_DAILY_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM daily
    )
    SELECT n AS n_days, sy AS sum_events,
      CASE WHEN sy > 0 THEN CAST(
        (1000000::HUGEINT * (n::HUGEINT * syy - sy::HUGEINT * sy))
        // (n::HUGEINT * sy) AS BIGINT)
      END AS fano_ppm
    FROM m
"""


def ship_latency_percentiles(lineitem: DataFrame,
                             orders: DataFrame) -> DataFrame:
    """Order-to-ship latency SLA report: per ship-month, exact p50 and
    p95 of the integer day gap (l_shipdate − o_orderdate) by RANK
    SELECTION — the lower-median discipline (p50 at rank (n+1) DIV 2,
    p95 at rank (95·n + 99) DIV 100 = ceil(0.95·n)), never an
    interpolated float percentile (engines interpolate differently;
    rank selection is hash-exact). The per-month rank window is the
    sanctioned calendar-bounded class only in month COUNT — row counts
    per month scale with the corpus, so the rank runs as a partitioned
    window (per-month hash partitions), not a global sort.
    Columns: month, n_items, p50_days, p95_days."""
    from pyspark.sql.window import Window

    od = orders.select(F.col("o_orderkey").alias("l_orderkey"),
                       F.to_date("o_orderdate").alias("od"))
    g = (lineitem.select("l_orderkey", F.to_date("l_shipdate")
                         .alias("sd"))
         .join(od, "l_orderkey")
         .select(F.trunc("sd", "month").alias("month"),
                 F.datediff("sd", F.col("od")).cast("long")
                 .alias("gap")))
    w = Window.partitionBy("month").orderBy("gap")
    r = g.select(
        "month", "gap",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("month")).alias("n"))
    p50 = (r.filter(F.col("rn") == F.expr("(n + 1) div 2"))
           .select("month", F.col("n").alias("n_items"),
                   F.col("gap").alias("p50_days")))
    p95 = (r.filter(F.col("rn") == F.expr("(95 * n + 99) div 100"))
           .select("month", F.col("gap").alias("p95_days")))
    return p50.join(p95, "month")


SHIP_LATENCY_SQL = """
    WITH g AS (
      SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS month,
             CAST(date_diff('day',
                            CAST(date_trunc('day', o.o_orderdate)
                                 AS DATE),
                            CAST(date_trunc('day', l.l_shipdate)
                                 AS DATE)) AS BIGINT) AS gap
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    r AS (
      SELECT month, gap,
             row_number() OVER (PARTITION BY month ORDER BY gap) AS rn,
             count(*) OVER (PARTITION BY month) AS n
      FROM g
    )
    SELECT a.month, CAST(a.n AS BIGINT) AS n_items,
           a.gap AS p50_days, b.gap AS p95_days
    FROM (SELECT * FROM r WHERE rn = (n + 1) // 2) a
    JOIN (SELECT * FROM r WHERE rn = (95 * n + 99) // 100) b
      ON a.month = b.month
"""


def ship_gap_counts(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(month, gap, cnt) latency histogram — EXACTLY ADDITIVE under
    lineitem row partition (what the streamed twin's counts_fold_sink
    keeps). The order-date join carries no mandatory broadcast hint —
    orders scales with the corpus; AQE size-dispatches per batch."""
    od = orders.select(F.col("o_orderkey").alias("l_orderkey"),
                       F.to_date("o_orderdate").alias("od"))
    return (lineitem.select("l_orderkey",
                            F.to_date("l_shipdate").alias("sd"))
            .join(od, "l_orderkey")
            .groupBy(F.trunc("sd", "month").alias("month"),
                     F.datediff("sd", F.col("od")).cast("long")
                     .alias("gap"))
            .agg(F.count("*").cast("long").alias("cnt")))


def ship_latency_from_gap_counts(counts: DataFrame) -> DataFrame:
    """:func:`ship_latency_percentiles`' rank-selection tail from an
    already-built (or streamed-and-folded) latency histogram: the
    value at rank r over the expanded multiset equals the smallest gap
    whose cumulative count reaches r — identical output, but the rank
    runs over the BOUNDED histogram instead of the raw rows."""
    from pyspark.sql.window import Window

    wc = (Window.partitionBy("month").orderBy("gap")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wm = Window.partitionBy("month")
    c = counts.select(
        "month", "gap",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wm).alias("n"))
    p50 = (c.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
           .groupBy("month")
           .agg(F.max("n").cast("long").alias("n_items"),
                F.min("gap").alias("p50_days")))
    p95 = (c.filter(F.col("cum") >= F.expr("(95 * n + 99) div 100"))
           .groupBy("month")
           .agg(F.min("gap").alias("p95_days")))
    return p50.join(p95, "month")


def jackknife_daily_mean(events: DataFrame) -> DataFrame:
    """Leave-one-day-out jackknife variance of the mean daily revenue —
    the deterministic resampling uncertainty estimate (Quenouille 1956 /
    Tukey 1958; public method) where bootstrap's randomness is banned by
    the engine-exactness contract: with K daily cents values x_i and
    S = Σx_i, the LOO means are (S − x_i)/(K−1) and

        var_jack = (K−1)/K · Σ(mean_i − mean)²
                 = Σ(S − K·x_i)² / (K³·(K−1))

    after clearing denominators — the numerator is an exact
    DECIMAL(38,0) sum of squared integers, the denominator an exact
    integer, so the variance (and its sqrt, the standard error) is ONE
    IEEE division (+ one correctly-rounded sqrt) of exact values.

    Scale shape: the corpus collapses to the CALENDAR-BOUNDED daily
    table first (one groupBy — the additive fold the streamed twin
    keeps), then a 1-row cross join carries (S, K) to a K-row second
    aggregate. Columns: k_days, total_cents, var_jack, se_jack."""
    return jackknife_from_daily(daily_value_series(events))


def jackknife_from_daily(daily: DataFrame) -> DataFrame:
    """:func:`jackknife_daily_mean`'s tail from an already-built (or
    streamed-and-folded) daily series — rides the same fold state as
    the rolling-corr/ACF/Spearman/Theil-Sen monitors."""
    tot = daily.agg(F.count("*").cast("long").alias("k_days"),
                    F.sum("x").cast("long").alias("total_cents"))
    num = (daily.crossJoin(F.broadcast(tot))
           .agg(F.sum(F.expr(
               "CAST(total_cents - k_days * x AS DECIMAL(38,0))"
               " * (total_cents - k_days * x)")).alias("num"),
               F.first("k_days").alias("k_days"),
               F.first("total_cents").alias("total_cents")))
    var = ("CAST(num AS DOUBLE)"
           " / (CAST(k_days AS DOUBLE) * CAST(k_days AS DOUBLE)"
           " * CAST(k_days AS DOUBLE)"
           " * (CAST(k_days AS DOUBLE) - CAST(1 AS DOUBLE)))")
    return num.select(
        "k_days", "total_cents",
        F.expr(var).alias("var_jack"),
        F.expr(f"sqrt({var})").alias("se_jack"))


JACKKNIFE_DAILY_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) * 100
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS k_days,
                   CAST(SUM(x) AS BIGINT) AS total_cents FROM daily),
    num AS (
      SELECT CAST(SUM(CAST(t.total_cents - t.k_days * d.x AS HUGEINT)
                      * (t.total_cents - t.k_days * d.x)) AS HUGEINT)
               AS num,
             MAX(t.k_days) AS k_days,
             MAX(t.total_cents) AS total_cents
      FROM daily d, tot t
    )
    SELECT k_days, total_cents,
           CAST(num AS DOUBLE)
             / (CAST(k_days AS DOUBLE) * CAST(k_days AS DOUBLE)
                * CAST(k_days AS DOUBLE)
                * (CAST(k_days AS DOUBLE) - CAST(1 AS DOUBLE)))
             AS var_jack,
           sqrt(CAST(num AS DOUBLE)
             / (CAST(k_days AS DOUBLE) * CAST(k_days AS DOUBLE)
                * CAST(k_days AS DOUBLE)
                * (CAST(k_days AS DOUBLE) - CAST(1 AS DOUBLE))))
             AS se_jack
    FROM num
"""


def _floor_div_expr(e: str, n: int) -> str:
    """Floor division of a possibly-NEGATIVE integer expression by a
    positive literal, spelled identically on both engines: the pmod
    trick makes the numerator exactly divisible, where truncation ==
    floor (Spark ``div`` truncates, DuckDB ``//`` floors — on the
    adjusted numerator they agree)."""
    return (f"((({e}) - (((({e}) % {n}) + {n}) % {n})) div {n})")


def holt_linear_forecast(events: DataFrame) -> DataFrame:
    """Holt's linear-trend double exponential smoothing of the daily
    revenue series (Holt 1957 / Winters 1960; public method) — the
    actual FORECASTING monitor next to the descriptive trend gates
    (EWMA smooths level only, Theil-Sen fits one global slope): with
    pinned rational smoothing constants α = 1/2, β = 1/4,

        l_t = ⌊(x_t + l_{t−1} + b_{t−1}) / 2⌋          (α = 1/2)
        b_t = ⌊((l_t − l_{t−1}) + 3·b_{t−1}) / 4⌋       (β = 1/4)

    initialized l_1 = x_1, b_1 = x_2 − x_1, every step ONE integer
    floor division via the pmod trick (the value may be negative —
    plain DIV is banned), so the whole recursion is exact BIGINT
    arithmetic and the h-step forecasts l + h·b are hash-exact.

    Scale shape: the corpus collapses to the CALENDAR-BOUNDED daily
    table first (the additive fold the streamed twin keeps); the
    recursion left-folds the K-element ordered array in ONE engine-side
    ``aggregate`` over a 1-row frame (the kaplan_meier product-limit
    fold discipline — sequential by nature, K is days-not-corpus).
    Columns: k_days, level_cents, trend_cents, forecast_1d,
    forecast_2d, forecast_3d."""
    return holt_from_daily(daily_value_series(events))


def holt_from_daily(daily: DataFrame) -> DataFrame:
    """:func:`holt_linear_forecast`'s recursion tail from an
    already-built (or streamed-and-folded) daily series — the eighth
    ALIAS reader of the rolling-corr daily fold state."""
    s = daily.agg(
        F.expr("sort_array(collect_list(struct(day, x)))").alias("s"))
    # zero-events edge (r12 ADVICE): an empty daily series must yield
    # ZERO rows like the DuckDB twin, not crash — slice() rejects the
    # negative length size(s)-1 = -1. Filter the empty frame away and
    # clamp the slice length so neither engine path can throw.
    s = s.filter(F.expr("size(s) > 0"))
    lnew = _floor_div_expr("e.x + acc.l + acc.b", 2)
    bnew = _floor_div_expr(f"({lnew}) - acc.l + 3 * acc.b", 4)
    fold = (
        "aggregate("
        " slice(s, 2, greatest(size(s) - 1, 0)),"
        " named_struct("
        # get() is 0-based and NULL on out-of-bounds (element_at
        # throws under ANSI when K = 1 and there is no second day)
        "   'l', CAST(get(s, 0).x AS BIGINT),"
        "   'b', CAST(coalesce(get(s, 1).x"
        "                      - get(s, 0).x, 0) AS BIGINT)),"
        f" (acc, e) -> named_struct('l', CAST({lnew} AS BIGINT),"
        f"                          'b', CAST({bnew} AS BIGINT)))")
    return s.select(
        F.expr("CAST(size(s) AS BIGINT)").alias("k_days"),
        F.expr(f"({fold}).l").alias("level_cents"),
        F.expr(f"({fold}).b").alias("trend_cents"),
    ).select(
        "k_days", "level_cents", "trend_cents",
        F.expr("level_cents + 1 * trend_cents").alias("forecast_1d"),
        F.expr("level_cents + 2 * trend_cents").alias("forecast_2d"),
        F.expr("level_cents + 3 * trend_cents").alias("forecast_3d"),
    )


def _holt_fd_sql(e: str, n: int) -> str:
    """DuckDB spelling of the same pmod floor division (// on the
    adjusted numerator; DuckDB % truncates like C, as Spark's does)."""
    return (f"((({e}) - (((({e}) % {n}) + {n}) % {n})) // {n})")


def holt_daily_sql() -> str:
    """DuckDB twin of :func:`holt_linear_forecast`: the identical
    recursion as a recursive CTE over the row-numbered daily series —
    same init, same pmod floor divisions, same forecast tail."""
    lnew = _holt_fd_sql("d.x + r.l + r.b", 2)
    bnew = _holt_fd_sql(f"({lnew}) - r.l + 3 * r.b", 4)
    return f"""
        WITH RECURSIVE daily AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                 CAST(SUM(CAST(value AS DECIMAL(38,2))) * 100
                      AS BIGINT) AS x
          FROM events GROUP BY 1
        ),
        idx AS (
          SELECT row_number() OVER (ORDER BY day) AS i, x FROM daily
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS k FROM idx),
        rec AS (
          SELECT CAST(1 AS BIGINT) AS i,
                 CAST(x AS BIGINT) AS l,
                 CAST(coalesce(
                   (SELECT x FROM idx WHERE i = 2) - x, 0) AS BIGINT)
                   AS b
          FROM idx WHERE i = 1
          UNION ALL
          SELECT r.i + 1,
                 CAST({lnew} AS BIGINT),
                 CAST({bnew} AS BIGINT)
          FROM rec r JOIN idx d ON d.i = r.i + 1
        )
        SELECT n.k AS k_days,
               r.l AS level_cents,
               r.b AS trend_cents,
               r.l + 1 * r.b AS forecast_1d,
               r.l + 2 * r.b AS forecast_2d,
               r.l + 3 * r.b AS forecast_3d
        FROM rec r, n WHERE r.i = n.k
    """
