"""SQL analytic (window-function) surface beyond the reference's single
``row_number`` ranking (``/root/reference/src/main/java/com/soto/
Top3HotProduct.java:92-103``): running frames, ntile bucketing, and
two-level rank-over-aggregate.

Scale posture: every window here partitions on a real key (custkey /
lang) — never an empty OVER (), which would serialize 100 TB through one
task. Running sums quantize addends to decimal so the frame's
accumulation order (fully determined by the ORDER BY + unique tiebreak)
yields bit-identical results on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_customer_spend(orders: DataFrame) -> DataFrame:
    """Per customer, orders in date order with the running decimal-exact
    total spend. The window partitions by custkey → one shuffle, then a
    single in-partition sort; the unique orderkey tiebreak makes the
    frame (and therefore the running values) deterministic.
    Columns: o_custkey, o_orderkey, o_orderdate, o_totalprice, run_spend."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
        .over(w).cast("double").alias("run_spend"),
    )


def customer_balance_quartiles(customer: DataFrame) -> DataFrame:
    """ntile(4) over account balance within each market segment.
    Deterministic via the unique custkey tiebreak. Columns: c_custkey,
    c_mktsegment, c_acctbal, quartile."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return customer.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
    )


def top_terms_per_lang(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k terms per language by document frequency: explode → distinct
    (doc, lang, term) → df agg → per-lang dense rank ≤ k. Two shuffles
    (distinct, agg share the same (lang, term) key so AQE coalesces;
    the rank partitions on lang only — tiny). Ties broken by term so the
    cut is stable. Columns: lang, term, df, rnk."""
    term_docs = (
        docs.select(
            "lang", "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("term"),
        )
        .distinct()
    )
    dfreq = term_docs.groupBy("lang", "term").agg(
        F.count("*").alias("df")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    return (
        dfreq.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def value_outliers(events: DataFrame, k: float = 5.0) -> DataFrame:
    """Robust per-type outliers: |value − median| > k × MAD (median
    absolute deviation). Median/MAD use EXACT percentile — order-
    independent and engine-identical, so even this statistical op
    oracle-checks bitwise; at 100 TB swap percentile → approx_percentile
    (same shape, sketch error documented). Two aggregation passes over
    events (median, then MAD of residuals) + a broadcast join back —
    all keyed on the low-cardinality event_type.
    Columns: event_id, event_type, value, med, mad."""
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = events.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > k * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


def purchase_funnel_daily(events: DataFrame) -> DataFrame:
    """Per (user, day) funnel: did a click precede the first purchase
    that day? One conditional aggregation — min click ts and min
    purchase ts per group, compared. The funnel predicate is computed
    without ordering state or self-joins. Columns: user_id, day,
    first_click_ts, first_purchase_ts, converted."""
    day = F.date_trunc("day", "ts").alias("day")
    first_click = F.min(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).alias("first_click_ts")
    first_purchase = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).alias("first_purchase_ts")
    agg = events.groupBy("user_id", day).agg(first_click, first_purchase)
    return agg.select(
        "user_id", "day", "first_click_ts", "first_purchase_ts",
        (
            F.col("first_click_ts").isNotNull()
            & F.col("first_purchase_ts").isNotNull()
            & (F.col("first_click_ts") < F.col("first_purchase_ts"))
        ).alias("converted"),
    )


def cohort_retention(events: DataFrame, max_offset: int = 14) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity day
    (the cohort), counted on each subsequent day they return — the
    standard growth-analytics rollup. Columns: cohort_day, day_offset,
    n_users (distinct users of that cohort active offset days later).

    Plan: one groupBy(user) for first-activity (partial-agg min), a
    shuffle join back on user_id (both sides keyed on the natural key —
    bucketed layouts co-locate), then count(DISTINCT user) per
    (cohort_day, offset) — Spark expands the distinct into a two-phase
    aggregate, so no single reducer sees a whole cohort's user list.
    ``max_offset`` bounds the matrix width (beyond it rows are dropped,
    not clamped)."""
    days = events.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    offset = F.datediff(F.col("day"), F.col("cohort_day")).cast("int")
    return (
        days.join(first, "user_id")
        .select("user_id", "cohort_day", offset.alias("day_offset"))
        .filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def rolling_spend_90d(orders: DataFrame, days: int = 90) -> DataFrame:
    """Time-RANGE rolling window: for each order, the customer's order
    count and decimal-exact spend over the preceding ``days`` (inclusive
    of the current date). Completes the frame surface — running_customer_
    spend is a ROWS frame; this is a RANGE frame over event time, the
    shape behind "activity in the trailing N days" features.

    Spark has no interval RANGE frames, so the ORDER BY key is epoch
    SECONDS (timestamp→long cast) with a numeric rangeBetween — exactly
    what the engine would do internally; the oracle spells the same
    frame over epoch seconds. RANGE includes full tie groups on both
    ends, so same-date orders see identical frames regardless of
    physical row order → deterministic without a unique tiebreak.
    One shuffle on o_custkey. Columns: o_orderkey, o_custkey,
    o_orderdate, n_orders_90d, spend_90d."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("long"))
        .rangeBetween(-days * 86400, 0)
    )
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.count("*").over(w).alias("n_orders_90d"),
        F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
        .over(w).cast("double").alias("spend_90d"),
    )


def event_value_histogram(events: DataFrame, lo: float = 0.0,
                          hi: float = 500.0, nbins: int = 20) -> DataFrame:
    """Fixed-grid histogram per event_type (width_bucket semantics) — the
    distributed histogram primitive: one scan, one partial-aggregated
    groupBy; the result is ≤ nbins+2 cells per key (bucket 0 =
    underflow, nbins+1 = overflow) no matter how many rows feed it, so
    at 100 TB the shuffle carries only the grid. The bucket expression
    is spelled as explicit double arithmetic rather than Spark's
    ``width_bucket`` builtin because DuckDB lacks that function — the
    floor/divide ops are bit-identical IEEE doubles on both engines.
    Columns: event_type, bucket, n_events."""
    width = (hi - lo) / nbins
    v = F.col("value")
    bucket = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(nbins + 1))
        .otherwise(F.floor((v - lo) / F.lit(width)).cast("int") + 1)
    )
    return (
        events.groupBy("event_type", bucket.cast("int").alias("bucket"))
        .agg(F.count("*").alias("n_events"))
    )


def crosstab_association(events: DataFrame) -> DataFrame:
    """Chi-square contingency analysis of event_type × day-of-week —
    the categorical-association audit a feature pipeline runs to catch
    temporal confounds (is event mix independent of weekday?).

    Exact-arithmetic discipline: observed/row/column/grand totals are
    BIGINT; the expected count is reported as ``e_x1e6 = 1e6·r·c div N``
    and each cell's chi-square term ``(O·N − r·c)² / (N·r·c)`` floats
    only in the final division (7 dp-quantized). Day-of-week is
    engine-neutral: days since Monday 2024-01-01 mod 7 (0 = Monday),
    avoiding the engines' conflicting dayofweek() conventions.

    Scale shape: ONE map-side-combinable groupBy collapses the corpus
    to |types|×7 cells; the marginals are windows over that tiny cell
    table — the heavy data is touched exactly once.

    Columns: event_type, dow, o, e_x1e6, chi2_term."""
    cells = (
        events.select(
            "event_type",
            (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
             % 7).alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("o"))
    )
    r = F.sum("o").over(Window.partitionBy("event_type"))
    c = F.sum("o").over(Window.partitionBy("dow"))
    n = F.sum("o").over(Window.partitionBy())
    num = F.col("o") * F.col("n_tot") - F.col("r_tot") * F.col("c_tot")
    # denominator in DOUBLE from the start (N·r·c passes int64 well
    # before num does); fixed left-to-right association on both engines
    den = (F.col("n_tot").cast("double") * F.col("r_tot").cast("double")
           * F.col("c_tot").cast("double"))
    return (
        cells
        .withColumn("r_tot", r).withColumn("c_tot", c).withColumn("n_tot", n)
        .select(
            "event_type", "dow", "o",
            # numerator promoted to DECIMAL(38,0): 1e6·r·c passes int64
            # around r·c ~ 9.2e12 (reachable at 100 TB row counts) and
            # Spark's non-ANSI BIGINT multiply would wrap SILENTLY
            # while DuckDB promotes to HUGEINT — divergence exactly at
            # scale. The QUOTIENT e = 1e6·r·c/N <= 1e6·min(r,c) still
            # fits BIGINT for any realistic cell.
            F.expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * r_tot * c_tot)"
                   " DIV n_tot AS BIGINT)")
            .alias("e_x1e6"),
            # square in DOUBLE: num is BIGINT-exact but num² can pass
            # int64 at large N; the double product rounds identically
            # on both engines (IEEE correctly-rounded multiply)
            F.round(num.cast("double") * num.cast("double") / den, 7)
            .alias("chi2_term"),
        )
    )


def ab_experiment_report(events: DataFrame, salt: str = "exp1") -> DataFrame:
    """Deterministic A/B experiment readout: users are assigned to arms
    by the md5-threshold hash of their id (the
    operators/sampling.split_of contract with a 50/50 cut — assignment
    is a pure function of (salt, user_id): stable across reruns,
    resizes, and late data, which `randomSplit` cannot promise), and
    each arm reports its exposure and outcome counts with integer-ppm
    rates. The analysis every experimentation platform runs; rates stay
    integer so the whole report hash-checks.

    Scale shape: the arm label is MAP-SIDE column algebra; one
    groupBy(arm) with partial aggregation (distinct-user counts shuffle
    (arm, user) pairs once). Columns: arm, n_users, n_events,
    n_purchases, n_purchasers, purch_ppm (purchases per event),
    cvr_ppm (purchasing users per user)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(salt),
                              F.col("user_id").cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long") % 1000000
    arm = F.when(h < 500000, F.lit("A")).otherwise(F.lit("B"))
    is_p = (F.col("event_type") == "purchase").cast("long")
    labeled = events.select(arm.alias("arm"), "user_id",
                            is_p.alias("is_purchase"))
    per_user = labeled.groupBy("arm", "user_id").agg(
        F.count("*").alias("n_ev"),
        F.sum("is_purchase").alias("n_p"),
    )
    return (
        per_user.groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_ev").alias("n_events"),
            F.sum("n_p").alias("n_purchases"),
            F.sum((F.col("n_p") > 0).cast("long")).alias("n_purchasers"),
        )
        .selectExpr(
            "arm", "n_users", "n_events", "n_purchases", "n_purchasers",
            "CAST(n_purchases * 1000000 DIV n_events AS BIGINT)"
            " AS purch_ppm",
            "CAST(n_purchasers * 1000000 DIV n_users AS BIGINT)"
            " AS cvr_ppm",
        )
    )


def stationary_distribution(trans: DataFrame,
                            n_iters: int = 8) -> DataFrame:
    """Stationary distribution of the first-order Markov chain (the
    long-run fraction of time user behavior spends in each event type —
    the equilibrium readout next to :func:`event_transition_matrix`'s
    one-step view): left power iteration π ← πP with L1
    renormalization, from the uniform start. Types observed only as
    targets (no outgoing row) leak mass; the renormalization makes this
    the dominant-left-eigenvector iteration of the substochastic matrix
    — the standard spelling (von Mises iteration; public method).

    Engine-exact like operators/pca.py: the k² transition matrix is a
    BOUNDED artifact (k = |event types|), so it is collected ONCE (the
    sanctioned tiny driver fetch — formerly a types collect plus a
    checkpoint plus one distributed job per round, all scheduling
    latency on a corpus-independent table); each round computes
    w_to = Σ_from round(π_from·p, 7) driver-side in EXACT decimal
    arithmetic replicating the engines op-for-op (IEEE double product,
    7 dp HALF_UP quantization on the shortest round-trip rendering,
    exact decimal sum — operators/pca._r7), with p = p_ppm / 1e6 the
    same one IEEE divide per cell; the only other float op is the
    final w/Σw divide, the identical IEEE op the oracle's SQL
    executes. Columns: event_type, prob (bit-exact cross-engine)."""
    from spark_streaming_spark.operators.pca import _DEC0, _r7

    spark = trans.sparkSession
    rows = trans.select("from_type", "to_type", "p_ppm").collect()
    types = sorted({r["from_type"] for r in rows}
                   | {r["to_type"] for r in rows})
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    cells = [(idx[r["to_type"]], idx[r["from_type"]],
              float(r["p_ppm"]) / 1000000.0) for r in rows]
    v = [1.0 / k] * k
    for _ in range(n_iters):
        w = {}
        for i, j, p in cells:
            w[i] = w.get(i, _DEC0) + _r7(p * v[j])
        nrm = float(sum(w.values(), _DEC0))
        # 0.0 / nrm, not a bare 0.0: a zero transition matrix gives
        # nrm == 0 and the engine's divide yields NaN for EVERY slot —
        # rows with no inbound mass must degrade identically (ADVICE
        # r14 asked for this spelled out rather than left implicit)
        v = [(float(w[i]) if i in w else 0.0) / nrm for i in range(k)]
    return spark.createDataFrame(
        [(t, v[i]) for t, i in idx.items()],
        "event_type string, prob double")


def cep_pattern_matches(events: DataFrame, a: str = "click",
                        b: str = "purchase", guard: str = "error",
                        within_s: int = 3600) -> DataFrame:
    """Complex-event-processing pattern detection — the
    MATCH_RECOGNIZE capability class (SQL:2016; Flink CEP's bread and
    butter) Spark has no native operator for, expressed as ONE ordered
    window pass: per user, emit every ``b`` event whose most recent
    ``a`` is within ``within_s`` seconds AND with no ``guard`` event
    between them (A ⇒ B within T, no C in between — the checkout-
    without-error funnel, fraud sequences, alert escalations).

    Spelling: running ``last(a.ts)`` and ``last(guard.ts)`` over the
    (ts, event_id)-ordered per-user frame (one shuffle on user_id);
    a ``b`` row matches iff last_a is set, ts − last_a ≤ T, and last_g
    is null-or-before last_a. Exact integers end to end (epoch-second
    arithmetic, the gap as BIGINT). Columns: user_id, a_ts, b_ts,
    gap_s.

    Scale shape: one user-keyed window — the sessionize plan; no join,
    no per-user collect. A 100 TB run shuffles the events table once on
    its natural key."""
    from pyspark.sql.window import Window

    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # ts is monotone within the ordered frame, so the most recent
    # a/guard timestamp IS the frame MAX — the same value LAST
    # ignore-nulls would give, with identical semantics in DuckDB
    last_a = F.max(
        F.when(F.col("event_type") == a, F.col("ts"))).over(w)
    last_g = F.max(
        F.when(F.col("event_type") == guard, F.col("ts"))).over(w)
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(F.col("__a")))
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__a", last_a)
        .withColumn("__g", last_g)
        .filter(
            (F.col("event_type") == b)
            & F.col("__a").isNotNull()
            & (F.unix_timestamp("ts")
               - F.unix_timestamp(F.col("__a")) <= within_s)
            & (F.col("__g").isNull() | (F.col("__g") < F.col("__a")))
        )
        .select(
            "user_id",
            F.col("__a").alias("a_ts"),
            F.col("ts").alias("b_ts"),
            gap.cast("long").alias("gap_s"),
        )
    )


def next_event_accuracy(events: DataFrame) -> DataFrame:
    """EVAL of the first-order Markov model as a next-event PREDICTOR —
    the closes-the-loop readout next to the matrix and its stationary
    distribution: for every consecutive pair, the prediction is the
    argmax row of :func:`event_transition_matrix` (ties (n_trans DESC,
    to_type ASC)), and the report is per-from_type hits / totals /
    integer-ppm accuracy. In-sample by construction (the fixture's
    honest shape — a production run fits the matrix on yesterday and
    scores today; identical plan). All counts and the DIV are exact.
    Columns: from_type, predicted, n_hits, n_total, accuracy_ppm.

    Scale shape: the pair stream is ONE lag-window shuffle (shared
    shape with the matrix build); the predictor is a ≤|types|-row
    broadcast; the scoring is a map-side equality + one partial-agged
    groupBy."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id",
                      F.col("event_type").alias("from_type"))
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    trans = event_transition_matrix(events)
    wpred = Window.partitionBy("from_type").orderBy(
        F.col("n_trans").desc(), F.col("to_type").asc())
    pred = (
        trans.withColumn("__rn", F.row_number().over(wpred))
        .filter(F.col("__rn") == 1)
        .select("from_type", F.col("to_type").alias("predicted"))
    )
    return (
        pairs.join(F.broadcast(pred), "from_type")
        .groupBy("from_type", "predicted")
        .agg(
            F.sum(F.when(F.col("to_type") == F.col("predicted"), 1)
                  .otherwise(0)).cast("long").alias("n_hits"),
            F.count("*").cast("long").alias("n_total"),
        )
        .withColumn("accuracy_ppm", F.expr(
            "CAST(1000000 * n_hits DIV n_total AS BIGINT)"))
    )


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov TRANSITION MATRIX of user behavior: for every
    ordered pair of consecutive events of one user, count
    (from_type -> to_type) and its integer-ppm row-conditional
    probability — the sequence statistic behind next-event prediction,
    funnel leak detection and session synthesis. One shuffle (the lag
    window on user_id), one partial-agged pair groupBy; the per-from
    normalizer rides a tiny broadcastable aggregate. Deterministic: the
    in-user order is (ts, event_id) — the event_id tiebreak pins
    simultaneous events — and p_ppm is integer DIV.
    Columns: from_type, to_type, n_trans, p_ppm."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id",
                      F.col("event_type").alias("from_type"))
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n_trans"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_trans").alias("n_from"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type", "to_type", "n_trans",
            F.expr("CAST(1000000 * n_trans AS BIGINT) DIV n_from")
            .alias("p_ppm"),
        )
    )


def frequent_event_sequences(events: DataFrame) -> DataFrame:
    """Sequential-pattern support counts — the length-2 case of
    Agrawal & Srikant 1995 ("Mining Sequential Patterns"; public
    method): for every ordered pair of distinct event types (a, b),
    how many users have SOME a-event strictly before SOME b-event
    (ts order; ts-ties don't count as precedence — the well-defined
    cross-engine rule). Unlike the transition matrix (ADJACENT pairs),
    this is any-gap precedence — "ever viewed before ever purchasing",
    the funnel-mining support primitive. support_ppm is integer-exact
    over the total distinct-user count.

    Scale shape: ONE (user, type) groupBy compresses each user to at
    most |types| rows carrying (first_ts, last_ts) sufficient
    statistics — precedence 'exists a before b' ⟺ first(a) < last(b),
    so the per-user quadratic runs over ≤ |types|² struct pairs
    MAP-SIDE (the copurchase array-explode spelling, no self-join);
    one final partial-agged (antecedent, consequent) groupBy. Linear
    in events; never keys a shuffle on the pair. Columns: antecedent,
    consequent, support, support_ppm."""
    return sequences_from_stats(user_type_spans(events))


def user_type_spans(events: DataFrame) -> DataFrame:
    """(user_id, event_type, f=min ts, l=max ts) — the sufficient
    statistic for any-gap precedence. min/max are semilattice merges,
    so the table folds per micro-batch through counts_fold_sink's
    agg_fns and the streamed twin shares the batch oracle."""
    return (
        events.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("f"), F.max("ts").alias("l"))
    )


def sequences_from_stats(ut: DataFrame) -> DataFrame:
    """The support tail of :func:`frequent_event_sequences`, off the
    (user, type, f, l) stats table (batch-built or stream-folded).
    Every user with ≥ 1 event has a stats row, so the denominator is
    the stats table's distinct-user count."""
    per_user = ut.groupBy("user_id").agg(
        F.collect_list(F.struct("event_type", "f", "l")).alias("ts"))
    pairs = per_user.select(F.explode(F.expr(
        "filter(flatten(transform(ts, a -> transform(ts,"
        " b -> struct(a.event_type AS ant, b.event_type AS cons,"
        " a.f AS f, b.l AS l)))),"
        " p -> p.ant != p.cons AND p.f < p.l)")).alias("p"))
    n_users = int(ut.select("user_id").distinct().count())  # 1-row scalar
    return (
        pairs.groupBy(F.col("p.ant").alias("antecedent"),
                      F.col("p.cons").alias("consequent"))
        .agg(F.count("*").cast("long").alias("support"))
        .select(
            "antecedent", "consequent", "support",
            F.expr(f"CAST((1000000 * support) DIV {n_users} AS BIGINT)")
            .alias("support_ppm"),
        )
    )
