"""Table profiling / data-quality gate: per-column statistics computed
in ONE pass — the audit a training-data pipeline runs on every corpus
drop before it is allowed downstream (row counts, null rates, distinct
cardinality, value hulls), and the measuring twin of schema contracts.

Spark-first shape: every metric is an aggregate expression, so the
whole profile is a SINGLE Aggregate over one scan — no per-column jobs,
no driver loop; long-form output (column, metric, value) so adding a
column never changes the schema. Distincts use exact count_distinct
here (the gate wants exact or nothing at audit time); swap in the
engine-exact HLL (operators/sketch.py) when approximate is acceptable.
Values are rendered to strings so one result schema carries numeric,
timestamp and text hulls alike — rendering rules are pinned so the
DuckDB oracle reproduces them byte-for-byte (BIGINT as digits, DOUBLE
via the repr contract, NULL as the literal 'null').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _render(col: F.Column) -> F.Column:
    """Deterministic string rendering shared with the oracle: casting
    to string in Spark and DuckDB agrees for BIGINT and DECIMAL;
    doubles are avoided upstream (hulls are cast before rendering)."""
    return F.coalesce(col.cast("string"), F.lit("null"))


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass long-form profile. For each column: n_null, n_distinct
    (exact, nulls excluded), min, max. Plus one (column='*',
    metric='n_rows') row. Columns: column, metric, value.

    Plan: one Aggregate over one scan computes every cell; the long
    form comes from a map-only posexplode of the 1-row aggregate — so
    profiling k columns costs one shuffle of ONE row, not k jobs.

    Aggregate-buffer discipline (r14, guide §2.3/§7.2): HashAggregate
    requires every agg BUFFER to be a mutable UnsafeRow type, and one
    immutable buffer (a string or a >18-digit decimal) demotes the
    whole node — and with it the count_distinct Expand stage — to
    SortAggregate, which SORTS the k+1-fold expanded corpus twice
    (measured 5.0 s on orders at sf0.1; 1.5 s after). So: double hulls
    aggregate as raw doubles (long buffer) and quantize to
    DECIMAL(38,7) AFTER aggregation — cast is monotone, so min/cast
    commute, and a when() guard excludes NaNs and decimal-overflowing
    values (|x| >= 1e31) from the hull exactly as the old pre-agg cast's
    null did (ADVICE r14), so the rendering is byte-identical on ANY
    corpus, no precondition — and string
    hulls move to a sibling global aggregate over just the string
    columns (a global SortAggregate needs NO sort — there are no group
    keys) whose 1-row result crossJoins back. Every buffer in the
    Expand path is now mutable → HashAggregate end to end."""
    dtypes = dict(df.dtypes)
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n_rows")]
    str_aggs: list[F.Column] = []
    for c in cols:
        typ = dtypes[c]
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        sink = str_aggs if typ == "string" else aggs
        hull = F.col(c)
        if typ in ("double", "float"):
            # ADVICE r14: the pre-r14 spelling quantized BEFORE the
            # aggregate, so NaNs and DECIMAL(38,7)-overflowing values
            # (|x| >= 1e31) cast to null and were EXCLUDED from the
            # hull. Aggregating raw doubles (the HashAggregate buffer
            # fix) must reproduce that exclusion explicitly — a when()
            # guard keeps the buffer a mutable double, so the Expand
            # path stays hash-aggregated (plan-pinned)
            hull = F.when(~F.isnan(hull) & (F.abs(hull) < 1e31), hull)
        sink.append(F.min(hull).alias(f"__min_{c}"))
        sink.append(F.max(hull).alias(f"__max_{c}"))
    one = df.agg(*aggs)
    if str_aggs:
        one = one.crossJoin(F.broadcast(df.agg(*str_aggs)))
    cells = [
        F.struct(F.lit("*").alias("column"), F.lit("n_rows").alias("metric"),
                 _render(F.col("__n_rows")).alias("value"))
    ]
    for c in cols:
        for metric, src in (("n_null", f"__nn_{c}"), ("n_distinct", f"__nd_{c}"),
                            ("min", f"__min_{c}"), ("max", f"__max_{c}")):
            val = F.col(src)
            if metric in ("min", "max") and dtypes[c] in ("double", "float"):
                val = val.cast("decimal(38,7)")  # post-agg quantize (see above)
            cells.append(F.struct(
                F.lit(c).alias("column"), F.lit(metric).alias("metric"),
                _render(val).alias("value")))
    return (
        one.select(F.explode(F.array(*cells)).alias("cell"))
        .select("cell.column", "cell.metric", "cell.value")
    )


def _q_expr(c: str, scale: int) -> str:
    """Scaled-BIGINT quantization of a numeric column (the
    functions/vectors SCALED_VEC contract at column grain): positive
    half-up ROUND agrees between engines, DECIMAL(38,0) carries the
    exact sums."""
    return (f"CAST(ROUND(CAST({c} AS DOUBLE) * {10 ** scale})"
            f" AS DECIMAL(38,0))")


def corr_matrix(df: DataFrame, cols: list[str],
                scale: int = 4) -> DataFrame:
    """Pearson correlation MATRIX over ``cols`` in ONE pass — the
    feature-screening statistic a 100 TB pipeline wants without k²
    jobs: every Σx, Σx², Σxy accumulates as an EXACT decimal of the
    scaled-integer quantization (one Aggregate over one scan, partial
    agg map-side), and the correlation itself is a fixed IEEE formula
    over those exact sums — so the float output is bit-identical on
    any engine (the supplier_corank discipline: determinism comes from
    exact accumulators + a frozen final expression, never from float
    accumulation order).

    Overflow bound, documented not hoped: each pair sum is
    Σ qx·qy ≤ n·(max|x|·10^scale)·(max|y|·10^scale) and must stay
    below 1e38 — at scale=4 and TPC-H magnitudes (≤ 1e5·1e4 = 1e9 per
    factor) that allows n up to ~1e19 rows. Inputs must be non-null
    (the profile gate upstream asserts this).

    Columns: col_a < col_b, n (BIGINT), corr (DOUBLE)."""
    k = len(cols)
    q = df.select(*[
        F.expr(_q_expr(c, scale)).alias(f"q{i}") for i, c in enumerate(cols)
    ])
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [F.sum(F.col(f"q{i}")).alias(f"s{i}") for i in range(k)]
    aggs += [
        F.sum(F.expr(f"CAST(q{i} * q{j} AS DECIMAL(38,0))"))
        .alias(f"p{i}_{j}")
        for i in range(k) for j in range(i, k)
    ]
    one = q.agg(*aggs)

    def d(name):
        return F.col(name).cast("double")

    pairs = []
    for i in range(k):
        for j in range(i + 1, k):
            num = d("n") * d(f"p{i}_{j}") - d(f"s{i}") * d(f"s{j}")
            den = (
                F.sqrt(d("n") * d(f"p{i}_{i}") - d(f"s{i}") * d(f"s{i}"))
                * F.sqrt(d("n") * d(f"p{j}_{j}") - d(f"s{j}") * d(f"s{j}"))
            )
            pairs.append(F.struct(
                F.lit(cols[i]).alias("col_a"),
                F.lit(cols[j]).alias("col_b"),
                F.col("n").alias("n"),
                (num / den).alias("corr"),
            ))
    return (
        one.select(F.explode(F.array(*pairs)).alias("r"))
        .select("r.col_a", "r.col_b", "r.n", "r.corr")
    )


def corr_matrix_sql(cols: list[str], table: str = "lineitem",
                    scale: int = 4) -> str:
    """DuckDB twin of :func:`corr_matrix` — generated from the same
    quantization and the same frozen IEEE formula (never DuckDB's own
    corr(), whose float accumulation order is engine-private)."""
    k = len(cols)
    qsel = ", ".join(
        f"{_q_expr(c, scale)} AS q{i}" for i, c in enumerate(cols))
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    sums += [f"SUM(q{i}) AS s{i}" for i in range(k)]
    sums += [f"SUM(CAST(q{i} * q{j} AS DECIMAL(38,0))) AS p{i}_{j}"
             for i in range(k) for j in range(i, k)]
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            num = (f"(CAST(n AS DOUBLE) * CAST(p{i}_{j} AS DOUBLE)"
                   f" - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))")
            den = (
                f"(sqrt(CAST(n AS DOUBLE) * CAST(p{i}_{i} AS DOUBLE)"
                f" - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
                f" * sqrt(CAST(n AS DOUBLE) * CAST(p{j}_{j} AS DOUBLE)"
                f" - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE)))"
            )
            rows.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b,"
                f" n, {num} / {den} AS corr FROM s")
    return f"""
        WITH q AS (SELECT {qsel} FROM {table}),
        s AS (SELECT {", ".join(sums)} FROM q)
        {" UNION ALL ".join(rows)}
    """


def standardize(df: DataFrame, key_col: str, cols: list[str],
                scale: int = 4) -> DataFrame:
    """Feature STANDARDIZATION (z-scores) with the corr_matrix exactness
    discipline — the train-time normalization artifact every ML
    pipeline fits once and applies at scale: one pass builds exact
    scaled-integer Σx / Σx² per column (DECIMAL(38,0), map-side partial
    agg), and the per-row z = (q − mean_q) / std_q is a frozen IEEE
    expression over those exact sums riding the plan as literals —
    map-only serving, bit-identical on any engine. Population std
    (divide by n); columns with zero variance emit NULL.
    Long form (key, feature, z) — the sparse ML-prep spelling.

    Scale shape: ONE aggregate over one scan fits the artifact; the
    apply pass is a bare projection (no join, no shuffle) — exactly how
    a 100 TB standardization runs (fit once, broadcast constants)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.expr(_q_expr(c, scale))).alias(f"s{i}"))
        aggs.append(F.sum(F.expr(
            f"CAST({_q_expr(c, scale)} * {_q_expr(c, scale)}"
            " AS DECIMAL(38,0))")).alias(f"ss{i}"))
    stats = df.agg(*aggs).first()   # 1-row artifact fetch, sanctioned
    n = int(stats["n"])
    outs = []
    for i, c in enumerate(cols):
        s, ss = int(stats[f"s{i}"]), int(stats[f"ss{i}"])
        # frozen IEEE tail: mean/var from doubles OF THE EXACT SUMS —
        # the identical expression sequence the oracle executes
        mean = F.lit(float(s)) / F.lit(float(n))
        var = ((F.lit(float(n)) * F.lit(float(ss))
                - F.lit(float(s)) * F.lit(float(s)))
               / (F.lit(float(n)) * F.lit(float(n))))
        std = F.sqrt(var)
        q = F.expr(_q_expr(c, scale)).cast("double")
        outs.append(F.struct(
            F.lit(c).alias("feature"),
            F.when(std != F.lit(0.0), (q - mean) / std).alias("z"),
        ))
    return df.select(
        F.col(key_col).alias("key"),
        F.explode(F.array(*outs)).alias("r"),
    ).select("key", "r.feature", "r.z")


def standardize_sql(key_col: str, cols: list[str],
                    table: str = "lineitem", scale: int = 4) -> str:
    """DuckDB twin of :func:`standardize` — same quantization, same
    frozen IEEE tail over the same exact sums (never DuckDB's own
    stddev, whose accumulation order is engine-private). The stats CTE
    is MATERIALIZED (referenced once per column arm).

    Decimal→double gotcha (measured): DuckDB's DIRECT int128-decimal →
    DOUBLE cast is NOT always correctly rounded for values beyond 2⁶⁴
    (1-ulp off vs Spark/Python, which are correctly rounded) — the sums
    route through VARCHAR (strtod IS correctly rounded) so both engines
    see bit-identical doubles."""
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for i, c in enumerate(cols):
        q = _q_expr(c, scale)
        sums.append(f"SUM({q}) AS s{i}")
        sums.append(f"SUM(CAST({q} * {q} AS DECIMAL(38,0))) AS ss{i}")
    arms = []

    def dd(x):   # correctly-rounded decimal -> double
        return f"CAST(CAST({x} AS VARCHAR) AS DOUBLE)"

    for i, c in enumerate(cols):
        q = _q_expr(c, scale)
        mean = f"({dd(f'st.s{i}')} / CAST(st.n AS DOUBLE))"
        var = (f"((CAST(st.n AS DOUBLE) * {dd(f'st.ss{i}')}"
               f" - {dd(f'st.s{i}')} * {dd(f'st.s{i}')})"
               f" / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE)))")
        arms.append(f"""
            SELECT {key_col} AS key, '{c}' AS feature,
                   CASE WHEN sqrt({var}) <> 0
                     THEN (CAST({q} AS DOUBLE) - {mean}) / sqrt({var})
                   END AS z
            FROM {table}, st""")
    return (f"WITH st AS MATERIALIZED (SELECT {', '.join(sums)}"
            f" FROM {table})" + " UNION ALL ".join(arms))


# Benford's law first-digit frequencies, log10(1+1/d) in exact ppm —
# they sum to exactly 1 000 000. Shared by the Spark expression and the
# generated DuckDB twin so the expectation is a constant, not a float.
BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
               6: 66947, 7: 57992, 8: 51153, 9: 45757}


def benford_digit_counts(df: DataFrame, amount_col: str) -> DataFrame:
    """ADDITIVE summary for the Benford audit: first significant digit
    of the integer-cents quantization (string head of a BIGINT — no
    float log10 at decade boundaries), count per digit. Additive under
    corpus partition, so the streamed fold shares the batch oracle.
    Zero/negative amounts carry no leading-digit signal and are
    excluded (documented contract). Columns: digit, n."""
    cents = F.expr(f"CAST(ROUND({amount_col} * 100) AS BIGINT)")
    return (
        df.select(cents.alias("c")).filter(F.col("c") > 0)
        .select(F.substring(F.col("c").cast("string"), 1, 1)
                .cast("long").alias("digit"))
        .groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    )


def benford_finalize(counts: DataFrame) -> DataFrame:
    """Join the digit spine (1-9, zero-filled), attach the exact
    expected ppm, and compute observed ppm + delta — all integer
    arithmetic over a ≤ 9-row table (the sanctioned tiny-table window
    for the total). Columns: digit, n_rows, observed_ppm,
    expected_ppm, delta_ppm."""
    from pyspark.sql import Window

    spark = counts.sparkSession
    spine = spark.range(1, 10).select(F.col("id").alias("digit"))
    exp_case = "CASE " + " ".join(
        f"WHEN digit = {d} THEN {p}" for d, p in BENFORD_PPM.items()
    ) + " END"
    w = Window.partitionBy()  # 9 rows
    return (
        spine.join(counts, "digit", "left")
        .select("digit", F.coalesce("n", F.lit(0)).alias("n_rows"))
        .withColumn("total", F.sum("n_rows").over(w))
        .select(
            "digit", "n_rows",
            F.expr("CAST((1000000 * n_rows) DIV total AS BIGINT)")
            .alias("observed_ppm"),
            F.expr(f"CAST({exp_case} AS BIGINT)").alias("expected_ppm"),
        )
        .withColumn("delta_ppm", F.col("observed_ppm")
                    - F.col("expected_ppm"))
    )


def benford_audit(df: DataFrame, amount_col: str) -> DataFrame:
    """Benford's-law conformance audit (Newcomb 1881 / Benford 1938 /
    Nigrini's forensic-accounting use; public method) of a monetary
    column — the data-quality gate that flags fabricated or truncated
    amount distributions before they poison a training set. One
    partial-agged 9-group aggregate over the scan; everything after is
    driver-sized. See :func:`benford_digit_counts` for the exact
    digit rule."""
    return benford_finalize(benford_digit_counts(df, amount_col))


def benford_sql(table: str, amount_col: str) -> str:
    """Generated DuckDB twin of :func:`benford_audit` — the same
    integer-cents digit rule and the same exact-ppm expectation
    constants (BENFORD_PPM), never a float log10."""
    exp_case = "CASE " + " ".join(
        f"WHEN d.digit = {d} THEN {p}" for d, p in BENFORD_PPM.items()
    ) + " END"
    return f"""
        WITH c AS (
          SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit, count(*) AS n
          FROM (SELECT CAST(ROUND({amount_col} * 100) AS BIGINT)
                  AS cents FROM {table}) WHERE cents > 0 GROUP BY 1
        ),
        d AS (SELECT unnest(range(1, 10)) AS digit),
        j AS (SELECT d.digit, COALESCE(c.n, 0) AS n_rows,
                     {exp_case} AS expected_ppm
              FROM d LEFT JOIN c USING (digit)),
        t AS (SELECT SUM(n_rows) AS total FROM j)
        SELECT digit, CAST(n_rows AS BIGINT) AS n_rows,
               CAST((1000000 * n_rows) // total AS BIGINT)
                 AS observed_ppm,
               CAST(expected_ppm AS BIGINT) AS expected_ppm,
               CAST((1000000 * n_rows) // total - expected_ppm AS BIGINT)
                 AS delta_ppm
        FROM j, t
    """


def mad_anomalies(events: DataFrame, k: int = 5) -> DataFrame:
    """Robust anomaly detection by median/MAD (Hampel's rule — the
    median-absolute-deviation outlier gate, public method): flag events
    whose |value − median| exceeds ``k``·MAD. Unlike the mean/stddev
    z-score (value_outliers), the breakdown point is 50% — the
    anomalies themselves can't drag the fence, which is the point of
    using it on dirty data. EXACT and engine-identical: values quantize
    to integer cents, both medians are the value at global rank
    ⌊(n+1)/2⌋ under a total (value, event_id) order (value ties make
    the tie-break free), and the fence compare is pure integer
    arithmetic. Columns: event_id, user_id, cents, dev, med_cents,
    mad_cents.

    Scale shape: two exact-median passes, each the two-phase
    range-partitioned global rank (ranking.with_global_rank — no
    single-partition exchange), each reduced to a broadcast 1-row
    scalar; the flagging filter is map-side. At 100 TB you'd trade the
    exact medians for the KMV quantile sketch (kmv_quantity_quantiles)
    — this is the exact spelling the sketch is measured against."""
    from spark_streaming_spark.operators.ranking import with_global_rank

    c = events.select(
        "event_id", "user_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"))
    n = c.count()  # 1-row scalar
    mid = (n + 1) // 2
    med = (with_global_rank(c.select("cents", "event_id"),
                            ["cents", "event_id"], "rk")
           .filter(F.col("rk") == mid)
           .select(F.col("cents").alias("med_cents")))
    d = c.join(F.broadcast(med)).withColumn(
        "dev", F.abs(F.col("cents") - F.col("med_cents")))
    mad = (with_global_rank(d.select("dev", "event_id"),
                            ["dev", "event_id"], "rk")
           .filter(F.col("rk") == mid)
           .select(F.col("dev").alias("mad_cents")))
    return (
        d.join(F.broadcast(mad))
        .filter(F.col("dev") > k * F.col("mad_cents"))
        .select("event_id", "user_id", "cents", "dev",
                "med_cents", "mad_cents")
    )


def referential_audit(
        edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key integrity audit — the reconciliation report a data
    platform runs after every load: per declared FK edge, how many
    child rows reference a missing parent (orphans — broken joins
    waiting to happen) and how many parent keys have no children
    (childless — not an error, but the inner-join row-loss bound).
    ``edges`` is [(label, child_df, child_col, parent_df, parent_col)].
    Columns: fk, n_child, n_orphans, n_parents, n_childless.

    Scale shape: per edge ONE partial-agged child-key groupBy + one
    distinct on the parent key + one full outer join of the two KEY
    tables (|keys| rows, never the fact rows), aggregated to a single
    row — no per-edge driver actions; the report is the union of
    1-row frames."""
    outs = [
        fk_audit_from_child_counts(
            label, child_key_counts(child, ckey), parent, pkey)
        for label, child, ckey, parent, pkey in edges
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def child_key_counts(child: DataFrame, ckey: str) -> DataFrame:
    """(k, n_rows) per child key — ADDITIVE under corpus partition, so
    the streamed audit folds this table per micro-batch
    (counts_fold_sink) and shares the batch oracle."""
    return (child.groupBy(F.col(ckey).alias("k"))
            .agg(F.count("*").cast("long").alias("n_rows")))


def fk_audit_from_child_counts(label: str, ck: DataFrame,
                               parent: DataFrame, pkey: str) -> DataFrame:
    """The single-edge audit tail of :func:`referential_audit`, off a
    (k, n_rows) child-key table (batch-built or stream-folded)."""
    pk = parent.select(F.col(pkey).alias("k")).distinct() \
        .withColumn("is_p", F.lit(1))
    j = ck.join(pk, "k", "full_outer")
    return j.agg(
        F.lit(label).alias("fk"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long")
        .alias("n_child"),
        F.coalesce(F.sum(F.when(F.col("is_p").isNull(),
                                F.col("n_rows"))), F.lit(0))
        .cast("long").alias("n_orphans"),
        F.sum(F.coalesce("is_p", F.lit(0))).cast("long")
        .alias("n_parents"),
        F.sum(F.when(F.col("is_p").isNotNull()
                     & F.col("n_rows").isNull(), 1).otherwise(0))
        .cast("long").alias("n_childless"),
    )


def value_drift_bins(events: DataFrame) -> DataFrame:
    """Numeric-feature drift report — the PSI-style monitor a feature
    pipeline runs between a REFERENCE window and the CURRENT one,
    spelled integer-exact: the event span splits at its calendar
    midpoint, the reference half's exact DECILES (values at ranks
    ⌈i·n/10⌉ under a total order) become the bin edges, both halves
    bin against them map-side, and the report carries per-bin
    integer-ppm shares plus |ref − cur| — whose half-sum is the total-
    variation drift (the token_drift_tv discipline on a numeric
    column; no float ln, unlike PSI proper). A new-data distribution
    that slid off the training distribution shows up as mass leaving
    the middle bins. Columns: bin, n_ref, n_cur, ref_ppm, cur_ppm,
    diff_ppm.

    Scale shape: one pass quantizes + day-numbers the events; the
    split pivot and the 9 edges are driver-sized scalars (edges via
    the two-phase global rank over the REFERENCE half only); binning
    is a map-side 9-literal comparison; one (half, bin) groupBy ends
    it."""
    from spark_streaming_spark.operators.ranking import with_global_rank

    c = events.select(
        "event_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("dnum"))
    lo, hi = c.agg(F.min("dnum"), F.max("dnum")).first()
    pivot = lo + (hi - lo + 1) // 2
    ref = c.filter(F.col("dnum") < pivot)
    n_ref = ref.count()  # 1-row scalar
    ranked = with_global_rank(ref.select("cents", "event_id"),
                              ["cents", "event_id"], "r")
    edge_ranks = [(i * n_ref + 9) // 10 for i in range(1, 10)]
    # Exactly 9 edges, duplicates KEPT: with n_ref < 10 several decile
    # ranks collide on the same row, and each occurrence still counts
    # as its own bin boundary (the DuckDB twin materializes one edge
    # row per i). A distinct-rank isin here would bin against < 9
    # edges and shift every downstream bin number.
    by_rank = {r["r"]: r["cents"] for r in
               ranked.filter(F.col("r").isin(list(set(edge_ranks))))
               .select("r", "cents").collect()}  # ≤9-row driver artifact
    edges = [by_rank[r] for r in edge_ranks if r in by_rank]
    if edges:
        edge_arr = "array(" + ",".join(f"CAST({e} AS BIGINT)"
                                       for e in edges) + ")"
        bin_expr = F.expr(f"size(filter({edge_arr}, e -> cents > e))")
    else:  # empty reference window: everything lands in bin 0
        bin_expr = F.lit(0)
    binned = c.select(
        F.when(F.col("dnum") < pivot, 0).otherwise(1).alias("half"),
        bin_expr.alias("bin"))
    counts = (binned.groupBy("bin")
              .agg(F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
                   .cast("long").alias("n_ref"),
                   F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
                   .cast("long").alias("n_cur")))
    spine = events.sparkSession.range(0, 10).select(
        F.col("id").cast("int").alias("bin"))
    from pyspark.sql import Window
    w = Window.partitionBy()  # 10 rows
    return (
        spine.join(counts, "bin", "left")
        .select("bin",
                F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
                F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"))
        .withColumn("tr", F.sum("n_ref").over(w))
        .withColumn("tc", F.sum("n_cur").over(w))
        .select(
            "bin", "n_ref", "n_cur",
            F.expr("CAST(CASE WHEN tr = 0 THEN NULL ELSE"
                   " (1000000 * n_ref) DIV tr END AS BIGINT)")
            .alias("ref_ppm"),
            F.expr("CAST(CASE WHEN tc = 0 THEN NULL ELSE"
                   " (1000000 * n_cur) DIV tc END AS BIGINT)")
            .alias("cur_ppm"),
        )
        .withColumn("diff_ppm", F.abs(F.col("ref_ppm") - F.col("cur_ppm")))
    )


def fd_discovery(tagged: list[tuple[str, DataFrame, str, str]]) -> DataFrame:
    """Functional-dependency check (the schema-profiling primitive of
    FD-discovery systems — Huhtala et al. 1999 TANE's verification
    step; public method): does column A determine column B? Per
    candidate, count LHS values mapping to more than one distinct RHS
    — zero violations means the FD holds, the signal that a column is
    denormalizable / join-safe / a candidate key component. ``tagged``
    is [(label, df, lhs_col, rhs_col)]. Columns: fd, n_lhs,
    n_violating, holds.

    Scale shape: per candidate ONE partial-agged (lhs) groupBy with a
    distinct-count, then a 1-row aggregate — never a pairwise join;
    the report is the union of 1-row frames."""
    outs = []
    for label, df, lhs, rhs in tagged:
        g = (df.groupBy(lhs)
             .agg(F.count_distinct(F.col(rhs)).alias("nd")))
        outs.append(g.agg(
            F.lit(label).alias("fd"),
            F.count("*").cast("long").alias("n_lhs"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("long")
            .alias("n_violating"),
        ).withColumn("holds", F.col("n_violating") == 0))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def user_value_outliers(events: DataFrame, k_sigma: int = 3,
                        min_events: int = 5) -> DataFrame:
    """Per-entity anomaly gate: events deviating more than
    ``k_sigma``·σ from their OWN user's value distribution — the
    personalized complement to the global gates (value_outliers,
    mad_anomalies): a $50 event is normal for a whale and anomalous
    for a browser. EXACT integer algebra, no float mean/stddev ever:
    with s = Σcents, q = Σcents², the population test
    (x − s/n)² > k²·(nq − s²)/n² clears denominators to
    (n·x − s)² > k²·(n·q − s²) — every side an exact DECIMAL(38,0).
    Users need ``min_events`` events (σ of a 2-event user is noise).
    Columns: event_id, user_id, cents, n_user.

    Scale shape: one partial-agged per-user moment aggregate joined
    back on user_id (both sides hash-partitioned on the same key —
    one shuffle each, no window); the test is map-side."""
    c = events.select(
        "event_id", "user_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"))
    m = (c.groupBy("user_id")
         .agg(F.count("*").cast("long").alias("n_user"),
              F.sum(F.expr("CAST(cents AS DECIMAL(38,0))")).alias("s"),
              F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents"))
              .alias("q"))
         .filter(F.col("n_user") >= min_events))
    lhs = "CAST(n_user AS DECIMAL(38,0)) * cents - s"
    rhs = (f"CAST({k_sigma * k_sigma} AS DECIMAL(38,0))"
           " * (CAST(n_user AS DECIMAL(38,0)) * q - s * s)")
    return (
        c.join(m, "user_id")
        .filter(F.expr(f"CAST(({lhs}) AS DECIMAL(38,0))"
                       f" * ({lhs}) > {rhs}"))
        .select("event_id", "user_id", "cents", "n_user")
    )


def ks_two_sample(events: DataFrame, type_a: str = "click",
                  type_b: str = "purchase") -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the value
    distributions of two event types — the distribution-shift gate a
    pipeline runs between cohorts (treatment vs control, this week vs
    last) when a mean test isn't enough; public method (Smirnov 1939,
    Massey 1951 for the large-sample critical values).

    D = max_v |F_a(v) - F_b(v)| computed EXACTLY in integers: values
    quantize to cents; per-cent counts (c_a, c_b) cumsum in value
    order; the ECDF difference clears denominators to
    |cum_a·n_b - cum_b·n_a| (exact BIGINT), and D's numerator is its
    max. The reported d_stat = D_num/(n_a·n_b) and the α = 0.05
    decision d_stat > 1.358·√((n_a+n_b)/(n_a·n_b)) are fixed IEEE
    sequences over those exact integers — bit-identical cross-engine
    (√ is correctly rounded by IEEE 754; no transcendental appears).

    Scale shape: one partial-agged groupBy(cents) over the filtered
    pair of cohorts, then the distributed two-phase global cumsum
    (ranking.with_global_cumsum — range-partitioned local cumsums +
    a broadcast offsets table, never a single-task global window),
    then a 1-row max. n_a·n_b ≤ 2^53 governs d_stat's exactness —
    beyond that, d_ppm (integer DIV) stays exact.
    Columns: n_a, n_b, d_num, d_ppm, d_stat, reject_05."""
    return ks_from_value_counts(ks_value_counts(events, type_a, type_b))


def ks_value_counts(events: DataFrame, type_a: str = "click",
                    type_b: str = "purchase") -> DataFrame:
    """The per-cent-value cohort counts under the KS test — EXACTLY
    ADDITIVE under event partition (a count table), so the streamed
    twin folds it per micro-batch and shares the batch oracle.
    Columns: v, ca, cb."""
    ev = (events.filter(F.col("event_type").isin(type_a, type_b))
          .select(F.col("event_type").alias("et"),
                  F.expr("CAST(ROUND(value * 100) AS BIGINT)")
                  .alias("v")))
    return ev.groupBy("v").agg(
        F.sum(F.when(F.col("et") == type_a, 1).otherwise(0))
        .cast("long").alias("ca"),
        F.sum(F.when(F.col("et") == type_b, 1).otherwise(0))
        .cast("long").alias("cb"),
    )


def ks_from_value_counts(per_v: DataFrame) -> DataFrame:
    """:func:`ks_two_sample`'s decision tail from an already-built (or
    streamed-and-folded) per-value count table. Both cohort cumsums
    ride ONE two-phase pass (with_global_cumsums — one range shuffle,
    not one per cohort)."""
    from .ranking import with_global_cumsums

    cum = with_global_cumsums(per_v, ["v"], ["ca", "cb"],
                              ["cuma", "cumb"])
    tot = per_v.agg(F.sum("ca").cast("long").alias("n_a"),
                    F.sum("cb").cast("long").alias("n_b"))
    d = (cum.crossJoin(F.broadcast(tot))
         .agg(F.max(F.abs(F.col("cuma") * F.col("n_b")
                          - F.col("cumb") * F.col("n_a")))
              .cast("long").alias("d_num"),
              F.first("n_a").alias("n_a"), F.first("n_b").alias("n_b")))
    dn = F.col("d_num").cast("double")
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    d_stat = dn / (na * nb)
    crit = F.lit(1.358) * F.sqrt((na + nb) / (na * nb))
    return d.select(
        "n_a", "n_b", "d_num",
        F.expr("CAST(1000000 * d_num AS BIGINT)"
               " div (n_a * n_b)").alias("d_ppm"),
        d_stat.alias("d_stat"),
        (d_stat > crit).cast("int").alias("reject_05"),
    )


KS_TWO_SAMPLE_SQL = """
    WITH ev AS (
      SELECT event_type AS et,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    per_v AS (
      SELECT v,
             CAST(SUM(CASE WHEN et = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM ev GROUP BY 1
    ),
    cum AS (
      SELECT v,
             CAST(SUM(ca) OVER w AS BIGINT) AS cuma,
             CAST(SUM(cb) OVER w AS BIGINT) AS cumb
      FROM per_v
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
                   CAST(SUM(cb) AS BIGINT) AS n_b FROM per_v),
    d AS (
      SELECT CAST(MAX(ABS(cuma * t.n_b - cumb * t.n_a)) AS BIGINT)
             AS d_num, MAX(t.n_a) AS n_a, MAX(t.n_b) AS n_b
      FROM cum, tot t
    )
    SELECT n_a, n_b, d_num,
           CAST(1000000 * d_num // (n_a * n_b) AS BIGINT) AS d_ppm,
           CAST(d_num AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d_stat,
           CAST(CAST(d_num AS DOUBLE)
                  / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                > CAST(1.358 AS DOUBLE)
                  * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
               AS INTEGER) AS reject_05
    FROM d
"""


# Mann-Whitney decision tail: ONE expression string (in the FINAL
# column names n_a, n_b, u2_a, tie_sum) pasted into both the Spark
# plan and the DuckDB oracle (the regress.py single-source discipline)
# so the IEEE association is identical by construction.
_MW_Z = (
    "((CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
    " / (CAST(2 AS DOUBLE) * sqrt("
    "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(12 AS DOUBLE))"
    " * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + CAST(1 AS DOUBLE))"
    " - CAST(tie_sum AS DOUBLE)"
    " / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
    " * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)"
    " - CAST(1 AS DOUBLE)))))))"
)


def mann_whitney_from_value_counts(per_v: DataFrame) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) decision tail from the SAME
    per-cent-value cohort count table the KS gate folds — the two
    location-shift gates share one streamed state.

    Exact integers throughout the statistic (Mann & Whitney 1947;
    tie-corrected normal approximation per standard references): with
    values ordered and cumb(v) = pooled count before v, the DOUBLED
    average rank of v's tie block is 2·cumb + cnt + 1 (an integer), so
    2R_A = Σ ca·(2·cumb + cnt + 1) and the doubled statistic
    u2_a = 2U_A = 2R_A − n_a(n_a+1) are exact (DECIMAL(38,0)
    accumulators; the tie term Σ(t³−t) wraps int64 once a tie block
    reaches ~2e6 rows, hence decimal). Only the z-score divides — the
    fixed IEEE string _MW_Z shared verbatim with the oracle (sqrt is
    correctly rounded; no transcendental). reject_05: |z| > 1.96.

    Scale shape: one groupBy(cents) + the distributed two-phase global
    cumsum + a 1-row aggregate — the KS plan with a different tail.
    Columns: n_a, n_b, u2_a, tie_sum, z, reject_05."""
    from .ranking import with_global_cumsum

    staged = per_v.select(
        "v", "ca", "cb", (F.col("ca") + F.col("cb")).alias("cnt"))
    cum = with_global_cumsum(staged, ["v"], "cnt", "cumall")
    tot = per_v.agg(F.sum("ca").cast("long").alias("n_a"),
                    F.sum("cb").cast("long").alias("n_b"))
    parts = (cum.select(
        "ca", (F.col("cumall") - F.col("cnt")).alias("cumb"), "cnt")
        .agg(
            F.sum(F.expr("CAST(ca AS DECIMAL(38,0))"
                         " * (2 * cumb + cnt + 1)")).alias("r2a"),
            F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt"
                         " - cnt")).alias("tsum"),
        ))
    stats = (parts.crossJoin(F.broadcast(tot))
             .select(
                 "n_a", "n_b",
                 F.expr("CAST(CAST(r2a - CAST(n_a AS DECIMAL(38,0))"
                        " * (n_a + 1) AS DECIMAL(38,0)) AS BIGINT)")
                 .alias("u2_a"),
                 F.col("tsum").cast("long").alias("tie_sum")))
    return stats.select(
        "n_a", "n_b", "u2_a", "tie_sum",
        F.expr(_MW_Z).alias("z"),
        F.expr(f"CAST(abs({_MW_Z}) > CAST(1.96 AS DOUBLE) AS INT)")
        .alias("reject_05"),
    )


def mann_whitney_value_shift(events: DataFrame, type_a: str = "click",
                             type_b: str = "purchase") -> DataFrame:
    """Mann-Whitney U location-shift gate between two cohorts' value
    distributions — the rank test that stays valid when KS's
    whole-distribution alternative is too broad; shares
    :func:`ks_value_counts`'s fold-able count table (and hence the
    streamed twin's state). Columns: n_a, n_b, u2_a, tie_sum, z,
    reject_05."""
    return mann_whitney_from_value_counts(
        ks_value_counts(events, type_a, type_b))


def mann_whitney_sql(counts_cte: str) -> str:
    """DuckDB twin of :func:`mann_whitney_from_value_counts` over a
    ``counts_cte`` producing (v, ca, cb) — same exact integer ranks,
    same _MW_Z decision string."""
    return f"""
        WITH per_v AS ({counts_cte}),
        cum AS (
          SELECT ca, cb, ca + cb AS cnt,
                 SUM(ca + cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cumall
          FROM per_v
        ),
        tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
                       CAST(SUM(cb) AS BIGINT) AS n_b FROM per_v),
        parts AS (
          SELECT SUM(CAST(ca AS HUGEINT)
                     * (2 * (cumall - cnt) + cnt + 1)) AS r2a,
                 SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tsum
          FROM cum
        ),
        stats AS (
          SELECT t.n_a, t.n_b,
                 CAST(p.r2a - CAST(t.n_a AS HUGEINT) * (t.n_a + 1)
                      AS BIGINT) AS u2_a,
                 CAST(p.tsum AS BIGINT) AS tie_sum
          FROM parts p, tot t
        )
        SELECT n_a, n_b, u2_a, tie_sum,
               {_MW_Z} AS z,
               CAST(abs({_MW_Z}) > CAST(1.96 AS DOUBLE) AS INTEGER)
                 AS reject_05
        FROM stats
    """


KS_VALUE_COUNTS_SQL = """
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
"""


def auc_from_value_counts(per_v: DataFrame) -> DataFrame:
    """Exact ROC-AUC from a (v, ca, cb) score-value count table
    (ca = positives at score v, cb = negatives) via the Mann-Whitney
    identity AUC = U_A / (n_pos · n_neg) with half credit for ties —
    the standard exact formulation (Hanley & McNeil 1982; public
    method). Reuses the rank-sum spelling
    :func:`mann_whitney_from_value_counts` pins: the DOUBLED statistic
    u2 = 2·U_A is an exact integer built from tie-block average ranks
    (2·cumall_before + cnt + 1), so AUC = u2 / (2·n_pos·n_neg) is one
    IEEE double division of exact integers, and auc_ppm is the pure
    floor (500000·u2) DIV (n_pos·n_neg) (u2 ≥ 0 — truncation == floor).

    Scale shape: one groupBy(v) upstream of this tail + the two-phase
    distributed global cumsum + a 1-row aggregate — the KS/MW plan.
    The count table is exactly ADDITIVE under corpus partition, so the
    streamed twin folds it and shares this oracle.
    Columns: n_pos, n_neg, u2, auc_ppm, auc."""
    from .ranking import with_global_cumsum

    staged = per_v.select(
        "v", "ca", "cb", (F.col("ca") + F.col("cb")).alias("cnt"))
    cum = with_global_cumsum(staged, ["v"], "cnt", "cumall")
    tot = per_v.agg(F.sum("ca").cast("long").alias("n_pos"),
                    F.sum("cb").cast("long").alias("n_neg"))
    parts = cum.select(
        "ca", (F.col("cumall") - F.col("cnt")).alias("before"), "cnt"
    ).agg(F.sum(F.expr("CAST(ca AS DECIMAL(38,0))"
                       " * (2 * before + cnt + 1)")).alias("r2a"))
    return (parts.crossJoin(F.broadcast(tot))
            .select(
                "n_pos", "n_neg",
                F.expr("CAST(CAST(r2a - CAST(n_pos AS DECIMAL(38,0))"
                       " * (n_pos + 1) AS DECIMAL(38,0)) AS BIGINT)")
                .alias("u2"))
            .select(
                "n_pos", "n_neg", "u2",
                # ppm tail in DECIMAL(38,0) (r12 ADVICE): 500000·u2
                # with u2 ≤ 2·n_pos·n_neg wraps BIGINT once
                # n_pos·n_neg > ~9.2e12 — well inside 100 TB cohorts
                F.expr("CAST((CAST(500000 AS DECIMAL(38,0)) * u2)"
                       " DIV (CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                       " AS BIGINT)").alias("auc_ppm"),
                F.expr("CAST(u2 AS DOUBLE) / (CAST(2 AS DOUBLE)"
                       " * CAST(n_pos AS DOUBLE)"
                       " * CAST(n_neg AS DOUBLE))").alias("auc")))


def auc_sql(counts_cte: str) -> str:
    """DuckDB twin of :func:`auc_from_value_counts` over a
    ``counts_cte`` producing (v, ca, cb) — same exact doubled rank-sum,
    same one-divide tail."""
    return f"""
        WITH per_v AS ({counts_cte}),
        cum AS (
          SELECT ca, cb, ca + cb AS cnt,
                 SUM(ca + cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cumall
          FROM per_v
        ),
        tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_pos,
                       CAST(SUM(cb) AS BIGINT) AS n_neg FROM per_v),
        parts AS (
          SELECT SUM(CAST(ca AS HUGEINT)
                     * (2 * (cumall - cnt) + cnt + 1)) AS r2a
          FROM cum
        ),
        stats AS (
          SELECT t.n_pos, t.n_neg,
                 CAST(p.r2a - CAST(t.n_pos AS HUGEINT) * (t.n_pos + 1)
                      AS BIGINT) AS u2
          FROM parts p, tot t
        )
        SELECT n_pos, n_neg, u2,
               CAST((500000 * CAST(u2 AS HUGEINT))
                    // (CAST(n_pos AS HUGEINT) * n_neg)
                    AS BIGINT) AS auc_ppm,
               CAST(u2 AS DOUBLE) / (CAST(2 AS DOUBLE)
                 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
        FROM stats
    """


def cliffs_delta_from_value_counts(per_v: DataFrame) -> DataFrame:
    """Cliff's delta ordinal effect size from the SAME (v, ca, cb)
    cohort count table the KS/Mann-Whitney gates fold — the magnitude
    companion to their significance verdicts (Cliff 1993; magnitude
    thresholds |d| < 0.147 negligible / < 0.33 small / < 0.474 medium
    per Romano et al. 2006; public method): d = (#(a>b) − #(a<b)) /
    (n_a·n_b), with #(a>b) = Σ_v ca(v)·cumb_before(v) and #(a<b) =
    Σ_v ca(v)·(n_b − cumb_incl(v)) — exact integer pair counts off one
    distributed cumsum of cb. The magnitude class compares in CLEARED
    integer form (1000·|gt−lt| vs threshold·n_a·n_b scaled to ppt), so
    no float ever decides a label; d itself is one IEEE division.
    Columns: n_a, n_b, gt_pairs, lt_pairs, delta, magnitude."""
    from .ranking import with_global_cumsum

    cum = with_global_cumsum(per_v, ["v"], "cb", "cumb")
    tot = per_v.agg(F.sum("ca").cast("long").alias("n_a"),
                    F.sum("cb").cast("long").alias("n_b"))
    parts = (cum.crossJoin(F.broadcast(tot))
             .agg(
                 F.sum(F.expr("CAST(ca AS DECIMAL(38,0))"
                              " * (cumb - cb)")).alias("gt_d"),
                 F.sum(F.expr("CAST(ca AS DECIMAL(38,0))"
                              " * (n_b - cumb)")).alias("lt_d"),
                 F.first("n_a").alias("n_a"),
                 F.first("n_b").alias("n_b")))
    # magnitude compares in DECIMAL(38,0) (r12 ADVICE): both sides are
    # ≤ ~n_a·n_b·1000, past BIGINT once n_a·n_b > ~9.2e15
    _d = "CAST(1000 AS DECIMAL(38,0)) * abs(gt_pairs - lt_pairs)"
    _t = "CAST(n_a AS DECIMAL(38,0)) * n_b"
    mag = (f"CASE WHEN {_d} < 147 * ({_t}) THEN 'negligible'"
           f" WHEN {_d} < 330 * ({_t}) THEN 'small'"
           f" WHEN {_d} < 474 * ({_t}) THEN 'medium'"
           " ELSE 'large' END")
    return (parts.select(
        "n_a", "n_b",
        F.col("gt_d").cast("long").alias("gt_pairs"),
        F.col("lt_d").cast("long").alias("lt_pairs"))
        .select(
            "n_a", "n_b", "gt_pairs", "lt_pairs",
            F.expr("(CAST(gt_pairs AS DOUBLE) - CAST(lt_pairs AS DOUBLE))"
                   " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))")
            .alias("delta"),
            F.expr(mag).alias("magnitude")))


def cliffs_delta_value_shift(events: DataFrame, type_a: str = "click",
                             type_b: str = "purchase") -> DataFrame:
    """Cliff's delta between two cohorts' value distributions — shares
    :func:`ks_value_counts`'s fold-able count table (and hence the
    streamed twin's state with the KS and Mann-Whitney gates).
    Columns: n_a, n_b, gt_pairs, lt_pairs, delta, magnitude."""
    return cliffs_delta_from_value_counts(
        ks_value_counts(events, type_a, type_b))


def cliffs_delta_sql(counts_cte: str) -> str:
    """DuckDB twin of :func:`cliffs_delta_from_value_counts` — same
    exact pair counts, same cleared-integer magnitude thresholds."""
    return f"""
        WITH per_v AS ({counts_cte}),
        cum AS (
          SELECT ca, cb,
                 SUM(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cumb
          FROM per_v
        ),
        tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
                       CAST(SUM(cb) AS BIGINT) AS n_b FROM per_v),
        parts AS (
          SELECT CAST(SUM(CAST(ca AS HUGEINT) * (cumb - cb))
                      AS BIGINT) AS gt_pairs,
                 CAST(SUM(CAST(ca AS HUGEINT)
                          * ((SELECT n_b FROM tot) - cumb))
                      AS BIGINT) AS lt_pairs
          FROM cum
        )
        SELECT t.n_a, t.n_b, p.gt_pairs, p.lt_pairs,
               (CAST(p.gt_pairs AS DOUBLE) - CAST(p.lt_pairs AS DOUBLE))
                 / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE))
                 AS delta,
               CASE WHEN 1000 * abs(CAST(p.gt_pairs AS HUGEINT)
                                    - p.lt_pairs)
                         < 147 * CAST(t.n_a AS HUGEINT) * t.n_b
                         THEN 'negligible'
                    WHEN 1000 * abs(CAST(p.gt_pairs AS HUGEINT)
                                    - p.lt_pairs)
                         < 330 * CAST(t.n_a AS HUGEINT) * t.n_b
                         THEN 'small'
                    WHEN 1000 * abs(CAST(p.gt_pairs AS HUGEINT)
                                    - p.lt_pairs)
                         < 474 * CAST(t.n_a AS HUGEINT) * t.n_b
                         THEN 'medium'
                    ELSE 'large' END AS magnitude
        FROM parts p, tot t
    """
