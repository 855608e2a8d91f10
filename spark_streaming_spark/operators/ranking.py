"""Distributed exact global ranking — the scale-correct spelling of
``row_number() OVER (ORDER BY ...)``.

A global window with no PARTITION BY funnels the whole dataset through
ONE task (Spark plans ``Exchange SinglePartition``) — the sequential
trap that kills exact ranking, ntile scoring, and Pareto analysis at
100 TB. The distributed discipline used here is the classic two-phase
rank every sorted-output system implements:

1. ``repartitionByRange`` on the full order key — Spark's range
   partitioner guarantees every row in partition *i* sorts before every
   row in partition *i+1* (boundaries come from sampling, but the
   RESULT is boundary-independent: only the total order matters).
2. local ``row_number`` within each range partition (parallel), plus a
   per-partition row count — a #partitions-sized table.
3. cumulative offsets over that tiny count table, broadcast back:
   ``global_rank = offset[pid] + local_rank``.

Identical result to the naive single-partition window (which is what
the DuckDB oracle runs), with rank determinism guaranteed by making the
order key TOTAL (callers must include a tie-breaking unique column).

``customer_rfm`` builds on it: the classic recency/frequency/monetary
segmentation with ntile-by-formula scores (``1 + (rank-1)·k div n`` —
the SQL-standard ntile on an exact global rank, so equal ranks can
never straddle an engine-dependent bucket boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(df: DataFrame, order_cols: list[str],
                     rank_col: str = "rank") -> DataFrame:
    """Add ``rank_col`` = exact 1-based global row_number by
    ``order_cols`` (which must be a TOTAL order — include a unique
    tie-breaker) without ever planning a single-partition exchange."""
    d = (df.repartitionByRange(*order_cols)
         .withColumn("__pid", F.spark_partition_id()))
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    local = d.withColumn("__lr", F.row_number().over(w))
    counts = local.groupBy("__pid").agg(F.count("*").alias("__c"))
    wo = (Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = counts.select(
        "__pid", (F.sum("__c").over(wo) - F.col("__c")).alias("__off"))
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, F.col("__off") + F.col("__lr"))
        .drop("__pid", "__lr", "__off")
    )


def _ntile_score(rank_col: str, n: int, k: int = 5) -> F.Column:
    """SQL-standard ntile from an exact global rank: bucket sizes differ
    by at most one, earlier ranks get the larger buckets — integer-only
    (mirrors ntile(k) exactly; DuckDB's ntile is the oracle)."""
    # ntile with remainder r = n % k: first r buckets have size q+1
    q, r = divmod(n, k)
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {r * (q + 1)}"
        f" THEN 1 + ({rank_col} - 1) DIV {q + 1}"
        f" ELSE {r} + 1 + ({rank_col} - 1 - {r * (q + 1)}) DIV {max(q, 1)}"
        f" END AS INT)")


def customer_rfm(orders: DataFrame, k: int = 5) -> DataFrame:
    """Recency/frequency/monetary segmentation of customers from their
    order history — ntile(k) scores on exact distributed global ranks
    (no single-partition window anywhere; see module docstring).

    Recency ranks ascending by days-since-last-order (most recent →
    score 1), frequency and monetary rank descending (largest → score
    1), each with the customer key as tie-breaker so every rank is
    total. Monetary sums in DECIMAL(38,2) internally and crosses the
    output boundary as BIGINT cents (the house rule: decimals never
    leave an entry — a DECIMAL(38,2) and a float64 render differently
    under hash canonicalization even when equal).

    Columns: c_custkey, recency_days, frequency, monetary_cents,
    r_score, f_score, m_score, rfm_code (= 100·r + 10·f + m)."""
    per = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
        .cast("decimal(38,2)").alias("monetary"))
    asof = orders.agg(F.max("o_orderdate").alias("__asof"))
    per = (per.join(F.broadcast(asof))
           .withColumn("recency_days",
                       F.datediff("__asof", "last_order").cast("long"))
           .drop("__asof", "last_order"))
    n = per.count()
    ranked = with_global_rank(per, ["recency_days", "o_custkey"], "__rr")
    ranked = with_global_rank(
        ranked.withColumn("__negf", -F.col("frequency")),
        ["__negf", "o_custkey"], "__fr")
    ranked = with_global_rank(
        ranked.withColumn("__negm", -F.col("monetary")),
        ["__negm", "o_custkey"], "__mr")
    return (
        ranked
        .withColumn("r_score", _ntile_score("__rr", n, k))
        .withColumn("f_score", _ntile_score("__fr", n, k))
        .withColumn("m_score", _ntile_score("__mr", n, k))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "recency_days", "frequency",
            (F.col("monetary") * 100).cast("bigint")
            .alias("monetary_cents"),
            "r_score", "f_score", "m_score",
            (F.col("r_score") * 100 + F.col("f_score") * 10
             + F.col("m_score")).cast("int").alias("rfm_code"),
        )
    )


def with_global_cumsum(df: DataFrame, order_cols: list[str],
                       value_col: str, out_col: str = "cum") -> DataFrame:
    """Exact global running sum of ``value_col`` by ``order_cols``
    (total order required) — same two-phase shape as
    :func:`with_global_rank`: local cumsums run parallel within range
    partitions, per-partition totals (a #partitions-sized table) cumsum
    once and broadcast back as offsets."""
    d = (df.repartitionByRange(*order_cols)
         .withColumn("__pid", F.spark_partition_id()))
    w = (Window.partitionBy("__pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = d.withColumn("__lc", F.sum(value_col).over(w))
    totals = local.groupBy("__pid").agg(F.sum(value_col).alias("__t"))
    wo = (Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = totals.select(
        "__pid", (F.sum("__t").over(wo) - F.col("__t")).alias("__off"))
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__lc"))
        .drop("__pid", "__lc", "__off")
    )


def with_global_cumsums(df: DataFrame, order_cols: list[str],
                        value_cols: list[str],
                        out_cols: list[str]) -> DataFrame:
    """Multi-column :func:`with_global_cumsum` in ONE two-phase pass:
    all ``value_cols`` share the single range repartition, local
    window, and broadcast offsets table — callers cumulating several
    measures over the same order (the KS/Mann-Whitney cohort counts)
    pay one range shuffle instead of one per column."""
    d = (df.repartitionByRange(*order_cols)
         .withColumn("__pid", F.spark_partition_id()))
    w = (Window.partitionBy("__pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = d.select(
        "*", *[F.sum(v).over(w).alias(f"__lc_{v}") for v in value_cols])
    totals = local.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__t_{v}") for v in value_cols])
    wo = (Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = totals.select(
        "__pid",
        *[(F.sum(f"__t_{v}").over(wo) - F.col(f"__t_{v}"))
          .alias(f"__off_{v}") for v in value_cols])
    out = local.join(F.broadcast(offsets), "__pid")
    for v, o in zip(value_cols, out_cols):
        out = out.withColumn(o, F.col(f"__off_{v}") + F.col(f"__lc_{v}"))
    return out.drop("__pid", *[f"__lc_{v}" for v in value_cols],
                    *[f"__off_{v}" for v in value_cols])


def pareto_parts(lineitem: DataFrame) -> DataFrame:
    """Pareto/ABC revenue analysis: parts ordered by discounted revenue
    descending with exact cumulative share, classed A (first 70 % of
    revenue), B (to 90 %), C (tail) — the inventory-policy classic,
    here with the distributed cumsum (no single-partition window over
    the part table).

    Revenue is exact to 4 dp: per-row discounted price quantizes to
    DECIMAL(38,4) (the house contract), per-part totals convert to
    BIGINT 1e-4 units. The share floats only in the final
    ``floor(cum/total·1e6)`` (both engines' correctly-rounded double
    ops agree; cum < 2^53 at any bench SF).

    Columns: part_id, revenue_c4, cum_share_ppm, abc_class."""
    rev4 = (F.col("l_extendedprice")
            * (1 - F.col("l_discount"))).cast("decimal(38,4)")
    per = (lineitem.groupBy(F.col("l_partkey").alias("part_id"))
           .agg((F.sum(rev4) * 10000).cast("bigint").alias("revenue_c4")))
    total = per.agg(F.sum("revenue_c4")).collect()[0][0]
    cum = with_global_cumsum(
        per.withColumn("__neg", -F.col("revenue_c4")),
        ["__neg", "part_id"], "revenue_c4", "cum_c4").drop("__neg")
    share = F.expr(
        f"CAST(FLOOR(CAST(cum_c4 AS DOUBLE) / {float(total)!r} * 1e6)"
        " AS BIGINT)")
    return cum.select(
        "part_id", "revenue_c4", share.alias("cum_share_ppm"),
        F.when(share <= 700000, "A").when(share <= 900000, "B")
        .otherwise("C").alias("abc_class"),
    )


def curriculum_stages(docs: DataFrame, k: int = 4) -> DataFrame:
    """Curriculum-learning data ordering: rank the corpus by the
    heuristic quality score (operators/textstats.quality_scores),
    best first, and cut it into ``k`` curriculum stages — stage 1 is
    the cleanest quarter a curriculum schedule trains on first. Exact
    global rank via :func:`with_global_rank` (range repartition, no
    single-partition window over the corpus) + the formula-ntile.
    Columns: doc_id, q_rank, stage."""
    from spark_streaming_spark.operators.textstats import quality_scores

    scored = quality_scores(docs).select("doc_id", "quality")
    n = scored.count()
    ranked = with_global_rank(
        scored.withColumn("__negq", -F.col("quality")),
        ["__negq", "doc_id"], "q_rank").drop("__negq", "quality")
    return ranked.select(
        "doc_id", "q_rank", _ntile_score("q_rank", n, k).alias("stage"))


def quantile_transform(df: DataFrame, value_col: str, key_cols: list[str],
                       scale_ppm: int = 1_000_000) -> DataFrame:
    """Rank-based QUANTILE TRANSFORM (the scikit QuantileTransformer
    shape with a uniform target; public method) — the outlier-immune
    normalization heavy-tailed features get before training: each row's
    value maps to its exact empirical quantile u_ppm =
    scale·rank DIV (n+1), an integer in (0, scale). Built on the exact
    DISTRIBUTED global rank (:func:`with_global_rank` — range partition
    + broadcast offsets, no single-partition exchange, plan-asserted
    there), totally ordered by (value, key) so ties are deterministic.
    Columns: key_cols..., value_col, u_ppm.

    Everything is integer-exact (rank, the DIV), so the transform is
    hash-checkable cross-engine; the inverse map (quantile → value) is
    the same table read backwards."""
    n = df.count()   # 1-scalar driver fetch, sanctioned
    ranked = with_global_rank(df, [value_col, *key_cols], "__r")
    return ranked.select(
        *key_cols, value_col,
        F.expr(f"CAST({scale_ppm} * __r DIV {n + 1} AS BIGINT)")
        .alias("u_ppm"),
    )


def revenue_gini(orders: DataFrame) -> DataFrame:
    """Gini coefficient of per-customer revenue — the inequality
    headline ("what share of revenue sits with the top customers")
    computed EXACTLY in integers via the sorted-multiset identity
    (public formula):

        G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx),   i = ascending rank

    Per-customer cents are exact DECIMAL(38,2)·100 BIGINTs; ranks come
    from the DISTRIBUTED two-phase global rank (no single-task sort);
    Σ i·x_i accumulates as DECIMAL(38,0); the ppm output is one
    decimal-widened scaled DIV. Ties order by (cents, custkey) — a
    total order, and the Gini value is tie-order-invariant.
    Columns: n_customers, total_cents, gini_ppm."""
    return gini_from_customer_cents(customer_cents(orders))


def customer_cents(orders: DataFrame) -> DataFrame:
    """Per-customer revenue cents — exactly ADDITIVE under order
    partition (a sum table), the streamed-Gini fold input.
    Columns: cust, cents."""
    return (orders.groupBy(F.col("o_custkey").alias("cust"))
            .agg(F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))"
                        " * 100 AS BIGINT)").alias("cents")))


def gini_from_customer_cents(per: DataFrame) -> DataFrame:
    """:func:`revenue_gini`'s rank + identity tail from an
    already-built (or streamed-and-folded) per-customer cents table."""
    ranked = with_global_rank(per, ["cents", "cust"], "i")
    return (ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("sx"),
        F.sum(F.expr("CAST(i AS DECIMAL(38,0)) * cents")).alias("six"))
        .select(
            F.col("n").alias("n_customers"),
            F.col("sx").cast("long").alias("total_cents"),
            F.expr("CAST((CAST(1000000 AS DECIMAL(38,0))"
                   " * (2 * six - (n + 1) * sx))"
                   " div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)")
            .alias("gini_ppm")))


REVENUE_GINI_SQL = """
    WITH per AS (
      SELECT o_custkey AS cust,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) * 100
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, cust) AS i
      FROM per
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS HUGEINT) AS sx,
             SUM(CAST(i AS HUGEINT) * cents) AS six
      FROM ranked
    )
    SELECT n AS n_customers, CAST(sx AS BIGINT) AS total_cents,
           CAST((CAST(1000000 AS HUGEINT) * (2 * six - (n + 1) * sx))
                // (CAST(n AS HUGEINT) * sx) AS BIGINT) AS gini_ppm
    FROM m
"""
