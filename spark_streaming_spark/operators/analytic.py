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
