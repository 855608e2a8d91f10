"""Linear-model inference over hashed text features — the fasttext-style
quality classifier every corpus pipeline runs at scale (Joulin et al.
2016, "Bag of Tricks for Efficient Text Classification"; public method).

The model is a weight per hashed feature bucket. Inference is pure
column algebra over the long-form hashed bag-of-words
(``textstats.hashed_bow``): weight lookup is an EXPRESSION on the bucket
id (the weight table rides in the plan — no join, no shuffle beyond the
BoW aggregation itself), the per-doc logit is an exact integer dot
product, and the only floating-point op is one final IEEE divide — so
the scores are bit-identical on any engine, and a 100 TB scoring pass is
map-side work after one groupBy.

The reference never had model inference; this extends its map/filter
surface (/root/reference/src/main/java/FilterBlackList.java:40-55 is
the closest shape: derive a signal per record, gate on it) to the
model-based filtering a training-data pipeline needs.

Weights here are a deterministic md5-derived stand-in for a trained
model (the container has no model artifacts); a real deployment swaps
``_weight_expr`` for a broadcast join against its trained weight table —
same plan shape, same cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_spark.operators.textstats import hashed_bow

# weights live in [-1000, 1000] / 1000 — integer math until the last op
_W_MOD = 2001
_W_OFF = 1000


def _weight_expr(bucket: F.Column) -> F.Column:
    """Deterministic per-bucket weight in [-1000, 1000] (integer): the
    first 8 hex chars of md5(bucket-as-decimal-string) mod 2001, shifted.
    md5 on the decimal rendering is bit-identical in DuckDB
    (``('0x' || substr(md5(bucket::VARCHAR), 1, 8))::BIGINT``)."""
    h = F.conv(F.substring(F.md5(bucket.cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % _W_MOD) - _W_OFF


def quality_logits(docs: DataFrame, dim: int = 64,
                   threshold: float = 0.0) -> DataFrame:
    """Score every document with the linear model and gate on the logit.

    logit = (Σ_b cnt_b · w_b) / (1000 · Σ_b cnt_b) — a length-normalized
    dot product in exact BIGINTs, one final double divide (IEEE-exact,
    order-free: both sums are integer sums). ``keep`` is the filter
    decision a pipeline would apply before training.
    Columns: doc_id, dot, n_tokens, logit, keep."""
    bow = hashed_bow(docs, dim)
    scored = bow.select(
        "doc_id",
        (F.col("cnt") * _weight_expr(F.col("bucket"))).alias("contrib"),
        "cnt",
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("contrib").alias("dot"),
            F.sum("cnt").alias("n_tokens"),
        )
        .select(
            "doc_id", "dot", "n_tokens",
            (F.col("dot").cast("double")
             / (F.lit(float(_W_OFF)) * F.col("n_tokens"))).alias("logit"),
        )
        .withColumn("keep", F.col("logit") > F.lit(threshold))
    )


def weight_table(spark, dim: int = 64):
    """The trained-model ARTIFACT as a table: (bucket, w) with the same
    md5-derived weights `_weight_expr` computes inline — |buckets| rows,
    broadcastable at any corpus size. A real deployment loads this from
    its training job's output instead."""
    from pyspark.sql import functions as F  # noqa: F811 (local alias)

    buckets = spark.range(dim).select(F.col("id").cast("int").alias("bucket"))
    return buckets.withColumn("w", _weight_expr(F.col("bucket")))


def quality_logits_join(docs: DataFrame, weights: DataFrame,
                        dim: int = 64,
                        threshold: float = 0.0) -> DataFrame:
    """:func:`quality_logits` with the weights as a BROADCAST JOIN
    against a trained weight table — the production spelling the
    expression variant stands in for. Identical output (pinned in
    tests/test_classify.py): the join key is the bucket id, the small
    side is |buckets| rows, and the scoring algebra is unchanged."""
    bow = hashed_bow(docs, dim)
    scored = bow.join(F.broadcast(weights), "bucket").select(
        "doc_id", (F.col("cnt") * F.col("w")).alias("contrib"), "cnt",
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("contrib").alias("dot"), F.sum("cnt").alias("n_tokens"))
        .select(
            "doc_id", "dot", "n_tokens",
            (F.col("dot").cast("double")
             / (F.lit(float(_W_OFF)) * F.col("n_tokens"))).alias("logit"),
        )
        .withColumn("keep", F.col("logit") > F.lit(threshold))
    )


def calibration_table(docs: DataFrame, n_bins: int = 10) -> DataFrame:
    """Reliability table of the linear classifier against the Gopher
    rule gate — the standard calibration check before a cheap learned
    filter replaces an expensive rule cascade (score-decile vs observed
    pass rate; the reliability-diagram computation, public ML-eval
    method). A well-calibrated distillation shows pass rate rising
    monotonically with the logit decile.

    Exactness: deciles come from the EXACT distributed global rank over
    the total order (logit, doc_id) (operators/ranking.with_global_rank
    — no single-partition exchange) bucketed by the SQL-standard ntile
    formula (operators/ranking._ntile_score), so equal logits can never
    straddle an engine-dependent boundary; pass rates are integer ppm.
    Logits themselves are IEEE-identical by the classifier's contract.
    Columns: bin, n_docs, n_keep, keep_ppm, lo_logit, hi_logit."""
    from spark_streaming_spark.operators.pipeline import quality_filter
    from spark_streaming_spark.operators.ranking import (
        _ntile_score, with_global_rank)

    scores = quality_logits(docs).select("doc_id", "logit")
    gate = quality_filter(docs).select("doc_id", "keep")
    joined = scores.join(gate, "doc_id")
    n = joined.count()   # 1-row scalar for the ntile formula
    ranked = with_global_rank(joined, ["logit", "doc_id"], "__r")
    return (
        ranked.withColumn("bin", _ntile_score("__r", n, n_bins))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
            F.min("logit").alias("lo_logit"),
            F.max("logit").alias("hi_logit"),
        )
        .selectExpr(
            "bin", "n_docs", "n_keep",
            "CAST(n_keep * 1000000 DIV n_docs AS BIGINT) AS keep_ppm",
            "lo_logit", "hi_logit",
        )
    )
