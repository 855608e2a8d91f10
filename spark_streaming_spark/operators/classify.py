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


# fixed ROC/PR operating points (logit thresholds): exact double
# literals shared verbatim with the oracle — the md5 stand-in model's
# logits land in ~[-0.36, 0.34], so this grid brackets the mass
PR_THRESHOLDS = (-0.25, -0.20, -0.15, -0.10, -0.05, 0.0, 0.05, 0.10,
                 0.15)


def quality_value_counts(docs: DataFrame, dim: int = 64,
                         pos_lang: str = "en") -> DataFrame:
    """(v, ca, cb): per-logit-value label counts of the linear quality
    classifier against the ground-truth language column (positives =
    ``pos_lang`` docs) — the SHARED sufficient-statistics table of the
    ROC-AUC and PR-curve evals, exactly ADDITIVE under corpus partition
    (what the streamed twins fold). Logits are IEEE-identical by the
    classifier's contract, so equal scores tie identically on both
    engines. Columns: v, ca, cb."""
    scored = quality_logits(docs, dim).select("doc_id", "logit")
    labeled = scored.join(docs.select("doc_id", "lang"), "doc_id")
    return (labeled.groupBy(F.col("logit").alias("v"))
            .agg(F.sum(F.when(F.col("lang") == pos_lang, 1)
                       .otherwise(0)).cast("long").alias("ca"),
                 F.sum(F.when(F.col("lang") != pos_lang, 1)
                       .otherwise(0)).cast("long").alias("cb")))


def quality_auc(docs: DataFrame, dim: int = 64,
                pos_lang: str = "en") -> DataFrame:
    """Exact ROC-AUC of the quality classifier as a detector of
    ``pos_lang`` — the threshold-free eval completing the classifier
    tier (scores → calibration → AUC), via the Mann-Whitney identity
    over the shared value-count table (profile.auc_from_value_counts).
    Columns: n_pos, n_neg, u2, auc_ppm, auc."""
    from spark_streaming_spark.operators.profile import (
        auc_from_value_counts)

    return auc_from_value_counts(quality_value_counts(docs, dim,
                                                      pos_lang))


def pr_from_value_counts(per_v: DataFrame) -> DataFrame:
    """Precision/recall/F1 at the fixed ``PR_THRESHOLDS`` operating
    points from a (v, ca, cb) score-value count table: tp(t) =
    Σ_{v>t} ca etc. — exact integer counts (one cross of the count
    table with the 9-literal threshold array, then one 9-group
    aggregate), metrics in pure floor-ppm ((1e6·tp) DIV (tp+fp), F1 =
    (2·p·r) DIV (p+r) on the ppm integers — all quantities
    nonnegative, truncation == floor). Undefined precision (no
    predicted positives) is NULL, never 0/0.
    Columns: thr, tp, fp, fn, precision_ppm, recall_ppm, f1_ppm."""
    thr = F.explode(F.array(*[F.lit(float(t))
                              for t in PR_THRESHOLDS])).alias("thr")
    crossed = per_v.select("v", "ca", "cb", thr)
    agg = (crossed.groupBy("thr")
           .agg(F.sum(F.when(F.col("v") > F.col("thr"), F.col("ca"))
                      .otherwise(0)).cast("long").alias("tp"),
                F.sum(F.when(F.col("v") > F.col("thr"), F.col("cb"))
                      .otherwise(0)).cast("long").alias("fp"),
                F.sum(F.when(F.col("v") <= F.col("thr"), F.col("ca"))
                      .otherwise(0)).cast("long").alias("fn")))
    return agg.select(
        "thr", "tp", "fp", "fn",
        F.expr("CASE WHEN tp + fp > 0 THEN"
               " CAST(1000000 * tp AS BIGINT) div (tp + fp) END")
        .alias("precision_ppm"),
        F.expr("CASE WHEN tp + fn > 0 THEN"
               " CAST(1000000 * tp AS BIGINT) div (tp + fn) END")
        .alias("recall_ppm"),
        F.expr("CASE WHEN tp + fp > 0 AND tp + fn > 0"
               " AND (CAST(1000000 * tp AS BIGINT) div (tp + fp))"
               "   + (CAST(1000000 * tp AS BIGINT) div (tp + fn)) > 0"
               " THEN (2 * (CAST(1000000 * tp AS BIGINT) div (tp + fp))"
               "         * (CAST(1000000 * tp AS BIGINT) div (tp + fn)))"
               "  div ((CAST(1000000 * tp AS BIGINT) div (tp + fp))"
               "     + (CAST(1000000 * tp AS BIGINT) div (tp + fn)))"
               " END").alias("f1_ppm"))


def classifier_pr_curve(docs: DataFrame, dim: int = 64,
                        pos_lang: str = "en") -> DataFrame:
    """PR curve of the quality classifier over the shared value-count
    table — same folded state as :func:`quality_auc`'s streamed twin.
    Columns: thr, tp, fp, fn, precision_ppm, recall_ppm, f1_ppm."""
    return pr_from_value_counts(quality_value_counts(docs, dim,
                                                     pos_lang))


def pr_curve_sql(counts_cte: str) -> str:
    """DuckDB twin of :func:`pr_from_value_counts` over a
    ``counts_cte`` producing (v, ca, cb) — identical threshold
    literals, identical floor-ppm algebra."""
    lits = ", ".join(f"CAST({t!r} AS DOUBLE)" for t in PR_THRESHOLDS)
    return f"""
        WITH per_v AS ({counts_cte}),
        thrs AS (SELECT unnest([{lits}]) AS thr),
        agg AS (
          SELECT t.thr,
                 CAST(SUM(CASE WHEN p.v > t.thr THEN p.ca ELSE 0 END)
                      AS BIGINT) AS tp,
                 CAST(SUM(CASE WHEN p.v > t.thr THEN p.cb ELSE 0 END)
                      AS BIGINT) AS fp,
                 CAST(SUM(CASE WHEN p.v <= t.thr THEN p.ca ELSE 0 END)
                      AS BIGINT) AS fn
          FROM per_v p CROSS JOIN thrs t
          GROUP BY 1
        )
        SELECT thr, tp, fp, fn,
               CASE WHEN tp + fp > 0
                    THEN CAST(1000000 * tp // (tp + fp) AS BIGINT)
               END AS precision_ppm,
               CASE WHEN tp + fn > 0
                    THEN CAST(1000000 * tp // (tp + fn) AS BIGINT)
               END AS recall_ppm,
               CASE WHEN tp + fp > 0 AND tp + fn > 0
                    AND (1000000 * tp // (tp + fp))
                      + (1000000 * tp // (tp + fn)) > 0
                    THEN CAST((2 * (1000000 * tp // (tp + fp))
                                 * (1000000 * tp // (tp + fn)))
                              // ((1000000 * tp // (tp + fp))
                                + (1000000 * tp // (tp + fn)))
                              AS BIGINT)
               END AS f1_ppm
        FROM agg
    """
