"""Language identification as a second classifier head — the fasttext
lang-id shape (Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification"; public method): hashed character-n-gram features, one
linear scorer per language, map-side argmax per document.

This is the one standard LLM-pipeline gate the quality classifier
(operators/classify.py) does not spell: corpus routing / per-language
mixture control needs a lang decision per document BEFORE the quality
and dedup tiers partition by language.

Engine-exact training (no model artifacts exist in the container, and
a real deployment would swap in its trained weights — same plan shape):
the weights ARE per-language n-gram statistics learned from the even
half of the corpus — w(lang, bucket) = ppm P(bucket | lang), an exact
integer (1e6·cnt DIV total). Scoring is an exact BIGINT dot product;
the argmax tie-breaks (score DESC, lang ASC). Every degree of freedom
is integer + md5, so scores, predictions, and the confusion matrix are
hash-checkable cross-engine.

Scale shape: training is one explode + one (lang, bucket) groupBy
(map-side partial agg; |langs|·dim output rows — a broadcast ARTIFACT
at any corpus size). Scoring is one explode + one (doc_id, bucket)
groupBy, a broadcast join against the weight table (multiplies rows by
|langs|, bounded), one (doc_id, lang) partial-agged groupBy, and a
per-doc |langs|-row window (WindowGroupLimit pushes the rank map-side).
No all-pairs anything; the corpus is scanned once per pass.

Reference parity: extends the reference's derive-a-signal-per-record
surface (/root/reference/src/main/java/com/soto/FilterBlackList.java:
40-55) with model-based routing, like operators/classify.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_spark.sources.batch import widen

_DIM = 128   # hashed char-trigram buckets
_PPM = 1_000_000

# trained weight-table memo across queries in one session (the lm.py
# _COUNTS_CACHE discipline — train once, serve the scorer, the
# confusion eval, and the streamed router's broadcast artifact; the
# |langs|·dim-row table is bounded by construction)
_WEIGHTS_CACHE: dict = {}


def char_ngram_buckets(docs: DataFrame, dim: int = _DIM,
                       key_col: str = "doc_id") -> DataFrame:
    """Per-``key_col`` hashed char-TRIGRAM counts (key, bucket, cnt):
    each word is padded '<w>' (the fasttext boundary markers — a
    1-char word still yields one trigram), trigrams hash md5-first-8-
    hex mod ``dim`` (bit-identical in DuckDB, the hashed_bow contract).
    Long form is the scale-correct sparse spelling. Keyed by doc_id for
    scoring, by lang for training."""
    pw = F.concat(F.lit("<"), F.col("w"), F.lit(">"))
    tok = (
        widen(docs)
        .select(key_col,
                F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .select(key_col, pw.alias("pw"))
    )
    tri = tok.select(
        key_col,
        F.explode(F.expr(
            "transform(sequence(1, length(pw) - 2),"
            " i -> substring(pw, i, 3))")).alias("g"),
    )
    bucket = (
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long") % dim
    )
    return (
        tri.select(key_col, bucket.alias("bucket"))
        .groupBy(key_col, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def langid_train(docs: DataFrame, dim: int = _DIM,
                 cache_key: str | None = None) -> DataFrame:
    """Learn the per-language weight table from the EVEN-doc_id half of
    the corpus (the deterministic split idiom — train/eval leakage is a
    first-class concern, operators/sampling.py): w(lang, bucket) =
    ppm P(bucket | lang) = 1e6·cnt(lang, bucket) DIV cnt(lang), exact
    BIGINT. Output (lang, bucket, w) — |langs|·dim rows, the broadcast
    ARTIFACT a real deployment loads from its training job instead.
    ``cache_key`` memoizes the trained table across queries (r15 —
    train once, serve the scorer + confusion eval + streamed router,
    the lm.py/dsir.py artifact discipline)."""
    ck = (("langidw", docs.sparkSession.sparkContext.applicationId,
           cache_key, dim) if cache_key is not None else None)
    if ck is not None and ck in _WEIGHTS_CACHE:
        return _WEIGHTS_CACHE[ck]
    train = docs.filter(F.col("doc_id") % 2 == 0)
    counts = char_ngram_buckets(train.select("lang", "text"), dim,
                                key_col="lang")
    totals = counts.groupBy("lang").agg(F.sum("cnt").alias("total"))
    out = (
        counts.join(F.broadcast(totals), "lang")
        .select(
            "lang", "bucket",
            F.expr(f"CAST({_PPM} * cnt DIV total AS BIGINT)").alias("w"),
        )
    )
    if ck is not None:
        out = out.localCheckpoint(eager=True)
        _WEIGHTS_CACHE[ck] = out
    return out


def langid_scores(docs: DataFrame, weights: DataFrame | None = None,
                  dim: int = _DIM,
                  cache_key: str | None = None) -> DataFrame:
    """Score every document against each language head and keep the
    argmax: score = Σ_b cnt_b · w(lang, b) (exact BIGINT), prediction =
    the (score DESC, lang ASC) winner — a per-doc window over |langs|
    rows (WindowGroupLimit). Documents with no trigram (empty text)
    carry no feature rows and drop, like every BoW consumer.
    Columns: doc_id, pred_lang, score.

    (r14 note: a min(struct(-score, lang)) aggregate spelling was
    tried and REVERTED — a struct agg buffer is immutable, demoting
    the groupBy to SortAggregate, while the rank-1 window already
    plans as WindowGroupLimit with a partial per-partition limit
    before its sort. Plan-pinned by test_plans.py.)"""
    from pyspark.sql.window import Window

    if weights is None:
        weights = langid_train(docs, dim, cache_key=cache_key)
    bow = char_ngram_buckets(docs, dim)
    scored = (
        bow.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * F.col("w")).cast("long").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "score")
    )


def langid_confusion(docs: DataFrame, dim: int = _DIM,
                     cache_key: str | None = None) -> DataFrame:
    """Confusion matrix of the lang-id head on the HELD-OUT odd-doc_id
    half (trained on even — the standard eval harness shape): (lang,
    pred_lang, n_docs), fixture label vs prediction. Diagonal mass is
    the accuracy readout; integer counts, hash-exact."""
    weights = langid_train(docs, dim, cache_key=cache_key)
    eval_docs = docs.filter(F.col("doc_id") % 2 == 1)
    preds = langid_scores(eval_docs, weights=weights, dim=dim)
    return confusion_from_scores(preds, docs)


def confusion_from_scores(preds: DataFrame, docs: DataFrame) -> DataFrame:
    """The confusion-matrix tail of :func:`langid_confusion` off an
    already-scored (doc_id, pred_lang, ...) table — one-shot or the
    at-ingest router's accumulated per-batch predictions (docs are
    batch-disjoint, so the union of per-batch scores over the held-out
    half equals the one-shot eval; the stratum_allocation
    read-at-fold shape). Restricts to the odd-doc_id eval half here so
    a full-corpus scored table can be passed as-is."""
    eval_docs = docs.filter(F.col("doc_id") % 2 == 1)
    return (
        eval_docs.select("doc_id", "lang")
        .join(preds, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
