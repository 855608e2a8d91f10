"""DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling";
public method): estimate how much more likely each document is under a
TARGET distribution than under the raw SOURCE distribution, using
fixed-width hashed n-gram bag-of-words features, then resample the
corpus toward the target with a deterministic content-hash draw.

Model, exactly as in the paper adapted to integer arithmetic:

    features(x)    = hashed unigrams + bigrams, bucket = h(f) mod B
    log w(x)       = Σ_b n_b(x) · [log p_tgt(b) − log p_src(b)]
    p_·(b)         = (c_·(b) + 1) / (N_· + B)        (Laplace)

Engine-exactness discipline (the operators/lm.py rule: no libm, no
float anywhere): log2 is evaluated through a PINNED floor-ppm literal
table — ``L(x) = 10⁶·e + _LOG2_MANT_PPM[j]`` where ``e`` is the top
bit position (``length(bin(x)) - 1``, exact in both engines) and
``j`` is the next five mantissa bits (``(x·32) DIV 2^e − 32``). The
32 mantissa literals are ``floor(10⁶·(log2(32+j) − 5))`` — the NDCG
discount-table discipline (operators/basket.py): literals in source,
revalidated by a test, interpolated into BOTH engine strings so the
log can never drift between them. Max quantization error is one
mantissa step (≈ 44394 ppm of a factor 2) — far inside what an
importance RANKING needs, and bit-identical everywhere. The per-
bucket log-ratio decomposes into four single-operand logs,

    lw_ppm(b) = (L(c_t+1) − L(N_t+B)) − (L(c_s+1) − L(N_s+B)),

so every L operand is a plain BIGINT count — no N² products, no
DECIMAL promotion needed (the ``x·32`` mantissa step bounds the
operand at 2^57 ≈ 1.4e17 tokens, ~5000× a 100 TB corpus).

Resampling: acceptance is the clamped-linear-in-log profile
``accept_ppm = clamp(500000 + mean_lw_ppm, 0, 10⁶)`` — monotone in
the true importance weight, bounded, integer — drawn by the
operators/sampling.py content-hash rule (md5, salt 'dsir'), so the
sample is stable under repartitioning, retries, and scale-up.

The per-doc mean divides a possibly NEGATIVE sum: Spark's DIV
truncates toward zero while DuckDB's ``//`` floors, so the mean is
computed on the OFFSET-shifted non-negative sum
``(lw_sum + 64·10⁶·n_feats) DIV n_feats − 64·10⁶`` (|lw_ppm| < 63·10⁶
by construction: each L lies in [0, 63·10⁶]).

Scale shape (100 TB): feature extraction is map-side (one explode of
the per-doc token+bigram array); the corpus touches exactly TWO
shuffles — one partial-agged groupBy to (doc_id, bucket) counts and
one doc-keyed aggregation of the scored rows. The trained artifact is
the B-row bucket-total table (B = 1024 PINNED at birth), bounded by
construction, so its broadcast is mandatory (tests/
test_broadcast_hints.py sanctions fixed-width artifacts); it is
memoized across the gate and the streamed twin's read tail
(``cache_key``, the lm.py _COUNTS_CACHE discipline), and it is
ADDITIVE under corpus partition, so the streamed twin folds exactly
this table. Bigram halves join on chr(1) (the textstats.py Gopher
separator rule — spelled as the chr(1) FUNCTION, never a raw byte).

Reference context: the reference repo (C++/Java DStream tutorial
pipelines, src/main/java/com/soto/) has no data-selection surface —
this is part of the LLM-training-data extension (SURVEY.md §2.12),
next to the CCNet-style LM gate (operators/lm.py) and the
discriminative quality classifier (operators/classify.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DSIR_BUCKETS = 1024          # fixed feature width B, pinned at birth
DSIR_BASE_ACCEPT_PPM = 500_000
_MEAN_OFFSET_PPM = 64_000_000  # > max |lw_ppm|; makes the DIV operand
                               # non-negative (Spark DIV vs DuckDB //)

# floor(10^6 * (log2(32 + j) - 5)) for j = 0..31 — PINNED literals,
# revalidated against math.log2 by tests/test_dsir.py
_LOG2_MANT_PPM = (
    0, 44394, 87462, 129283, 169925, 209453, 247927, 285402,
    321928, 357552, 392317, 426264, 459431, 491853, 523561, 554588,
    584962, 614709, 643856, 672425, 700439, 727920, 754887, 781359,
    807354, 832890, 857980, 882643, 906890, 930737, 954196, 977279,
)

# trained bucket-total memo across queries in one session (the lm.py
# _COUNTS_CACHE discipline — train once, serve gate + streamed reader)
_TOTALS_CACHE: dict = {}


def log2_ppm_sql(x: str, div: str = "DIV") -> str:
    """Floor-ppm log2 of the positive BIGINT expression ``x`` as SQL
    text shared by BOTH engines (pass div='//' for DuckDB): top-bit
    exponent via length(bin(x)), 5 mantissa bits via the pinned
    literal CASE table."""
    mant = " ".join(f"WHEN {j} THEN {v}"
                    for j, v in enumerate(_LOG2_MANT_PPM))
    e = f"(length(bin({x})) - 1)"
    j = f"((({x}) * 32) {div} CAST(pow(2, {e}) AS BIGINT) - 32)"
    return f"(1000000 * {e} + CASE {j} {mant} END)"


def doc_bucket_counts(docs: DataFrame,
                      dim: int = DSIR_BUCKETS) -> DataFrame:
    """Hashed unigram+bigram feature counts per doc in long form
    (doc_id, lang, bucket, cnt) — the hashed_bow shape widened to
    bigrams. Map-side explode + ONE partial-agged groupBy; md5-first-
    8-hex bucketing so the bucket is bit-identical in DuckDB (the
    textstats.hashed_bow rule). Empty docs emit nothing (both
    engines). Columns: doc_id, lang, bucket, cnt."""
    feats = (
        docs.select(
            "doc_id", "lang",
            F.expr("filter(split(text, ' '), t -> t <> '')").alias("a"))
        .filter(F.expr("size(a) >= 1"))
        .select(
            "doc_id", "lang",
            F.explode(F.expr(
                "concat(a, zip_with("
                " slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),"
                " (x, y) -> concat(x, chr(1), y)))")).alias("f"))
    )
    bucket = (F.conv(F.substring(F.md5("f"), 1, 8), 16, 10)
              .cast("long") % dim)
    return (feats.select("doc_id", "lang", bucket.alias("bucket"))
            .groupBy("doc_id", "lang", "bucket")
            .agg(F.count("*").cast("long").alias("cnt")))


def bucket_totals(docs: DataFrame, target_lang: str = "en",
                  dim: int = DSIR_BUCKETS,
                  cache_key: str | None = None,
                  db: DataFrame | None = None) -> DataFrame:
    """The trained artifact: per-bucket feature totals under the
    TARGET slice (lang = target_lang — the in-domain proxy, as the LM
    gate trains on the en subset) and under the full SOURCE corpus.
    B rows, ADDITIVE under corpus partition (the streamed twin folds
    exactly this). ``db``: an already-computed doc_bucket_counts table
    to total instead of re-running the feature pass (the batch entry
    shares ONE pass between training and scoring — r15, guide §3.3).
    Columns: bucket, tgt_c, src_c."""
    ck = (("dsirtot", docs.sparkSession.sparkContext.applicationId,
           cache_key, target_lang, dim)
          if cache_key is not None else None)
    if ck is not None and ck in _TOTALS_CACHE:
        return _TOTALS_CACHE[ck]
    if db is None:
        db = doc_bucket_counts(docs, dim)
    tot = (db.groupBy("bucket")
           .agg(F.sum(F.when(F.col("lang") == target_lang,
                             F.col("cnt")).otherwise(F.lit(0)))
                .cast("long").alias("tgt_c"),
                F.sum("cnt").cast("long").alias("src_c")))
    if ck is not None:
        tot = tot.localCheckpoint(eager=True)
        _TOTALS_CACHE[ck] = tot
    return tot


def bucket_log_ratios(totals: DataFrame,
                      dim: int = DSIR_BUCKETS) -> DataFrame:
    """B-row per-bucket floor-ppm log2 importance ratios off the
    trained totals. Columns: bucket, tgt_c, src_c, lw_ppm."""
    n = totals.agg(F.sum("tgt_c").cast("long").alias("n_t"),
                   F.sum("src_c").cast("long").alias("n_s"))
    lw = (f"CAST(({log2_ppm_sql('tgt_c + 1')}"
          f" - {log2_ppm_sql(f'n_t + {dim}')})"
          f" - ({log2_ppm_sql('src_c + 1')}"
          f" - {log2_ppm_sql(f'n_s + {dim}')}) AS BIGINT)")
    # 1-row scalar: mandatory broadcast is sanctioned (bounded)
    return (totals.crossJoin(F.broadcast(n))
            .select("bucket", "tgt_c", "src_c", F.expr(lw).alias("lw_ppm")))


def dsir_weights_from_totals(docs: DataFrame, totals: DataFrame,
                             dim: int = DSIR_BUCKETS,
                             base_accept_ppm: int = DSIR_BASE_ACCEPT_PPM,
                             db: DataFrame | None = None) -> DataFrame:
    """Score EVERY document against a trained (bucket, tgt_c, src_c)
    total table and draw the resampling decision. Shared verbatim by
    the batch entry and the streamed twin's read tail (totals are
    additive — the folded state equals the batch table). The weight
    table is B-row bounded ⇒ mandatory broadcast. ``db``: an already-
    computed (and materialized) doc_bucket_counts table to score
    instead of re-running the feature pass. Columns: doc_id,
    lang, n_feats, lw_sum_ppm, mean_lw_ppm, accept_ppm, sampled."""
    w = bucket_log_ratios(totals, dim).select("bucket", "lw_ppm")
    off = _MEAN_OFFSET_PPM
    h = ("CAST(conv(substring(md5(concat('dsir#',"
         " CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    return (
        (doc_bucket_counts(docs, dim) if db is None else db)
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum("cnt").cast("long").alias("n_feats"),
             F.sum(F.col("cnt") * F.col("lw_ppm")).cast("long")
             .alias("lw_sum_ppm"))
        .select(
            "doc_id", "lang", "n_feats", "lw_sum_ppm",
            F.expr(f"(lw_sum_ppm + CAST({off} AS BIGINT) * n_feats)"
                   f" DIV n_feats - {off}").alias("mean_lw_ppm"))
        .select(
            "doc_id", "lang", "n_feats", "lw_sum_ppm", "mean_lw_ppm",
            F.expr(f"LEAST(CAST(1000000 AS BIGINT),"
                   f" GREATEST(CAST(0 AS BIGINT),"
                   f" {base_accept_ppm} + mean_lw_ppm))")
            .alias("accept_ppm"))
        .select(
            "doc_id", "lang", "n_feats", "lw_sum_ppm", "mean_lw_ppm",
            "accept_ppm",
            F.expr(f"CAST({h} % 1000000 < accept_ppm AS INTEGER)")
            .alias("sampled"))
    )


def dsir_importance_weights(docs: DataFrame, target_lang: str = "en",
                            dim: int = DSIR_BUCKETS,
                            base_accept_ppm: int = DSIR_BASE_ACCEPT_PPM,
                            cache_key: str | None = None) -> DataFrame:
    """Batch entry: train the bucket-total table on the target slice
    vs the full corpus, score and resample every document. Columns:
    doc_id, lang, n_feats, lw_sum_ppm, mean_lw_ppm, accept_ppm,
    sampled.

    The (doc_id, lang, bucket, cnt) feature table is computed ONCE and
    materialized: training totals and per-doc scoring both consume it,
    and without the checkpoint the explode-heavy feature pass ran
    twice — once under the totals build, once under the scoring join
    (r15, guide §3.3: materialize reused staging intermediates; at
    100 TB this is the index build's staging write)."""
    db = doc_bucket_counts(docs, dim).localCheckpoint(eager=True)
    return dsir_weights_from_totals(
        docs, bucket_totals(docs, target_lang, dim, cache_key=cache_key,
                            db=db),
        dim, base_accept_ppm, db=db)


def dsir_sql(target_lang: str = "en", dim: int = DSIR_BUCKETS,
             base_accept_ppm: int = DSIR_BASE_ACCEPT_PPM) -> str:
    """DuckDB twin: identical feature hash, Laplace totals, pinned
    log table (same literal text via log2_ppm_sql), offset-shifted
    mean, clamp, and md5-threshold draw."""
    off = _MEAN_OFFSET_PPM
    return f"""
        WITH tok AS (
          SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), t -> t <> '') AS a
          FROM documents
        ),
        feats AS (
          SELECT doc_id, lang,
                 unnest(list_concat(a,
                   CASE WHEN len(a) >= 2 THEN
                     list_transform(list_zip(a[1:-2], a[2:-1]),
                                    z -> z[1] || chr(1) || z[2])
                   ELSE CAST([] AS VARCHAR[]) END)) AS f
          FROM tok WHERE len(a) >= 1
        ),
        db AS (
          SELECT doc_id, lang,
                 CAST('0x' || substr(md5(f), 1, 8) AS BIGINT)
                   % {dim} AS bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM feats GROUP BY 1, 2, 3
        ),
        tot AS (
          SELECT bucket,
                 CAST(SUM(CASE WHEN lang = '{target_lang}' THEN cnt
                          ELSE 0 END) AS BIGINT) AS tgt_c,
                 CAST(SUM(cnt) AS BIGINT) AS src_c
          FROM db GROUP BY 1
        ),
        n AS (
          SELECT CAST(SUM(tgt_c) AS BIGINT) AS n_t,
                 CAST(SUM(src_c) AS BIGINT) AS n_s
          FROM tot
        ),
        w AS (
          SELECT bucket,
                 CAST(({log2_ppm_sql('tgt_c + 1', '//')}
                       - {log2_ppm_sql(f'n_t + {dim}', '//')})
                      - ({log2_ppm_sql('src_c + 1', '//')}
                         - {log2_ppm_sql(f'n_s + {dim}', '//')})
                   AS BIGINT) AS lw_ppm
          FROM tot CROSS JOIN n
        ),
        sc AS (
          SELECT doc_id, lang,
                 CAST(SUM(cnt) AS BIGINT) AS n_feats,
                 CAST(SUM(cnt * lw_ppm) AS BIGINT) AS lw_sum_ppm
          FROM db JOIN w USING (bucket)
          GROUP BY 1, 2
        ),
        m AS (
          SELECT doc_id, lang, n_feats, lw_sum_ppm,
                 CAST((lw_sum_ppm + CAST({off} AS BIGINT) * n_feats)
                      // n_feats - {off} AS BIGINT) AS mean_lw_ppm
          FROM sc
        )
        SELECT doc_id, lang, n_feats, lw_sum_ppm, mean_lw_ppm,
               CAST(LEAST(1000000, GREATEST(0,
                    {base_accept_ppm} + mean_lw_ppm)) AS BIGINT)
                 AS accept_ppm,
               CAST(CAST('0x' || substr(md5('dsir#'
                      || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                    % 1000000
                    < LEAST(1000000, GREATEST(0,
                        {base_accept_ppm} + mean_lw_ppm))
                 AS INTEGER) AS sampled
        FROM m
    """
