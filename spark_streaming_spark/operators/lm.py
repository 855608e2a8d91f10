"""Count-based n-gram language-model quality gate (CCNet-style
LM filtering; Wenzek et al. 2020 train a KenLM on a reference corpus
and gate the crawl on per-doc perplexity — public method). Scoring is
Brants et al. 2007 "stupid backoff": S(w | ctx) = c(ctx·w)/c(ctx·*)
at the longest matching order, backing off with a fixed α = 0.4
multiplier per level — no discounting, no normalization, which is
exactly what makes it count-table-shaped and engine-exact.

Engine-exactness discipline: no log and no float anywhere. Each
token's backoff score is the floor-ppm integer

    order 3:  (10⁶   · c₃) DIV ctx₂      (trigram hit)
    order 2:  (4·10⁵ · c₂) DIV ctx₁      (α·10⁶ = 400000)
    order 1:  (16·10⁴ · c₁) DIV N        (α²·10⁶ = 160000)
    OOV:      0

with every product in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) before
the final BIGINT cast (the r12-ADVICE headroom rule: c ≤ N tokens, so
10⁶·c wraps BIGINT past ~9.2e12 tokens — inside 100 TB). The per-doc
gate statistic is the integer mean token score (sum DIV n) — monotone
in the geometric-mean perplexity's job (separating in-domain text
from out-of-domain/noise) without needing log.

The whole model is ONE padded-context count table: every training
token contributes a ((w₋₂, w₋₁, w) → count) row with out-of-range
context slots padded by the empty string, so '' acts as the <s>
boundary marker and every lower order is a MARGINAL of the same
table — c₂(w₁,w) = Σ_{w₂}, ctx₁(w₁) = Σ_{w₂,w}, c₁(w) = Σ_{w₂,w₁},
N = Σ. Denominators are therefore *continuation-context* counts
(c(ctx·*) = contexts that have a next token), the self-consistent
choice for a table-derived model.

Scale shape (100 TB): the padded table is the standard distributed
LM count shape — one partial-agged groupBy of the training corpus,
partitioned by the n-gram key. Scoring touches the CORPUS-scale rows
with exactly TWO shuffles (one partial-agged groupBy to per-doc key
counts, one join back against the scored key table); the five model
equi-joins run on the distinct (w2, w1, w) key table, which is
vocabulary-trigram-scaled (vocab relations: NO mandatory broadcast
hints, per tests/test_broadcast_hints.py — AQE size-dispatches). No
driver materialization, no all-pairs path. Real deployments prune
the tail (``min_count``).

Reference context: the reference repo has no LM surface — this is
part of the LLM-training-data extension (SURVEY.md §2.12), next to
the discriminative quality classifier (operators/classify.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ALPHA_PPM = (1_000_000, 400_000, 160_000)  # α=2/5 per backoff level

# trained count-table memo across queries in one session (the
# dedup._PAIRS_CACHE discipline) — a production pipeline trains the
# LM once per corpus snapshot and serves every gate/report from it
_COUNTS_CACHE: dict = {}


def _positional_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, w2, w1, w) per token: each token with its two
    predecessors, out-of-range slots padded '' (the <s> marker) — a
    map-side transform over the per-doc token array, no shuffle."""
    return (
        docs.select(
            "doc_id", "lang",
            F.expr("filter(split(text, ' '), t -> t <> '')").alias("a"))
        .select(
            "doc_id", "lang",
            # indexed two-arg transform (i is 0-based), NOT
            # transform(sequence(1, size(a)), …): sequence(1, 0) on an
            # empty array generates the DESCENDING [1, 0] and would
            # emit spurious NULL-token rows
            F.explode(F.expr(
                "transform(a, (x, i) -> struct("
                " coalesce(get(a, i - 2), '') AS w2,"
                " coalesce(get(a, i - 1), '') AS w1,"
                " x AS w))")).alias("t"))
        .select("doc_id", "lang", "t.w2", "t.w1", "t.w")
    )


def padded_trigram_counts(docs: DataFrame, train_lang: str = "en",
                          min_count: int = 1,
                          cache_key: str | None = None) -> DataFrame:
    """The model: padded-context trigram counts over the training
    subset (``lang = train_lang`` — CCNet trains on a reference corpus
    and scores everything else). ADDITIVE under corpus partition, so
    the streamed twin folds exactly this table. ``cache_key`` memoizes
    the trained table across queries (train once, serve the per-doc
    gate AND the per-source report — fam_lm).
    Columns: w2, w1, w, c."""
    ck = (("lmcounts", docs.sparkSession.sparkContext.applicationId,
           cache_key, train_lang, min_count)
          if cache_key is not None else None)
    if ck is not None and ck in _COUNTS_CACHE:
        return _COUNTS_CACHE[ck]
    toks = _positional_tokens(docs.filter(F.col("lang") == train_lang))
    counts = (toks.groupBy("w2", "w1", "w")
              .agg(F.count("*").cast("long").alias("c")))
    if min_count > 1:
        counts = counts.filter(F.col("c") >= min_count)
    if ck is not None:
        counts = counts.localCheckpoint(eager=True)
        _COUNTS_CACHE[ck] = counts
    return counts


def lm_gate_from_counts(docs: DataFrame, counts: DataFrame,
                        keep_threshold_ppm: int = 60_000) -> DataFrame:
    """Score EVERY document against a (w2, w1, w, c) padded count
    table and gate on the integer mean token score. Shared verbatim by
    the batch entry and the streamed twin's read tail (the folded
    state equals the batch count table — counts are additive).
    Columns: doc_id, lang, n_tokens, sum_score, mean_score_ppm, keep.
    """
    a3, a2, a1 = ALPHA_PPM
    ctx2 = counts.groupBy("w2", "w1").agg(F.sum("c").alias("cx2"))
    big2 = (counts.groupBy("w1", "w")
            .agg(F.sum("c").alias("c2")))
    ctx1 = counts.groupBy("w1").agg(F.sum("c").alias("cx1"))
    uni = (counts.groupBy("w")
           .agg(F.sum("c").alias("c1"))
           .withColumnRenamed("w", "u_w"))
    n_tok = counts.agg(F.sum("c").alias("n_train"))
    # the backoff score depends ONLY on the (w2, w1, w) key and each
    # model join is 1:<=1, so the CORPUS is tokenized exactly ONCE and
    # scored in-line (r15, guide §2.4/§1.2): the pre-r15 spelling
    # routed the scores through a DISTINCT-key table whose subtree —
    # the full tokenize+explode+groupBy — also fed the final attach
    # join, so the corpus pass executed TWICE per gate call (measured
    # 2.41 → 1.44 s at sf0.1, value-identical). A localCheckpoint of
    # the per-doc key table was tried first and REJECTED: the
    # materialization cost more than the duplicated pass at bench
    # scale (2.92 s). The model-side tables are vocab-scale
    # (Heaps-sublinear in the corpus) and ride the planner's
    # broadcast/shuffle decision per join; the scored key count per
    # row is unchanged — only the duplicate corpus scan is gone.
    occ = (_positional_tokens(docs)
           .groupBy("doc_id", "lang", "w2", "w1", "w")
           .agg(F.count("*").cast("long").alias("occ")))
    scored = (
        occ
        .join(counts.withColumnRenamed("c", "c3"), ["w2", "w1", "w"],
              "left")
        .join(ctx2, ["w2", "w1"], "left")
        .join(big2.withColumnRenamed("w1", "b_w1")
              .withColumnRenamed("w", "b_w"),
              (F.col("w1") == F.col("b_w1")) & (F.col("w") == F.col("b_w")),
              "left")
        .join(ctx1, ["w1"], "left")
        .join(uni, F.col("w") == F.col("u_w"), "left")
        # 1-row scalar: mandatory broadcast is sanctioned (bounded)
        .crossJoin(F.broadcast(n_tok))
        .select(
            "doc_id", "lang", "occ",
            F.expr(
                f"CASE WHEN c3 IS NOT NULL THEN"
                f" CAST((CAST({a3} AS DECIMAL(38,0)) * c3) DIV cx2"
                f"      AS BIGINT)"
                f" WHEN c2 IS NOT NULL THEN"
                f" CAST((CAST({a2} AS DECIMAL(38,0)) * c2) DIV cx1"
                f"      AS BIGINT)"
                f" WHEN c1 IS NOT NULL THEN"
                f" CAST((CAST({a1} AS DECIMAL(38,0)) * c1) DIV n_train"
                f"      AS BIGINT)"
                f" ELSE CAST(0 AS BIGINT) END").alias("s"))
    )
    return (
        scored
        .groupBy("doc_id", "lang")
        .agg(F.sum("occ").cast("long").alias("n_tokens"),
             F.sum(F.col("occ") * F.col("s")).cast("long")
             .alias("sum_score"))
        .select(
            "doc_id", "lang", "n_tokens", "sum_score",
            F.expr("sum_score DIV n_tokens").alias("mean_score_ppm"),
            F.expr(f"CAST(sum_score DIV n_tokens >= {keep_threshold_ppm}"
                   " AS INTEGER)").alias("keep"))
    )


def lm_perplexity_gate(docs: DataFrame, train_lang: str = "en",
                       keep_threshold_ppm: int = 60_000,
                       cache_key: str | None = None) -> DataFrame:
    """Batch entry: train the padded count table on ``train_lang``,
    score and gate the whole corpus.
    Columns: doc_id, lang, n_tokens, sum_score, mean_score_ppm, keep.
    """
    return lm_gate_from_counts(
        docs, padded_trigram_counts(docs, train_lang,
                                    cache_key=cache_key),
        keep_threshold_ppm)


def lm_gate_sql(train_lang: str = "en",
                keep_threshold_ppm: int = 60_000) -> str:
    """DuckDB twin: identical padded table, marginals, backoff CASE,
    floor-ppm integers (HUGEINT headroom), mean DIV gate."""
    a3, a2, a1 = ALPHA_PPM
    return f"""
        WITH tok_all AS (
          SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), t -> t <> '') AS a
          FROM documents
        ),
        pos AS (
          -- NB: DuckDB list indexing wraps negatives from the END
          -- (a[-1] = last element), so boundary padding must be an
          -- explicit CASE, not a coalesce over out-of-range reads
          SELECT doc_id, lang,
                 CASE WHEN i >= 3 THEN a[i - 2] ELSE '' END AS w2,
                 CASE WHEN i >= 2 THEN a[i - 1] ELSE '' END AS w1,
                 a[i] AS w
          FROM tok_all, LATERAL (
            SELECT unnest(range(1, len(a) + 1)) AS i) ii
          WHERE len(a) >= 1
        ),
        counts AS (
          SELECT w2, w1, w, CAST(count(*) AS BIGINT) AS c
          FROM pos WHERE lang = '{train_lang}' GROUP BY 1, 2, 3
        ),
        ctx2 AS (SELECT w2, w1, SUM(c) AS cx2 FROM counts GROUP BY 1, 2),
        big2 AS (SELECT w1, w, SUM(c) AS c2 FROM counts GROUP BY 1, 2),
        ctx1 AS (SELECT w1, SUM(c) AS cx1 FROM counts GROUP BY 1),
        uni  AS (SELECT w, SUM(c) AS c1 FROM counts GROUP BY 1),
        n_tok AS (SELECT SUM(c) AS n_train FROM counts),
        scored AS (
          SELECT p.doc_id, p.lang,
                 CASE WHEN t.c IS NOT NULL THEN
                        CAST(({a3}::HUGEINT * t.c) // x2.cx2 AS BIGINT)
                      WHEN b.c2 IS NOT NULL THEN
                        CAST(({a2}::HUGEINT * b.c2) // x1.cx1 AS BIGINT)
                      WHEN u.c1 IS NOT NULL THEN
                        CAST(({a1}::HUGEINT * u.c1) // nt.n_train
                             AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS s
          FROM pos p
          LEFT JOIN counts t
            ON t.w2 = p.w2 AND t.w1 = p.w1 AND t.w = p.w
          LEFT JOIN ctx2 x2 ON x2.w2 = p.w2 AND x2.w1 = p.w1
          LEFT JOIN big2 b ON b.w1 = p.w1 AND b.w = p.w
          LEFT JOIN ctx1 x1 ON x1.w1 = p.w1
          LEFT JOIN uni u ON u.w = p.w
          CROSS JOIN n_tok nt
        )
        SELECT doc_id, lang,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(SUM(s) AS BIGINT) AS sum_score,
               CAST(SUM(s) // count(*) AS BIGINT) AS mean_score_ppm,
               CAST(SUM(s) // count(*) >= {keep_threshold_ppm}
                    AS INTEGER) AS keep
        FROM scored
        GROUP BY 1, 2
    """


def lm_source_report_from_counts(docs: DataFrame, counts: DataFrame,
                                 keep_threshold_ppm: int = 60_000
                                 ) -> DataFrame:
    """Per-SOURCE corpus-prep league table off the same model: how much
    of each provider's slice survives the LM gate, and its average
    score — the dashboard a 100 TB ingest pipeline gates providers by
    (CCNet buckets by perplexity; public method). Rides the identical
    count-table state as the gate (one streamed fold, two readers).
    DECIMAL(38,0) promotion on the ppm products (per-source doc counts
    scale with the corpus, unlike the per-doc stats).
    Columns: source, n_docs, n_keep, keep_ppm, avg_score_ppm."""
    gate = lm_gate_from_counts(docs, counts, keep_threshold_ppm)
    src = docs.select("doc_id", "source")
    return (
        gate.join(src, "doc_id")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("keep").cast("long").alias("n_keep"),
             F.sum("mean_score_ppm").alias("sum_means"))
        .select(
            "source", "n_docs", "n_keep",
            F.expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_keep)"
                   " DIV n_docs AS BIGINT)").alias("keep_ppm"),
            F.expr("CAST(CAST(sum_means AS DECIMAL(38,0)) DIV n_docs"
                   " AS BIGINT)").alias("avg_score_ppm"))
    )


def lm_gate_by_source(docs: DataFrame, train_lang: str = "en",
                      keep_threshold_ppm: int = 60_000,
                      cache_key: str | None = None) -> DataFrame:
    """Batch entry: train + score + per-source rollup.
    Columns: source, n_docs, n_keep, keep_ppm, avg_score_ppm."""
    return lm_source_report_from_counts(
        docs, padded_trigram_counts(docs, train_lang,
                                    cache_key=cache_key),
        keep_threshold_ppm)


def lm_by_source_sql(train_lang: str = "en",
                     keep_threshold_ppm: int = 60_000) -> str:
    """DuckDB twin: the gate SQL as a derived table + one rollup."""
    return f"""
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(g.keep) AS BIGINT) AS n_keep,
               CAST((1000000::HUGEINT * SUM(g.keep)) // count(*)
                    AS BIGINT) AS keep_ppm,
               CAST(CAST(SUM(g.mean_score_ppm) AS HUGEINT) // count(*)
                    AS BIGINT) AS avg_score_ppm
        FROM ({lm_gate_sql(train_lang, keep_threshold_ppm)}) g
        JOIN documents d USING (doc_id)
        GROUP BY 1
    """
