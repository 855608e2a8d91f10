"""Text analysis over the documents table (north-star extension):
token stats, quality scoring, language-ID heuristic, fingerprints.

All pure Column expressions (functions/text.py) — language-ID and quality
scores run inside whole-stage codegen, no Python. Each op has an exact
DuckDB oracle because every formula is shared double arithmetic on
integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_spark.sources.batch import widen
from spark_streaming_spark.functions.text import (
    fingerprint,
    punct_ratio,
    stopword_ratio,
    token_count,
)


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token statistics.
    Columns: doc_id, n_tokens, n_distinct, ttr (type-token ratio)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("long")
    nd = F.size(F.array_distinct(toks)).cast("long")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        (nd.cast("double") / n).alias("ttr"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality score: long docs with modest punctuation and a
    natural stopword rate score higher. Columns: doc_id, n_tokens,
    punct_ratio, stop_ratio, quality."""
    n = token_count("text")
    p = punct_ratio("text")
    s = stopword_ratio("text")
    quality = (
        F.least(n.cast("double") / 50.0, F.lit(1.0)) * 0.5
        + (1.0 - F.least(p * 10.0, F.lit(1.0))) * 0.2
        + F.least(s * 5.0, F.lit(1.0)) * 0.3
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        p.alias("punct_ratio"),
        s.alias("stop_ratio"),
        quality.alias("quality"),
    )


def lang_guess(docs: DataFrame, threshold: float = 0.08) -> DataFrame:
    """n-gram-free language-ID heuristic: flag as 'en' when the English
    stopword ratio clears the threshold. (The documents table carries a
    ground-truth ``lang`` column; test accuracy is reported by
    tests/test_textstats.py.) Columns: doc_id, lang, lang_guess."""
    s = stopword_ratio("text")
    return docs.select(
        "doc_id",
        "lang",
        F.when(s >= threshold, F.lit("en")).otherwise(F.lit("other")).alias("lang_guess"),
    )


# GPT-style pre-tokenizer approximation: letter runs | digit runs |
# single non-alnum-non-space marks. Identical semantics in Java regex
# (Spark) and RE2 (DuckDB) — no lookarounds, no unicode classes.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Token counts under a BPE-ish regex pre-tokenizer (letter runs,
    digit runs, punctuation marks) vs plain whitespace tokens — the
    cheap proxy for LLM token budgeting over a corpus.
    Columns: doc_id, n_ws_tokens, n_bpe_tokens, bpe_per_ws."""
    ws = token_count("text")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0))).cast("long")
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        (bpe.cast("double") / ws).alias("bpe_per_ws"),
    )


def term_stats(docs: DataFrame) -> DataFrame:
    """TF-IDF building blocks, integer-exact: per (doc, term) frequency
    and per-term document frequency. The two shuffles here (doc-term agg,
    term df agg + broadcast-back join) ARE the cost of TF-IDF at scale;
    the idf formula itself (ln((N+1)/(df+1))+1 or any variant) is a
    trivial map the consumer applies — kept out of the output because
    libm ln() isn't bitwise-portable across engines, and every column
    below is exact. The df table (one row per vocab term) broadcasts
    while vocab ≪ corpus — at web scale with an unbounded vocab drop the
    hint and let AQE pick the join side. Columns: doc_id, term, tf, df."""
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = (
        terms.distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    return tf.join(F.broadcast(df_), "term").select("doc_id", "term", "tf", "df")


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """min-md5-shingle fingerprint (deterministic 1-perm MinHash) + exact
    duplicate groups by fingerprint. Columns: doc_id, fp."""
    # widen: the rolling md5-over-shingles map is the hot per-row cost
    # (sources/batch.widen — no-op on well-split inputs)
    return widen(docs).select("doc_id", fingerprint("text").alias("fp"))


def fingerprint_dupes(docs: DataFrame) -> DataFrame:
    """Documents sharing a fingerprint — candidate dup clusters.
    Columns: fp, n_docs, min_doc, max_doc."""
    return (
        doc_fingerprints(docs)
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def vocab_build(docs: DataFrame, n: int = 100) -> DataFrame:
    """Tokenizer vocabulary construction: the top-``n`` tokens by corpus
    frequency with each prefix's cumulative corpus coverage — the curve
    that decides a tokenizer's vocab size ("how many entries until 99%
    of the stream is covered"). Columns: token, cnt, rank, cum_coverage.

    Scale shape, in order: explode + groupBy(token) with map-side
    partial aggregation (the only pass over the corpus); top-n via
    orderBy+limit — TakeOrderedAndProject, so the full vocabulary is
    never globally sorted or collected; the cumulative sum then runs on
    the n-row result, where the unpartitioned window's single-partition
    exchange is n rows, not the vocabulary. The corpus token total rides
    in as a broadcast 1-row scalar. Rank ties break on the token string
    so both engines agree."""
    from pyspark.sql.window import Window

    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    topn = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        topn.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_coverage",
            (F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("double") / F.col("total")),
        )
        .select("token", "cnt", "rank", "cum_coverage")
    )


def hashed_bow(docs: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-hashed bag-of-words (the hashing trick — Weinberger et
    al. 2009; public method): token → bucket = md5(token) mod dim,
    per-doc bucket counts in LONG FORM (doc_id, bucket, cnt). This is
    the text→vector bridge into the similarity/ANN stack: a cheap
    lexical embedding whose dimensionality is fixed a priori, no
    vocabulary build, no OOV. Long form IS the scale-correct sparse
    spelling — a corpus-wide dense matrix would be rows×dim; this is
    O(nnz), and the ANN operators consume either form.

    md5 (not xxhash64) so the bucketing is bit-identical in DuckDB: the
    bucket is the first 8 hex chars as an integer mod dim — 32 bits is
    ample for a power-of-two-free modulus and avoids any sign edge."""
    tok = widen(docs).select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("w"),
    ).filter(F.col("w") != "")
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % dim
    )
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def lexical_knn(docs: DataFrame, query_doc_id: int = 0, k: int = 10,
                dim: int = 64) -> DataFrame:
    """Top-k lexically-similar documents to one query doc, by cosine
    over the hashed bag-of-words — computed INVERTED-INDEX style: the
    sparse dot product is a JOIN on the bucket key (only buckets the
    query touches contribute), not a dense scan. This is the IR-classic
    plan shape: at 100 TB the long-form BoW partitioned by bucket IS
    the inverted index, the query side is a broadcast of ≤dim rows, and
    the candidate set is only docs sharing a bucket with the query.
    All-integer dots and norms (exact in any engine); cosine is one
    final double divide. Columns: doc_id, cosine."""
    bow = hashed_bow(docs, dim)
    qv = bow.filter(F.col("doc_id") == query_doc_id).select(
        F.col("bucket"), F.col("cnt").alias("qcnt"))
    norms = bow.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("n2"))
    qnorm = norms.filter(F.col("doc_id") == query_doc_id).select(
        F.col("n2").alias("qn2"))
    dots = (
        bow.filter(F.col("doc_id") != query_doc_id)
        .join(F.broadcast(qv), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("qcnt")).alias("dot"))
    )
    return (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            (F.col("dot").cast("double")
             / F.sqrt((F.col("n2") * F.col("qn2")).cast("double")))
            .alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_scores(docs: DataFrame,
                query_terms: tuple[str, ...] = ("hash", "join", "vector"),
                k: int = 20) -> DataFrame:
    """BM25 retrieval (Robertson/Sparck Jones, Okapi; public method) for
    a fixed query, inverted-index style: only postings of the query's
    terms are aggregated, so the shuffle carries O(docs containing a
    query term), never the corpus.

    Engine-exact without libm: the conventional log() idf is not
    bitwise-portable (cf. term_stats), so this uses the RSJ idf RATIO
    variant idf = (N - df + 0.5)/(df + 0.5) — same monotone df weighting
    minus the log damping. With k1 = 1.2 and b = 0.75 the whole per-term
    score is one ratio of exact integers,

        score_t = (22·tf·L·(2N − 2df + 1))
                  / ((10·tf·L + 3·L + 9·dl·N)·(2df + 1)),

    (L = total corpus tokens, dl = doc tokens, avgdl = L/N cleared from
    the denominators). Each factor is an exact BIGINT; products and the
    final divide run in double with a FIXED association shared by the
    DuckDB oracle — IEEE ops are correctly rounded, so both engines
    produce the identical double. The per-term scores are quantized to
    decimal(38,12) before the per-doc sum, making the 3-term reduction
    order-independent (functions/numeric.py discipline).

    At 100 TB the dl/tf tables are the inverted index (partitioned by
    term), the query side is literal predicates pushed to the scan, and
    the corpus scalars (N, L) broadcast as a 1-row table.
    Columns: doc_id, score."""
    tok = widen(docs).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    scalars = dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    hits = tok.filter(F.col("w").isin(*query_terms))
    tf = hits.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df_ = (
        hits.select("doc_id", "w").distinct()
        .groupBy("w").agg(F.count("*").alias("df"))
    )
    term_score = (
        (F.lit(22.0) * F.col("tf") * F.col("total_len")
         * (F.lit(2.0) * F.col("n_docs") - F.lit(2.0) * F.col("df")
            + F.lit(1.0)))
        / ((F.lit(10.0) * F.col("tf") * F.col("total_len")
            + F.lit(3.0) * F.col("total_len")
            + F.lit(9.0) * F.col("dl") * F.col("n_docs"))
           * (F.lit(2.0) * F.col("df") + F.lit(1.0)))
    )
    return (
        tf.join(F.broadcast(df_), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select("doc_id", term_score.cast("decimal(38,12)").alias("ts"))
        .groupBy("doc_id")
        .agg(F.sum("ts").cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
