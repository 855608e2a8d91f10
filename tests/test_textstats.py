"""Text-analysis semantics: language-ID heuristic quality and fingerprint
clustering behavior (beyond the oracle hash checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_spark.operators import textstats as TX
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_lang_guess_behavior(spark):
    """The driver's synthetic corpus draws text and the `lang` label
    independently (verified: per-language word distributions are
    identical), so accuracy against the label is meaningless here. Assert
    the operator's *behavior*: total coverage, closed label set, and
    monotonicity — guessed-'en' docs have stopword ratios strictly above
    guessed-'other' docs on average."""
    docs = load_table(spark, SF_DIR, "documents")
    g = TX.lang_guess(docs)
    assert g.count() == docs.count()
    labels = {r.lang_guess for r in g.select("lang_guess").distinct().collect()}
    assert labels <= {"en", "other"}
    from spark_streaming_spark.functions.text import stopword_ratio
    joined = g.join(docs.select("doc_id", "text"), "doc_id").select(
        "lang_guess", stopword_ratio("text").alias("sr")
    )
    means = {
        r.lang_guess: r.m
        for r in joined.groupBy("lang_guess").agg(F.avg("sr").alias("m")).collect()
    }
    if {"en", "other"} <= set(means):
        assert means["en"] > means["other"]


def test_fingerprint_clusters_exact_dupes(spark):
    """Identical texts must always share a fingerprint."""
    docs = load_table(spark, SF_DIR, "documents")
    per_text = (
        TX.doc_fingerprints(docs)
        .join(docs.select("doc_id", "text"), "doc_id")
        .groupBy("text")
        .agg(F.countDistinct("fp").alias("nfp"))
    )
    assert per_text.filter(F.col("nfp") > 1).count() == 0


def test_bpe_token_stats(spark, duck):
    """BPE-ish regex token counts: ≥ whitespace counts (punctuation
    splits off) and exact vs the DuckDB regex oracle."""
    import __spark_entry__ as E
    from spark_streaming_spark.operators.textstats import bpe_token_stats
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = bpe_token_stats(docs)
    assert out.filter("n_bpe_tokens < n_ws_tokens").count() == 0
    assert_matches_oracle(out, duck, E.oracle_sql()["bpe_token_stats"])


def test_vocab_build_coverage_curve(spark):
    from spark_streaming_spark.operators.textstats import vocab_build
    from spark_streaming_spark.plans import explain

    docs = load_table(spark, SF_DIR, "documents")
    out = vocab_build(docs, n=20).collect()
    assert len(out) == 20
    # ranks are 1..50, counts non-increasing, coverage strictly increasing
    by_rank = sorted(out, key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == list(range(1, 21))
    cnts = [r.cnt for r in by_rank]
    assert cnts == sorted(cnts, reverse=True)
    covs = [r.cum_coverage for r in by_rank]
    assert all(b > a for a, b in zip(covs, covs[1:]))
    assert 0 < covs[-1] <= 1.0
    # scale posture: top-n is TakeOrderedAndProject, count partial-aggs
    df = vocab_build(docs)
    assert explain.has_take_ordered(df)
    assert explain.has_partial_aggregate(df)
