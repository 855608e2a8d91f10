"""Stupid-backoff LM gate (operators/lm.py): hand-checked backoff
arithmetic at every order, boundary-marker semantics, and the
training-subset rule."""
from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_spark.operators import lm as LM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")


def test_padded_counts_boundary_markers(spark):
    docs = _docs(spark, [(1, "a b a b", "en"), (2, "a b c", "en"),
                         (3, "x y", "fr")])
    counts = {(r.w2, r.w1, r.w): r.c
              for r in LM.padded_trigram_counts(docs).collect()}
    # fr doc excluded from training; '' pads the two boundary slots
    assert counts == {("", "", "a"): 2, ("", "a", "b"): 2,
                      ("a", "b", "a"): 1, ("b", "a", "b"): 1,
                      ("a", "b", "c"): 1}


def test_gate_scores_every_backoff_order(spark):
    train = [(1, "a b a b", "en"), (2, "a b c", "en")]
    # doc 4 exercises order-1 then order-2 backoff; doc 5 is pure OOV
    docs = _docs(spark, train + [(4, "b a", "fr"), (5, "x y", "fr")])
    rows = {r.doc_id: r for r in LM.lm_perplexity_gate(docs).collect()}
    # doc 2 "a b c": every position is a trigram hit —
    # ('','',a): 1e6*2 DIV 2; ('',a,b): 1e6*2 DIV 2; (a,b,c): 1e6*1 DIV 2
    assert (rows[2].n_tokens, rows[2].sum_score) == (3, 2_500_000)
    assert (rows[2].mean_score_ppm, rows[2].keep) == (833_333, 1)
    # doc 4 "b a": t1 ('','',b) misses orders 3 and 2 → unigram
    # 160000*c1(b)=3 DIV N=7 = 68571; t2 ('',b,a) misses order 3 →
    # bigram 400000*c2(b,a)=1 DIV ctx1(b)=2 = 200000
    assert rows[4].sum_score == 68_571 + 200_000
    assert rows[4].mean_score_ppm == 134_285 and rows[4].keep == 1
    # doc 5: both tokens OOV → 0, gated out
    assert (rows[5].sum_score, rows[5].mean_score_ppm, rows[5].keep) \
        == (0, 0, 0)


def test_gate_matches_duckdb_twin_on_fixture(spark, tmp_path):
    import duckdb

    docs = _docs(spark, [(1, "a b a b", "en"), (2, "a b c", "en"),
                         (3, "b a x", "fr"), (4, "", "de"),
                         (5, "c", "zh")])
    # empty text tokenizes to zero tokens -> no output row, both sides
    pq = str(tmp_path / "documents.parquet")
    docs.write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    want = sorted(map(tuple, con.execute(LM.lm_gate_sql()).fetchall()))
    got = sorted(tuple(r) for r in LM.lm_perplexity_gate(docs)
                 .select("doc_id", "lang", "n_tokens", "sum_score",
                         "mean_score_ppm", "keep").collect())
    assert got == want and len(got) == 4


def test_no_forced_broadcast_of_vocab_tables(spark):
    from spark_streaming_spark.plans import explain

    docs = _docs(spark, [(1, "a b", "en"), (2, "b c", "fr")])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        text = explain.explain_text(LM.lm_perplexity_gate(docs))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    import re

    # exactly ONE forced broadcast survives: the 1-row n_train scalar
    assert len(re.findall(r"\(\d+\) BroadcastExchange", text)) == 1


def test_lm_source_report_rolls_up_gate(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b", "en", "s1"), (2, "a b c", "en", "s1"),
         (3, "x y", "fr", "s2")],
        "doc_id LONG, text STRING, lang STRING, source STRING")
    rows = {r.source: r for r in LM.lm_gate_by_source(docs).collect()}
    gate = {r.doc_id: r for r in LM.lm_perplexity_gate(docs).collect()}
    assert rows["s1"].n_docs == 2
    assert rows["s1"].n_keep == gate[1].keep + gate[2].keep
    assert rows["s1"].avg_score_ppm == (
        gate[1].mean_score_ppm + gate[2].mean_score_ppm) // 2
    assert (rows["s2"].n_docs, rows["s2"].n_keep,
            rows["s2"].keep_ppm) == (1, 0, 0)
