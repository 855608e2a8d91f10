"""SQ8 integer ANN serving + RRF hybrid fusion: quantization-quality
pins, fusion hand cases, oracle parity."""

from __future__ import annotations

import __spark_entry__ as E
from pyspark.sql import functions as F
from spark_streaming_spark.operators import similarity as SIM
from spark_streaming_spark.operators import textstats as TX
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def test_sq8_codes_bounded_and_consistent(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = SIM.quantize_codes(emb).collect()
    for r in rows[:50]:
        assert all(-127 <= q <= 127 for q in r.qv)
    # the array form must agree with the serialized quantize entry
    ser = {r.vec_id: r.qvec for r in SIM.embedding_quantize(emb).collect()}
    for r in rows[:50]:
        assert "|".join(str(q) for q in r.qv) == ser[r.vec_id]


def test_sq8_topk_tracks_exact_topk(spark):
    """INT8 is a 1/254-resolution grid: the SQ8 top-5 must be contained
    in the exact cosine top-20 at the test SF (recall sanity, not a
    universal bound — pinned against this fixture)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    sq = [r.vec_id for r in SIM.sq8_search_topk(emb, k=5).collect()]
    exact = [r.vec_id
             for r in SIM.knn_to_query(emb, query_vec_id=0, k=20).collect()]
    assert set(sq) <= set(exact)


def test_sq8_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["sq8_search_topk"](spark, SF_DIR), duck,
        E.oracle_sql()["sq8_search_topk"])


def test_rrf_fusion_hand_properties(spark):
    """Fused ids = union of the two lists; a doc present in both lists
    scores the exact ppm sum of its two reciprocal ranks."""
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    lex = [r.doc_id for r in TX.lexical_knn(docs, 0).collect()]
    sem = [r.vec_id for r in SIM.knn_to_query(emb, 0).collect()]
    fused = {r.doc_id: r for r in
             TX.hybrid_search_rrf(docs, emb).collect()}
    assert set(fused) == set(lex) | set(sem)
    for did, r in fused.items():
        want = 0
        if did in lex:
            want += 1000000 // (60 + lex.index(did) + 1)
        if did in sem:
            want += 1000000 // (60 + sem.index(did) + 1)
        assert r.rrf_ppm == want
        assert r.in_lexical == int(did in lex)
        assert r.in_semantic == int(did in sem)


def test_rrf_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["hybrid_search_rrf"](spark, SF_DIR), duck,
        E.oracle_sql()["hybrid_search_rrf"])
