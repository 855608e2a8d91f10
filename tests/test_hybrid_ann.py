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


def test_ivf_sq8_exhaustive_equals_sq8(spark):
    """nprobe == n_cells makes the IVF shortlist exhaustive, so the
    composed index must return exactly the flat SQ8 top-k."""
    from spark_streaming_spark.operators import ann as ANN

    emb = load_table(spark, SF_DIR, "embeddings")
    a = [tuple(r) for r in
         ANN.ivf_sq8_search(emb, k=10, n_cells=8, nprobe=8).collect()]
    b = [(r.vec_id, r.dot_int, r.approx_dot) for r in
         SIM.sq8_search_topk(emb, k=10).collect()]
    assert a == b


def test_ivf_sq8_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["ivf_sq8_search"](spark, SF_DIR), duck,
        E.oracle_sql()["ivf_sq8_search"])


def test_rocchio_expansion_is_exact_linear(spark):
    """dot(q20, c) must equal 100·dot(q, c) + 15·dot(Σseeds, c)
    recomputed in Python — the integer-cleared Rocchio identity."""
    emb = load_table(spark, SF_DIR, "embeddings")
    codes = {r.vec_id: (list(r.qv), r.scale)
             for r in SIM.quantize_codes(emb).collect()}
    seeds = [r.vec_id for r in SIM.sq8_search_topk(emb, k=5).collect()]
    q = codes[0][0]
    csum = [sum(codes[s][0][i] for s in seeds) for i in range(len(q))]
    out = SIM.rocchio_sq8_rerank(emb).collect()
    for r in out:
        c = codes[r.vec_id][0]
        want = sum((100 * q[i] + 15 * csum[i]) * c[i]
                   for i in range(len(q)))
        assert r.dot_int == want
        assert r.is_seed == int(r.vec_id in seeds)


def test_rocchio_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["rocchio_sq8_rerank"](spark, SF_DIR), duck,
        E.oracle_sql()["rocchio_sq8_rerank"])


def test_hits_edge_fold_additive(spark):
    """Per-half bipartite edge tables fold (sum of counts) to the
    one-shot edge table — the streamed-HITS property."""
    from pyspark.sql import functions as F2
    from spark_streaming_spark.operators import graphrank as GRK

    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    halves = (GRK.customer_part_edges(
                  li.filter(F2.col("l_orderkey") % 2 == 0), od)
              .unionByName(GRK.customer_part_edges(
                  li.filter(F2.col("l_orderkey") % 2 == 1), od)))
    folded = sorted(map(tuple, halves.groupBy("cust", "part")
                        .agg(F2.sum("w").alias("w")).collect()))
    oneshot = sorted(map(tuple,
                         GRK.customer_part_edges(li, od).collect()))
    assert folded == oneshot
