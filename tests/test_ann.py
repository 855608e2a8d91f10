"""IVF ANN invariants: exhaustive probing equals brute force exactly;
partial probing reports (not pins) recall — it depends on data geometry."""

from __future__ import annotations

from spark_streaming_spark.operators import ann as ANN
from spark_streaming_spark.operators.ann import knn_ivf
from spark_streaming_spark.operators.similarity import knn_to_query
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_ivf_exhaustive_equals_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    brute = [(r.vec_id, r.cosine) for r in knn_to_query(emb, 0, 10).collect()]
    ivf = [
        (r.vec_id, r.cosine)
        for r in knn_ivf(emb, 0, 10, n_cells=8, nprobe=8).collect()
    ]
    assert ivf == brute


def test_ivf_partial_probe_subset_and_valid(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    brute = {r.vec_id for r in knn_to_query(emb, 0, 10).collect()}
    ivf_rows = knn_ivf(emb, 0, 10, n_cells=8, nprobe=2).collect()
    assert len(ivf_rows) == 10
    assert all(-1.0 <= r.cosine <= 1.0 for r in ivf_rows)
    recall = len({r.vec_id for r in ivf_rows} & brute) / 10
    print(f"IVF recall@10 nprobe=2/8: {recall:.2f}")


def test_pq_adc_distance_is_reconstruction_distance(spark):
    """ADC's LUT sum is EXACTLY ||q - reconstruct(codes)||^2 — the
    defining identity of asymmetric distance computation. Verified
    numerically against a NumPy reconstruction for every vector in the
    shortlist."""
    import numpy as np

    from spark_streaming_spark.operators import ann

    emb = load_table(spark, SF_DIR, "embeddings")
    books = ann.pq_train(emb, m=8, k=8)
    top = ann.pq_adc_topk(emb, books, query_vec_id=0, k_out=20).collect()
    codes = {r.vec_id: r.codes
             for r in ann.pq_encode(emb, books).collect()}
    data = {r.vec_id: np.asarray(r.embedding, dtype="float64")
            for r in emb.collect()}
    q = data[0]
    sub = len(books[0][0])
    for r in top:
        recon = np.concatenate([
            np.asarray(books[s][codes[r.vec_id][s]])
            for s in range(len(books))
        ])
        want = float(np.sum((q - recon) ** 2))
        assert abs(r.approx_dist2 - want) < 1e-6 * max(1.0, want)
    assert sub == len(books[0][0])


def test_pq_codes_shape_and_determinism(spark):
    from spark_streaming_spark.operators import ann

    emb = load_table(spark, SF_DIR, "embeddings")
    books = ann.pq_train(emb, m=8, k=8)
    a = {r.vec_id: tuple(r.codes)
         for r in ann.pq_encode(emb, books).collect()}
    b = {r.vec_id: tuple(r.codes)
         for r in ann.pq_encode(emb, books).collect()}
    assert a == b
    assert all(len(c) == 8 and all(0 <= x < 8 for x in c)
               for c in a.values())


def test_pq_rerank_recall_floor(spark):
    """Shortlist+rerank recovers most of the exact top-10 even at 64-bit
    codes (seeded fixture — deterministic)."""
    import numpy as np

    from spark_streaming_spark.operators import ann

    emb = load_table(spark, SF_DIR, "embeddings")
    data = {r.vec_id: np.asarray(r.embedding, dtype="float64")
            for r in emb.collect()}
    q = data[0]
    exact = {i for _, i in sorted(
        (float(np.sum((v - q) ** 2)), i)
        for i, v in data.items() if i != 0)[:10]}
    books = ann.pq_train(emb, m=16, k=16)
    got = {r.vec_id for r in
           ann.pq_search(emb, books, 0, k_out=10, shortlist=50).collect()}
    assert len(exact & got) >= 7, (exact, got)


def test_ivfpq_recall_floor_and_exhaustive_probe(spark):
    """Composed IVF-PQ: with every cell probed and a generous shortlist
    the pipeline reduces to PQ-rerank (high recall); at nprobe=4 recall
    degrades gracefully, bounded below on the seeded fixture."""
    import numpy as np

    from spark_streaming_spark.operators import ann

    emb = load_table(spark, SF_DIR, "embeddings")
    data = {r.vec_id: np.asarray(r.embedding, dtype="float64")
            for r in emb.collect()}
    q = data[0]
    exact = {i for _, i in sorted(
        (float(np.sum((v - q) ** 2)), i)
        for i, v in data.items() if i != 0)[:10]}
    full = {r.vec_id for r in ann.knn_ivfpq(
        emb, 0, k_out=10, n_cells=8, nprobe=8, m=16, pq_k=16,
        shortlist=100).collect()}
    assert len(exact & full) >= 7, (exact, full)
    probed = {r.vec_id for r in ann.knn_ivfpq(
        emb, 0, k_out=10, n_cells=8, nprobe=4, m=16, pq_k=16,
        shortlist=100).collect()}
    assert len(exact & probed) >= 5, (exact, probed)


def test_pq_train_cache_hit_returns_same_books(spark):
    """cache_key memoizes the fit: second call returns the identical
    codebooks object without re-running k-means."""
    from spark_streaming_spark.operators import ann

    emb = load_table(spark, SF_DIR, "embeddings")
    key = f"test-pq-{SF_DIR}"
    ann._ARTIFACT_CACHE.pop(("pq", key, 4, 16, 42), None)
    b1 = ann.pq_train(emb, m=4, k=16, cache_key=key)
    b2 = ann.pq_train(emb, m=4, k=16, cache_key=key)
    assert b1 is b2
    uncached = ann.pq_train(emb, m=4, k=16)
    assert uncached == b1  # seeded fit is deterministic either way
    ann._ARTIFACT_CACHE.pop(("pq", key, 4, 16, 42), None)


def test_ivf_det_exhaustive_equals_bruteforce(spark):
    """knn_ivf_det with nprobe=n_cells scans every cell, so it must
    exactly equal the brute-force top-k (same invariant as the
    ml.KMeans path, now over the deterministic quantizer)."""
    from spark_streaming_spark.operators import ann, similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    exhaustive = {
        (r.vec_id, r.cosine)
        for r in ann.knn_ivf_det(emb, n_cells=4, nprobe=4).collect()
    }
    brute = {
        (r.vec_id, r.cosine)
        for r in similarity.knn_to_query(emb).collect()
    }
    assert exhaustive == brute


def test_ivf_det_partial_probe_subset(spark):
    """Partial probe returns k rows, each a true corpus vector with a
    cosine present in the exhaustive ranking (pruning never fabricates
    scores) — and the deterministic build is run-to-run stable."""
    from spark_streaming_spark.operators import ann

    emb = load_table(spark, SF_DIR, "embeddings")
    part = ann.knn_ivf_det(emb, n_cells=8, nprobe=2).collect()
    assert len(part) == 10
    again = ann.knn_ivf_det(emb, n_cells=8, nprobe=2).collect()
    assert [tuple(r) for r in part] == [tuple(r) for r in again]


def test_det_pq_codes_shape_and_determinism(spark):
    """Deterministic PQ: every vector gets m codes in [0, k); identical
    across runs (the oracle-exactness precondition); codes actually
    discriminate (more than one distinct codeword used)."""
    from spark_streaming_spark.operators import ann

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = ann.det_pq_codes(emb, m=8, k=8).collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        codes = [int(c) for c in r.code_str.split(",")]
        assert len(codes) == 8 and all(0 <= c < 8 for c in codes)
    assert len({r.code_str for r in rows}) > 1
    again = ann.det_pq_codes(emb, m=8, k=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivf_graph_det_exhaustive_probe_equals_exact(spark):
    """With nprobe = n_cells the probe filter is vacuous and the
    multi-query IVF search must equal the exact kNN graph exactly
    (same scaled-integer cosine contract, same tie order)."""
    from spark_streaming_spark.operators.similarity import knn_graph

    emb = load_table(spark, SF_DIR, "embeddings")
    ivf = {tuple(r) for r in ANN.ivf_graph_det(
        emb, k=5, n_cells=8, nprobe=8).collect()}
    exact = {tuple(r) for r in knn_graph(emb, k=5).collect()}
    assert ivf == exact and len(exact) > 0


def test_ivf_recall_det_bounds_and_oracle(spark, duck):
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = ANN.ivf_recall_det(emb).collect()
    assert rows and all(0 <= r["recall_ppm"] <= 1_000_000 for r in rows)
    assert_matches_oracle(
        ANN.ivf_recall_det(emb), duck, E.oracle_sql()["ivf_recall_det"])
