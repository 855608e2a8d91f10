"""IVF ANN invariants: exhaustive probing equals brute force exactly;
partial probing reports (not pins) recall — it depends on data geometry."""

from __future__ import annotations

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
