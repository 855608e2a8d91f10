"""Distributed engine-exact PCA: cross-engine oracle + numpy pins. The
fixture embeddings are near-isotropic (lambda_max/lambda_avg ~ 1.85),
so DIRECTIONAL alignment after finitely many power iterations is not a
sound assertion — the honest convergence pin is the Rayleigh quotient
(which power iteration increases monotonically toward lambda_max)."""

from __future__ import annotations

import numpy as np

import __spark_entry__ as E
from spark_streaming_spark.operators import pca as PCA
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def _loadings_vec(spark, n_iters):
    emb = load_table(spark, SF_DIR, "embeddings")
    v = np.zeros(64)
    for r in PCA.pca_top_component(emb, n_iters=n_iters).collect():
        v[r["dim"]] = r["loading"]
    return v


def test_pca_loadings_match_oracle_and_converge(spark, duck):
    emb = load_table(spark, SF_DIR, "embeddings")
    assert_matches_oracle(
        PCA.pca_top_component(emb), duck,
        E.oracle_sql()["embedding_pca_loadings"])
    X = np.array(emb.select("embedding").toPandas()["embedding"].tolist(),
                 dtype="float64")
    C = np.cov(X.T, bias=True)
    lmax = float(np.linalg.eigvalsh(C)[-1])
    v2, v8 = _loadings_vec(spark, 2), _loadings_vec(spark, 8)
    assert abs(np.linalg.norm(v8) - 1.0) < 1e-6
    rq2, rq8 = float(v2 @ C @ v2), float(v8 @ C @ v8)
    assert rq8 >= rq2 - 1e-9          # monotone toward lambda_max
    assert rq8 >= 0.85 * lmax, (rq8, lmax)


def test_pca_scores_match_oracle_and_rayleigh(spark, duck):
    emb = load_table(spark, SF_DIR, "embeddings")
    assert_matches_oracle(
        PCA.pca_scores(emb), duck, E.oracle_sql()["embedding_pca_scores"])
    # score variance IS the Rayleigh quotient of the learned direction
    # (up to the 7dp quantization and the uncentered-score offset)
    scores = np.array([r["score"] for r in PCA.pca_scores(emb).collect()])
    X = np.array(emb.select("embedding").toPandas()["embedding"].tolist(),
                 dtype="float64")
    C = np.cov(X.T, bias=True)
    v = _loadings_vec(spark, 8)
    assert abs(scores.var() - float(v @ C @ v)) < 1e-4
