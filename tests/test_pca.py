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


def test_pca_top2_orthogonal_and_captures_variance(spark, duck):
    """VERDICT r9 #3 pins: the projected-iteration second component is
    orthogonal to the first UP TO THE 7 dp QUANTIZER (the property
    explicit rank-1 deflation cannot give when component 1 is not fully
    converged — measured 0.06 residual cosine on this near-isotropic
    fixture), and each component captures >= 85% of its matching
    eigenvalue's variance. A strict Rayleigh ORDER pin (ray1 >= ray2)
    is NOT sound here: lambda2/lambda1 ~ 0.93, so an 8-iteration
    component 1 (ray1 ~ 0.90*l1) can trail a clean component 2 —
    ordering is instead pinned against each component's OWN
    eigenvalue."""
    emb = load_table(spark, SF_DIR, "embeddings")
    assert_matches_oracle(
        PCA.pca_top_components(emb, 2), duck,
        E.oracle_sql()["embedding_pca_top2"])
    rows = PCA.pca_top_components(emb, 2).collect()
    v = {1: np.zeros(64), 2: np.zeros(64)}
    for r in rows:
        v[r["component"]][r["dim"]] = r["loading"]
    assert abs(np.linalg.norm(v[1]) - 1.0) < 1e-6
    assert abs(np.linalg.norm(v[2]) - 1.0) < 1e-6
    assert abs(float(v[1] @ v[2])) < 1e-5      # quantizer-level ortho
    X = np.array(emb.select("embedding").toPandas()["embedding"].tolist(),
                 dtype="float64")
    C = np.cov(X.T, bias=True)
    evals = np.linalg.eigvalsh(C)
    l1, l2 = float(evals[-1]), float(evals[-2])
    assert float(v[1] @ C @ v[1]) >= 0.85 * l1
    assert float(v[2] @ C @ v[2]) >= 0.85 * l2
    # and neither direction exceeds the spectrum's ceiling
    assert float(v[2] @ C @ v[2]) <= l1 + 1e-9


def test_pca_top2_component1_is_prefix_stable(spark):
    """Projected iteration never looks at later components, so the
    2-component build's component 1 equals the solo build bit-for-bit
    (what lets the train-once cache serve smaller requests by
    slicing)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    solo = {r["dim"]: r["loading"]
            for r in PCA.pca_top_component(emb).collect()}
    both = {r["dim"]: r["loading"]
            for r in PCA.pca_top_components(emb, 2).collect()
            if r["component"] == 1}
    assert solo == both


def test_pca_moment_fold_equals_oneshot(spark):
    """The additive path the streamed twin executes: per-shard moment
    tables, cell-wise summed, reach the SAME loadings as the one-shot
    build — why streaming_pca_loadings shares the batch oracle
    verbatim."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    even = PCA.second_moments(emb.filter(F.col("vec_id") % 2 == 0))
    odd = PCA.second_moments(emb.filter(F.col("vec_id") % 2 == 1))
    folded = (
        even.unionByName(odd).groupBy("i", "j")
        .agg(F.sum("sij").alias("sij"), F.sum("si").alias("si"),
             F.sum("n_pairs").alias("n_pairs"))
    )
    got = sorted(tuple(r) for r in
                 PCA.pca_top_component_from_moments(folded).collect())
    want = sorted(tuple(r) for r in PCA.pca_top_component(emb).collect())
    assert got == want


def test_pca_explained_variance_matches_numpy(spark, duck):
    """The eval entry's exact-integer ppm equals the float Rayleigh
    ratio to within the quantizer, and the oracle reproduces it
    bit-for-bit."""
    emb = load_table(spark, SF_DIR, "embeddings")
    assert_matches_oracle(
        PCA.pca_explained_variance(emb, 2), duck,
        E.oracle_sql()["pca_explained_variance"])
    got = {r["component"]: r["var_ppm"]
           for r in PCA.pca_explained_variance(emb, 2).collect()}
    X = np.array(emb.select("embedding").toPandas()["embedding"].tolist(),
                 dtype="float64")
    C = np.cov(X.T, bias=True)
    trace = float(np.trace(C))
    rows = PCA.pca_top_components(emb, 2).collect()
    v = {1: np.zeros(64), 2: np.zeros(64)}
    for r in rows:
        v[r["component"]][r["dim"]] = r["loading"]
    for k in (1, 2):
        want = 1e6 * float(v[k] @ C @ v[k]) / trace
        assert abs(got[k] - want) < 50, (k, got[k], want)  # ppm-scale


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


def test_pca_axis_drift_matches_oracle_and_bounds(spark, duck):
    """Axis-drift monitor: oracle bit-match, |cos| <= 1 + quantizer,
    halves partition the corpus, and each half's axis really is that
    half's pca_top_component (the independence contract)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    out = PCA.pca_axis_drift(emb)
    assert_matches_oracle(out, duck, E.oracle_sql()["pca_axis_drift"])
    r = out.first()
    assert abs(r["cos_axes"]) <= 1.0 + 1e-6
    assert r["n_even"] + r["n_odd"] == emb.count()
    va = {x["dim"]: x["loading"] for x in PCA.pca_top_component(
        emb.filter(F.col("vec_id") % 2 == 0)).collect()}
    vb = {x["dim"]: x["loading"] for x in PCA.pca_top_component(
        emb.filter(F.col("vec_id") % 2 == 1)).collect()}
    manual = sum(round(va[i] * vb[i], 7) for i in range(64))
    assert abs(r["cos_axes"] - manual) < 1e-6


def test_axis_drift_parity_fold_seeds_full_moments(spark):
    """The parity-keyed moment build's cell-wise fold must reproduce
    the one-shot full-corpus moment table BIT-FOR-BIT (exact decimal
    additivity), and pca_axis_drift(cache_key=...) must seed the shared
    moment cache so sibling PCA entries skip their corpus scan."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    folded = (PCA.second_moments_by_parity(emb)
              .groupBy("i", "j")
              .agg(F.sum("sij").alias("sij"), F.sum("si").alias("si"),
                   F.sum("n_pairs").alias("n_pairs")))
    one_shot = PCA.second_moments(emb)
    a = {(r["i"], r["j"]): (r["sij"], r["si"], r["n_pairs"])
         for r in folded.collect()}
    b = {(r["i"], r["j"]): (r["sij"], r["si"], r["n_pairs"])
         for r in one_shot.collect()}
    assert a == b
    key = "drift-seed-test"
    PCA.pca_axis_drift(emb, cache_key=key).collect()
    fk = (spark.sparkContext.applicationId, key, 64)
    assert fk in PCA._MOMENTS_CACHE
    cached = {(r["i"], r["j"]): (r["sij"], r["si"], r["n_pairs"])
              for r in PCA._MOMENTS_CACHE[fk].collect()}
    assert cached == b
