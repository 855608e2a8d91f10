"""kNN graph/join tiers (operators/similarity.py): exact broadcast-NL
ground truth over a deterministic query sample vs LSH-bucketed
all-vectors approximation."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_spark.operators import similarity as SIM
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_knn_graph_shape_and_rank(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    n_queries = emb.filter(F.col("vec_id") % 10 == 0).count()
    out = SIM.knn_graph(emb, k=5)
    # every query vector has exactly k ranked neighbors, ranks 1..k
    per_vec = out.groupBy("vec_id").agg(
        F.count("*").alias("c"),
        F.min("rank").alias("lo"), F.max("rank").alias("hi"))
    bad = per_vec.filter(
        (F.col("c") != 5) | (F.col("lo") != 1) | (F.col("hi") != 5)).count()
    assert bad == 0
    assert per_vec.count() == n_queries
    # only query-subset vectors appear on the left side; no self-edges
    assert out.filter(F.col("vec_id") % 10 != 0).count() == 0
    assert out.filter(F.col("vec_id") == F.col("nbr")).count() == 0
    assert out.filter(F.abs(F.col("cosine")) > 1.0 + 1e-6).count() == 0


def test_knn_graph_lsh_recall(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {(r.vec_id, r.nbr) for r in SIM.knn_graph(emb, k=5).collect()}
    # the LSH tier covers ALL vectors; measure recall on the query sample
    # (dense_fallback_pairs=0 forces the LSH path — the fixture is small
    # enough that the cost-based pick would otherwise go dense)
    approx = {(r.vec_id, r.nbr)
              for r in SIM.knn_graph_lsh(
                  emb, k=5, dense_fallback_pairs=0).collect()
              if r.vec_id % 10 == 0}
    # candidates are exact-scored, so approx edges at a given rank are
    # true-cosine-ordered; recall of the exact edge set must be high on
    # the fixture (12 hyperplane tables x 4 bits — see the operator
    # docstring for why the kNN-graph regime is short-code/many-table)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"kNN-graph LSH recall degraded: {recall:.3f}"


def test_knn_graph_lsh_bucket_cap(spark):
    """With a cap that BINDS on the fixture (avg bucket ≈ 31 at 4 bits
    over 500 vectors), the graph stays well-formed and recall degrades
    smoothly, not to zero — the skew-survival property the 100 TB path
    depends on (one dense semantic cluster must not go quadratic)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {(r.vec_id, r.nbr) for r in SIM.knn_graph(emb, k=5).collect()}
    capped = SIM.knn_graph_lsh(emb, k=5, max_bucket=20,
                               dense_fallback_pairs=0)
    rows = capped.collect()
    approx = {(r.vec_id, r.nbr) for r in rows if r.vec_id % 10 == 0}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.35, f"capped recall collapsed: {recall:.3f}"
    # ranks stay dense 1..k' per vector, no self-edges
    per_vec = {}
    for r in rows:
        assert r.vec_id != r.nbr
        per_vec.setdefault(r.vec_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in per_vec.values())


def test_knn_graph_lsh_dense_path_is_exact(spark):
    """Below the dense_fallback threshold the cost-based pick scores all
    pairs off a broadcast: on the query sample the result must EQUAL the
    exact broadcast-NL ground truth (recall 1), and the plan must carry
    no shuffle before the top-k window."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {(r.vec_id, r.nbr) for r in SIM.knn_graph(emb, k=5).collect()}
    dense = SIM.knn_graph_lsh(emb, k=5)  # fixture n=500 → dense path
    got = {(r.vec_id, r.nbr) for r in dense.collect() if r.vec_id % 10 == 0}
    assert got == exact
    plan = dense._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_embedding_quantize_bounds(spark):
    """INT8 quantization invariants: codes in [-127, 127], per-vector
    reconstruction error ≤ scale/2 (the symmetric-quantizer bound), and
    a map-only plan (no Exchange)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    out = SIM.embedding_quantize(emb)
    rows = out.collect()
    assert len(rows) == emb.count()
    for r in rows:
        codes = [int(c) for c in r.qvec.split("|")]
        assert all(-127 <= c <= 127 for c in codes)
        assert r.max_abs_err <= r.scale / 2 * (1 + 1e-9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_centroid_assign_broadcast_and_shape(spark):
    """Nearest-centroid assignment: every vector gets exactly one label;
    the centroid side is broadcast (the big side must not shuffle for
    the join); self-consistency — a vector equal to a centroid would
    pick that centroid (dist2 is nonnegative, argmin deterministic)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    out = SIM.centroid_assign(emb)
    n = emb.count()
    rows = out.collect()
    assert len(rows) == n
    assert all(r.dist2 >= 0 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_semantic_dedup_subbits_refines_clusters(spark):
    """The 100 TB knob (round-4 VERDICT #2): the (label, subcell) cluster
    key must be a STRICT REFINEMENT as subbits grows — hyperplane b of a
    wider key reuses the same md5 seed, so cluster@subbits=4 extends
    cluster@subbits=2 by two more sign bits. Pins: (a) per-vector prefix
    property, (b) cell count non-decreasing, (c) max cell size
    non-increasing — i.e. raising subbits with the corpus holds the
    per-cell quadratic constant instead of n/|labels| growing linearly."""
    emb = load_table(spark, SF_DIR, "embeddings")
    c2 = SIM.semantic_dedup(emb, subbits=2).select("vec_id", "cluster")
    c4 = SIM.semantic_dedup(emb, subbits=4).select(
        "vec_id", F.col("cluster").alias("cluster4"))
    both = {r.vec_id: (r.cluster, None) for r in c2.collect()}
    for r in c4.collect():
        both[r.vec_id] = (both[r.vec_id][0], r.cluster4)
    assert both and all(c4v.startswith(c2v) for c2v, c4v in both.values())
    from collections import Counter
    sizes2 = Counter(v[0] for v in both.values())
    sizes4 = Counter(v[1] for v in both.values())
    assert len(sizes4) >= len(sizes2)
    assert max(sizes4.values()) <= max(sizes2.values())


def test_semantic_dedup_derived_subbits_tracks_corpus(spark):
    """subbits=None derives the knob from the corpus (round-5 VERDICT
    #4): smallest s with expected cell size n/(|labels|*2^s) <= the
    target. Pins, across two corpus sizes: (a) the derived value matches
    the shared formula, (b) the expected-cell-size bound holds at both
    sizes, (c) growing the corpus 4x raises subbits so the bound STILL
    holds (the knob turns itself), (d) realized mean cell size stays
    within 2x the target (hash-uniformity slack)."""
    from collections import Counter

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    nl = emb.select("label").distinct().count()
    SIM.semantic_dedup(emb).count()
    s1 = SIM.LAST_SEMANTIC_SUBBITS
    assert s1 == SIM.derived_subbits(n, nl)
    assert n <= SIM.SEMANTIC_TARGET_CELL * nl * 2 ** s1

    grown = emb
    for i in (1, 2, 3):
        grown = grown.union(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000 * i)))
    out = SIM.semantic_dedup(grown)
    sizes = Counter(r.cluster for r in out.select("cluster").collect())
    s2 = SIM.LAST_SEMANTIC_SUBBITS
    assert s2 == SIM.derived_subbits(4 * n, nl)
    assert s2 > s1
    assert 4 * n <= SIM.SEMANTIC_TARGET_CELL * nl * 2 ** s2
    assert sum(sizes.values()) / len(sizes) <= 2 * SIM.SEMANTIC_TARGET_CELL


def test_lsh_graph_recall_metric(spark, duck):
    """Recall entry: per-query rows for every eval vector, recall_ppm in
    [0, 1e6], a usable mean (the LSH tables are tuned for ≥~0.5 recall
    at driver SFs), and an exact oracle match of the composed metric."""
    import __spark_entry__ as E
    from tests.conftest import SF_DIR, assert_matches_oracle

    out = E.queries()["lsh_graph_recall"](spark, SF_DIR)
    rows = out.collect()
    assert rows and all(0 <= r.recall_ppm <= 1_000_000 for r in rows)
    assert all(r.n_hit <= r.n_exact for r in rows)
    mean_r = sum(r.recall_ppm for r in rows) / len(rows) / 1e6
    assert mean_r >= 0.5, mean_r
    assert_matches_oracle(out, duck, E.oracle_sql()["lsh_graph_recall"])


def test_knn_graph_lsh_queries_mod_equals_filtered_full(spark):
    """queries_mod pushes the eval-sample restriction below the scoring
    stages WITHOUT changing any returned row: the restricted graph must
    equal the unrestricted graph filtered to the sample, on both the
    LSH and dense paths."""
    emb = load_table(spark, SF_DIR, "embeddings")
    for fallback in (0, 8_000_000):
        full = SIM.knn_graph_lsh(emb, dense_fallback_pairs=fallback)
        sampled = SIM.knn_graph_lsh(emb, dense_fallback_pairs=fallback,
                                    queries_mod=10)
        want = {tuple(r) for r in
                full.filter("vec_id % 10 = 0").collect()}
        got = {tuple(r) for r in sampled.collect()}
        assert got == want, f"fallback={fallback}"


def test_margin_mined_pairs_semantics(spark, duck):
    """Every mined pair clears the ratio margin, crosses labels, and is
    the query's top-1 exact neighbor; the mined margin recomputes from
    the graph driver-side; exact oracle match."""
    import __spark_entry__ as E
    from tests.conftest import SF_DIR, assert_matches_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    g = {(r.vec_id, r.rank): r for r in SIM.knn_graph(emb).collect()}
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = SIM.margin_mined_pairs(emb).collect()
    assert out, "fixture should mine at least one cross-label pair"
    for r in out:
        assert r.margin >= 1.02
        assert r.label_a == labels[r.vec_id] != r.label_b == labels[r.nbr]
        assert g[(r.vec_id, 1)].nbr == r.nbr
    assert_matches_oracle(SIM.margin_mined_pairs(emb), duck,
                          E.oracle_sql()["margin_mined_pairs"])


def test_random_projection_matches_hashlib_pin(spark):
    """Independent reconstruction of one vector's projection with
    hashlib + plain Python — pins the md5-sign derivation and the
    scaled-integer arithmetic against a non-Spark implementation."""
    import hashlib

    emb = load_table(spark, SF_DIR, "embeddings").filter("vec_id = 1")
    vec = emb.collect()[0]["embedding"]
    sv = [round(float(x) * 1e7) for x in vec]
    expect = {}
    for m in range(8):
        s = 0
        for j, x in enumerate(sv, start=1):
            h = hashlib.md5(f"rp:{j}:{m}".encode()).hexdigest()
            s += x if h[0] <= "7" else -x
        expect[m] = s
    got = {r["out_dim"]: r["proj_scaled"]
           for r in SIM.random_projection(emb).collect()}
    assert got == expect


def test_rp_distortion_centers_on_unity(spark):
    """The JL unbiasedness check the eval exists for: across pairs the
    mean ratio should hover near 1e6 ppm (loose band — 8 output dims
    is a noisy estimator per pair, but the MEAN concentrates)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = SIM.rp_distortion(emb).collect()
    assert len(rows) >= 400
    mean = sum(r["ratio_ppm"] for r in rows) / len(rows)
    assert 700000 < mean < 1300000


def test_label_separation_orders_tight_vs_loose(spark):
    """Hand clusters: label 0 is tight around (1,0,...), label 1 tight
    around (0,1,...), label 2 is label 0's position but SPREAD — so
    label 2's sep_ratio (inter/intra) must be far below label 1's,
    and labels 0 and 2 are each other's nearest (same position)."""
    import random

    def vec(base, jitter, rng):
        v = [0.0] * 64
        v[0], v[1] = base[0], base[1]
        return [x + rng.uniform(-jitter, jitter) for x in v]

    rng = random.Random(7)
    rows = []
    vid = 0
    for label, base, jit in [(0, (1.0, 0.0), 0.01),
                             (1, (0.0, 1.0), 0.01),
                             (2, (1.0, 0.0), 0.4)]:
        for _ in range(20):
            vid += 1
            rows.append((vid, vec(base, jit, rng), label))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in SIM.label_separation(emb).collect()}
    assert out[0]["nearest_label"] == 2 and out[2]["nearest_label"] == 0
    assert out[2]["sep_ratio"] < out[1]["sep_ratio"] / 10
    assert out[0]["avg_intra_d2"] < out[2]["avg_intra_d2"]
