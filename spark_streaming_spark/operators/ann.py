"""IVF-style approximate nearest neighbor search (scale path beyond the
brute-force baseline in operators/similarity.py).

Classic IVF: k-means coarse centroids partition the vector space; a
query probes only the ``nprobe`` closest cells. At 100 TB the inverted
lists live partitioned-by-cell in storage, so a query scans nprobe/k of
the data — partition pruning for vectors.

Built on pyspark.ml KMeans (seeded, deterministic locally) + the same
decimal-exact cosine used everywhere. When ``nprobe == n_cells`` the
search is exhaustive and must exactly equal brute force — the invariant
tests/test_ann.py pins; recall at small nprobe is reported, not pinned
(it depends on the data's cluster structure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from spark_streaming_spark.functions.vectors import dot_expr, norm2_expr


def _with_dense_vec(embeddings: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    # NOT widened: the k-means fit iterates, and each iteration pays
    # per-task scheduling — on a small sampled fit, 32 tiny splits cost
    # more than the single-split map saves (measured 1.4s -> 1.9s)
    return embeddings.withColumn("_vec", array_to_vector("embedding"))


def build_ivf_index(embeddings: DataFrame, n_cells: int = 16,
                    seed: int = 42) -> tuple[DataFrame, "object"]:
    """Assign every vector to a k-means cell. Returns (assigned, model):
    assigned = embeddings + ``cell`` column. In a persisted deployment
    ``assigned`` would be written partitioned by cell."""
    from pyspark.ml.clustering import KMeans

    with_vec = _with_dense_vec(embeddings)
    # Coarse-quantizer training discipline (standard IVF practice):
    # fit on a bounded sample — cell quality saturates at a few hundred
    # points per cell — then assign the FULL dataset with the model.
    # At 100 TB this is the difference between an O(sample) driver-side
    # fit and an iterative full-data job; 4 iterations is ample for
    # assignment quality (the quantizer needn't converge — standard IVF
    # training discipline; halving iterations halved local fit time with
    # no recall change on the fixture).
    train = with_vec.select("_vec")
    target = 400 * n_cells
    n = train.count()
    if n > target:
        train = train.sample(fraction=target / n, seed=seed)
    km = KMeans(k=n_cells, seed=seed, maxIter=4,
                featuresCol="_vec", predictionCol="cell")
    model = km.fit(train)
    return model.transform(with_vec).drop("_vec"), model


def knn_ivf(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10,
            n_cells: int = 16, nprobe: int = 4) -> DataFrame:
    """Top-k cosine neighbors probing only the nprobe nearest cells.
    Columns: vec_id, cosine."""
    assigned, model = build_ivf_index(embeddings, n_cells)
    q_rows = (
        assigned.filter(F.col("vec_id") == query_vec_id)
        .select("embedding", "cell")
        .collect()
    )
    if not q_rows:
        raise KeyError(f"query vector {query_vec_id} not found")
    # rank cells by centroid similarity to the query — driver-side over
    # the tiny centroid table (n_cells rows), never over the data
    import numpy as np

    qv = np.asarray(q_rows[0].embedding, dtype="float64")
    centers = model.clusterCenters()
    order = sorted(
        range(len(centers)),
        key=lambda c: -float(
            np.dot(qv, centers[c])
            / (np.linalg.norm(qv) * (np.linalg.norm(centers[c]) or 1.0))
        ),
    )
    probe = order[:nprobe]
    qdf = (
        assigned.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.col("embedding").alias("qv"),
            F.sqrt(norm2_expr("embedding")).alias("qnrm"),
        )
    )
    return (
        assigned.filter(F.col("cell").isin(probe))
        .filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qdf))
        .select(
            "vec_id",
            (
                dot_expr("embedding", "qv")
                / (F.sqrt(norm2_expr("embedding")) * F.col("qnrm"))
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )
