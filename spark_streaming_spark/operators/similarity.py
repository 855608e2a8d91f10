"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k is the correctness baseline; sign-LSH bucketed
pairing is the scale path (bucket-local joins instead of the all-pairs
product). Everything is built from JVM-side higher-order array functions
(``zip_with`` / ``aggregate``) — no Python UDF in the hot path.

Determinism contract (shared with the DuckDB oracle): every per-element
product is rounded to 7 dp and accumulated as DECIMAL(38,8), so dot
products are exact, order-independent, and engine-identical; the final
cosine is a single double division both engines share. See
functions/vectors.py.

Scale notes: top-k against a single query vector is a map-only pass +
TakeOrderedAndProject (no shuffle). The pairwise variant buckets by an
8-bit sign LSH before joining; at 100 TB you'd raise the bucket width and
add multiple hyperplane tables, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_spark.functions.vectors import (
    cosine_expr,
    dot_expr,
    norm2_expr,
)


def knn_to_query(embeddings: DataFrame, query_vec_id: int = 0,
                 k: int = 10) -> DataFrame:
    """Top-k nearest neighbors (cosine) of one stored vector.
    Columns: vec_id, cosine.

    The 1-row query side is crossJoin(broadcast(...)) — a map-side lookup,
    not a shuffle; then TakeOrderedAndProject caps driver transfer at k.
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"),
        F.sqrt(norm2_expr("embedding")).alias("qnrm"),  # once, not per row
    )
    return (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_vec_id)
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


def sign_bucket(vec: str, bits: int = 8) -> F.Column:
    """Axis-aligned random-hyperplane LSH: bit i = sign(vec[i]).
    Deterministic and SQL-expressible, so the oracle can reproduce the
    exact bucketing (recall is approximate; the *result* is not)."""
    return F.concat(*[
        F.when(F.element_at(F.col(vec), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ])


def similar_pairs_lsh(embeddings: DataFrame, threshold: float = 0.4,
                      bits: int = 8) -> DataFrame:
    """Near-neighbor pairs within sign-LSH buckets, cosine ≥ threshold.
    Columns: vec_a, vec_b, cosine (vec_a < vec_b).

    Join keys on the bucket string → the quadratic blowup is bucket-local
    (2^bits buckets). The follow-up cosine uses the decimal-exact path.
    """
    # norms hoisted out of the pair join: O(N) norm computations instead
    # of O(pairs) — bitwise-identical cosine (each norm is a per-vector
    # decimal sum either way)
    tagged = embeddings.select(
        "vec_id", "embedding",
        sign_bucket("embedding", bits).alias("bucket"),
        F.sqrt(norm2_expr("embedding")).alias("nrm"),
    )
    a = tagged.alias("a")
    b = tagged.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                dot_expr("a.embedding", "b.embedding")
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid in long form: (label, dim, centroid) — the
    distributed layout for mean vectors (posexplode → groupBy(label, dim)).
    Decimal-stable mean per dimension. Columns: label, dim, centroid."""
    long_form = embeddings.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    mean = (
        F.sum(F.round(F.col("x").cast("double"), 7).cast("decimal(38,8)"))
        .cast("double") / F.count("x")
    )
    return long_form.groupBy("label", "dim").agg(mean.alias("centroid"))


def embedding_norms(embeddings: DataFrame) -> DataFrame:
    """L2 norms (decimal-exact accumulation). Columns: vec_id, label, l2."""
    return embeddings.select(
        "vec_id", "label", F.sqrt(norm2_expr("embedding")).alias("l2")
    )
