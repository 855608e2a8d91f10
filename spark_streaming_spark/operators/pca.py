"""Distributed PCA (top principal component) with an ENGINE-EXACT
contract — the dimensionality-reduction workload (embedding whitening,
drift axes, compression) expressed Spark-first:

1. ONE corpus pass builds the exact scaled-integer second-moment
   sufficient statistics (n, Σq_i, Σq_i·q_j for i ≤ j) — 2 080
   DECIMAL(38,0) accumulators for d = 64, partial-aggregated map-side,
   exactly the operators/profile.corr_matrix discipline at vector
   grain. The covariance NUMERATOR M_ij = n·S_ij − S_i·S_j is then an
   exact decimal (no mean subtraction ever touches a float).
2. POWER ITERATION on the d×d matrix runs as unrolled rounds of
   matrix-vector products (join + partial-agged sum keyed on the dim —
   the supplier_corank shape at d² = 4 096 rows, trivially cheap and
   broadcastable at any corpus size): per-term products quantize to
   7 dp DECIMAL(38,8) before the order-independent sum, the L2
   normalization is a fixed IEEE sequence — so every round, and the
   final loadings, are bit-identical on any engine and the DuckDB
   oracle just unrolls the same rounds (the corank/LPA discipline:
   approximate-iterative ≠ unverifiable when each step is
   deterministic).
3. Eigenvector SIGN is arbitrary; it is pinned by forcing the loading
   with the largest |value| (smallest dim on ties) positive.

Scale shape: the corpus is touched ONCE (the moment build); iterations
touch only the d² matrix — independent of corpus size. mllib's PCA
reaches the same answer via private float accumulation; this spelling
trades a constant factor for auditability, the repo's standing trade.

Public method: von Mises power iteration; sufficient-statistics
covariance is textbook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = 64          # embedding dimensionality (driver fixture schema)
_SCALE = 10 ** 7  # the functions/vectors scaled-integer contract


def second_moments(embeddings: DataFrame, d: int = _D) -> DataFrame:
    """One-pass exact sufficient statistics: a single Aggregate emitting
    n plus Σq_i (per dim) plus Σq_i·q_j (i ≤ j) as DECIMAL(38,0) of the
    7 dp scaled-integer quantization. Long-form map-side explode
    (d(d+1)/2 structs per row), ONE shuffle on (i, j)."""
    q = F.expr(
        "transform(embedding, x ->"
        f" CAST(ROUND(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))")
    pairs = F.expr(
        f"flatten(transform(sequence(0, {d - 1}), i ->"
        f" transform(sequence(i, {d - 1}), j ->"
        "  struct(i AS i, j AS j,"
        "   CAST(q[i] * q[j] AS DECIMAL(38,0)) AS p,"          # 0-based
        "   CAST(IF(i = j, q[i], 0) AS DECIMAL(38,0)) AS s))))")
    return (
        embeddings.select(q.alias("q"))
        .select(F.explode(pairs).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
        .agg(
            F.sum("c.p").alias("sij"),
            F.sum("c.s").alias("si"),   # nonzero only on the diagonal
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


def cov_numerator(embeddings: DataFrame, d: int = _D) -> DataFrame:
    """Symmetric covariance NUMERATOR M_ij = n·S_ij − S_i·S_j as exact
    decimals cast to double — both triangles emitted so the iteration
    is one plain join. Columns: i, j, m."""
    mom = second_moments(embeddings, d)
    n = embeddings.count()  # 1-scalar driver fetch, sanctioned
    diag = mom.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("k"), F.col("si"))
    upper = (
        mom.join(F.broadcast(diag.withColumnRenamed("k", "i")
                 .withColumnRenamed("si", "si_i")), "i")
        .join(F.broadcast(diag.withColumnRenamed("k", "j")
              .withColumnRenamed("si", "si_j")), "j")
        .select(
            "i", "j",
            (F.lit(n).cast("decimal(38,0)") * F.col("sij")
             - F.col("si_i") * F.col("si_j")).cast("double").alias("m"),
        )
    )
    lower = upper.filter(F.col("i") != F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "m")
    return upper.unionByName(lower)


def pca_top_component(embeddings: DataFrame, n_iters: int = 8,
                      d: int = _D) -> DataFrame:
    """Top principal direction by ``n_iters`` power iterations from the
    uniform start vector (1/sqrt(d) exactly). Columns: dim, loading.

    Per round: w_i = Σ_j round(M_ij·v_j, 7) (DECIMAL(38,8),
    order-independent), then v = w / sqrt(Σ round(w_i², 7)) — one IEEE
    sqrt + divide per component, fixed sequence. Sign pinned positive
    at the max-|loading| dim (smallest dim on ties)."""
    from pyspark.sql.window import Window

    raw = cov_numerator(embeddings, d)
    # normalize by the max |entry| so round-1 products sit at O(1) for
    # the 7 dp quantizer (power iteration is scale-invariant; the max is
    # a deterministic reduction of exact decimals, the divide one IEEE
    # op — cross-engine identical)
    mmax = raw.agg(F.max(F.abs(F.col("m"))).alias("mx"))
    m = (raw.crossJoin(F.broadcast(mmax))
         .select("i", "j", (F.col("m") / F.col("mx")).alias("m"))
         .localCheckpoint(eager=True))
    spark = embeddings.sparkSession
    v = spark.range(d).select(
        F.col("id").cast("int").alias("j"),
        F.lit(1.0 / (d ** 0.5)).alias("v"),
    )
    contrib = F.expr("cast(round(m * v, 7) as decimal(38,8))")
    for _ in range(n_iters):
        w = (
            m.join(F.broadcast(v), "j")
            .select("i", contrib.alias("c"))
            .groupBy("i")
            .agg(F.sum("c").cast("double").alias("w"))
        )
        nrm = F.sqrt(F.sum(F.expr(
            "cast(round(w * w, 7) as decimal(38,8))"))
            .cast("double")).alias("nrm")
        v = (
            w.crossJoin(F.broadcast(w.agg(nrm)))
            .select(F.col("i").alias("j"), (F.col("w") / F.col("nrm"))
                    .alias("v"))
            .localCheckpoint(eager=True)
        )
    sgn = F.max(F.struct(
        F.abs(F.col("v")).alias("a"),
        (-F.col("j")).alias("negd"),
        F.signum("v").alias("s"),
    )).over(Window.partitionBy())
    return (
        v.withColumn("__sgn", sgn.getField("s"))
        .select(F.col("j").alias("dim"),
                (F.col("v") * F.col("__sgn")).alias("loading"))
    )


def pca_scores(embeddings: DataFrame, n_iters: int = 8,
               d: int = _D) -> DataFrame:
    """Per-vector projection onto the top component — the map-only
    SERVING step: the d loadings broadcast, the score is the
    7 dp-quantized decimal dot (deterministic). Columns: vec_id,
    score."""
    load = pca_top_component(embeddings, n_iters, d)
    arr = (
        load.groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("dim", "loading")))
             .alias("a"))
        .select(F.expr("transform(a, x -> x.loading)").alias("pc"))
    )
    from spark_streaming_spark.sources.batch import widen

    dot = F.expr(
        "cast(aggregate(zip_with(embedding, pc,"
        " (x, l) -> cast(round(cast(x as double) * l, 7)"
        " as decimal(38,8))),"
        " cast(0 as decimal(38,8)),"
        " (acc, t) -> cast(acc + t as decimal(38,8))) as double)")
    return (
        widen(embeddings).crossJoin(F.broadcast(arr))
        .select("vec_id", dot.alias("score"))
    )
