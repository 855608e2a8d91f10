"""Distributed PCA (top principal components) with an ENGINE-EXACT
contract — the dimensionality-reduction workload (embedding whitening,
drift axes, compression) expressed Spark-first:

1. ONE corpus pass builds the exact scaled-integer second-moment
   sufficient statistics (n, Σq_i, Σq_i·q_j for i ≤ j) — 2 080
   DECIMAL(38,0) accumulators for d = 64, partial-aggregated map-side,
   exactly the operators/profile.corr_matrix discipline at vector
   grain. The covariance NUMERATOR M_ij = n·S_ij − S_i·S_j is then an
   exact decimal (no mean subtraction ever touches a float). The
   moments are ADDITIVE under corpus partition, so a streamed fold of
   per-micro-batch moment tables reaches the identical statistics.
2. POWER ITERATION runs on the d×d matrix only — corpus-size-
   independent, i.e. a BOUNDED artifact (d(d+1)/2 = 2 080 cells at any
   corpus size). The moment table is therefore collected ONCE (the
   sanctioned driver-sized fetch — the ann.py codebook / density.py
   centroid class) and every round's matrix-vector product w_i =
   Σ_j round(M_ij·v_j, 7) runs driver-side in EXACT decimal arithmetic
   that replicates the engines' op-for-op: each per-term product is
   the same IEEE-754 double multiply, the 7 dp HALF_UP quantization is
   performed on the shortest round-trip decimal rendering of that
   double (exactly what Spark's ROUND→DECIMAL(38,8) cast and DuckDB's
   pinned round compute on these values), the sum is an exact decimal
   (order-independent), and the L2 normalization is a fixed IEEE
   sequence (sqrt, one divide per entry). Every round, and the final
   loadings, are bit-identical to the engine spelling — the DuckDB
   oracle still unrolls the same rounds in SQL (the corank/LPA
   discipline: approximate-iterative ≠ unverifiable when each step is
   deterministic). r14 optimization: the previous spelling ran each
   round as a Spark job over a checkpointed 4 096-row matrix —
   ~25 scheduling round-trips of pure latency per component chain for
   arithmetic on a corpus-independent artifact (guide §1.2/§5: the
   driver may do driver-SIZED work; it must not pay cluster latency
   for it).
3. Eigenvector SIGN is arbitrary; it is pinned by forcing the loading
   with the largest |value| (smallest dim on ties) positive.
4. FURTHER components come from per-round PROJECTION against the
   already-extracted directions (Hotelling deflation in projection
   form: w ← w − round(⟨w, v_prev⟩)·v_prev before each normalize).
   Projection is preferred over explicit rank-1 matrix deflation
   because it guarantees orthogonality to the extracted directions up
   to the 7 dp quantizer REGARDLESS of how converged they are —
   subtracting λ̂·v₁v₁ᵀ from the matrix leaves an O(sin θ) contaminant
   when v₁ still carries angle θ of error (measured: 0.06 residual
   cosine on the near-isotropic fixture), while projected iteration
   measures ⟨v₁, v₂⟩ ≈ 1e-7. The projection ops are the same
   quantize-then-IEEE sequence, so the oracle unrolls them verbatim.

Scale shape: the corpus is touched ONCE (the moment build); iterations
touch only the d² matrix — independent of corpus size. mllib's PCA
reaches the same answer via private float accumulation; this spelling
trades a constant factor for auditability, the repo's standing trade.

Public methods: von Mises power iteration, Hotelling deflation /
orthogonal (simultaneous) iteration; sufficient-statistics covariance
is textbook.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = 64          # embedding dimensionality (driver fixture schema)
_SCALE = 10 ** 7  # the functions/vectors scaled-integer contract


def _moment_exprs(d: int):
    """The quantize + upper-triangle-explode expressions shared by the
    one-shot and grouped moment builds."""
    q = F.expr(
        "transform(embedding, x ->"
        f" CAST(ROUND(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))")
    pairs = F.expr(
        f"flatten(transform(sequence(0, {d - 1}), i ->"
        f" transform(sequence(i, {d - 1}), j ->"
        "  struct(i AS i, j AS j,"
        "   CAST(q[i] * q[j] AS DECIMAL(38,0)) AS p,"          # 0-based
        "   CAST(IF(i = j, q[i], 0) AS DECIMAL(38,0)) AS s))))")
    return q, pairs


def second_moments(embeddings: DataFrame, d: int = _D) -> DataFrame:
    """One-pass exact sufficient statistics: a single Aggregate emitting
    n plus Σq_i (per dim) plus Σq_i·q_j (i ≤ j) as DECIMAL(38,0) of the
    7 dp scaled-integer quantization. Long-form map-side explode
    (d(d+1)/2 structs per row), ONE shuffle on (i, j). ADDITIVE under
    corpus partition: per-shard / per-micro-batch tables sum cell-wise
    to the one-shot table (what pipelines.counts_fold_sink folds for
    the streamed twin)."""
    q, pairs = _moment_exprs(d)
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


def second_moments_by_parity(embeddings: DataFrame,
                             d: int = _D) -> DataFrame:
    """:func:`second_moments` with the vec_id parity as an extra group
    key — ONE corpus pass emits BOTH halves' sufficient statistics
    (2·d(d+1)/2 cells), the axis-drift monitor's input. Because the
    moments are exactly additive, folding the two parities cell-wise
    reproduces the full-corpus table bit-for-bit (decimal sums are
    order-independent). Columns: parity, i, j, sij, si, n_pairs."""
    q, pairs = _moment_exprs(d)
    return (
        embeddings.select(
            (F.col("vec_id") % 2).cast("int").alias("parity"),
            q.alias("q"))
        .select("parity", F.explode(pairs).alias("c"))
        .groupBy("parity", F.col("c.i").alias("i"),
                 F.col("c.j").alias("j"))
        .agg(
            F.sum("c.p").alias("sij"),
            F.sum("c.s").alias("si"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


_Q7 = Decimal("1E-7")
_DEC0 = Decimal(0).quantize(_Q7)


def _r7(x: float) -> Decimal:
    """Driver twin of the engines' quantizer on a DOUBLE:
    ``CAST(ROUND(x, 7) AS DECIMAL(38,8))``. Spark's ROUND on DoubleType
    is ``BigDecimal.valueOf(x).setScale(7, HALF_UP)`` — HALF_UP on the
    shortest round-trip decimal rendering of the double (which is what
    ``repr(float)`` produces), and the DECIMAL cast of the resulting
    ≤7 dp double recovers that decimal exactly (a 7 dp value sits
    ~1e-8 from any cast boundary, the double ~1e-17 from the value).
    Zero canonicalized to +0E-7: java.math.BigDecimal has no signed
    zero, python Decimal does."""
    q = Decimal(repr(x)).quantize(_Q7, rounding=ROUND_HALF_UP)
    return _DEC0 if not q else q


def _collected_matrix(mom: DataFrame, d: int) -> tuple[int, list[list[float]]]:
    """ONE driver fetch of the d(d+1)/2-cell sufficient-statistics
    table (bounded artifact — corpus-size-independent, the sanctioned
    codebook/centroid collect class), then the exact covariance
    NUMERATOR M_ij = n·S_ij − S_i·S_j in arbitrary-precision ints
    (≡ the engines' DECIMAL(38,0) arithmetic), rendered to double
    (correctly-rounded nearest, ≡ DECIMAL→DOUBLE cast) and normalized
    by the max |entry| (one IEEE divide per cell) so round-1 products
    sit at O(1) for the 7 dp quantizer — power iteration is
    scale-invariant. n is recovered from the moments themselves: every
    cell counted every corpus row, so max(n_pairs) IS the row count.
    Returns (n, dense normalized d×d matrix)."""
    return _matrix_from_rows(
        mom.select("i", "j", "sij", "si", "n_pairs").collect(), d)


def _matrix_from_rows(rows, d: int) -> tuple[int, list[list[float]]]:
    """:func:`_collected_matrix` over already-fetched moment rows."""
    if not rows:
        # empty corpus/half (ADVICE r14): degrade like the all-zero
        # matrix below (n=0, NaN everywhere) instead of raising on
        # max()/si[i] — the same degenerate shape the mx == 0 branch
        # already returns, and NaN flows through _r7/_iterate quietly
        return 0, [[float("nan")] * d for _ in range(d)]
    n = max(int(r["n_pairs"]) for r in rows)
    si = {int(r["i"]): int(r["si"]) for r in rows if r["i"] == r["j"]}
    m = [[0.0] * d for _ in range(d)]
    for r in rows:
        i, j = int(r["i"]), int(r["j"])
        val = float(n * int(r["sij"]) - si[i] * si[j])
        m[i][j] = val
        m[j][i] = val
    mx = max(abs(x) for row in m for x in row)
    if mx == 0.0:  # degenerate all-zero corpus: same NaNs as 0/0 doubles
        return n, [[float("nan")] * d for _ in range(d)]
    return n, [[x / mx for x in row] for row in m]


def _iterate(m: list[list[float]], d: int, n_iters: int,
             ortho: list[list[float]] | None = None) -> list[float]:
    """``n_iters`` power-iteration rounds on the collected normalized
    d×d matrix ``m``, starting from the exact 1/sqrt(d) uniform vector,
    optionally PROJECTING each round's product against the
    already-extracted directions in ``ortho`` (in order). Returns the
    converged unit vector as a Python list (index = dim).

    Determinism: every step replicates the engine spelling op-for-op —
    w_i = Σ_j round(m_ij·v_j, 7) with IEEE double products, 7 dp
    HALF_UP quantization (:func:`_r7`) and an exact decimal sum; each
    projection w ← round(w − ⟨w,o⟩₇·o, 7) the same way; then
    nrm = sqrt(Σ round(w², 7)) and one IEEE divide per entry — so the
    iterate, and the loadings, are bit-for-bit what the previous
    Spark-job-per-round spelling produced and what the DuckDB oracle's
    unrolled rounds produce."""
    import math

    v = [1.0 / (d ** 0.5)] * d
    for _ in range(n_iters):
        w = [float(sum((_r7(m[i][j] * v[j]) for j in range(d)), _DEC0))
             for i in range(d)]
        for o in (ortho or []):
            c = float(sum((_r7(w[i] * o[i]) for i in range(d)), _DEC0))
            w = [float(_r7(w[i] - c * o[i])) for i in range(d)]
        nrm = math.sqrt(float(sum((_r7(x * x) for x in w), _DEC0)))
        v = [x / nrm for x in w]
    return v


def _pin_sign(v: list[float]) -> list[float]:
    """Eigenvector sign is arbitrary; pin it by forcing the loading with
    the largest |value| (smallest dim on ties) positive — the mirror of
    the oracle's MAX(struct(abs(v), -dim, signum(v))) over d rows."""
    best = max(range(len(v)), key=lambda i: (abs(v[i]), -i))
    s = 1.0 if v[best] > 0 else (-1.0 if v[best] < 0 else 0.0)
    return [x * s for x in v]


# Build-once loadings cache (the bpe_train/_MERGE_CACHE shape): PCA
# loadings are a trained ARTIFACT — computed once per corpus, applied
# forever. Projected iteration is PREFIX-STABLE (component k's chain
# never looks at components > k), so one cached n-component build
# serves every smaller request by slicing. Callers modelling the
# train-once deployment (bench, long-lived sessions) pass ``cache_key``.
_LOADINGS_CACHE: dict[tuple, list[list[float]]] = {}

# Checkpointed-moments cache: the ONE corpus pass under every PCA
# entry. App-scoped (a new Spark application must never see a stale
# localCheckpoint handle — the frequent_pairs _PAIRS_CACHE discipline).
_MOMENTS_CACHE: dict[tuple, DataFrame] = {}


def cached_second_moments(embeddings: DataFrame, d: int = _D,
                          cache_key: str | None = None) -> DataFrame:
    """:func:`second_moments`, localCheckpointed and memoized per
    (application, cache_key, d) — the moment table is the shared input
    of the loadings build, the trace, and the streamed fold's one-shot
    twin, so the corpus pass pays once per session."""
    if cache_key is None:
        return second_moments(embeddings, d)
    ck = (embeddings.sparkSession.sparkContext.applicationId,
          cache_key, d)
    got = _MOMENTS_CACHE.get(ck)
    if got is None:
        got = second_moments(embeddings, d).localCheckpoint(eager=True)
        _MOMENTS_CACHE[ck] = got
    return got


def _loading_vectors(mom: DataFrame, n_components: int, n_iters: int,
                     d: int, cache_key: str | None = None
                     ) -> list[list[float]]:
    """The top ``n_components`` sign-pinned unit loading vectors from a
    sufficient-statistics table: ONE collect of the bounded moment
    table (:func:`_collected_matrix`), then per component a projected
    power iteration against all prior (UNPINNED) directions —
    projection is sign-invariant only through its paired ⟨w,o⟩·o use,
    and the oracle replays the same unpinned chain."""
    ck = (cache_key, n_iters, d) if cache_key is not None else None
    if ck is not None:
        cached = _LOADINGS_CACHE.get(ck)
        if cached is not None and len(cached) >= n_components:
            return cached[:n_components]
    _n, m = _collected_matrix(mom, d)
    raw: list[list[float]] = []
    for _ in range(n_components):
        raw.append(_iterate(m, d, n_iters, ortho=raw))
    pinned = [_pin_sign(v) for v in raw]
    if ck is not None:
        _LOADINGS_CACHE[ck] = pinned
    return pinned


def _as_loading_df(spark, vecs: list[list[float]],
                   with_component: bool) -> DataFrame:
    rows = [
        (comp, dim, val)
        for comp, v in enumerate(vecs, start=1)
        for dim, val in enumerate(v)
    ]
    df = spark.createDataFrame(
        rows, "component int, dim int, loading double")
    return df if with_component else df.select("dim", "loading")


def pca_top_component(embeddings: DataFrame, n_iters: int = 8,
                      d: int = _D, cache_key: str | None = None
                      ) -> DataFrame:
    """Top principal direction by ``n_iters`` power iterations from the
    uniform start vector (1/sqrt(d) exactly). Columns: dim, loading.

    Per round: w_i = Σ_j round(M_ij·v_j, 7) (DECIMAL(38,8),
    order-independent), then v = w / sqrt(Σ round(w_i², 7)) — one IEEE
    sqrt + divide per component, fixed sequence. Sign pinned positive
    at the max-|loading| dim (smallest dim on ties)."""
    return pca_top_component_from_moments(
        cached_second_moments(embeddings, d, cache_key), n_iters, d,
        cache_key=cache_key)


def pca_top_component_from_moments(mom: DataFrame, n_iters: int = 8,
                                   d: int = _D,
                                   cache_key: str | None = None
                                   ) -> DataFrame:
    """:func:`pca_top_component` starting from an already-built (or
    streamed-and-folded) sufficient-statistics table — the moments are
    exactly additive under corpus partition, so the streamed fold's
    final state reaches the SAME loadings bit-for-bit and shares the
    batch oracle verbatim."""
    vecs = _loading_vectors(mom, 1, n_iters, d, cache_key=cache_key)
    return _as_loading_df(mom.sparkSession, vecs, with_component=False)


def pca_top_components(embeddings: DataFrame, n_components: int = 2,
                       n_iters: int = 8, d: int = _D,
                       cache_key: str | None = None) -> DataFrame:
    """Top ``n_components`` principal directions by projected power
    iteration (Hotelling deflation in projection form): component 1
    exactly as :func:`pca_top_component`; each next component iterates
    with a per-round projection against all prior directions — the d²
    iteration cost structure is unchanged and the corpus is still
    touched ONCE (the shared moment build). Per-component sign pins as
    the solo path. Columns: component (1-based), dim, loading."""
    return pca_top_components_from_moments(
        cached_second_moments(embeddings, d, cache_key), n_components,
        n_iters, d, cache_key=cache_key)


def pca_top_components_from_moments(mom: DataFrame, n_components: int = 2,
                                    n_iters: int = 8,
                                    d: int = _D,
                                    cache_key: str | None = None
                                    ) -> DataFrame:
    vecs = _loading_vectors(mom, n_components, n_iters, d,
                            cache_key=cache_key)
    return _as_loading_df(mom.sparkSession, vecs, with_component=True)


def _scores_df(embeddings: DataFrame,
               vecs: list[list[float]]) -> DataFrame:
    """One corpus scan projecting every vector onto each loading vector
    (array-literal loadings, per-component 7 dp-quantized decimal
    dots). Columns: vec_id, score1..score{n}."""
    from spark_streaming_spark.sources.batch import widen

    out = widen(embeddings)
    cols = []
    for k, v in enumerate(vecs, start=1):
        out = out.withColumn(f"__pc{k}", F.array(*[F.lit(float(x))
                                                   for x in v]))
        cols.append(F.expr(
            f"cast(aggregate(zip_with(embedding, __pc{k},"
            " (x, l) -> cast(round(cast(x as double) * l, 7)"
            " as decimal(38,8))),"
            " cast(0 as decimal(38,8)),"
            " (acc, t) -> cast(acc + t as decimal(38,8))) as double)")
            .alias(f"score{k}"))
    return out.select("vec_id", *cols)


def pca_scores_multi(embeddings: DataFrame, n_components: int = 2,
                     n_iters: int = 8, d: int = _D,
                     cache_key: str | None = None) -> DataFrame:
    """Per-vector projection onto the top ``n_components`` components —
    the dimensionality-REDUCTION serving step (the 2-D embedding map
    every corpus-visualization/drift dashboard wants): all component
    loadings ride the plan as array literals, each score is the same
    7 dp-quantized decimal dot as :func:`pca_scores`, one corpus scan
    for all components. Columns: vec_id, score1..score{n}."""
    vecs = _loading_vectors(cached_second_moments(embeddings, d, cache_key),
                            n_components, n_iters, d,
                            cache_key=cache_key)
    return _scores_df(embeddings, vecs)


def pca_explained_variance(embeddings: DataFrame, n_components: int = 2,
                           n_iters: int = 8, d: int = _D,
                           cache_key: str | None = None) -> DataFrame:
    """The EVAL step completing the PCA tier (train → serve →
    evaluate): per-component captured-variance share in exact integer
    ppm. var_ppm_k = (1e6 · VarNum(s_k)) DIV TraceNum where

    * VarNum(s) = n·Σŝ² − (Σŝ)² over the 1e7-scaled integer scores
      ŝ = round(score·1e7) (scores are 7 dp-quantized decimal dots, so
      ŝ recovers them exactly — every sum is an exact DECIMAL(38,0)),
    * TraceNum = Σ_i (n·S_ii − S_i²) from the SAME second-moment table
      (the q = round(x·1e7) scaled-integer quantization, so both sides
      carry the identical 1e14 scale factor and the ratio is pure).

    The final DIV is exact integer division (Spark ``div`` ≡ DuckDB
    ``//`` on nonnegative exact decimals — pinned), computed from two
    1-row aggregates (sanctioned scalar fetches). On the near-isotropic
    fixture each component captures ~λ_k/trace ≈ 2–3% — small and
    CORRECT. Columns: component, var_ppm."""
    mom = cached_second_moments(embeddings, d, cache_key)
    if cache_key is None:
        mom = mom.localCheckpoint(eager=True)
    vecs = _loading_vectors(mom, n_components, n_iters, d,
                            cache_key=cache_key)
    sc = _scores_df(embeddings, vecs)
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for k in range(1, n_components + 1):
        sint = (f"CAST(CAST(ROUND(score{k} * {_SCALE}) AS BIGINT)"
                " AS DECIMAL(38,0))")
        aggs.append(F.expr(f"SUM({sint})").alias(f"s{k}"))
        aggs.append(F.expr(f"SUM({sint} * {sint})").alias(f"ss{k}"))
    sums = sc.agg(*aggs).first()
    n_dec = int(sums["n"])
    # trace + n from ONE bounded diag fetch (d rows) instead of two
    # aggregate jobs — exact Python-int arithmetic ≡ the DECIMAL(38,0)
    # expression it replaces
    diag = mom.filter(F.col("i") == F.col("j")).select(
        "sij", "si", "n_pairs").collect()
    mom_n = max(int(r["n_pairs"]) for r in diag)
    trace = sum(mom_n * int(r["sij"]) - int(r["si"]) ** 2 for r in diag)
    rows = []
    for k in range(1, n_components + 1):
        num = n_dec * int(sums[f"ss{k}"]) - int(sums[f"s{k}"]) ** 2
        # exact integer floor division on nonnegative ints — identical
        # to the engines' DIV / // on the same exact decimals
        rows.append((k, (1_000_000 * num) // trace))
    return embeddings.sparkSession.createDataFrame(
        rows, "component int, var_ppm long")


def pca_scores(embeddings: DataFrame, n_iters: int = 8,
               d: int = _D, cache_key: str | None = None) -> DataFrame:
    """Per-vector projection onto the top component — the map-only
    SERVING step: the d loadings ride the plan as an array literal
    (the broadcast-artifact shape), the score is the 7 dp-quantized
    decimal dot (deterministic). Columns: vec_id, score."""
    vecs = _loading_vectors(cached_second_moments(embeddings, d, cache_key),
                            1, n_iters, d, cache_key=cache_key)
    from spark_streaming_spark.sources.batch import widen

    pc = F.array(*[F.lit(float(x)) for x in vecs[0]])
    dot = F.expr(
        "cast(aggregate(zip_with(embedding, pc,"
        " (x, l) -> cast(round(cast(x as double) * l, 7)"
        " as decimal(38,8))),"
        " cast(0 as decimal(38,8)),"
        " (acc, t) -> cast(acc + t as decimal(38,8))) as double)")
    return (
        widen(embeddings).withColumn("pc", pc)
        .select("vec_id", dot.alias("score"))
    )


def pca_axis_drift(embeddings: DataFrame, n_iters: int = 8,
                   d: int = _D, cache_key: str | None = None) -> DataFrame:
    """EMBEDDING-DISTRIBUTION drift between two corpus halves — the
    monitoring statistic the PCA tier exists to serve (did yesterday's
    principal axis move?): the top component is extracted independently
    from the even- and odd-vec_id halves (two moment builds, two
    iteration chains — each the exact :func:`pca_top_component`
    contract), and the report is their alignment cosine plus each
    half's top-axis variance numerator share. |cos| near 1 = the
    dominant axis is stable; the sign ambiguity is already pinned per
    half, and the cosine of two unit vectors needs no denominator.

    Determinism: the two loading vectors are bit-exact by the tier's
    contract; the cosine is the 7 dp-quantized decimal dot of two
    64-double plan literals, summed engine-side (order-free decimals).
    Columns: cos_axes (double), n_even, n_odd (BIGINT).

    Scale shape: ONE corpus pass (the parity-keyed moment build —
    formerly two moment scans plus two count() scans); both halves'
    counts are recovered from the moment cells themselves, and the
    parity fold repopulates the full-corpus moment cache for the
    sibling PCA entries (the moments are exactly additive)."""
    spark = embeddings.sparkSession
    if cache_key is not None:
        pk = (spark.sparkContext.applicationId, "parity:" + cache_key, d)
        mom2 = _MOMENTS_CACHE.get(pk)
        if mom2 is None:
            mom2 = (second_moments_by_parity(embeddings, d)
                    .localCheckpoint(eager=True))
            _MOMENTS_CACHE[pk] = mom2
            # cell-wise parity fold == the full-corpus moment table
            # bit-for-bit -> seed the shared cache so the loadings /
            # scores / explained-variance siblings skip their scan
            fk = (spark.sparkContext.applicationId, cache_key, d)
            if fk not in _MOMENTS_CACHE:
                _MOMENTS_CACHE[fk] = (
                    mom2.groupBy("i", "j")
                    .agg(F.sum("sij").alias("sij"),
                         F.sum("si").alias("si"),
                         F.sum("n_pairs").alias("n_pairs"))
                    .localCheckpoint(eager=True))
    else:
        # no cache to seed: the single consumer below is one bounded
        # collect, so the parity build needs no lineage checkpoint
        mom2 = second_moments_by_parity(embeddings, d)
    # ONE driver fetch of the 2·d(d+1)/2-cell parity table (bounded
    # artifact), split driver-side: every moment cell counted every
    # half row, so max(n_pairs) IS each half's n
    rows = mom2.select("parity", "i", "j", "sij", "si",
                       "n_pairs").collect()
    n_even, mat_e = _matrix_from_rows(
        [r for r in rows if r["parity"] == 0], d)
    n_odd, mat_o = _matrix_from_rows(
        [r for r in rows if r["parity"] == 1], d)
    va = _pin_sign(_iterate(mat_e, d, n_iters))
    vb = _pin_sign(_iterate(mat_o, d, n_iters))
    arr_a = F.array(*[F.lit(float(x)) for x in va])
    arr_b = F.array(*[F.lit(float(x)) for x in vb])
    return (
        spark.range(1)
        .select(arr_a.alias("a"), arr_b.alias("b"))
        .select(
            F.expr(
                "cast(aggregate(zip_with(a, b,"
                " (x, y) -> cast(round(x * y, 7) as decimal(38,8))),"
                " cast(0 as decimal(38,8)),"
                " (acc, t) -> cast(acc + t as decimal(38,8)))"
                " as double)").alias("cos_axes"),
            F.lit(n_even).cast("long").alias("n_even"),
            F.lit(n_odd).cast("long").alias("n_odd"),
        )
    )
