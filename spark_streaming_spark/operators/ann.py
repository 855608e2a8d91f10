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

# Train-once artifact cache (index build vs. serve separation): a real
# vector store trains its coarse quantizer / PQ codebooks ONCE at index
# build time and serves every query off the trained artifact — it never
# re-fits k-means per query. Callers that model repeated serving (the
# bench entries, a long-lived session) pass ``cache_key`` (any stable
# identifier for the input corpus, e.g. its path) to memoize the fit;
# callers without a key get the uncached fit-per-call behavior.
_ARTIFACT_CACHE: dict = {}


def _with_dense_vec(embeddings: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    # NOT widened: the k-means fit iterates, and each iteration pays
    # per-task scheduling — on a small sampled fit, 32 tiny splits cost
    # more than the single-split map saves (measured 1.4s -> 1.9s)
    return embeddings.withColumn("_vec", array_to_vector("embedding"))


def build_ivf_index(embeddings: DataFrame, n_cells: int = 16,
                    seed: int = 42,
                    cache_key: str | None = None) -> tuple[DataFrame, "object"]:
    """Assign every vector to a k-means cell. Returns (assigned, model):
    assigned = embeddings + ``cell`` column. In a persisted deployment
    ``assigned`` would be written partitioned by cell."""
    from pyspark.ml.clustering import KMeans

    ck = ("ivf", cache_key, n_cells, seed,
          embeddings.sparkSession.sparkContext.applicationId) \
        if cache_key is not None else None
    if ck is not None and ck in _ARTIFACT_CACHE:
        return _ARTIFACT_CACHE[ck]

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
    out = model.transform(with_vec).drop("_vec"), model
    if ck is not None:
        _ARTIFACT_CACHE[ck] = out
    return out


def knn_ivf(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10,
            n_cells: int = 16, nprobe: int = 4,
            cache_key: str | None = None) -> DataFrame:
    """Top-k cosine neighbors probing only the nprobe nearest cells.
    Columns: vec_id, cosine."""
    assigned, model = build_ivf_index(embeddings, n_cells,
                                      cache_key=cache_key)
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


# ---------------------------------------------------------------------------
# Deterministic IVF (the auditable-index-build twin of knn_ivf)
#
# pyspark.ml KMeans is seeded but engine-private (k-means|| init, float
# accumulation order), so knn_ivf can only ever be a rows-only driver
# entry. This twin builds the coarse quantizer with arithmetic BOTH
# engines reproduce bit-for-bit — md5-ordered seed pick + one Lloyd
# round under the repo's decimal contract — so the ENTIRE IVF search
# (cell assignment, probe choice, final ranking) carries a hash-checked
# DuckDB oracle (the knn_graph_lsh rationale: a deterministic
# approximation is itself verifiable). A reproducible quantizer is also
# what a production index wants: rebuild the index from the same corpus
# anywhere and get byte-identical cells, so index artifacts can be
# diffed, cached and audited.
# ---------------------------------------------------------------------------

_DET_SEED_TAG = "ivfdet1"


def _cell_dist2(cvec_col: str = "cvec") -> F.Column:
    """Squared L2 to a centroid array under the decimal contract — the
    assign_with_centroids spelling (operators/similarity.py), reused so
    oracle SQL and plan stay bit-identical."""
    return F.expr(
        f"cast(aggregate(zip_with(embedding, {cvec_col},"
        " (x, c) -> cast(round((cast(x as double) - c)"
        " * (cast(x as double) - c), 7) as decimal(38,8))),"
        " cast(0 as decimal(38,8)),"
        " (acc, v) -> cast(acc + v as decimal(38,8))) as double)"
    )


def _assign_cells(embeddings: DataFrame, cells: DataFrame) -> DataFrame:
    """(vec_id, cell) by argmin dist2 over the broadcast centroid table;
    struct-min aggregation (map-side partial), ties break on cell asc."""
    from spark_streaming_spark.sources.batch import widen

    return (
        widen(embeddings).crossJoin(F.broadcast(cells))
        .select("vec_id", "cell", _cell_dist2().alias("dist2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist2", "cell")).alias("m"))
        .select("vec_id", F.col("m.cell").alias("cell"))
    )


_ANN_INDEX_CACHE: dict = {}


def det_kmeans_cells(embeddings: DataFrame, n_cells: int = 8,
                     cache_key: str | None = None
                     ) -> tuple[DataFrame, DataFrame]:
    """Deterministic coarse quantizer: seeds are the ``n_cells`` vectors
    with the smallest md5 hash (engine-neutral pseudo-random pick), then
    ONE Lloyd round — assign to seeds, recompute decimal-exact means —
    yields the centroid table. Standard IVF discipline applies: the
    quantizer needn't converge, it needs stable well-spread cells
    (build_ivf_index's maxIter=4 rationale), and one round over md5
    seeds is the deterministic spelling of that.

    Returns (cells, assigned): cells = (cell, cvec) — n_cells rows,
    broadcastable at any corpus size; assigned = (vec_id, cell) against
    those centroids. Two shuffles total (seed ordering over slim rows,
    mean aggregation); assignments are map-side against the broadcast
    table both times."""
    from pyspark.sql.window import Window

    # index-artifact cache (build once, serve many — the BPE
    # _MERGE_CACHE discipline): the (cells, assigned) pair is already
    # localCheckpointed, so caching just skips the rebuild when several
    # entries serve the same index (knn_ivf_det, the multi-query graph,
    # the recall eval, the streamed server)
    ck = (("det_cells", cache_key, n_cells,
           embeddings.sparkSession.sparkContext.applicationId)
          if cache_key is not None else None)
    if ck is not None and ck in _ANN_INDEX_CACHE:
        return _ANN_INDEX_CACHE[ck]

    h = F.md5(F.concat_ws(
        "#", F.lit(_DET_SEED_TAG), F.col("vec_id").cast("string")))
    seeds = (
        embeddings.select("vec_id", h.alias("h"))
        .orderBy("h", "vec_id").limit(n_cells)
        .withColumn(
            "cell",
            F.row_number().over(Window.orderBy("h", "vec_id")) - 1)
        .select("vec_id", "cell")
    )
    cells0 = (
        seeds.join(embeddings, "vec_id")
        .select(
            "cell",
            F.expr("transform(embedding, x -> cast(x as double))")
            .alias("cvec"),
        )
    )
    a0 = _assign_cells(embeddings, cells0)
    # decimal-exact per-(cell, dim) mean — the label_centroids spelling
    long_form = (
        a0.join(embeddings, "vec_id")
        .select("cell", F.posexplode("embedding").alias("dim", "x"))
    )
    mean = (
        F.sum(F.round(F.col("x").cast("double"), 7).cast("decimal(38,8)"))
        .cast("double") / F.count("x")
    )
    cells1 = (
        long_form.groupBy("cell", "dim").agg(mean.alias("c"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("arr"))
        .select("cell", F.expr("transform(arr, x -> x.c)").alias("cvec"))
    )
    # materialize the ARTIFACTS (n_cells rows + the slim N-row
    # assignment): the build's Lloyd passes are inherently multi-scan,
    # but serving must not re-run them — at 100 TB these are the
    # persisted index tables, locally a localCheckpoint
    cells1 = cells1.localCheckpoint(eager=True)
    assigned = _assign_cells(embeddings, cells1).localCheckpoint(eager=True)
    if ck is not None:
        _ANN_INDEX_CACHE[ck] = (cells1, assigned)
    return cells1, assigned


def knn_ivf_det(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10,
                n_cells: int = 8, nprobe: int = 2,
                cache_key: str | None = None) -> DataFrame:
    """IVF top-k over the DETERMINISTIC quantizer: rank cells by decimal
    cosine(query, centroid), probe the ``nprobe`` best, exact decimal
    cosine + top-k on the probed sliver. Columns: vec_id, cosine.

    Same plan shape as :func:`knn_ivf` — broadcast centroid table,
    map-side assignment, probe filter pruning (nprobe/n_cells of the
    corpus scanned), TakeOrderedAndProject — but every step reproduces
    in DuckDB, so the driver entry is hash-checked end-to-end. The probe
    choice is a semi join against the ranked 2-row cell table (no
    driver collect)."""
    from spark_streaming_spark.sources.batch import widen

    cells, assigned = det_kmeans_cells(embeddings, n_cells,
                                       cache_key=cache_key)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"),
        F.sqrt(norm2_expr("embedding")).alias("qnrm"),
    )
    # decimal-quantized dot/norm against the centroid doubles — the
    # oracle spells the identical ROUND(..,7)/DECIMAL(38,8) chain
    cdot = F.expr(
        "cast(aggregate(zip_with(qv, cvec,"
        " (x, c) -> cast(round(cast(x as double) * c, 7)"
        " as decimal(38,8))),"
        " cast(0 as decimal(38,8)),"
        " (acc, v) -> cast(acc + v as decimal(38,8))) as double)"
    )
    cnorm2 = F.expr(
        "cast(aggregate(transform(cvec,"
        " c -> cast(round(c * c, 7) as decimal(38,8))),"
        " cast(0 as decimal(38,8)),"
        " (acc, v) -> cast(acc + v as decimal(38,8))) as double)"
    )
    from pyspark.sql.window import Window

    ranked = (
        cells.crossJoin(F.broadcast(q))
        .select(
            "cell",
            (cdot / (F.sqrt(cnorm2) * F.col("qnrm"))).alias("ccos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("ccos").desc(), F.col("cell"))),
        )
        .filter(F.col("rn") <= nprobe)
        .select("cell")
    )
    cand = (
        assigned.join(F.broadcast(ranked), "cell", "left_semi")
        .filter(F.col("vec_id") != query_vec_id)
        .join(embeddings, "vec_id")
    )
    return (
        widen(cand).crossJoin(F.broadcast(q))
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


def det_pq_codes(embeddings: DataFrame, m: int = 8,
                 k: int = 8) -> DataFrame:
    """DETERMINISTIC product quantization — the knn_ivf_det recipe
    applied per subspace: the ``k`` codebook seeds are the vectors with
    the smallest md5 hash (one shared seed set; subspace s's initial
    centroids are their s-th subvectors), then ONE Lloyd round per
    subspace under the decimal contract (7 dp-quantized squared
    distances, decimal-exact means), then the final per-subspace argmin
    assigns each vector its m codes. Every step reproduces in DuckDB,
    so PQ encoding — the storage tier of the ANN stack — gets the same
    hash-checked bar as the IVF and LSH tiers. ml.KMeans ``pq_train``
    stays as the rows-only industrial path.

    Long-form plan: (vec_id, subspace, dim, x) explodes once
    (D rows/vector); each assignment pass is one join against the
    m·k·(D/m)-row centroid table (D·k multiply-adds per vector — the
    textbook PQ encode cost) followed by a struct-min argmin
    aggregation (map-side partial). Columns: vec_id, code_str (the m
    codes comma-joined — a cross-engine-stable rendering)."""
    from pyspark.sql.window import Window

    dim = 64
    sub = dim // m
    # the long-form staging table is read by four consumers (seed
    # gather, two assignment passes, the mean update) — materialize it
    # once instead of four corpus re-scans. At 100 TB this is the
    # index build's staging write; locally a localCheckpoint.
    # Materialized HASH-PARTITIONED BY vec_id (r15, guide §2.4): every
    # downstream clustering key is a vec_id-prefixed superset
    # — groupBy(vec_id,s,c), groupBy(vec_id,s), the a0⋈long equi-join
    # on (vec_id,s), the final groupBy(vec_id) — and HashPartitioning
    # on a subset of the grouping/join keys satisfies their
    # ClusteredDistribution, so ONE exchange here replaces the five
    # per-pass exchanges the unpartitioned spelling paid (the mean
    # update's (s,c,j) rollup keeps its own tiny exchange). Values
    # are partitioning-independent: decimal sums and struct-mins are
    # exact, and the final code list is array_sort'ed. Measured
    # 4.11 → 1.16 s at sf0.1, value-equal. AQE is toggled OFF around
    # the materialization only: a checkpoint executed under
    # AdaptiveSparkPlan publishes UnknownPartitioning (verified
    # empirically on 4.1.2), which would re-insert every downstream
    # exchange and waste the staging shuffle.
    base = (
        embeddings.select(
            "vec_id", F.posexplode("embedding").alias("i", "xf"))
        .select(
            "vec_id",
            (F.col("i") / sub).cast("int").alias("s"),
            (F.col("i") % sub).alias("j"),
            F.col("xf").cast("double").alias("x"),
        )
        .repartition("vec_id")
    )
    from spark_streaming_spark.session import checkpoint_keep_partitioning
    long = checkpoint_keep_partitioning(base)
    h = F.md5(F.concat_ws(
        "#", F.lit("pqdet1"), F.col("vec_id").cast("string")))
    seeds = (
        embeddings.select("vec_id", h.alias("h"))
        .orderBy("h", "vec_id").limit(k)
        .withColumn(
            "c", F.row_number().over(Window.orderBy("h", "vec_id")) - 1)
        .select("vec_id", "c")
    )
    cent0 = (
        seeds.join(long, "vec_id")
        .select("s", "c", "j", F.col("x").alias("v"))
    )
    contrib = F.expr(
        "cast(round((x - v) * (x - v), 7) as decimal(38,8))")

    def assign(cent: DataFrame) -> DataFrame:
        return (
            long.join(F.broadcast(cent), ["s", "j"])
            .select("vec_id", "s", "c", contrib.alias("d"))
            .groupBy("vec_id", "s", "c")
            .agg(F.sum("d").cast("double").alias("d2"))
            .groupBy("vec_id", "s")
            .agg(F.min(F.struct("d2", "c")).alias("m"))
            .select("vec_id", "s", F.col("m.c").alias("c"))
        )

    a0 = assign(cent0)
    mean = (
        F.sum(F.round(F.col("x"), 7).cast("decimal(38,8)"))
        .cast("double") / F.count("x")
    )
    cent1 = (
        a0.join(long, ["vec_id", "s"])
        .groupBy("s", "c", "j").agg(mean.alias("v"))
    )
    codes = assign(cent1)
    return (
        codes.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("s", "c"))).alias("arr"))
        .select(
            "vec_id",
            F.expr("array_join(transform(arr, x -> cast(x.c as string)), ',')")
            .alias("code_str"),
        )
    )


def pq_train(embeddings: DataFrame, m: int = 8, k: int = 16,
             seed: int = 42,
             cache_key: str | None = None) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"; public method): split the
    D-dim space into ``m`` subspaces of D/m dims and k-means each
    subspace independently. Returns ``codebooks[s][c] = centroid c of
    subspace s`` — m·k·(D/m) floats, a driver-sized constant at ANY
    corpus size (that is the point of PQ: the model is tiny, the codes
    are m·log2(k) bits per vector — 4 bytes here vs 256 for the raw
    floats, 64×).

    Fit discipline mirrors build_ivf_index: bounded sample per subspace,
    few iterations — the quantizer needn't converge to assign well."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # applicationId in the key for consistency with build_ivf_index /
    # the dedup _PAIRS_CACHE (codebooks are plain lists, so unlike the
    # checkpointed DataFrames they would survive a session swap — but
    # one keying convention beats two). Cache-contract caveat (all
    # artifact caches here): the key is the CALLER-SUPPLIED corpus
    # identifier — rewriting the table at the same path within one
    # process serves the stale artifact; use a content-versioned
    # cache_key when the corpus can change mid-session.
    ck = ("pq", cache_key, m, k, seed,
          embeddings.sparkSession.sparkContext.applicationId) \
        if cache_key is not None else None
    if ck is not None and ck in _ARTIFACT_CACHE:
        return _ARTIFACT_CACHE[ck]

    dim = len(embeddings.select("embedding").first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    train = embeddings.select("embedding")
    target = 400 * k
    n = train.count()
    if n > target:
        train = train.sample(fraction=target / n, seed=seed)
    train = train.localCheckpoint()  # don't re-scan per subspace fit
    books = []
    for s in range(m):
        sv = train.select(
            array_to_vector(
                F.slice("embedding", s * sub + 1, sub)
            ).alias("_sv")
        )
        km = KMeans(k=k, seed=seed + s, maxIter=4,
                    featuresCol="_sv", predictionCol="_c")
        model = km.fit(sv)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    if ck is not None:
        _ARTIFACT_CACHE[ck] = books
    return books


def _books_lit(books: list[list[list[float]]]) -> F.Column:
    """codebooks as a nested array literal: array<array<array<double>>>
    indexed [subspace][centroid][dim] — a plan constant, broadcast with
    the plan itself."""
    return F.array(*[
        F.array(*[
            F.array(*[F.lit(float(x)) for x in c]) for c in book
        ])
        for book in books
    ])


def pq_encode(embeddings: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """Encode every vector to its m nearest-centroid codes — map-only
    (the codebooks ride in the plan; no join, no shuffle, no UDF).
    Columns: vec_id, codes (array<int>, one code per subspace).

    Per subspace the argmin over k centroids runs as a fold over the
    codebook literal inside codegen; cost is m·k·(D/m) = D·k mults per
    vector, embarrassingly parallel."""
    m = len(books)
    sub = len(books[0][0])
    dim = m * sub

    def code_for(s: int) -> F.Column:
        # argmin over centroids of subspace s: fold carrying (best_c, best_d)
        sv = F.slice("embedding", s * sub + 1, sub)
        book = _books_lit([books[s]])[0]
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(len(books[s]) - 1)),
            F.struct(F.lit(-1).alias("c"), F.lit(float("inf")).alias("d")),
            lambda acc, c: F.when(
                _sqdist(sv, book[c]) < acc["d"],
                F.struct(c.alias("c"), _sqdist(sv, book[c]).alias("d")),
            ).otherwise(acc),
        )["c"]

    from spark_streaming_spark.sources.batch import widen

    out = widen(embeddings).select(
        "vec_id",
        F.array(*[code_for(s) for s in range(m)]).alias("codes"),
    )
    _ = dim  # dimension validated at train time
    return out


def _sqdist(sv: F.Column, centroid: F.Column) -> F.Column:
    """Squared L2 between a subvector column and a centroid array."""
    return F.aggregate(
        F.zip_with(sv, centroid, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda a, v: a + v,
    )


def pq_adc_topk(embeddings: DataFrame, books: list[list[list[float]]],
                query_vec_id: int = 0, k_out: int = 10) -> DataFrame:
    """Asymmetric-distance top-k: the query stays EXACT; every database
    vector is its PQ code; distance ≈ sum over subspaces of a
    query-specific lookup table LUT[s][code]. The LUT (m·k doubles) is
    computed once on the driver from the query vector and rides in the
    plan — scoring a candidate is m array lookups + adds, no float
    vector access at all. This is how a 100 TB vector store scans codes
    at memory bandwidth. Columns: vec_id, approx_dist2."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id) \
        .select("embedding").first()
    if q is None:
        raise KeyError(f"query vector {query_vec_id} not found")
    qv = list(q[0])
    m = len(books)
    sub = len(books[0][0])
    lut = [
        [
            sum((qv[s * sub + j] - c[j]) ** 2 for j in range(sub))
            for c in books[s]
        ]
        for s in range(m)
    ]
    lut_lit = F.array(*[
        F.array(*[F.lit(float(d)) for d in row]) for row in lut
    ])
    codes = pq_encode(embeddings, books)
    dist = F.aggregate(
        F.zip_with(
            "codes",
            lut_lit,
            lambda c, row: F.element_at(row, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return (
        codes.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", dist.alias("approx_dist2"))
        .orderBy(F.col("approx_dist2").asc(), F.col("vec_id").asc())
        .limit(k_out)
    )


def pq_search(embeddings: DataFrame, books: list[list[list[float]]],
              query_vec_id: int = 0, k_out: int = 10,
              shortlist: int = 50) -> DataFrame:
    """PQ search as deployed at scale: ADC over the codes produces a
    ``shortlist`` of candidates (code-only scan, memory-bandwidth
    cheap), then ONLY the shortlist is re-ranked with the exact float
    vectors (touches ``shortlist`` rows, not the corpus). Recall is
    governed by the shortlist hit rate, not by ADC's final-rank
    fidelity — the shortlist/rerank split is what lets 64-bit codes
    serve high-recall top-10. Columns: vec_id, dist2 (exact)."""
    cand = pq_adc_topk(embeddings, books, query_vec_id, shortlist) \
        .select("vec_id")
    q = embeddings.filter(F.col("vec_id") == query_vec_id) \
        .select(F.col("embedding").alias("qv"))
    exact = (
        embeddings.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with("embedding", "qv",
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda a, v: a + v,
            ).alias("dist2"),
        )
    )
    return exact.orderBy(F.col("dist2").asc(), F.col("vec_id").asc()) \
        .limit(k_out)


def knn_ivfpq(embeddings: DataFrame, query_vec_id: int = 0, k_out: int = 10,
              n_cells: int = 16, nprobe: int = 4, m: int = 8,
              pq_k: int = 16, shortlist: int = 50,
              cache_key: str | None = None) -> DataFrame:
    """The composed FAISS-style index — IVF cell pruning × PQ code scan
    × exact rerank, each tier cutting what the next one touches:

    1. coarse quantizer prunes to ``nprobe``/``n_cells`` of the corpus
       (partition pruning for vectors — the cells are storage partitions
       at scale);
    2. inside probed cells, ADC scans 4-byte codes with a lookup table
       (memory-bandwidth, no float vectors touched) for a shortlist;
    3. only ``shortlist`` rows are re-ranked with exact distances.

    At 100 TB: tier 1 is partition pruning, tier 2 reads m·log2(k) bits
    per vector instead of 4·D bytes (64× less IO here), tier 3 touches
    a constant number of rows. Columns: vec_id, dist2 (exact)."""
    import numpy as np

    assigned, model = build_ivf_index(embeddings, n_cells,
                                      cache_key=cache_key)
    q_row = assigned.filter(F.col("vec_id") == query_vec_id) \
        .select("embedding").first()
    if q_row is None:
        raise KeyError(f"query vector {query_vec_id} not found")
    qv = np.asarray(q_row[0], dtype="float64")
    centers = model.clusterCenters()
    order = sorted(
        range(len(centers)),
        key=lambda c: float(np.sum((qv - centers[c]) ** 2)),
    )
    probed = assigned.filter(F.col("cell").isin(order[:nprobe]))
    books = pq_train(embeddings, m=m, k=pq_k, cache_key=cache_key)
    cand = pq_adc_topk(probed, books, query_vec_id, shortlist) \
        .select("vec_id")
    q = embeddings.filter(F.col("vec_id") == query_vec_id) \
        .select(F.col("embedding").alias("qv"))
    return (
        embeddings.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with("embedding", "qv",
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda a, v: a + v,
            ).alias("dist2"),
        )
        .orderBy(F.col("dist2").asc(), F.col("vec_id").asc())
        .limit(k_out)
    )


def ivf_graph_det(embeddings: DataFrame, k: int = 5, n_cells: int = 8,
                  nprobe: int = 2, queries_mod: int = 10,
                  queries: DataFrame | None = None,
                  index: tuple[DataFrame, DataFrame] | None = None,
                  cache_key: str | None = None) -> DataFrame:
    """Multi-query deterministic IVF search — :func:`knn_ivf_det`
    generalized from one query to the eval sample ``vec_id %
    queries_mod == 0`` (the ann-benchmarks protocol's query set, shared
    with similarity.knn_graph). Per query: rank the deterministic cells
    by the decimal cosine chain, probe the ``nprobe`` best, exact
    SCALED-INTEGER cosine (the knn_graph contract, so recall joins
    compare like with like) on the probed sliver, top-k per query.
    Columns: vec_id (query), nbr, cosine, rank.

    Scale shape: the centroid table broadcasts (n_cells rows), the
    probe table broadcasts (|Q|·nprobe rows), and the candidate join
    touches ~|Q|·nprobe/n_cells of the corpus — the IVF cost model;
    nothing quadratic, no driver collect.

    ``queries``: an explicit (vec_id, embedding) query frame replaces
    the default ``% queries_mod`` sample — the SERVING entry point (a
    micro-batch of arriving queries searches the static index).
    ``index``: a prebuilt (cells, assigned) pair from
    :func:`det_kmeans_cells` — build once, serve every batch."""
    from pyspark.sql.window import Window

    from spark_streaming_spark.functions.vectors import (
        int_cosine, int_dot_expr, scaled_vec_expr)
    from spark_streaming_spark.sources.batch import widen

    cells, assigned = (index if index is not None
                       else det_kmeans_cells(embeddings, n_cells,
                                             cache_key=cache_key))
    qsrc = (queries if queries is not None
            else embeddings.filter(F.col("vec_id") % queries_mod == 0))
    qd = qsrc.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.sqrt(norm2_expr("embedding")).alias("qnrm"),
    )
    cdot = F.expr(
        "cast(aggregate(zip_with(qv, cvec,"
        " (x, c) -> cast(round(cast(x as double) * c, 7)"
        " as decimal(38,8))),"
        " cast(0 as decimal(38,8)),"
        " (acc, v) -> cast(acc + v as decimal(38,8))) as double)"
    )
    cnorm2 = F.expr(
        "cast(aggregate(transform(cvec,"
        " c -> cast(round(c * c, 7) as decimal(38,8))),"
        " cast(0 as decimal(38,8)),"
        " (acc, v) -> cast(acc + v as decimal(38,8))) as double)"
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("ccos").desc(), F.col("cell"))
    probed = (
        cells.crossJoin(F.broadcast(qd))
        .select(
            "qid", "cell",
            (cdot / (F.sqrt(cnorm2) * F.col("qnrm"))).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("qid", "cell")
    )
    base = widen(embeddings).select(
        "vec_id", scaled_vec_expr("embedding").alias("sv")
    ).withColumn("n2", int_dot_expr("sv", "sv"))
    qi = (
        qsrc.select("vec_id", scaled_vec_expr("embedding").alias("sv"))
        .withColumn("n2", int_dot_expr("sv", "sv"))
        .select(F.col("vec_id").alias("qid"), F.col("sv").alias("qsv"),
                F.col("n2").alias("qn2"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("nbr").asc())
    return (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(base, "vec_id")
        .join(F.broadcast(qi), "qid")
        .select(
            F.col("qid").alias("vec_id"),
            F.col("vec_id").alias("nbr"),
            int_cosine(int_dot_expr("sv", "qsv"), F.col("qn2"),
                       F.col("n2")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_recall_det(embeddings: DataFrame, k: int = 5, n_cells: int = 8,
                   nprobe: int = 2, queries_mod: int = 10,
                   cache_key: str | None = None) -> DataFrame:
    """Recall@k of the deterministic IVF index against the exact kNN
    graph on the shared eval sample — the ann-benchmarks protocol for
    the IVF tier (similarity.knn_graph_recall covers the LSH tier).
    Deterministic end to end, so recall itself hash-checks: recall_ppm
    is integer arithmetic. Columns: vec_id, n_exact, n_hit,
    recall_ppm."""
    from spark_streaming_spark.operators.similarity import knn_graph

    exact = knn_graph(embeddings, k, queries_mod,
                      cache_key=cache_key).select("vec_id", "nbr")
    approx = ivf_graph_det(embeddings, k, n_cells, nprobe, queries_mod,
                           cache_key=cache_key).select("vec_id", "nbr")
    q = exact.groupBy("vec_id").agg(F.count("*").alias("n_exact"))
    hits = (
        exact.join(approx, ["vec_id", "nbr"])
        .groupBy("vec_id").agg(F.count("*").alias("n_hit"))
    )
    return (
        q.join(hits, "vec_id", "left")
        .select(
            "vec_id", "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.expr("CAST(1000000 * coalesce(n_hit, 0) AS BIGINT)"
                   " DIV n_exact").alias("recall_ppm"),
        )
    )


def ivf_sq8_search(embeddings: DataFrame, query_vec_id: int = 0,
                   k: int = 10, n_cells: int = 8, nprobe: int = 2,
                   cache_key: str | None = None) -> DataFrame:
    """IVF + SQ8 — the production ANN serving pair (FAISS's
    ``IVFx,SQ8`` index; public method): the deterministic coarse
    quantizer shortlists ``nprobe`` cells, then the probed sliver is
    scored in EXACT INT8 integer dots (similarity.quantize_codes) with
    one fixed-order de-scale per pair — so unlike the float IVF tier
    (knn_ivf, rows-only), this composed index hash-checks end to end.

    Scale shape: centroid table broadcast (n_cells rows), probe choice
    a 2-row semi join, candidate scan = nprobe/n_cells of the CODE
    table (4× smaller than the float corpus — the SQ8 savings stack on
    the IVF pruning), map-side integer fold, TakeOrderedAndProject.
    Columns: vec_id, dot_int, approx_dot."""
    from pyspark.sql.window import Window

    from spark_streaming_spark.operators.similarity import quantize_codes
    from spark_streaming_spark.sources.batch import widen

    cells, assigned = det_kmeans_cells(embeddings, n_cells,
                                       cache_key=cache_key)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"),
        F.sqrt(norm2_expr("embedding")).alias("qnrm"),
    )
    cdot = F.expr(
        "cast(aggregate(zip_with(qv, cvec,"
        " (x, c) -> cast(round(cast(x as double) * c, 7)"
        " as decimal(38,8))),"
        " cast(0 as decimal(38,8)),"
        " (acc, v) -> cast(acc + v as decimal(38,8))) as double)"
    )
    cnorm2 = F.expr(
        "cast(aggregate(transform(cvec,"
        " c -> cast(round(c * c, 7) as decimal(38,8))),"
        " cast(0 as decimal(38,8)),"
        " (acc, v) -> cast(acc + v as decimal(38,8))) as double)"
    )
    probed = (
        cells.crossJoin(F.broadcast(q))
        .select("cell",
                (cdot / (F.sqrt(cnorm2) * F.col("qnrm"))).alias("ccos"))
        .withColumn("rn", F.row_number().over(
            Window.orderBy(F.col("ccos").desc(), F.col("cell"))))
        .filter(F.col("rn") <= nprobe)
        .select("cell")
    )
    codes = quantize_codes(embeddings)
    qc = (codes.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("qv").alias("qq"), F.col("scale").alias("qs")))
    cand = (assigned.join(F.broadcast(probed), "cell", "left_semi")
            .filter(F.col("vec_id") != query_vec_id)
            .join(codes, "vec_id"))
    return (
        widen(cand).crossJoin(F.broadcast(qc))
        .select(
            "vec_id",
            F.expr("aggregate(zip_with(qv, qq, (x, y) ->"
                   " CAST(x AS BIGINT) * y), CAST(0 AS BIGINT),"
                   " (acc, v) -> acc + v)").alias("dot_int"),
            F.expr("CAST(aggregate(zip_with(qv, qq, (x, y) ->"
                   " CAST(x AS BIGINT) * y), CAST(0 AS BIGINT),"
                   " (acc, v) -> acc + v) AS DOUBLE) * qs * scale")
            .alias("approx_dot"),
        )
        .orderBy(F.col("approx_dot").desc(), F.col("vec_id").asc())
        .limit(k)
    )
