"""Market-basket mining over the order/part relation: frequent
co-purchased item pairs (the 2-itemset core of Apriori/FP-growth) and
triangle counting over the resulting co-purchase graph.

Extends the reference's pair-oriented aggregations (the mapToPair →
reduceByKey family, e.g. ``WordCount.java``/``HotWords.java``) to the
relational association-mining workload a training-data or product
analytics pipeline runs at scale.

Scale shape (the part that must survive 100 TB):

- **Support pruning before the pair join** — the Apriori bound: an item
  pair can only be frequent if both items are. Items are counted with
  one map-side-combinable aggregate; the surviving frequent-item set is
  small by construction (a support threshold at corpus scale keeps only
  the head of the popularity distribution), so it BROADCASTS and the
  basket restriction is a map-side semi join — no shuffle of the big
  table beyond the one pair-join shuffle on the basket key.
- **Per-basket quadratic is bounded** — the self-join fans out k·(k-1)/2
  rows per basket where k = frequent items in that basket; pruning caps
  k, and the basket key (order) is the natural shuffle key, so skew is
  bounded by the largest single basket, not by item popularity.
- **Triangle counting is degree-ordered** — edges orient from the
  lower-(degree, id) endpoint to the higher, so every wedge is
  enumerated at its lowest-degree apex: the hub that would produce
  O(deg²) wedges under id-ordering produces none. This is the standard
  distributed triangle-count discipline (oriented wedge join + closing
  edge semi join); the result set is identical to the naive a<b<c
  enumeration, which is exactly what the DuckDB oracle runs.

Integer-exact metrics: lift is reported as ``lift_ppm`` via BIGINT
arithmetic (``1e6 · N · pair_support  div  support_a · support_b``) —
no floating point anywhere, so the oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAIRS_CACHE: dict = {}
_CFEVAL_CACHE: dict = {}


def basket_items(lineitem: DataFrame) -> DataFrame:
    """Distinct (basket, item) pairs: one row per part per order."""
    return (
        lineitem.select(F.col("l_orderkey").alias("basket"),
                        F.col("l_partkey").alias("item"))
        .distinct()
    )


def frequent_pairs(lineitem: DataFrame, min_item_support: int = 5,
                   min_pair_support: int = 2,
                   cache_key: str | None = None) -> DataFrame:
    """Frequent co-purchased part pairs with integer-exact lift.

    Columns: part_a < part_b, support_a, support_b, pair_support,
    lift_ppm (= floor(1e6 · n_baskets · pair / (sa · sb))).

    ``cache_key`` memoizes the mined pair set (localCheckpoint) — the
    artifact a pipeline persists once and serves to downstream graph
    analytics (the _PAIRS_CACHE discipline from operators/dedup.py);
    app-scoped so a new Spark application never sees a stale handle.
    """
    ck = ("basket_pairs", cache_key, min_item_support, min_pair_support,
          lineitem.sparkSession.sparkContext.applicationId) \
        if cache_key is not None else None
    if ck is not None and ck in _PAIRS_CACHE:
        return _PAIRS_CACHE[ck]
    # stage the distinct-item table once: the basket count, the support
    # aggregate AND both sides of the pair self-join read it, and
    # without truncation each would recompute the distinct shuffle
    items = basket_items(lineitem).localCheckpoint(eager=True)
    n_baskets = items.select("basket").distinct().count()
    supp = (items.groupBy("item")
            .agg(F.count("*").alias("support"))
            .filter(F.col("support") >= min_item_support))
    # Apriori prune: only frequent items can form frequent pairs. The
    # frequent set is head-of-distribution small -> broadcast semi join.
    pruned = items.join(F.broadcast(supp.select("item")), "item")
    # one-shuffle pair build: group each basket's (already distinct)
    # frequent items into an array and explode the ordered pairs
    # map-side — the self-join spelling would shuffle the item table
    # twice; the per-basket quadratic is the same either way
    pairs = (
        pruned.groupBy("basket")
        .agg(F.collect_list("item").alias("its"))
        .select(F.explode(F.expr(
            "filter(flatten(transform(its,"
            " x -> transform(its, y -> struct(x AS part_a, y AS part_b)"
            "))), p -> p.part_a < p.part_b)")).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_support"))
        .filter(F.col("pair_support") >= min_pair_support)
    )
    # supports attach AFTER the aggregation, on the tiny pair table
    sa = supp.select(F.col("item").alias("part_a"),
                     F.col("support").alias("support_a"))
    sb = supp.select(F.col("item").alias("part_b"),
                     F.col("support").alias("support_b"))
    result = (
        pairs.join(F.broadcast(sa), "part_a").join(F.broadcast(sb), "part_b")
        .select(
            "part_a", "part_b", "support_a", "support_b", "pair_support",
            # exact lift via integer DIV, BOTH sides in DECIMAL(38,0):
            # 1e6·n_baskets·pair_support wraps int64 once n_baskets
            # reaches ~1e10, and support_a·support_b wraps once supports
            # reach ~3e9 at the same corpus scale (Spark multiplies
            # non-ANSI = silent wrap; DuckDB promotes/raises — silent
            # divergence at scale). The quotient = 1e6·lift stays
            # small; no double ever materializes.
            F.expr(
                f"CAST((CAST(1000000 AS DECIMAL(38,0))"
                f" * CAST({n_baskets} AS BIGINT)"
                " * pair_support) DIV"
                " (CAST(support_a AS DECIMAL(38,0)) * support_b)"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    if ck is not None:
        result = result.localCheckpoint(eager=True)
        _PAIRS_CACHE[ck] = result
    return result


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as
    canonical edges (part_a < part_b, one row per edge).

    Degree-ordered orientation: each edge points from its lower
    (degree, id) endpoint to the higher, so wedges are enumerated at
    the lowest-degree apex and a closing-edge join finishes the count.
    Output: part_id, n_triangles (nodes in >=1 triangle only).
    """
    deg = (
        edges.select(F.col("part_a").alias("v"))
        .unionAll(edges.select(F.col("part_b").alias("v")))
        .groupBy("v").agg(F.count("*").alias("deg"))
    )
    # degree table ~ |V| of the pruned graph: broadcast both lookups
    with_deg = (
        edges
        .join(F.broadcast(deg).withColumnsRenamed(
            {"v": "part_a", "deg": "deg_a"}), "part_a")
        .join(F.broadcast(deg).withColumnsRenamed(
            {"v": "part_b", "deg": "deg_b"}), "part_b")
    )
    ka = F.struct(F.col("deg_a").alias("d"), F.col("part_a").alias("v"))
    kb = F.struct(F.col("deg_b").alias("d"), F.col("part_b").alias("v"))
    oriented = with_deg.select(
        F.when(ka < kb, F.col("part_a")).otherwise(F.col("part_b"))
        .alias("src"),
        F.when(ka < kb, F.col("part_b")).otherwise(F.col("part_a"))
        .alias("dst"),
        F.when(ka < kb, kb).otherwise(ka).alias("dst_key"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = (
        e1.join(e2, (F.col("e1.src") == F.col("e2.src"))
                & (F.col("e1.dst_key") < F.col("e2.dst_key")))
        .select(F.col("e1.src").alias("apex"),
                F.col("e1.dst").alias("x"), F.col("e2.dst").alias("y"))
    )
    # closing edge: x precedes y in orientation order, so the oriented
    # edge of a closed wedge is exactly (x -> y)
    closing = oriented.select(F.col("src").alias("x"),
                              F.col("dst").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "left_semi")
    return (
        tris.select(F.explode(F.array("apex", "x", "y")).alias("part_id"))
        .groupBy("part_id")
        .agg(F.count("*").alias("n_triangles"))
    )


def association_rules(lineitem: DataFrame,
                      cache_key: str | None = None) -> DataFrame:
    """Directional association rules from the frequent pair set
    (Agrawal, Imieliński & Swami 1993; public method): for each
    frequent pair, BOTH rules a→b and b→a with integer-exact
    confidence conf_ppm = (1e6 · pair_support) DIV support(antecedent)
    — the asymmetry lift can't express ("diapers→beer strong,
    beer→diapers weak" needs the direction), which is what a
    recommender thresholds on. Lift rides along from the pair mine.
    Columns: antecedent, consequent, pair_support, ant_support,
    conf_ppm, lift_ppm.

    Scale shape: pure map-side explode over the already-mined
    (Apriori-pruned, memoized) pair artifact — zero additional
    shuffles."""
    fp = frequent_pairs(lineitem, cache_key=cache_key)
    dirs = fp.select(F.explode(F.array(
        F.struct(F.col("part_a").alias("antecedent"),
                 F.col("part_b").alias("consequent"),
                 F.col("pair_support"),
                 F.col("support_a").alias("ant_support"),
                 F.col("lift_ppm")),
        F.struct(F.col("part_b").alias("antecedent"),
                 F.col("part_a").alias("consequent"),
                 F.col("pair_support"),
                 F.col("support_b").alias("ant_support"),
                 F.col("lift_ppm")),
    )).alias("r")).select("r.*")
    return dirs.select(
        "antecedent", "consequent",
        F.col("pair_support").cast("long").alias("pair_support"),
        F.col("ant_support").cast("long").alias("ant_support"),
        F.expr("CAST((1000000 * pair_support) DIV ant_support AS BIGINT)")
        .alias("conf_ppm"),
        F.col("lift_ppm").cast("long").alias("lift_ppm"),
    )


def item_cf_recommendations(lineitem: DataFrame, orders: DataFrame,
                            k: int = 3,
                            cache_key: str | None = None) -> DataFrame:
    """Item-based collaborative filtering (Sarwar et al. 2001, the
    Amazon item-item shape; public method): recommend to each customer
    the top-``k`` parts most co-purchased with parts they already own,
    excluding what they own. Score(c, p) = Σ over owned parts q of the
    co-purchase support of (q, p) — exact integers, so the ranking is
    engine-identical; (score DESC, part ASC) tie-break makes the
    per-customer top-k deterministic. Columns: custkey, part, score,
    rnk.

    Scale shape: the item-item model is the memoized Apriori-pruned
    pair artifact (frequent_pairs — bounded, never all-pairs); the
    serving join is customer-owned-parts ⋈ pair table keyed on the
    part (both sides hash-partitioned), one partial-agged (customer,
    candidate) groupBy, ownership removed with a left anti join, and
    the per-customer top-k is a WindowGroupLimit rank — per-partition
    heaps, no global sort."""
    from pyspark.sql import Window

    owned = (
        lineitem.join(orders,
                      F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("custkey"),
                F.col("l_partkey").alias("part"))
        .distinct()
    )
    fp = frequent_pairs(lineitem, cache_key=cache_key)
    sym = fp.select(F.col("part_a").alias("part"),
                    F.col("part_b").alias("cand"),
                    F.col("pair_support").alias("w")).unionAll(
        fp.select(F.col("part_b").alias("part"),
                  F.col("part_a").alias("cand"),
                  F.col("pair_support").alias("w")))
    scored = (
        owned.join(sym, "part")
        .groupBy("custkey", "cand")
        .agg(F.sum("w").cast("long").alias("score"))
        .join(owned.select("custkey",
                           F.col("part").alias("cand")),
              ["custkey", "cand"], "left_anti")
    )
    w = Window.partitionBy("custkey").orderBy(
        F.col("score").desc(), F.col("cand").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("custkey", F.col("cand").alias("part"), "score", "rnk")
    )


def last_order_keys(orders: DataFrame) -> DataFrame:
    """Each customer's LAST order (latest o_orderdate, ties broken by
    highest o_orderkey) — the leave-last-basket-out holdout split every
    recommender eval uses (public protocol; Sarwar et al. 2001 eval
    setup). One keyed window, deterministic. Columns: o_orderkey,
    o_custkey."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_orderkey", "o_custkey"))


def cf_eval_frames(lineitem: DataFrame, orders: DataFrame,
                   k: int = 3, cache_key: str | None = None):
    """Shared leave-last-order-out split for the CF offline evals:
    train :func:`item_cf_recommendations` on every order EXCEPT each
    customer's last and pair the top-``k`` recommendations with the
    held-out order's parts. ``cache_key`` memoizes the SPLIT-trained
    pair artifact (distinct from the full-corpus artifact the serving
    entry uses) AND the finished (recs, holdout) frames as
    localCheckpointed tables, so HitRate/MRR, MAP and NDCG evals train
    once and skip the rec-serving window + holdout distinct on every
    re-read (the _PAIRS_CACHE discipline).
    Returns (recs, holdout)."""
    ck = (("cfeval", lineitem.sparkSession.sparkContext.applicationId,
           cache_key, k) if cache_key is not None else None)
    if ck is not None and ck in _CFEVAL_CACHE:
        return _CFEVAL_CACHE[ck]
    last = last_order_keys(orders)
    last_keys = last.select("o_orderkey")
    train_orders = orders.join(last_keys, "o_orderkey", "left_anti")
    train_li = lineitem.join(
        last_keys.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", "left_anti")
    recs = item_cf_recommendations(train_li, train_orders, k=k,
                                   cache_key=cache_key)
    holdout = (
        lineitem.join(last,
                      lineitem["l_orderkey"] == last["o_orderkey"])
        .select(F.col("o_custkey").alias("custkey"),
                F.col("l_partkey").alias("part"))
        .distinct()
    )
    if ck is not None:
        recs = recs.localCheckpoint(eager=True)
        holdout = holdout.localCheckpoint(eager=True)
        _CFEVAL_CACHE[ck] = (recs, holdout)
    return recs, holdout


def cf_ranking_eval(lineitem: DataFrame, orders: DataFrame,
                    k: int = 3,
                    cache_key: str | None = None) -> DataFrame:
    """Leave-last-order-out ranking eval of the item-CF recommender:
    train :func:`item_cf_recommendations` on every order EXCEPT each
    customer's last, then score the top-``k`` against the parts of the
    held-out order — HitRate@k and MRR@k, the standard recsys offline
    metrics, in exact integer ppm (rr = 1e6 DIV first-hit rank; means
    by integer DIV — no float anywhere, the no-transcendental house
    rule's cousin for eval metrics: NDCG's log2 discount is replaced by
    the rank-reciprocal family on purpose).

    Scale shape: the split is one keyed window over orders + two anti
    joins; training reuses the CF plan (Apriori-pruned pair artifact,
    ownership serving join); the eval join keys on (custkey, part) and
    collapses to a 1-row summary. n_eval counts customers the model
    could score (≥1 rec from train history).
    Columns: n_eval, n_hits, hit_rate_ppm, mrr_ppm."""
    recs, holdout = cf_eval_frames(lineitem, orders, k=k,
                                   cache_key=cache_key)
    first_hits = (recs.join(holdout, ["custkey", "part"])
                  .groupBy("custkey")
                  .agg(F.min("rnk").alias("first_hit")))
    per_user = (recs.select("custkey").distinct()
                .join(first_hits, "custkey", "left"))
    return per_user.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(F.when(F.col("first_hit").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_hits"),
        F.sum(F.expr("CASE WHEN first_hit IS NOT NULL"
                     " THEN 1000000 div first_hit ELSE 0 END"))
        .cast("long").alias("rr_sum"),
    ).select(
        "n_eval", "n_hits",
        F.expr("CAST(1000000 * n_hits AS BIGINT) div n_eval")
        .alias("hit_rate_ppm"),
        F.expr("CAST(rr_sum AS BIGINT) div n_eval").alias("mrr_ppm"),
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node over the mined co-purchase
    graph (Watts & Strogatz 1998): cc(v) = 2·T(v) / (deg(v)·(deg(v)−1))
    — how close each part's co-purchase neighborhood is to a clique,
    the density signal next to the raw triangle count. Rides the
    degree-ordered triangle enumeration (:func:`triangle_counts` — no
    all-pairs, wedges enumerated at the lowest-degree apex) plus one
    degree aggregate; nodes of degree < 2 have no defined coefficient
    and are excluded. The division is ONE correctly-rounded IEEE op on
    exact small integers — engine-identical.
    Columns: part_id, degree, n_triangles, cc."""
    deg = (
        edges.select(F.col("part_a").alias("part_id"))
        .unionAll(edges.select(F.col("part_b").alias("part_id")))
        .groupBy("part_id").agg(F.count("*").cast("long").alias("degree"))
    )
    tri = triangle_counts(edges)
    return (
        deg.join(tri, "part_id", "left")
        .select(
            "part_id", "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long")
            .alias("n_triangles"))
        .filter(F.col("degree") >= 2)
        .withColumn(
            "cc",
            (F.lit(2.0) * F.col("n_triangles").cast("double"))
            / (F.col("degree").cast("double")
               * (F.col("degree") - 1).cast("double")))
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of the co-purchase graph (Newman 2002):
    Pearson correlation over the degree pairs of edge endpoints,
    SYMMETRIZED (each undirected edge contributes (d_a, d_b) and
    (d_b, d_a)) — positive means hub parts co-sell with other hubs,
    negative means hubs anchor long-tail parts (the usual retail
    shape). Exact integer/decimal moments over 2·|E| rows, one frozen
    IEEE tail (the corr_matrix discipline).
    Columns: n_edges, r."""
    deg = (
        edges.select(F.col("part_a").alias("v"))
        .unionAll(edges.select(F.col("part_b").alias("v")))
        .groupBy("v").agg(F.count("*").cast("long").alias("deg"))
    )
    da = deg.select(F.col("v").alias("part_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("part_b"), F.col("deg").alias("db"))
    ep = (edges.join(F.broadcast(da), "part_a")
          .join(F.broadcast(db), "part_b"))
    sym = (ep.select(F.col("da").alias("x"), F.col("db").alias("y"))
           .unionAll(ep.select(F.col("db").alias("x"),
                               F.col("da").alias("y"))))
    m = sym.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
    )

    def d(name):
        return F.col(name).cast("double")

    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = (F.sqrt(d("n") * d("sxx") - d("sx") * d("sx"))
           * F.sqrt(d("n") * d("syy") - d("sy") * d("sy")))
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_edges.crossJoin(
        m.select(F.when(den != F.lit(0.0), num / den).alias("r")))


_BASKET_EDGE_CTE = """
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
                       FROM lineitem),
        freq AS (
          SELECT l_partkey FROM items GROUP BY 1 HAVING count(*) >= 5
        ),
        pr AS (
          SELECT l_orderkey, l_partkey FROM items
          WHERE l_partkey IN (SELECT l_partkey FROM freq)
        ),
        e AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM pr a JOIN pr b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2
        )
"""


CLUSTERING_COEFFICIENTS_SQL = _BASKET_EDGE_CTE + """,
        tri AS (
          SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
          FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                    JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
        ),
        tcnt AS (
          SELECT part_id, CAST(count(*) AS BIGINT) AS n_triangles
          FROM (SELECT a AS part_id FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
          GROUP BY 1
        ),
        deg AS (
          SELECT part_id, CAST(count(*) AS BIGINT) AS degree
          FROM (SELECT pa AS part_id FROM e
                UNION ALL SELECT pb FROM e)
          GROUP BY 1
        )
        SELECT d.part_id, d.degree,
               CAST(COALESCE(t.n_triangles, 0) AS BIGINT)
                 AS n_triangles,
               2.0 * CAST(COALESCE(t.n_triangles, 0) AS DOUBLE)
                 / (CAST(d.degree AS DOUBLE)
                    * CAST(d.degree - 1 AS DOUBLE)) AS cc
        FROM deg d LEFT JOIN tcnt t USING (part_id)
        WHERE d.degree >= 2
"""


DEGREE_ASSORTATIVITY_SQL = _BASKET_EDGE_CTE + """,
        deg AS (
          SELECT v, CAST(count(*) AS BIGINT) AS deg
          FROM (SELECT pa AS v FROM e UNION ALL SELECT pb FROM e)
          GROUP BY 1
        ),
        ep AS (
          SELECT da.deg AS x, db.deg AS y
          FROM e JOIN deg da ON da.v = e.pa JOIN deg db ON db.v = e.pb
        ),
        sym AS (
          SELECT x, y FROM ep UNION ALL SELECT y AS x, x AS y FROM ep
        ),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
                 CAST(SUM(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
                 CAST(SUM(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy
          FROM sym
        ),
        ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
        SELECT n_edges,
          CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                    <> 0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
          END AS r
        FROM m, ne
"""


def cf_map_eval(lineitem: DataFrame, orders: DataFrame,
                k: int = 3, cache_key: str | None = None) -> DataFrame:
    """MAP@k of the item-CF recommender on the leave-last-order-out
    split — the order-sensitive companion to HitRate/MRR
    (:func:`cf_ranking_eval`): AP@k = (Σ_{j-th hit at rank r_j} j/r_j)
    / min(k, R), averaged over evaluable customers.

    Exact-integer contract: with k = 3 every per-hit precision j/r_j
    scales to the integer 6j DIV r_j (r_j ∈ {1..3} divides 6j), each
    customer's AP lands as floor-ppm (1e6·ap_x6) DIV (6·min(k, R)) and
    the mean is one more integer DIV — the KM-curve stepwise-DIV ppm
    discipline; no float anywhere, truncation == floor on both engines
    (all quantities non-negative).

    Scale shape: identical to cf_ranking_eval (shared memoized
    split-trained artifact) plus one per-customer window over ≤ k hit
    rows. Columns: n_eval, n_hit_users, map_ppm."""
    from pyspark.sql import Window

    if k != 3:
        raise ValueError("exact 6j DIV r contract is derived for k=3")
    recs, holdout = cf_eval_frames(lineitem, orders, k=k,
                                   cache_key=cache_key)
    hits = recs.join(holdout, ["custkey", "part"]).select("custkey", "rnk")
    w = Window.partitionBy("custkey").orderBy("rnk")
    ap = (hits.withColumn("j", F.row_number().over(w))
          .groupBy("custkey")
          .agg(F.sum(F.expr("(6 * j) div rnk")).cast("long")
               .alias("ap_x6")))
    nrel = (holdout.groupBy("custkey")
            .agg(F.count("*").cast("long").alias("n_rel")))
    per_user = (
        recs.select("custkey").distinct()
        .join(ap, "custkey", "left")
        .join(nrel, "custkey", "left")
        .select(F.expr(
            "CASE WHEN ap_x6 IS NULL THEN CAST(0 AS BIGINT)"
            " ELSE (1000000 * ap_x6)"
            f" div (6 * least({k}, n_rel)) END").alias("ap_ppm"))
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.when(F.col("ap_ppm") > 0, 1).otherwise(0)).cast("long")
        .alias("n_hit_users"),
        F.expr("CAST(SUM(ap_ppm) div count(1) AS BIGINT)")
        .alias("map_ppm"),
    )


# NDCG@3 rank discounts as PINNED floor-ppm integer literals of
# 1e6/log2(rank+1) — the no-transcendental house rule: the log2 values
# are compile-time constants, never computed by either engine.
_NDCG_DISC_PPM = {1: 1000000, 2: 630929, 3: 500000}
_NDCG_IDEAL_PPM = {1: 1000000, 2: 1630929, 3: 2130929}


def cf_ndcg_eval(lineitem: DataFrame, orders: DataFrame,
                 k: int = 3, cache_key: str | None = None) -> DataFrame:
    """NDCG@k of the item-CF recommender on the leave-last-order-out
    split — the graded-position companion to HitRate/MRR/MAP
    (Järvelin & Kekäläinen 2002; public method) with binary relevance:
    DCG = Σ_hits disc(rank), IDCG = Σ_{j ≤ min(k, R)} disc(j), both in
    the pinned integer-ppm discount table ``_NDCG_DISC_PPM`` (floor-ppm
    literals of 1e6/log2(r+1) — no transcendental runs on either
    engine), per-user ndcg = (1e6·dcg_ppm) DIV idcg_ppm, mean over
    evaluable users by one more integer DIV (the cf_map_eval ppm
    discipline; everything nonnegative, truncation == floor).

    Scale shape: identical to cf_ranking_eval — shared memoized
    split-trained artifact (cf_eval_frames), eval join on
    (custkey, part), 1-row summary.
    Columns: n_eval, n_hit_users, ndcg_ppm."""
    if k != 3:
        raise ValueError("pinned discount literals are derived for k=3")
    recs, holdout = cf_eval_frames(lineitem, orders, k=k,
                                   cache_key=cache_key)
    disc = ("CASE rnk " + " ".join(
        f"WHEN {r} THEN {p}" for r, p in _NDCG_DISC_PPM.items())
        + " ELSE 0 END")
    dcg = (recs.join(holdout, ["custkey", "part"])
           .groupBy("custkey")
           .agg(F.sum(F.expr(disc)).cast("long").alias("dcg_ppm")))
    ideal = ("CASE least(3, n_rel) " + " ".join(
        f"WHEN {j} THEN {p}" for j, p in _NDCG_IDEAL_PPM.items())
        + " END")
    nrel = (holdout.groupBy("custkey")
            .agg(F.count("*").cast("long").alias("n_rel")))
    per_user = (
        recs.select("custkey").distinct()
        .join(dcg, "custkey", "left")
        .join(nrel, "custkey", "left")
        .select(F.expr(
            "CASE WHEN dcg_ppm IS NULL THEN CAST(0 AS BIGINT)"
            f" ELSE (1000000 * dcg_ppm) div ({ideal}) END")
            .alias("ndcg_ppm")))
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.when(F.col("ndcg_ppm") > 0, 1).otherwise(0))
        .cast("long").alias("n_hit_users"),
        F.expr("CAST(SUM(ndcg_ppm) div count(1) AS BIGINT)")
        .alias("ndcg_ppm"),
    )
