"""Weighted PageRank by power iteration, Spark-first: the iterative
workload class (rank propagation over a co-occurrence graph) expressed
as per-round join + aggregate with a driver loop, lineage truncated by
``localCheckpoint`` each round — the same iterative discipline as the
connected-components loop in operators/dedup.py and the BPE trainer.

Engine-exact by construction (the sketch recipe from SURVEY §house
rules): per-edge contributions are quantized to 7 dp DECIMAL(38,8)
before the order-independent sum, the damping affine uses plain IEEE
double ops in a fixed sequence, and the iteration count is a plan
constant — so a DuckDB oracle that unrolls the same rounds reproduces
every rank bit-for-bit. Approximate-iterative ≠ unverifiable when each
step is deterministic (the knn_graph_lsh / knn_ivf_det rationale).

Graph: suppliers co-supplying an order (lineitem self-join on
l_orderkey), edge weight = co-occurrence count; symmetric, so every
node has out-edges and there is no dangling-mass correction to model.

Scale shape: the edge build shuffles lineitem once on the order key
(bounded per-order quadratic — suppliers per order is small and fixed
by the schema, the same bound as every order-grain join); each
iteration then touches only the EDGE table (|E| rows) and the rank
vector (|V| rows) — a join keyed on src, an aggregate keyed on dst.
At 100 TB the edge table is built once and the per-round cost is two
shuffles of |E|, independent of corpus size; the rank vector stays
broadcastable until |V| is itself huge, at which point the join is the
correct plan anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Edge-artifact cache (the basket.frequent_pairs / dedup._PAIRS_CACHE
# discipline): a production graph pipeline mines the co-occurrence edge
# table ONCE per corpus snapshot and serves every downstream consumer
# (rank, communities, k-core, link prediction, PPR) from that
# materialized artifact — at 100 TB a parquet table, here an eagerly-
# checkpointed frame. Keys include the Spark application id: a
# checkpointed frame dies with its session.
_EDGES_CACHE: dict = {}


def _cached_edges(build, key) -> DataFrame:
    got = _EDGES_CACHE.get(key)
    if got is None:
        got = build().localCheckpoint(eager=True)
        _EDGES_CACHE[key] = got
    return got


def cosupply_edges(lineitem: DataFrame,
                   cache_key: str | None = None) -> DataFrame:
    """(src, dst, w): supplier co-occurrence within an order, symmetric,
    self-pairs excluded. Columns: src, dst, w.

    One-shuffle spelling: instead of self-joining lineitem on the order
    key (which shuffles the big table TWICE — once per join side), group
    the suppliers per order into an array (one shuffle, map-side
    combinable) and explode the within-order pairs map-side. The
    per-order quadratic is identical to the self-join's output — only
    the shuffled volume changes. Pair multiset matches the row-level
    self-join exactly (duplicate line items of a supplier keep their
    multiplicity).

    ``cache_key`` memoizes the edge artifact per application (the
    _EDGES_CACHE discipline) — corank and LPA both consume it."""
    def build():
        per_order = (
            lineitem.groupBy("l_orderkey")
            .agg(F.collect_list("l_suppkey").alias("supps"))
        )
        return (
            per_order.select(F.explode(F.expr(
                "filter(flatten(transform(supps,"
                " x -> transform(supps, y -> struct(x AS src, y AS dst)))),"
                " p -> p.src != p.dst)")).alias("p"))
            .select("p.src", "p.dst")
            .groupBy("src", "dst")
            .agg(F.count("*").alias("w"))
        )
    if cache_key is None:
        return build()
    return _cached_edges(build, (
        "cosupply", lineitem.sparkSession.sparkContext.applicationId,
        cache_key))


def weighted_pagerank(raw_edges: DataFrame, n_iters: int = 3,
                      damping: float = 0.85,
                      seeds: DataFrame | None = None) -> DataFrame:
    """Weighted PageRank over a symmetric (src, dst, w) edge set,
    ``n_iters`` power iterations from the uniform vector — the generic
    engine behind :func:`supplier_corank` and textstats' TextRank.
    Columns: v, rank.

    ``seeds`` (one column ``v``) switches to PERSONALIZED PageRank
    (Haveliwala 2002 topic-sensitive PR; public method): the teleport
    vector is uniform over seeds ∩ graph nodes instead of all nodes
    (seed rows without edges carry no mass, by that intersection rule
    — part of the cross-engine contract), start vector = teleport —
    rank localizes around the seed neighborhood, the recommendation /
    related-items shape.

    Per round: rank flows along each edge proportionally to its weight
    share of the source's out-weight; contributions quantize to 7 dp
    decimals (order-independent exact sum), then
    ``rank' = (1-d)/N + d·Σ`` in a fixed IEEE sequence. The out-weight
    is folded into the staged edge table ONCE (so each round is a
    single broadcast join of the tiny rank vector against the edges,
    not two); the rank vector is localCheckpointed per round so the
    plan stays O(1) in rounds. Symmetric input means every node has
    out-edges — no dangling-mass correction to model."""
    raw = raw_edges.localCheckpoint(eager=True)
    outw = (raw.groupBy("src").agg(F.sum("w").alias("out_w"))
            .localCheckpoint(eager=True))
    # map-side fold: outw is |V|-sized -> broadcast; no materialization
    edges = raw.join(F.broadcast(outw), "src")
    d = damping
    if seeds is None:
        n = outw.count()
        base = (1.0 - d) / n
        nodes = outw.select(
            F.col("src").alias("v"), F.lit(1.0 / n).alias("r0"),
            F.lit(base).alias("b"))
    else:
        sv = (outw.select(F.col("src").alias("v"))
              .join(seeds.select("v").distinct(), "v", "left_semi"))
        ns = sv.count()
        if ns == 0:
            # No seed intersects the graph: the teleport vector is
            # undefined, so personalized rank is identically zero —
            # return the empty rank frame rather than divide by zero.
            return outw.select(F.col("src").alias("v"),
                               F.lit(0.0).alias("rank")).limit(0)
        s0 = 1.0 / ns
        nodes = (
            outw.select(F.col("src").alias("v"))
            .join(sv.withColumn("__s", F.lit(s0)), "v", "left")
            .select("v", F.coalesce("__s", F.lit(0.0)).alias("r0"),
                    (F.lit(1.0 - d)
                     * F.coalesce("__s", F.lit(0.0))).alias("b"))
        )
    nodes = nodes.localCheckpoint(eager=True)
    rank = nodes.select("v", F.col("r0").alias("r"))
    contrib = F.expr(
        "cast(round(r * w / out_w, 7) as decimal(38,8))")
    for _ in range(n_iters):
        flows = (
            edges.join(rank, edges["src"] == rank["v"])
            .select("dst", contrib.alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        rank = (
            nodes.select("v", "b")
            .join(flows, nodes["v"] == flows["dst"], "left")
            .select(
                "v",
                (F.col("b") + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0)))
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return rank.select("v", F.col("r").alias("rank"))


def supplier_corank(lineitem: DataFrame, n_iters: int = 3,
                    damping: float = 0.85,
                    cache_key: str | None = None) -> DataFrame:
    """Weighted PageRank over the co-supply graph — the generic
    :func:`weighted_pagerank` on :func:`cosupply_edges` (identical
    arithmetic; this was the original spelling the generic was factored
    from, so the hash oracle is unchanged). Columns: supp, rank."""
    return weighted_pagerank(
        cosupply_edges(lineitem, cache_key=cache_key), n_iters, damping
    ).select(F.col("v").alias("supp"), "rank")


def bfs_hops(edges: DataFrame, seeds: DataFrame,
             n_rounds: int = 3) -> DataFrame:
    """Min-hop distances from a seed set by frontier expansion — the
    BFS/k-hop-reach workload class (neighborhood enrichment, blast-
    radius analysis), complementing the fixed-point label propagation
    in operators/dedup.connected_components and the rank iteration
    above. Deterministic by construction: a node's hop is the FIRST
    round that reaches it, so no tie-breaking is ever needed.

    ``edges`` is directed (src, dst) — pass both directions for an
    undirected graph; ``seeds`` has one column ``v``. Returns (v, hop)
    for every node within ``n_rounds`` hops (hop 0 = seeds).

    Scale shape: each round is one join of the FRONTIER (not the whole
    visited set) against the edge table keyed on src, then an anti-join
    against the visited set keyed on v — both hash-partitioned, no
    broadcast of anything that grows with the graph; localCheckpoint
    per round truncates lineage so the plan stays O(1) in rounds. Cost
    per round is |frontier|·avg_degree, the textbook BFS bound."""
    dist = (seeds.select("v", F.lit(0).alias("hop"))
            .localCheckpoint(eager=True))
    frontier = dist.select("v")
    for r in range(1, n_rounds + 1):
        nxt = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .select(F.col("dst").alias("v")).distinct()
            .join(dist, "v", "left_anti")
            .withColumn("hop", F.lit(r))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("v")
    return dist


def cheapest_hops(edges: DataFrame, seeds: DataFrame,
                  n_rounds: int = 3) -> DataFrame:
    """Bounded-hop WEIGHTED shortest paths from a seed set — the
    Bellman-Ford relaxation unrolled (public textbook method), the
    weighted complement of :func:`bfs_hops`: after round r, ``cost`` is
    the exact minimum edge-cost sum over all paths of ≤ r hops.
    Deterministic by construction: integer costs, integer MIN — no
    tie-breaking needed, so a fixed round count unrolls into SQL.

    ``edges``: (src, dst, ecost) directed, integer cost — pass both
    directions for undirected graphs; ``seeds``: one column ``v``.
    Returns (v, cost) for every node within ``n_rounds`` hops.

    Scale shape: each round is ONE join of the current distance table
    against the edge table keyed on src plus one partial-agged MIN
    groupBy — O(|E|) per round, the Bellman-Ford bound; localCheckpoint
    per round truncates lineage (the corank discipline). Unlike BFS the
    whole table relaxes each round (a cheaper 2-hop path may improve a
    node found in 1 hop)."""
    dist = (seeds.select("v", F.lit(0).cast("long").alias("cost"))
            .localCheckpoint(eager=True))
    for _ in range(n_rounds):
        relaxed = (
            dist.join(edges, dist["v"] == edges["src"])
            .select(F.col("dst").alias("v"),
                    (F.col("cost") + F.col("ecost")).alias("cost"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("v")
            .agg(F.min("cost").cast("long").alias("cost"))
            .localCheckpoint(eager=True)
        )
    return dist


def lpa_communities(lineitem: DataFrame, n_iters: int = 3,
                    cache_key: str | None = None) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007, "Near linear time algorithm to detect
    community structures in large-scale networks"; public method) over
    the supplier co-supply graph: every node starts as its own label,
    and each round adopts the label with the LARGEST weighted vote among
    its neighbors — ties broken by the smallest label, so the
    synchronous variant is fully deterministic and the whole run
    unrolls into SQL (the supplier_corank / bfs_hops oracle
    discipline). Fixed ``n_iters`` rounds (LPA's natural stopping point
    is a few sweeps; determinism matters more than convergence here).
    Columns: supp, community (label after the final round).

    Scale shape: per round ONE edge-keyed join + one (node, label)
    partial-agged groupBy + a per-node top-1 window — all O(|E|);
    lineage truncated per round with localCheckpoint (the corank
    discipline) so the plan does not grow with iterations."""
    return lpa_propagate(cosupply_edges(lineitem, cache_key=cache_key),
                         n_iters).select(
        F.col("node").alias("supp"),
        F.col("label").cast("long").alias("community"),
    )


def lpa_propagate(edges: DataFrame, n_iters: int = 3) -> DataFrame:
    """The synchronous-LPA core over ANY weighted edge table (src, dst,
    w) — shared by :func:`lpa_communities` (co-supply graph) and
    dedup.dup_communities (SimHash near-dup graph). Every node starts as
    its own label; each round adopts the neighbor label with the largest
    weighted vote, smallest label on ties — fully deterministic, so a
    fixed round count unrolls into SQL. Returns (node, label) for every
    node appearing as an edge src (pass both directions for undirected
    graphs)."""
    # materialize the edge build ONCE: every round joins against it, and
    # without the checkpoint each round re-runs the upstream edge
    # construction (measured 3.5x slower on the co-supply build)
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    # (r14 note: a max(struct(votes, -label)) aggregate spelling of the
    # per-node argmax was tried and REVERTED — a struct agg buffer is
    # immutable, demoting the groupBy to SortAggregate, while the
    # rank-1 window plans as WindowGroupLimit with a partial
    # per-partition limit before its sort.)
    from pyspark.sql.window import Window

    w = Window.partitionBy("src").orderBy(
        F.col("votes").desc(), F.col("label").asc())
    for _ in range(n_iters):
        votes = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src", "label")
            .agg(F.sum("w").alias("votes"))
        )
        labels = (
            votes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("src").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
    return labels


def copurchase_part_edges(lineitem: DataFrame,
                          min_pair_orders: int = 2,
                          cache_key: str | None = None) -> DataFrame:
    """Symmetric part co-purchase edges: (src, dst, w) where w = number
    of DISTINCT orders containing both parts (collect_set dedupes
    within-order repeats), kept when w >= min_pair_orders. The one-
    shuffle per-order array-explode spelling of cosupply_edges — the
    shuffled volume is the grouped order/part table, and the per-order
    quadratic explodes map-side.

    ``cache_key`` memoizes the edge artifact per application (the
    _EDGES_CACHE discipline) — k-core, PPR and link prediction all
    consume this one table."""
    def build():
        per_order = (
            lineitem.groupBy("l_orderkey")
            .agg(F.collect_set("l_partkey").alias("ps"))
        )
        return (
            per_order.select(F.explode(F.expr(
                "filter(flatten(transform(ps,"
                " x -> transform(ps, y -> struct(x AS src, y AS dst)))),"
                " p -> p.src != p.dst)")).alias("p"))
            .select("p.src", "p.dst")
            .groupBy("src", "dst")
            .agg(F.count("*").alias("w"))
            .filter(F.col("w") >= min_pair_orders)
        )
    if cache_key is None:
        return build()
    return _cached_edges(build, (
        "copurchase", lineitem.sparkSession.sparkContext.applicationId,
        cache_key, min_pair_orders))


def kcore_parts(lineitem: DataFrame, k: int = 4,
                min_pair_orders: int = 2, n_rounds: int = 4,
                cache_key: str | None = None) -> DataFrame:
    """Dense-subgraph mining by k-core PEELING (Seidman 1983 "Network
    structure and minimum degree"; the standard bulk-parallel variant —
    Montresor et al.: repeatedly delete every node whose degree in the
    surviving subgraph is below k) over the part co-purchase graph:
    the assortments that keep selling together even after fringe parts
    peel away. Fixed ``n_rounds`` peel rounds (the lpa/bfs bounded-
    round discipline: deterministic and SQL-unrollable; each round is a
    SUPERSET of the true k-core, which is the fixpoint), then the
    surviving nodes are emitted with their induced degree.

    Scale shape: per round ONE induced-subgraph filter (two semi joins
    keyed on the node) + one partial-agged degree groupBy — O(|E|);
    lineage truncated per round with localCheckpoint. The peel is
    monotone (alive sets only shrink), so rounds after convergence are
    no-ops, never wrong. Columns: part, core_deg."""
    edges = (copurchase_part_edges(lineitem, min_pair_orders,
                                   cache_key=cache_key)
             .select("src", "dst").localCheckpoint(eager=True))
    alive = edges.select(F.col("src").alias("v")).distinct()
    for _ in range(n_rounds):
        induced = (
            edges.join(alive.withColumnRenamed("v", "src"), "src",
                       "left_semi")
            .join(alive.withColumnRenamed("v", "dst"), "dst", "left_semi")
        )
        deg = induced.groupBy("src").agg(F.count("*").alias("deg"))
        alive = (
            deg.filter(F.col("deg") >= k)
            .select(F.col("src").alias("v"))
            .localCheckpoint(eager=True)
        )
    final = (
        edges.join(alive.withColumnRenamed("v", "src"), "src", "left_semi")
        .join(alive.withColumnRenamed("v", "dst"), "dst", "left_semi")
        .groupBy("src").agg(F.count("*").cast("long").alias("core_deg"))
    )
    return final.select(F.col("src").alias("part"), "core_deg")


def link_prediction(edges: DataFrame, max_hub_deg: int = 50,
                    k: int = 50) -> DataFrame:
    """Common-neighbor link prediction over a symmetric weighted edge
    set — the classic similarity indices of Liben-Nowell & Kleinberg
    2003 / Zhou, Lü & Zhang 2009 (resource allocation), public methods:
    score every NON-adjacent pair (a, b) by its common neighbors z,
    cn = |N(a)∩N(b)| and the integer-exact RA variant
    ra_score = Σ_z (1 000 000 DIV deg(z)) — rarer shared neighbors
    count more; a hub shared with everyone counts little. Top-``k`` by
    (ra_score, cn, a, b) — the "customers who bought X also bought Y"
    candidate generator / graph-completion shape.

    Scale shape: candidates come from the WEDGE join (E ⋈ E on the
    middle node) — the triangle-counting cost Σ_z deg(z)², BOUNDED by
    the ``max_hub_deg`` cap: paths only route through nodes with
    deg ≤ cap (drop-the-hubs is the standard wedge-bounding move, same
    discipline as textstats' max_df; the cap rule is part of the
    cross-engine contract). One partial-agged (a, b) groupBy, existing
    edges removed with a left anti join, top-k is
    TakeOrderedAndProject. Columns: part_a, part_b, cn, ra_score."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    mid = deg.filter(F.col("deg") <= max_hub_deg)
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("z"))
    e2 = edges.select(F.col("src").alias("z"), F.col("dst").alias("b"))
    wedges = (
        e1.join(mid.withColumnRenamed("src", "z"), "z")
        .join(e2, "z")
        .filter(F.col("a") < F.col("b"))
    )
    scored = (
        wedges.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("cn"),
             F.sum(F.expr("1000000 DIV deg")).cast("long")
             .alias("ra_score"))
    )
    return (
        scored.join(
            edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"], "left_anti")
        .select(F.col("a").alias("part_a"), F.col("b").alias("part_b"),
                "cn", "ra_score")
        .orderBy(F.col("ra_score").desc(), F.col("cn").desc(),
                 F.col("part_a").asc(), F.col("part_b").asc())
        .limit(k)
    )


def ppr_recommendations(lineitem: DataFrame, part: DataFrame,
                        brand: str = "Brand#1", k: int = 30,
                        cache_key: str | None = None) -> DataFrame:
    """Related-item recommendations by PERSONALIZED PageRank
    (Haveliwala 2002): teleport uniformly to one brand's parts inside
    the co-purchase graph, iterate, return the top-``k`` NON-seed
    parts — mass localizes around the seed neighborhood, so the result
    is "what co-sells with this brand", not global popularity
    (supplier_corank's shape). Engine-exact by the corank discipline.
    Columns: part, rank.

    Scale shape: identical per-round cost to :func:`supplier_corank`
    (|E| join + |V| agg, localCheckpoint per round); the seed set is a
    left-semi + left join against the node table; top-k is
    TakeOrderedAndProject."""
    seeds = (part.filter(F.col("p_brand") == brand)
             .select(F.col("p_partkey").alias("v")))
    ranks = weighted_pagerank(
        copurchase_part_edges(lineitem, cache_key=cache_key), seeds=seeds)
    return (
        ranks.join(seeds, "v", "left_anti")
        .select(F.col("v").alias("part"), "rank")
        .orderBy(F.col("rank").desc(), F.col("part").asc())
        .limit(k)
    )


def customer_part_edges(lineitem: DataFrame, orders: DataFrame,
                        cache_key: str | None = None) -> DataFrame:
    """(cust, part, w): the customer→part purchase bipartite multigraph
    (w = line items), the input to HITS and any bipartite ranking.
    One corpus join on the order key + one partial-agged groupBy; the
    artifact memoizes per (application, corpus) like cosupply_edges.
    Columns: cust, part, w."""
    def build():
        return (
            lineitem.join(orders,
                          lineitem["l_orderkey"] == orders["o_orderkey"])
            .groupBy(F.col("o_custkey").alias("cust"),
                     F.col("l_partkey").alias("part"))
            .agg(F.count("*").alias("w"))
        )
    if cache_key is None:
        return build().localCheckpoint(eager=True)
    return _cached_edges(build, (
        "custpart", lineitem.sparkSession.sparkContext.applicationId,
        cache_key))


def hits_scores(lineitem: DataFrame, orders: DataFrame,
                n_iters: int = 2, k: int = 50,
                cache_key: str | None = None) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, "Authoritative
    sources in a hyperlinked environment"; public method) on the
    customer↔part purchase bipartite graph: customers are hubs (they
    "point at" parts), parts are authorities — the mutual-reinforcement
    ranking that finds the big-basket customers and the parts those
    customers concentrate on.

    Engine-exact by the corank discipline: per-edge contributions
    quantize to 7 dp DECIMAL(38,8) before the order-independent sum;
    normalization is by the MAX score (a documented HITS variant —
    max is order-independent where an L2 norm's float sum is not), one
    IEEE double divide per node; the iteration count is a plan
    constant, so the DuckDB twin unrolls the same rounds bit-for-bit.

    Scale shape: the edge build is the only corpus-sized work; each
    half-iteration is one |E| join + one partial-agged aggregate, with
    the 1-row max broadcast. Top-k per side is TakeOrderedAndProject.
    Columns: kind ('hub'|'authority'), node_id, score."""
    return hits_from_edges(
        customer_part_edges(lineitem, orders, cache_key=cache_key),
        n_iters=n_iters, k=k)


def hits_from_edges(edges: DataFrame, n_iters: int = 2,
                    k: int = 50) -> DataFrame:
    """:func:`hits_scores`' iteration + top-k from an already-built (or
    streamed-and-folded) (cust, part, w) edge table — edge weights are
    additive counts, so a per-micro-batch fold reaches the one-shot
    edge table and the streamed twin runs the SAME iterations at read
    (the streaming_textrank discipline: fold edges continuously,
    iterate on the folded totals)."""
    hub = (edges.select("cust").distinct()
           .select("cust", F.lit(1.0).alias("h"))
           .localCheckpoint(eager=True))
    auth = None
    # checkpoint the |E|-join aggregate ITSELF before the max-norm
    # scalar is derived from it: the scalar rides a broadcast subplan,
    # so checkpointing only the normalized result (the old spelling)
    # executed the corpus-scale join+agg TWICE per half-round — once
    # under the broadcast build, once under the checkpoint (guide §2.4:
    # an exchange is not reused across a broadcast boundary). The
    # max-norm scalar is COLLECTED (r15, VERDICT r14 #6): it is one row
    # of the node-sized checkpointed aggregate — driver-sized by
    # definition (guide §5) — and embedding it as a decimal literal
    # makes auth/hub pure projections over the checkpoint: size-known
    # broadcast build sides with NO max subplan to re-execute and no
    # eager normalization job per half-round (the r14 spelling's four
    # extra jobs were the streaming_hits riser; a fully-lazy variant
    # re-executed the max under every consumer and measured worse —
    # eager 3.38 / lazy 4.53 / this 2.84 s at sf0.1, value-identical:
    # collect returns the exact DECIMAL(38,8), and the divide casts it
    # to double exactly as the broadcast column did).
    for _ in range(n_iters):
        ar = (edges.join(hub, "cust")
              .select("part", F.expr(
                  "cast(round(w * h, 7) as decimal(38,8))").alias("c"))
              .groupBy("part").agg(F.sum("c").alias("s"))
              .localCheckpoint(eager=True))
        am = ar.agg(F.max("s").alias("m")).first()[0]
        auth = ar.select("part", (F.col("s").cast("double")
                                  / F.lit(am).cast("decimal(38,8)")
                                  .cast("double")).alias("a"))
        hr = (edges.join(auth, "part")
              .select("cust", F.expr(
                  "cast(round(w * a, 7) as decimal(38,8))").alias("c"))
              .groupBy("cust").agg(F.sum("c").alias("s"))
              .localCheckpoint(eager=True))
        hm = hr.agg(F.max("s").alias("m")).first()[0]
        hub = hr.select("cust", (F.col("s").cast("double")
                                 / F.lit(hm).cast("decimal(38,8)")
                                 .cast("double")).alias("h"))
    top_hub = (hub.orderBy(F.col("h").desc(), F.col("cust").asc())
               .limit(k)
               .select(F.lit("hub").alias("kind"),
                       F.col("cust").alias("node_id"),
                       F.col("h").alias("score")))
    top_auth = (auth.orderBy(F.col("a").desc(), F.col("part").asc())
                .limit(k)
                .select(F.lit("authority").alias("kind"),
                        F.col("part").alias("node_id"),
                        F.col("a").alias("score")))
    return top_hub.unionAll(top_auth)


def hits_sql(n_iters: int = 2, k: int = 50) -> str:
    """DuckDB twin of :func:`hits_scores` — the same quantized
    contributions, max-normalization, and per-side top-k, with the
    rounds UNROLLED as CTE chains (each CTE referenced once, so
    DuckDB's per-reference CTE inlining stays linear)."""
    rounds, prev_h = "", "h0"
    for i in range(1, n_iters + 1):
        rounds += f""",
        ar{i} AS (
          SELECT e.part, SUM(CAST(ROUND(e.w * h.h, 7)
                 AS DECIMAL(38,8))) AS s
          FROM edges e JOIN {prev_h} h USING (cust) GROUP BY 1),
        a{i} AS (
          SELECT part, CAST(s AS DOUBLE)
                 / CAST((SELECT MAX(s) FROM ar{i}) AS DOUBLE) AS a
          FROM ar{i}),
        hr{i} AS (
          SELECT e.cust, SUM(CAST(ROUND(e.w * a.a, 7)
                 AS DECIMAL(38,8))) AS s
          FROM edges e JOIN a{i} a USING (part) GROUP BY 1),
        h{i} AS (
          SELECT cust, CAST(s AS DOUBLE)
                 / CAST((SELECT MAX(s) FROM hr{i}) AS DOUBLE) AS h
          FROM hr{i})"""
        prev_h = f"h{i}"
    return f"""
        WITH edges AS (
          SELECT o.o_custkey AS cust, l.l_partkey AS part,
                 CAST(count(*) AS BIGINT) AS w
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        ),
        h0 AS (SELECT DISTINCT cust, CAST(1e0 AS DOUBLE) AS h
               FROM edges){rounds}
        SELECT * FROM (
          SELECT 'hub' AS kind, cust AS node_id, h AS score
          FROM h{n_iters} ORDER BY h DESC, cust ASC LIMIT {k})
        UNION ALL
        SELECT * FROM (
          SELECT 'authority' AS kind, part AS node_id, a AS score
          FROM a{n_iters} ORDER BY a DESC, part ASC LIMIT {k})
    """
