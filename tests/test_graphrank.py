"""Power-iteration rank (operators/graphrank.py): probability-mass
conservation, determinism, and the iterative-plan discipline."""

from __future__ import annotations

from spark_streaming_spark.operators import graphrank as GR
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_corank_mass_conserved_and_deterministic(spark):
    """Symmetric graph → no dangling mass: ranks must sum to 1 up to
    the 7 dp contribution quantization (|V|·1e-7 bound), and two runs
    must agree bit-for-bit (the oracle-exactness precondition)."""
    li = load_table(spark, SF_DIR, "lineitem")
    r1 = {(r.supp, r.rank) for r in GR.supplier_corank(li).collect()}
    total = sum(v for _, v in r1)
    assert abs(total - 1.0) <= len(r1) * 1e-6
    r2 = {(r.supp, r.rank) for r in GR.supplier_corank(li).collect()}
    assert r1 == r2


def test_corank_edges_symmetric_no_self_loops(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    edges = {(r.src, r.dst, r.w) for r in GR.cosupply_edges(li).collect()}
    assert edges
    assert all(s != d for s, d, _ in edges)
    assert all((d, s, w) in edges for s, d, w in edges)


def test_corank_more_iterations_converge(spark):
    """Power iteration must move toward a fixpoint: the L1 delta
    between successive iterates shrinks (damping contraction)."""
    li = load_table(spark, SF_DIR, "lineitem")
    r2 = dict((r.supp, r.rank) for r in
              GR.supplier_corank(li, n_iters=2).collect())
    r3 = dict((r.supp, r.rank) for r in
              GR.supplier_corank(li, n_iters=3).collect())
    r4 = dict((r.supp, r.rank) for r in
              GR.supplier_corank(li, n_iters=4).collect())
    d23 = sum(abs(r3[k] - r2[k]) for k in r2)
    d34 = sum(abs(r4[k] - r3[k]) for k in r3)
    assert d34 < d23


def test_bfs_hops_min_distance_and_horizon(spark):
    """Hand graph: 1-2-3-4-5 path plus a 1-3 shortcut. Hop = shortest
    distance; nodes beyond n_rounds are absent."""
    from spark_streaming_spark.operators.graphrank import bfs_hops

    und = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "v long")
    out = {r.v: r.hop for r in bfs_hops(edges, seeds, n_rounds=2).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}  # 5 is 3 hops out: excluded


def test_lpa_two_cliques_converge_and_oracle(spark, duck):
    """Two disjoint co-supply cliques collapse to one community each
    (hand-traced synchronous LPA with min-label ties), every graph node
    gets a label, and the driver entry hash-matches the unrolled
    oracle."""
    import __spark_entry__ as E
    from tests.conftest import SF_DIR, assert_matches_oracle

    rows = []
    for ok, supps in [(1, [1, 2, 3]), (2, [10, 11, 12])]:
        for s in supps:
            rows.append((ok, s))
    tiny = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    out = {r.supp: r.community
           for r in GR.lpa_communities(tiny).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    li = load_table(spark, SF_DIR, "lineitem")
    full = GR.lpa_communities(li).collect()
    nodes = {r.supp for r in full}
    labels = {r.community for r in full}
    assert labels <= nodes            # labels are node ids
    assert len(full) == len(nodes)    # one label per node
    assert_matches_oracle(GR.lpa_communities(li), duck,
                          E.oracle_sql()["lpa_communities"])


def test_kcore_parts_peels_and_bounds(spark):
    """Every survivor's induced degree >= k, and the peel genuinely
    removed fringe nodes (0 < survivors < graph nodes)."""
    from spark_streaming_spark.operators import graphrank as GRK

    li = load_table(spark, SF_DIR, "lineitem")
    edges = GRK.copurchase_part_edges(li)
    n_nodes = edges.select("src").distinct().count()
    out = GRK.kcore_parts(li, k=8, n_rounds=4).collect()
    assert 0 < len(out) < n_nodes
    assert all(r["core_deg"] >= 8 for r in out)


def test_kcore_extra_rounds_are_noops_once_converged(spark):
    """The peel is monotone: if round n changes nothing, rounds n+1..
    change nothing — more rounds can only shrink toward the fixpoint,
    so a converged bounded-round answer IS the true k-core."""
    from spark_streaming_spark.operators import graphrank as GRK

    li = load_table(spark, SF_DIR, "lineitem")
    a = sorted(tuple(r) for r in GRK.kcore_parts(li, k=8,
                                                 n_rounds=4).collect())
    b = sorted(tuple(r) for r in GRK.kcore_parts(li, k=8,
                                                 n_rounds=6).collect())
    assert a == b


def test_cheapest_hops_matches_oracle_and_bellman_ford(spark, duck):
    """Weighted bounded-hop shortest paths: oracle bit-match, cost
    monotone non-increasing in rounds, and cost <= ecost-weighted BFS
    along any 1-hop edge from a seed (relaxation actually relaxes)."""
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    out = E.queries()["part_cheapest_hops"](spark, SF_DIR)
    assert_matches_oracle(out, duck, E.oracle_sql()["part_cheapest_hops"])
    rows = {r["v"]: r["cost"] for r in out.collect()}
    assert rows
    # seeds cost 0; everything else positive
    assert sorted(c for c in rows.values())[0] == 0
    # 4 rounds never worse than 3 (Bellman-Ford monotonicity)
    from spark_streaming_spark.operators import basket as BK
    from spark_streaming_spark.operators import graphrank as GRK
    from pyspark.sql import functions as F

    eu = (BK.frequent_pairs(load_table(spark, SF_DIR, "lineitem"),
                            cache_key=SF_DIR)
          .select("part_a", "part_b", F.expr(
              "CAST(1000000 DIV pair_support AS BIGINT)").alias("ecost")))
    edges = eu.select(
        F.col("part_a").alias("src"), F.col("part_b").alias("dst"),
        "ecost",
    ).unionByName(eu.select(
        F.col("part_b").alias("src"), F.col("part_a").alias("dst"),
        "ecost"))
    seeds = (eu.select(F.col("part_a").alias("v")).distinct()
             .orderBy("v").limit(5))
    more = {r["v"]: r["cost"]
            for r in GRK.cheapest_hops(edges, seeds, 4).collect()}
    for v, c in rows.items():
        assert more[v] <= c, (v, more[v], c)


def _sym_edges(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_link_prediction_scores_and_excludes_edges(spark):
    """Hand graph: z=100 links (1,2) only (deg 2 -> RA 500000); hub
    h=200 links everyone (deg 4). Pair (1,2) shares BOTH neighbors;
    (3,4) shares only the hub. Existing edges never predicted."""
    e = _sym_edges(spark, [(1, 100), (2, 100),
                           (1, 200), (2, 200), (3, 200), (4, 200)])
    out = {(r["part_a"], r["part_b"]): r
           for r in GR.link_prediction(e).collect()}
    assert out[(1, 2)]["cn"] == 2
    assert out[(1, 2)]["ra_score"] == 500000 + 250000
    assert out[(3, 4)]["cn"] == 1 and out[(3, 4)]["ra_score"] == 250000
    # adjacent pairs (1,100) etc. must not appear
    assert all(a < b and (a, b) not in {(1, 100), (1, 200)}
               for a, b in out)


def test_link_prediction_hub_cap_contract(spark):
    """max_hub_deg is part of the contract: with the cap below the
    hub's degree, pairs sharing ONLY the hub vanish."""
    e = _sym_edges(spark, [(1, 100), (2, 100),
                           (1, 200), (2, 200), (3, 200), (4, 200)])
    out = {(r["part_a"], r["part_b"]): r
           for r in GR.link_prediction(e, max_hub_deg=2).collect()}
    assert (3, 4) not in out
    assert out[(1, 2)]["cn"] == 1 and out[(1, 2)]["ra_score"] == 500000


def test_ppr_localizes_to_seed_component(spark):
    """Two disconnected components; seeds in component A -> every
    component-B node ranks exactly 0 (no teleport, no inflow), and
    A's non-seed neighbor collects strictly positive rank. Seeds
    without edges are excluded from the teleport by the
    seeds-intersect-nodes rule."""
    e = _sym_edges(spark, [(1, 2), (2, 3), (10, 11)])
    e = e.groupBy("src", "dst").count().withColumnRenamed("count", "w")
    seeds = spark.createDataFrame([(1,), (999,)], "v long")
    r = {row["v"]: row["rank"]
         for row in GR.weighted_pagerank(e, seeds=seeds).collect()}
    assert r[10] == 0.0 and r[11] == 0.0
    assert r[2] > 0.0 and r[1] > 0.0
    # 999 has no edges: teleport mass went entirely to node 1
    assert r[1] > r[3] > 0.0


def test_ppr_no_seed_in_graph_returns_empty(spark):
    """Seeds entirely disjoint from the graph's nodes: the teleport
    vector is undefined, so the rank frame is EMPTY (schema intact)
    rather than a ZeroDivisionError — the ppr_recommendations path for
    a brand with no co-purchased parts."""
    e = _sym_edges(spark, [(1, 2)])
    e = e.groupBy("src", "dst").count().withColumnRenamed("count", "w")
    seeds = spark.createDataFrame([(999,)], "v long")
    out = GR.weighted_pagerank(e, seeds=seeds)
    assert out.columns == ["v", "rank"]
    assert out.count() == 0
