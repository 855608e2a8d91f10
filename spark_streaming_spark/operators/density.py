"""Density-based clustering (DBSCAN) over the exact-PCA projection
plane — grid-blocked, never all-pairs.

DBSCAN (Ester, Kriegel, Sander & Xu 1996; public method) needs every
eps-neighborhood EXACTLY — which is intractable to block in the raw
64-dim embedding space without losing completeness. The engine's move
(the standard one for density clustering at scale) is to run it on a
LOW-dimensional projection it can compute engine-exactly: the top-2 PCA
scores (operators/pca.py — hash-exact cross-engine), quantized to the
1e7-scaled integers the explained-variance tier already pins
(``ROUND(score·1e7)`` recovers the 7 dp decimal dots exactly). On an
integer plane, a side-eps grid makes the eps-neighborhood candidate set
COMPLETE by construction: any two points within eps lie in the same or
adjacent cells, so the 3×3 neighbor-cell equi-join (explode 9 offsets,
one shuffle) is a lossless blocking — the same guarantee argument as
SymSpell's deletion neighborhoods and the banded SimHash pairs.

Scale shape: |V|·9 offset rows through one equi-join; per-cell
population is bounded by density·eps² (a plan constant for fixed eps),
so no quadratic path exists. The core-core component step is the
bounded min-label iteration of dedup.dup_components (edge-touched
vertices only, localCheckpoint per round). Reference behavior parity:
the DuckDB oracle runs the NAIVE all-pairs neighborhood + a recursive
transitive closure — the entry's MATCH is the blocking-completeness
proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 10_000_000


def _quantized_plane(embeddings: DataFrame,
                     cache_key: str | None) -> DataFrame:
    """(vec_id, s1, s2): the exact-PCA top-2 scores as 1e7-scaled
    integers (the pca_explained_variance quantization pin)."""
    from spark_streaming_spark.operators.pca import pca_scores_multi

    sc = pca_scores_multi(embeddings, n_components=2,
                          cache_key=cache_key)
    return sc.select(
        "vec_id",
        F.expr(f"CAST(ROUND(score1 * {_SCALE}) AS BIGINT)").alias("s1"),
        F.expr(f"CAST(ROUND(score2 * {_SCALE}) AS BIGINT)").alias("s2"),
    )


def _grid_cell(col: str, eps: int):
    """Exact floor-division grid coordinate for possibly-negative
    integers: (x − pmod(x, eps)) / eps with the C-style truncating %
    both engines share — never a negative truncating DIV (the quotient
    is exactly divisible, where floor == trunc on both engines)."""
    return F.expr(f"CAST(({col} - ((({col} % {eps}) + {eps}) % {eps}))"
                  f" div {eps} AS BIGINT)")


def eps_neighbor_pairs(pts: DataFrame, eps: int) -> DataFrame:
    """All ORDERED pairs (vec_a, vec_b), a ≠ b, within Euclidean eps on
    the integer plane, via the complete 3×3 neighbor-cell join.
    Columns: vec_a, vec_b."""
    g = pts.select(
        F.col("vec_id"), "s1", "s2",
        _grid_cell("s1", eps).alias("gx"),
        _grid_cell("s2", eps).alias("gy"))
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1),"
        " x -> transform(sequence(-1, 1),"
        " y -> struct(x AS ox, y AS oy)))))")
    a = g.select(
        F.col("vec_id").alias("vec_a"), F.col("s1").alias("a1"),
        F.col("s2").alias("a2"), "gx", "gy",
        offsets.alias("o")).select(
        "vec_a", "a1", "a2",
        (F.col("gx") + F.col("o.ox")).alias("jx"),
        (F.col("gy") + F.col("o.oy")).alias("jy"))
    b = g.select(
        F.col("vec_id").alias("vec_b"), F.col("s1").alias("b1"),
        F.col("s2").alias("b2"), F.col("gx").alias("jx"),
        F.col("gy").alias("jy"))
    d2 = (F.expr("CAST(a1 - b1 AS BIGINT) * (a1 - b1)")
          + F.expr("CAST(a2 - b2 AS BIGINT) * (a2 - b2)"))
    return (a.join(b, ["jx", "jy"])
            .filter((F.col("vec_a") != F.col("vec_b"))
                    & (d2 <= F.lit(int(eps) * int(eps)).cast("long")))
            .select("vec_a", "vec_b"))


def dbscan_pca_clusters(embeddings: DataFrame, eps: int = 400_000,
                        min_pts: int = 4, max_iters: int = 50,
                        cache_key: str | None = None) -> DataFrame:
    """DBSCAN cluster assignment over the quantized top-2 PCA plane.

    * core: |N_eps(p)| ≥ ``min_pts`` (neighborhood INCLUDES the point,
      per the original paper);
    * cluster label: the MIN core vec_id transitively reachable through
      core-core eps-edges (min-label propagation to convergence — the
      deterministic replacement for the paper's scan-order labels);
    * border: non-core with ≥ 1 core eps-neighbor, assigned the MIN
      label among its core neighbors (again the deterministic pin of an
      order-dependent choice);
    * noise: everything else, cluster NULL.

    Columns: vec_id, role ('core' | 'border' | 'noise'),
    cluster (nullable BIGINT)."""
    pts = _quantized_plane(embeddings, cache_key).localCheckpoint(
        eager=True)
    return dbscan_on_plane(pts, eps, min_pts, max_iters)


def dbscan_on_plane(pts: DataFrame, eps: int = 400_000,
                    min_pts: int = 4,
                    max_iters: int = 50) -> DataFrame:
    """:func:`dbscan_pca_clusters`' clustering over an already-built
    integer plane (vec_id, s1, s2)."""
    nbrs = eps_neighbor_pairs(pts, eps).localCheckpoint(eager=True)
    counts = nbrs.groupBy("vec_a").agg(
        (F.count("*") + 1).cast("long").alias("n_in_eps"))
    core = (pts.join(counts, pts["vec_id"] == counts["vec_a"], "left")
            .select("vec_id",
                    (F.coalesce("n_in_eps", F.lit(1)) >= min_pts)
                    .alias("is_core")))
    core_ids = core.filter("is_core").select("vec_id")
    cc_edges = (
        nbrs
        .join(core_ids.withColumnRenamed("vec_id", "vec_a"), "vec_a")
        .join(core_ids.withColumnRenamed("vec_id", "vec_b"), "vec_b")
        .select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    labels = (core_ids.select(F.col("vec_id"),
                              F.col("vec_id").alias("component"))
              .localCheckpoint(eager=True))
    for _ in range(max_iters):
        prop = (cc_edges.join(labels,
                              cc_edges["src"] == labels["vec_id"])
                .groupBy(F.col("dst").alias("vec_id"))
                .agg(F.min("component").alias("nbr_min")))
        nxt = (labels.join(prop, "vec_id", "left_outer")
               .select("vec_id",
                       F.coalesce(F.least("component", "nbr_min"),
                                  F.col("component")).alias("component"))
               .localCheckpoint(eager=True))
        changed = (nxt.join(
            labels.withColumnRenamed("component", "old"), "vec_id")
            .filter(F.col("component") < F.col("old")).count())
        labels = nxt
        if changed == 0:
            break
    # border: min core-neighbor label; core: own component
    core_lbl = labels.withColumnsRenamed(
        {"vec_id": "vec_b", "component": "b_lbl"})
    border_lbl = (
        nbrs.join(core_lbl, "vec_b")
        .groupBy(F.col("vec_a").alias("vec_id"))
        .agg(F.min("b_lbl").alias("border_cluster")))
    return (
        core.join(labels, "vec_id", "left")
        .join(border_lbl, "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("border_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise")).alias("role"),
            F.when(F.col("is_core"), F.col("component"))
            .otherwise(F.col("border_cluster")).alias("cluster"))
    )


def dbscan_sql(eps: int = 400_000, min_pts: int = 4,
               scores_sql: str = "") -> str:
    """The NAIVE oracle: all-pairs eps-neighborhoods + recursive
    transitive closure over core-core edges. ``scores_sql`` is the
    engine-exact PCA scores query (vec_id, score1, score2)."""
    return f"""
        WITH RECURSIVE sc AS ({scores_sql}),
        pts AS (
          SELECT vec_id,
                 CAST(ROUND(score1 * {_SCALE}) AS BIGINT) AS s1,
                 CAST(ROUND(score2 * {_SCALE}) AS BIGINT) AS s2
          FROM sc
        ),
        nbrs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM pts a JOIN pts b ON a.vec_id <> b.vec_id
          WHERE (a.s1 - b.s1) * (a.s1 - b.s1)
                + (a.s2 - b.s2) * (a.s2 - b.s2)
                <= {eps}::BIGINT * {eps}
        ),
        cnt AS (
          SELECT vec_a AS vec_id, count(*) + 1 AS n_in_eps
          FROM nbrs GROUP BY 1
        ),
        core AS (
          SELECT p.vec_id,
                 COALESCE(c.n_in_eps, 1) >= {min_pts} AS is_core
          FROM pts p LEFT JOIN cnt c USING (vec_id)
        ),
        cc AS (
          SELECT n.vec_a AS s, n.vec_b AS d FROM nbrs n
          JOIN core x ON x.vec_id = n.vec_a AND x.is_core
          JOIN core y ON y.vec_id = n.vec_b AND y.is_core
        ),
        reach(vec_id, lbl) AS (
          SELECT vec_id, vec_id FROM core WHERE is_core
          UNION
          SELECT c.d, r.lbl FROM reach r JOIN cc c ON c.s = r.vec_id
        ),
        comp AS (
          SELECT vec_id, CAST(min(lbl) AS BIGINT) AS component
          FROM reach GROUP BY 1
        ),
        border AS (
          SELECT n.vec_a AS vec_id,
                 CAST(min(m.component) AS BIGINT) AS border_cluster
          FROM nbrs n JOIN comp m ON m.vec_id = n.vec_b
          GROUP BY 1
        )
        SELECT c.vec_id,
               CASE WHEN c.is_core THEN 'core'
                    WHEN b.border_cluster IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               CASE WHEN c.is_core THEN m.component
                    ELSE b.border_cluster END AS cluster
        FROM core c
        LEFT JOIN comp m ON m.vec_id = c.vec_id
        LEFT JOIN border b ON b.vec_id = c.vec_id
    """
