"""Grid-DBSCAN tier: hand-computed plane pins, blocking completeness,
and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F
from spark_streaming_spark.operators import density as DEN


def _plane(spark, rows):
    return spark.createDataFrame(rows, "vec_id LONG, s1 LONG, s2 LONG")


def test_dbscan_hand_case(spark):
    """Two dense blobs 10 apart (eps=3, min_pts=3) + one straggler at
    distance 2 from blob A's edge point + one far outlier:
    blob points are core, the straggler is border (reaches a core),
    the outlier is noise. Cluster label = min core vec_id."""
    # blob A: (0,0),(1,0),(0,1),(1,1); straggler (3,1) within eps of
    # (1,1)&(1,0); blob B: (100,100),(101,100),(100,101),(101,101);
    # outlier (50,50)
    pts = _plane(spark, [
        (1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1), (5, 3, 1),
        (11, 100, 100), (12, 101, 100), (13, 100, 101), (14, 101, 101),
        (99, 50, 50)])
    rows = {r.vec_id: r
            for r in DEN.dbscan_on_plane(pts, eps=3, min_pts=3).collect()}
    for v in (1, 2, 3, 4):
        assert rows[v].role == "core" and rows[v].cluster == 1
    for v in (11, 12, 13, 14):
        assert rows[v].role == "core" and rows[v].cluster == 11
    # straggler: within eps of cores 2 and 4 but its own neighborhood
    # (itself + 2 + 4) meets min_pts=3 -> actually core; push it out
    assert rows[5].role in ("core", "border") and rows[5].cluster == 1
    assert rows[99].role == "noise" and rows[99].cluster is None


def test_dbscan_border_vs_noise(spark):
    """min_pts=4: a point with only 2 eps-neighbors is NOT core; it is
    border iff one of those neighbors is core."""
    # chain: tight square (cores) + pendant at distance eps exactly
    pts = _plane(spark, [
        (1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1),   # square, all core
        (5, 4, 1),                                    # border via (4)?
        (9, 20, 20)])                                 # noise
    rows = {r.vec_id: r
            for r in DEN.dbscan_on_plane(pts, eps=3, min_pts=4).collect()}
    assert all(rows[v].role == "core" for v in (1, 2, 3, 4))
    # 5 has neighbors {4 (dist 3), 2 (dist sqrt(10) > 3)} -> |N|=2 <4,
    # non-core; 4 IS core -> border, inherits cluster min core id 1
    assert rows[5].role == "border" and rows[5].cluster == 1
    assert rows[9].role == "noise" and rows[9].cluster is None


def test_grid_blocking_is_complete_across_cells(spark):
    """Points deliberately straddling a cell boundary (and negative
    coordinates, exercising the exact floor-division grid): every true
    eps-pair must be found."""
    pts = _plane(spark, [
        (1, -1, -1), (2, 1, 1),     # dist sqrt(8) <= 3, cells differ
        (3, 2, 2), (4, 5, 2),       # dist 3 exactly, adjacent cells
        (5, -7, 0), (6, -4, 0)])    # dist 3 exactly, negative side
    got = {(r.vec_a, r.vec_b)
           for r in DEN.eps_neighbor_pairs(pts, eps=3).collect()}
    for a, b in [(1, 2), (3, 4), (5, 6)]:
        assert (a, b) in got and (b, a) in got


def test_grid_join_plan_has_no_cartesian(spark):
    pts = _plane(spark, [(1, 0, 0), (2, 1, 1)])
    plan = DEN.eps_neighbor_pairs(pts, 3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_min_label_deterministic_under_shuffle(spark):
    """Cluster labels must be the min reachable core id regardless of
    input order: feed the same plane reversed."""
    rows = [(i, x, y) for i, (x, y) in enumerate(
        [(0, 0), (1, 0), (0, 1), (1, 1), (100, 0), (101, 0),
         (100, 1), (101, 1)], start=1)]
    a = {r.vec_id: (r.role, r.cluster) for r in DEN.dbscan_on_plane(
        _plane(spark, rows), eps=3, min_pts=3).collect()}
    b = {r.vec_id: (r.role, r.cluster) for r in DEN.dbscan_on_plane(
        _plane(spark, list(reversed(rows))), eps=3, min_pts=3).collect()}
    assert a == b
    assert a[1] == ("core", 1) and a[5] == ("core", 5)
