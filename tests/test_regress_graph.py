"""Wave-2 statistical/graph tier: OLS vs numpy lstsq, HITS
mutual-reinforcement pins, attribution credit conservation,
t-closeness hand case — plus oracle parity for each entry."""

from __future__ import annotations

import datetime

import __spark_entry__ as E
from pyspark.sql import functions as F
from spark_streaming_spark.operators import conversions as CV
from spark_streaming_spark.operators import graphrank as GRK
from spark_streaming_spark.operators import redaction as RED
from spark_streaming_spark.operators import regress as RG
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def test_ols_matches_numpy(spark):
    """Cramer-over-exact-moments must agree with numpy's lstsq on the
    same quantized design matrix (to solver tolerance)."""
    import numpy as np

    li = load_table(spark, SF_DIR, "lineitem")
    got = RG.ols_price_model(li).collect()[0]
    pdf = li.select(
        F.expr(RG._Y).alias("y"), F.expr(RG._X1).alias("x1"),
        F.expr(RG._X2).alias("x2")).toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf.x1.to_numpy(float), pdf.x2.to_numpy(float)])
    y = pdf.y.to_numpy(float)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert got.n == len(pdf)
    for b, ref in zip((got.b0, got.b1, got.b2), beta):
        assert abs(b - ref) <= 1e-6 * max(1.0, abs(ref))
    resid = y - X @ beta
    sst = ((y - y.mean()) ** 2).sum()
    assert abs(got.r2 - (1.0 - (resid ** 2).sum() / sst)) < 1e-9
    assert 0.0 < got.r2 <= 1.0


def test_ols_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["ols_price_model"](spark, SF_DIR), duck,
        E.oracle_sql()["ols_price_model"])


def test_hits_shapes_and_normalization(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    rows = GRK.hits_scores(li, od, k=50).collect()
    hubs = [r for r in rows if r.kind == "hub"]
    auths = [r for r in rows if r.kind == "authority"]
    assert hubs and auths
    # max-normalized: the top score on each side is exactly 1.0
    assert max(r.score for r in hubs) == 1.0
    assert max(r.score for r in auths) == 1.0
    assert all(0.0 < r.score <= 1.0 for r in rows)


def test_hits_two_star_hand_case(spark):
    """Two disjoint stars, one with heavier edges: its hub and its
    authorities dominate (mutual reinforcement), max-norm pins the
    winner at 1.0."""
    li = spark.createDataFrame(
        # (orderkey, partkey) rows; customer via orders below
        [(1, 10), (1, 11), (1, 12), (2, 20)],
        "l_orderkey LONG, l_partkey LONG")
    od = spark.createDataFrame(
        [(1, 100), (2, 200)], "o_orderkey LONG, o_custkey LONG")
    rows = GRK.hits_scores(li, od, k=10).collect()
    hub = {r.node_id: r.score for r in rows if r.kind == "hub"}
    assert hub[100] == 1.0 and hub[200] < 1.0


def test_position_attribution_conserves_credits(spark):
    """Credit ppm sums to exactly 1e6 per attributed purchase; the
    attributed cents never exceed the purchase's cents (floor DIV)."""
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # user 1: 4 clicks then a purchase of $10 -> 40/ (20//2 twice) /40
    for i in range(4):
        rows.append((i, base + datetime.timedelta(hours=i), 1,
                     "click", 0.0, "{}"))
    rows.append((10, base + datetime.timedelta(hours=9), 1,
                 "purchase", 10.0, "{}"))
    # user 2: single click then purchase of $5
    rows.append((20, base, 2, "click", 0.0, "{}"))
    rows.append((21, base + datetime.timedelta(hours=1), 2,
                 "purchase", 5.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING")
    out = CV.position_attribution(ev).collect()
    total = sum(r.attributed_cents for r in out)
    # 4-click purchase: 400+100+100+400 ppm-thousandths of 1000c = 1000c
    # single-click: all 500c. Exact conservation because 1000·ppm/1e6
    # has no remainder here.
    assert total == 1500
    assert sum(r.n_credits for r in out) == 5


def test_position_attribution_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["position_attribution"](spark, SF_DIR), duck,
        E.oracle_sql()["position_attribution"])


def test_t_closeness_hand_case(spark):
    """g1 = 10A+10B (near the 18/10 global mix), g2 = 8A (skewed):
    dist_num is 160 for both, but g2's smaller mass gives
    160e6/(2·8·28) = 357142 ppm (violating) vs g1's
    160e6/(2·20·28) = 142857 (passing)."""
    rows = [(1, "A")] * 10 + [(1, "B")] * 10 + [(2, "A")] * 8
    df = spark.createDataFrame(rows, "g INT, seg STRING")
    out = {r.g: r for r in RED.t_closeness_violations(
        df, ["g"], "seg", t_ppm=300000).collect()}
    assert set(out) == {2}
    assert out[2].dist_ppm == 357142 and out[2].n_records == 8


def test_t_closeness_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["t_closeness_violations"](spark, SF_DIR), duck,
        E.oracle_sql()["t_closeness_violations"])


def test_hits_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["hits_scores"](spark, SF_DIR), duck,
        E.oracle_sql()["hits_scores"])


def test_cf_ranking_eval_bounds_and_no_leakage(spark):
    """Metrics live in [0, 1e6]; MRR <= hit-rate (rr <= 1 per hit);
    training never sees the held-out order (the split anti-joins it),
    pinned by recomputing the split here."""
    from spark_streaming_spark.operators import basket as BK

    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    r = BK.cf_ranking_eval(li, od).collect()[0]
    assert 0 < r.n_eval
    assert 0 <= r.n_hits <= r.n_eval
    assert 0 <= r.mrr_ppm <= r.hit_rate_ppm <= 1_000_000
    last = BK.last_order_keys(od)
    # exactly one held-out order per customer
    assert last.count() == od.select("o_custkey").distinct().count()
    assert last.select("o_custkey").distinct().count() == last.count()


def test_cf_ranking_eval_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["cf_ranking_eval"](spark, SF_DIR), duck,
        E.oracle_sql()["cf_ranking_eval"])


def test_ols_moments_fold_additive(spark):
    """The moment row is exactly additive: summing per-half moment rows
    cell-wise equals the one-shot row (the streamed re-fit property),
    and the tail over the folded row equals the full model."""
    li = load_table(spark, SF_DIR, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    halves = RG.ols_moments(a).unionByName(RG.ols_moments(b))
    folded = halves.groupBy("k").agg(*[
        F.sum(c).alias(c) for c in RG._MOMENTS])
    got = RG.ols_from_moments(folded).collect()[0]
    want = RG.ols_price_model(li).collect()[0]
    assert tuple(got) == tuple(want)
