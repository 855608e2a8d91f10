"""Kaplan-Meier / ACF / KS statistical tier: semantic pins on
hand-computed cases plus oracle parity at the test SF."""

from __future__ import annotations

import datetime

import __spark_entry__ as E
from pyspark.sql import functions as F
from spark_streaming_spark.operators import profile as PF
from spark_streaming_spark.operators import survival as SV
from spark_streaming_spark.operators import timeseries as TS
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def test_km_curve_hand_case(spark):
    """Classic textbook case: subjects with observed times
    (1, e), (2, c), (3, e), (3, e), (4, c) — at t=1 n=5 d=1 →
    S=4/5; at t=3 n=3 d=2 → S = 4/5 · 1/3."""
    subj = spark.createDataFrame(
        [(1, 1, 1), (2, 2, 0), (3, 3, 1), (4, 3, 1), (5, 4, 0)],
        "cust INT, t_days INT, event INT")
    rows = {r.t_days: r for r in SV.km_curve_from_subjects(subj).collect()}
    assert set(rows) == {1, 3}
    assert rows[1].n_risk == 5 and rows[1].d_events == 1
    assert rows[1].survival_ppm == 800000
    assert rows[3].n_risk == 3 and rows[3].d_events == 2
    # 800000 * 1 // 3 = 266666 (floor at each step — the ppm contract)
    assert rows[3].survival_ppm == 266666


def test_km_monotone_and_risk_consistent(spark):
    orders = load_table(spark, SF_DIR, "orders")
    rows = sorted(
        SV.kaplan_meier_repurchase(orders).collect(),
        key=lambda r: r.t_days)
    assert rows, "curve must be non-empty at the test SF"
    last = 1_000_000
    prev_n = None
    for r in rows:
        assert 0 <= r.survival_ppm <= last  # nonincreasing survival
        last = r.survival_ppm
        assert r.d_events >= 1
        if prev_n is not None:
            assert r.n_risk < prev_n  # risk set strictly shrinks
        prev_n = r.n_risk


def test_km_matches_oracle(spark, duck):
    out = E.queries()["kaplan_meier_repurchase"](spark, SF_DIR)
    assert_matches_oracle(
        out, duck, E.oracle_sql()["kaplan_meier_repurchase"])


def test_acf_constant_series_and_oracle(spark, duck):
    """A constant daily series has zero variance → NULL acf at every
    lag (the den != 0 guard), and the driver entry matches its twin."""
    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, base + datetime.timedelta(days=i), 1, "click", 5.0, "{}")
         for i in range(10)],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING")
    out = TS.daily_value_acf(ev, max_lag=3).collect()
    assert len(out) == 3
    assert all(r.acf is None for r in out)
    assert_matches_oracle(
        E.queries()["daily_value_acf"](spark, SF_DIR), duck,
        E.oracle_sql()["daily_value_acf"])


def test_acf_perfect_alternation(spark):
    """x alternating a,b,a,b → lag-1 acf = -1, lag-2 acf = +1 (up to
    the shared IEEE tail): the seasonality probe detects period 2."""
    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, base + datetime.timedelta(days=i), 1, "click",
          1.0 if i % 2 == 0 else 3.0, "{}") for i in range(12)],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING")
    rows = {r.lag: r.acf for r in TS.daily_value_acf(ev, max_lag=2).collect()}
    assert abs(rows[1] + 1.0) < 1e-12
    assert abs(rows[2] - 1.0) < 1e-12


def test_ks_identical_samples_accept(spark):
    """Two cohorts drawn as the SAME value multiset → D = 0, no
    rejection."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    for et in ("click", "purchase"):
        for v in (1.0, 2.0, 2.0, 5.0):
            rows.append((i, base, 1, et, v, "{}"))
            i += 1
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING")
    r = PF.ks_two_sample(ev).collect()[0]
    assert r.d_num == 0 and r.d_ppm == 0 and r.reject_05 == 0


def test_ks_disjoint_samples_reject(spark):
    """Disjoint supports → D = 1 (d_ppm = 1e6) and rejection at any n
    past the critical bar."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base, 1, "click", 1.0, "{}") for i in range(20)]
    rows += [(100 + i, base, 1, "purchase", 9.0, "{}") for i in range(20)]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING")
    r = PF.ks_two_sample(ev).collect()[0]
    assert r.d_ppm == 1_000_000 and r.reject_05 == 1


def test_ks_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["ks_value_shift"](spark, SF_DIR), duck,
        E.oracle_sql()["ks_value_shift"])


def test_streamed_twins_fold_to_one_shot(spark):
    """The fold halves are exact: applying the batch tail to the
    one-shot fold INPUT equals the full batch operator (the property
    that lets the streamed twins share the batch oracles)."""
    from spark_streaming_spark.operators import survival as SV2

    orders = load_table(spark, SF_DIR, "orders")
    events = load_table(spark, SF_DIR, "events")
    # KM: subjects from the distinct pair set == subjects from orders
    d1 = SV2.order_day_pairs(orders).select("cust", "day")
    a = sorted(map(tuple, SV2.subjects_from_day_pairs(d1).collect()))
    b = sorted(map(tuple, SV2.repurchase_subjects(orders).collect()))
    assert a == b
    # KS: tail over the one-shot count table == the full operator
    x = PF.ks_from_value_counts(PF.ks_value_counts(events)).collect()[0]
    y = PF.ks_two_sample(events).collect()[0]
    assert tuple(x) == tuple(y)
    # ACF: tail over the one-shot daily series == the full operator
    p = sorted(map(tuple, TS.acf_from_daily(
        TS.daily_value_series(events)).collect()))
    q = sorted(map(tuple, TS.daily_value_acf(events).collect()))
    assert p == q


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE, props STRING")


def test_mann_whitney_hand_cases(spark):
    """No ties: A={1,2}, B={3,4} → U_A = 0 (u2_a = 0), tie_sum 0,
    |z| < 1.96 at n=4. With ties: A={1,1}, B={1,2} → the 3-block
    contributes t³−t = 24 and U_A = 1 (u2_a = 2)."""
    base = datetime.datetime(2024, 1, 1)
    ev = _mk_events(spark, [
        (1, base, 1, "click", 1.0, "{}"), (2, base, 1, "click", 2.0, "{}"),
        (3, base, 1, "purchase", 3.0, "{}"),
        (4, base, 1, "purchase", 4.0, "{}")])
    r = PF.mann_whitney_value_shift(ev).collect()[0]
    assert (r.n_a, r.n_b, r.u2_a, r.tie_sum) == (2, 2, 0, 0)
    assert r.reject_05 == 0 and r.z < 0
    ev2 = _mk_events(spark, [
        (1, base, 1, "click", 1.0, "{}"), (2, base, 1, "click", 1.0, "{}"),
        (3, base, 1, "purchase", 1.0, "{}"),
        (4, base, 1, "purchase", 2.0, "{}")])
    r2 = PF.mann_whitney_value_shift(ev2).collect()[0]
    assert (r2.u2_a, r2.tie_sum) == (2, 24)


def test_mann_whitney_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["mann_whitney_value_shift"](spark, SF_DIR), duck,
        E.oracle_sql()["mann_whitney_value_shift"])


def test_spearman_monotone_hand_cases(spark):
    """Daily (revenue, traffic) strictly co-monotone → ρ = 1; daily
    revenue strictly anti-monotone in traffic → ρ = −1."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(5):  # day d: d+1 events of value (d+1) dollars
        for _ in range(d + 1):
            rows.append((eid, base + datetime.timedelta(days=d), 1,
                         "click", float(d + 1), "{}"))
            eid += 1
    r = TS.spearman_daily(_mk_events(spark, rows)).collect()[0]
    assert r.n_days == 5 and abs(r.rho - 1.0) < 1e-12
    rows = []
    eid = 0
    for d in range(5):  # more events -> lower total revenue
        for _ in range(d + 1):
            rows.append((eid, base + datetime.timedelta(days=d), 1,
                         "click", float(100 // (d + 1) ** 2), "{}"))
            eid += 1
    r = TS.spearman_daily(_mk_events(spark, rows)).collect()[0]
    assert abs(r.rho + 1.0) < 1e-12


def test_spearman_matches_oracle(spark, duck):
    assert_matches_oracle(
        E.queries()["spearman_daily"](spark, SF_DIR), duck,
        E.oracle_sql()["spearman_daily"])


def test_mw_shares_ks_fold_state(spark):
    """The MW tail over the one-shot KS count table equals the full
    operator — the property that lets streaming_mann_whitney read the
    SAME folded state as streaming_ks_value_shift (alias member)."""
    events = load_table(spark, SF_DIR, "events")
    a = PF.mann_whitney_from_value_counts(
        PF.ks_value_counts(events)).collect()[0]
    b = PF.mann_whitney_value_shift(events).collect()[0]
    assert tuple(a) == tuple(b)


def test_theil_sen_hand_cases(spark):
    """Strictly linear daily revenue → every pairwise slope equals the
    true slope; the median pair reports it exactly."""
    base = datetime.datetime(2024, 1, 1)
    # day d: one event of value (10 + 2d) dollars -> slope 200 c/day
    ev = _mk_events(spark, [
        (d, base + datetime.timedelta(days=d), 1, "click",
         10.0 + 2.0 * d, "{}") for d in range(6)])
    r = TS.theil_sen_daily(ev).collect()
    assert len(r) == 1
    r = r[0]
    assert r.n_pairs == 15  # C(6,2)
    assert abs(r.slope_per_day - 200.0) < 1e-9


def test_gini_extremes(spark):
    """All-equal revenue → Gini 0; near-total concentration → close to
    (n−1)/n."""
    rows = [(i, i, "O", 100.0,
             datetime.datetime(2024, 1, 1), "1-URGENT")
            for i in range(10)]
    od = spark.createDataFrame(
        rows, "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP,"
        " o_orderpriority STRING")
    from spark_streaming_spark.operators import ranking as RK

    r = RK.revenue_gini(od).collect()[0]
    assert r.n_customers == 10 and r.gini_ppm == 0
    rows = [(i, i, "O", 0.01, datetime.datetime(2024, 1, 1),
             "1-URGENT") for i in range(9)]
    rows.append((9, 9, "O", 10000.0, datetime.datetime(2024, 1, 1),
                 "1-URGENT"))
    od = spark.createDataFrame(
        rows, "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP,"
        " o_orderpriority STRING")
    r = RK.revenue_gini(od).collect()[0]
    assert 890000 < r.gini_ppm <= 900000  # ~ (n-1)/n = 0.9


def test_hhi_extremes(spark):
    """Check the cleared-denominator identity on a 2-market split:
    60/40 → 0.6² + 0.4² = 0.52."""
    from spark_streaming_spark.operators import aggregates as A

    cust = spark.createDataFrame(
        [(1, "a", 0, 0.0, "S"), (2, "b", 1, 0.0, "S")],
        "c_custkey LONG, c_name STRING, c_nationkey INT,"
        " c_acctbal DOUBLE, c_mktsegment STRING")
    nat = spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 0)],
        "n_nationkey INT, n_name STRING, n_regionkey INT")
    od = spark.createDataFrame(
        [(1, 1, "O", 60.0, datetime.datetime(2024, 1, 1), "1"),
         (2, 2, "O", 40.0, datetime.datetime(2024, 1, 1), "1")],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP,"
        " o_orderpriority STRING")
    r = A.market_hhi(cust, od, nat).collect()[0]
    assert r.n_markets == 2 and r.hhi_ppm == 520000


def test_chao1_hand_case(spark):
    """Corpus 'a a b c' per doc tokens: counts a=2, b=1, c=1 →
    s_obs=3, f1=2, f2=1, chao1 = 3 + 2·1/(2·2) = 3 (floor)."""
    from spark_streaming_spark.operators import textstats as TX2

    docs = spark.createDataFrame(
        [(0, "a a b c", "en", "s", 7)],
        "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG")
    r = TX2.vocab_chao1(docs).collect()[0]
    assert (r.s_obs, r.f1, r.f2, r.chao1_est) == (3, 2, 1, 3)


def test_wave8_match_oracles(spark, duck):
    for name in ("theil_sen_daily", "revenue_gini", "market_hhi",
                 "vocab_chao1"):
        assert_matches_oracle(
            E.queries()[name](spark, SF_DIR), duck,
            E.oracle_sql()[name])


def test_cliffs_delta_hand_cases(spark):
    # all a above b: delta = +1, large
    per_v = spark.createDataFrame(
        [(1.0, 0, 1), (2.0, 0, 1), (3.0, 1, 0), (4.0, 1, 0)],
        "v DOUBLE, ca LONG, cb LONG")
    r = PF.cliffs_delta_from_value_counts(per_v).collect()[0]
    assert (r.gt_pairs, r.lt_pairs) == (4, 0)
    assert r.delta == 1.0 and r.magnitude == "large"
    # identical distributions: delta = 0, negligible
    sym = spark.createDataFrame(
        [(1.0, 1, 1), (2.0, 1, 1)], "v DOUBLE, ca LONG, cb LONG")
    r = PF.cliffs_delta_from_value_counts(sym).collect()[0]
    assert r.gt_pairs == r.lt_pairs == 1
    assert r.delta == 0.0 and r.magnitude == "negligible"


def test_jackknife_hand_case_and_constant_series(spark):
    # two days 100 / 200 cents: var = (100^2 + 100^2) / (8 * 1) = 2500
    daily = spark.createDataFrame(
        [(datetime.date(2024, 1, 1), 100, 1),
         (datetime.date(2024, 1, 2), 200, 1)],
        "day DATE, x LONG, y LONG")
    r = TS.jackknife_from_daily(daily).collect()[0]
    assert (r.k_days, r.total_cents) == (2, 300)
    assert r.var_jack == 2500.0 and r.se_jack == 50.0
    # constant series: zero variance exactly
    const = spark.createDataFrame(
        [(datetime.date(2024, 1, d), 70, 1) for d in (1, 2, 3)],
        "day DATE, x LONG, y LONG")
    r = TS.jackknife_from_daily(const).collect()[0]
    assert r.var_jack == 0.0 and r.se_jack == 0.0


def test_heaps_vocab_growth_monotone_and_final(spark):
    from spark_streaming_spark.operators import textstats as TX

    docs = load_table(spark, SF_DIR, "documents")
    rows = {r.checkpoint: r for r in
            TX.heaps_vocab_growth(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for q in (2, 3, 4):
        assert rows[q].n_tokens >= rows[q - 1].n_tokens
        assert rows[q].vocab >= rows[q - 1].vocab
    total_vocab = (docs.select(F.explode(F.split("text", " "))
                               .alias("t")).distinct().count())
    assert rows[4].vocab == total_vocab


def test_holt_linear_series_extrapolates_exactly(spark):
    # perfectly linear series: level tracks, trend = slope, forecasts
    # extend the line exactly (alpha=1/2, beta=1/4 hand recursion)
    up = spark.createDataFrame(
        [(datetime.date(2024, 1, d), 100 * d, 1) for d in (1, 2, 3)],
        "day DATE, x LONG, y LONG")
    r = TS.holt_from_daily(up).collect()[0]
    assert (r.k_days, r.level_cents, r.trend_cents) == (3, 300, 100)
    assert (r.forecast_1d, r.forecast_2d, r.forecast_3d) == (400, 500, 600)
    # negative trend: the pmod floor division must not flip toward zero
    down = spark.createDataFrame(
        [(datetime.date(2024, 1, d), 100 * (4 - d), 1) for d in (1, 2, 3)],
        "day DATE, x LONG, y LONG")
    r = TS.holt_from_daily(down).collect()[0]
    assert (r.level_cents, r.trend_cents, r.forecast_1d) == (100, -100, 0)
    # single day: level = the value, zero trend
    one = spark.createDataFrame(
        [(datetime.date(2024, 1, 1), 70, 1)], "day DATE, x LONG, y LONG")
    r = TS.holt_from_daily(one).collect()[0]
    assert (r.k_days, r.level_cents, r.trend_cents) == (1, 70, 0)
    assert r.forecast_3d == 70
    # zero-events edge (r12 ADVICE): an empty daily series must return
    # ZERO rows like the DuckDB recursive-CTE twin, not throw on the
    # negative slice length
    empty = one.filter(F.col("x") < 0)
    assert TS.holt_from_daily(empty).collect() == []
