"""Time-series similarity: profile construction, peak-hour blocking, and
oracle parity."""

from __future__ import annotations

import __spark_entry__ as E
from spark_streaming_spark.operators import timeseries as TS
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def test_profiles_match_oracle(spark, duck):
    # the entry serializes the array profile ("c0|c1|...") so the
    # driver's pandas canonicalizer can hash it — compare the entry
    # spelling, not the raw operator (whose array output it wraps)
    out = E.queries()["user_activity_profiles"](spark, SF_DIR)
    assert_matches_oracle(out, duck, E.oracle_sql()["user_activity_profiles"])


def test_similar_pairs_blocked_and_thresholded(spark, duck):
    events = load_table(spark, SF_DIR, "events")
    pairs = TS.similar_activity_pairs(events, threshold=0.7)
    rows = pairs.collect()
    assert all(r.user_a < r.user_b and r.cosine >= 0.7 for r in rows)
    peak = {
        r.user_id: r.peak_hour
        for r in TS.user_hourly_profiles(events).collect()
    }
    for r in rows:  # blocking invariant: pairs share their peak hour
        assert peak[r.user_a] == peak[r.user_b]
    assert_matches_oracle(pairs, duck, E.oracle_sql()["similar_activity_pairs"])


def test_gap_fill_daily_materializes_full_spans(spark):
    """Every user's span is dense (one row per day), absent days carry
    n_events=0 with the last seen type forward-filled, and the total
    event count is conserved."""
    events = load_table(spark, SF_DIR, "events")
    out = TS.gap_fill_daily(events).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert sum(r.n_events for r in out) == events.count()
    for rows in by_user.values():
        rows.sort(key=lambda r: r.day)
        span = (rows[-1].day - rows[0].day).days + 1
        assert len(rows) == span            # dense: no missing days
        assert rows[0].n_events > 0         # span starts on activity
        assert all(r.carried_type is not None for r in rows)
    # at least one genuine gap exists at test SF and is zero-filled
    assert any(r.n_events == 0 for r in out)


def test_rolling_activity_growing_then_full_frames(spark):
    events = load_table(spark, SF_DIR, "events")
    rows = TS.rolling_activity(events, days=7).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for urows in by_user.values():
        urows.sort(key=lambda r: r.day)
        for i, r in enumerate(urows):
            assert r.window_rows == min(i + 1, 7)
            assert r.rolling_sum == sum(
                x.n_events for x in urows[max(0, i - 6):i + 1])
            assert r.avg_ppm == (1_000_000 * r.rolling_sum) // r.window_rows


def test_activity_trend_matches_closed_form(spark):
    """Spot-check the OLS slope against a NumPy fit per user."""
    import numpy as np

    events = load_table(spark, SF_DIR, "events")
    dense = {}
    for r in TS.gap_fill_daily(events).collect():
        dense.setdefault(r.user_id, []).append((r.day, r.n_events))
    got = {r.user_id: r for r in TS.activity_trend(events).collect()}
    assert set(got) == {u for u, v in dense.items() if len(v) >= 2}
    for u in list(got)[:10]:
        pts = sorted(dense[u])
        y = np.array([n for _, n in pts], dtype=float)
        x = np.arange(len(y), dtype=float)
        slope = np.polyfit(x, y, 1)[0]
        assert abs(got[u].slope - slope) < 1e-6
        assert got[u].n_days == len(y)
        assert got[u].avg_ppm == (1_000_000 * int(y.sum())) // len(y)


def test_time_weighted_avg_semantics(spark):
    """Hand-checkable LOCF weighting: value 10 held for 3s then value
    40 for 1s → (10·3 + 40·1)/4 = 17.5; a plain AVG would say 23.33.
    Constant series → twa == the constant; single event → excluded."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        (1, 1, s(0), 10.0), (1, 2, s(3), 40.0), (1, 3, s(4), 99.0),
        (2, 4, s(0), 7.0), (2, 5, s(2), 7.0), (2, 6, s(5), 7.0),
        (3, 7, s(0), 123.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    out = {r.user_id: r for r in TS.time_weighted_avg(ev).collect()}
    assert out[1].twa_value == 17.5
    assert out[1].span_us == 4_000_000
    assert out[2].twa_value == 7.0
    assert 3 not in out


def test_dau_mau_stickiness_invariants_and_plan(spark, duck):
    """dau <= mau per day (the window contains the day), ppm in (0,1e6],
    the first day has dau == mau (nothing trails it)... and the 28-day
    membership joins through the broadcast grid — no nested loop."""
    import __spark_entry__ as E
    from spark_streaming_spark.plans import explain
    from tests.conftest import assert_matches_oracle

    ev = load_table(spark, SF_DIR, "events")
    out = TS.dau_mau_stickiness(ev)
    plan = explain.explain_text(out, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = sorted(out.collect(), key=lambda r: r.day)
    assert rows
    assert all(r.dau <= r.mau for r in rows)
    assert all(0 < r.stickiness_ppm <= 1_000_000 for r in rows)
    assert rows[0].dau == rows[0].mau
    assert_matches_oracle(out, duck, E.oracle_sql()["dau_mau_stickiness"])


def test_event_transition_matrix_probabilities_sum(spark):
    """Row-conditional ppm probabilities per from_type sum to ~1e6
    (integer DIV floors each cell, so the row sum is within n_cells of
    1e6), and every transition count is positive."""
    from spark_streaming_spark.operators import analytic as AN

    events = load_table(spark, SF_DIR, "events")
    rows = AN.event_transition_matrix(events).collect()
    assert rows
    from collections import defaultdict
    sums = defaultdict(int)
    cells = defaultdict(int)
    for r in rows:
        assert r["n_trans"] > 0 and 0 <= r["p_ppm"] <= 1_000_000
        sums[r["from_type"]] += r["p_ppm"]
        cells[r["from_type"]] += 1
    for ft, s in sums.items():
        assert 1_000_000 - cells[ft] <= s <= 1_000_000, (ft, s)


def test_stationary_distribution_matches_oracle_and_numpy(spark, duck):
    """The equilibrium entry: oracle bit-match, a proper distribution
    (sums to 1 within IEEE), and within quantizer distance of numpy's
    dominant left eigenvector of the same ppm matrix."""
    import numpy as np

    from spark_streaming_spark.operators import analytic as AN

    events = load_table(spark, SF_DIR, "events")
    trans = AN.event_transition_matrix(events)
    out = AN.stationary_distribution(trans)
    assert_matches_oracle(out, duck,
                          E.oracle_sql()["event_stationary_dist"])
    rows = {r["event_type"]: r["prob"] for r in out.collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    assert all(p >= 0 for p in rows.values())
    types = sorted(rows)
    idx = {t: i for i, t in enumerate(types)}
    P = np.zeros((len(types), len(types)))
    for r in trans.collect():
        P[idx[r["from_type"]], idx[r["to_type"]]] = r["p_ppm"] / 1e6
    pi = np.full(len(types), 1.0 / len(types))
    for _ in range(200):
        pi = pi @ P
        pi /= pi.sum()
    got = np.array([rows[t] for t in types])
    assert np.max(np.abs(got - pi)) < 1e-3, (got, pi)


def test_rolling_daily_corr_matches_oracle_and_numpy(spark, duck):
    """Windowed corr_matrix discipline: oracle bit-match, and each
    window's value equals numpy's Pearson over the same daily integer
    series to float tolerance."""
    import numpy as np
    from pyspark.sql import functions as F

    from spark_streaming_spark.operators import timeseries as TSx

    events = load_table(spark, SF_DIR, "events")
    out = TSx.rolling_daily_corr(events)
    assert_matches_oracle(out, duck, E.oracle_sql()["rolling_daily_corr"])
    daily = {
        r["day"]: (int(r["x"]), int(r["y"]))
        for r in events.groupBy(F.to_date("ts").alias("day")).agg(
            F.expr("CAST(SUM(CAST(value AS DECIMAL(38,2))) * 100"
                   " AS BIGINT)").alias("x"),
            F.count("*").alias("y")).collect()
    }
    days = sorted(daily)
    for r in out.collect():
        lo = r["day"] - __import__("datetime").timedelta(days=29)
        xs = np.array([daily[d][0] for d in days if lo <= d <= r["day"]],
                      dtype="float64")
        ys = np.array([daily[d][1] for d in days if lo <= d <= r["day"]],
                      dtype="float64")
        assert r["n_days"] == len(xs)
        if len(xs) >= 2 and xs.std() > 0 and ys.std() > 0:
            want = float(np.corrcoef(xs, ys)[0, 1])
            assert abs(r["corr"] - want) < 1e-9, (r["day"], r["corr"], want)


def test_cep_pattern_brute_force(spark, duck):
    """CEP A=>B-without-C: every reported match reconstructs from a
    per-user Python replay, and no true match is missed."""
    from spark_streaming_spark.operators import analytic as AN

    events = load_table(spark, SF_DIR, "events")
    out = AN.cep_pattern_matches(events)
    assert_matches_oracle(out, duck, E.oracle_sql()["cep_click_purchase"])
    rows = sorted(
        ((r["user_id"], r["ts"], r["event_id"], r["event_type"])
         for r in events.collect()), key=lambda x: (x[0], x[1], x[2]))
    truth = set()
    last_a, last_g = {}, {}
    for uid, ts, eid, et in rows:
        if et == "click":
            last_a[uid] = ts
        elif et == "error":
            last_g[uid] = ts
        elif et == "purchase" and uid in last_a:
            a = last_a[uid]
            gap = int(ts.timestamp()) - int(a.timestamp())
            if gap <= 3600 and (uid not in last_g or last_g[uid] < a):
                truth.add((uid, a, ts, gap))
    got = {(r["user_id"], r["a_ts"], r["b_ts"], r["gap_s"])
           for r in out.collect()}
    assert got == truth and len(got) > 0


def test_frequent_event_sequences_any_gap_and_ties(spark):
    """Pins the semantics vs the transition matrix: (view -> purchase)
    counts even with a click BETWEEN them (any-gap, not adjacent);
    a ts-TIE is not precedence; support_ppm is integer-exact over the
    total distinct-user count (including users contributing no pair)."""
    import datetime as dt

    from spark_streaming_spark.operators import analytic as AN

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(0), 10, "view", 0.0, "{}"),
        (2, t(1), 10, "click", 0.0, "{}"),
        (3, t(2), 10, "purchase", 0.0, "{}"),
        # user 20: tie between signup and error -> no precedence
        (4, t(5), 20, "signup", 0.0, "{}"),
        (5, t(5), 20, "error", 0.0, "{}"),
        # user 30: single event, contributes to the denominator only
        (6, t(9), 30, "view", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    out = {(r["antecedent"], r["consequent"]): r
           for r in AN.frequent_event_sequences(events).collect()}
    assert ("view", "purchase") in out          # non-adjacent pair
    assert ("signup", "error") not in out       # ts tie
    assert ("error", "signup") not in out
    assert out[("view", "purchase")]["support"] == 1
    assert out[("view", "purchase")]["support_ppm"] == 333333  # 1 of 3


def test_user_value_ewma_exact_weights(spark):
    """Hand-checkable: user 1 has values 4.00 (old) then 2.00 (new):
    EWMA = (2·2 + 4·1)/3 cents-weighted = (200·2 + 400·1)/3 =
    266.66.. cents -> 266666666 microcents (floor). A single-event
    user is just its own value. Window truncation: 20 events keep 16."""
    import datetime as dt

    from spark_streaming_spark.operators import timeseries as TS

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, t(0), 1, "view", 4.0, "{}"), (2, t(1), 1, "view", 2.0, "{}"),
            (3, t(0), 2, "view", 5.5, "{}")]
    rows += [(10 + i, t(i), 3, "view", 1.0, "{}") for i in range(20)]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    out = {r["user_id"]: r for r in TS.user_value_ewma(events).collect()}
    assert out[1]["ewma_microcents"] == (1000000 * (200 * 2 + 400)) // 3
    assert out[2]["ewma_microcents"] == 550 * 1000000
    assert out[3]["n_used"] == 16
    assert out[3]["ewma_microcents"] == 100 * 1000000


def test_cusum_closed_form_matches_recursion(spark):
    """The closed form P_t - min prefix must equal the textbook
    recursion S_t = max(0, S_{t-1} + x_t - k) day by day, including
    through a gap day (counts 0) and a sustained shift."""
    import datetime as dt

    from spark_streaming_spark.operators import timeseries as TS

    counts = [2, 3, 0, 2, 9, 10, 8]  # day 3 absent, shift at day 5
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1 + i), 1, "error",
                         0.0, "{}"))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    out = {r["day"].isoformat(): (r["n"], r["cusum"])
           for r in TS.cusum_days(events).collect()}
    n, tot = len(counts), sum(counts)
    k = (tot + n - 1) // n
    s = 0
    for i, c in enumerate(counts):
        s = max(0, s + c - k)
        day = dt.date(2024, 1, 1 + i).isoformat()
        assert out[day] == (c, s), (day, out[day], (c, s))


def test_cusum_first_day_exceeds_k(spark):
    """A series whose first prefix sum is already positive (day 1
    above the allowance k) must carry that excess: the identity's min
    ranges over the VIRTUAL empty prefix P_0 = 0 too, so S_1 = x_1 - k,
    not 0. Counts [5, 1] with k = ceil(6/2) = 3 -> CUSUM [2, 0]."""
    import datetime as dt

    from spark_streaming_spark.operators import timeseries as TS

    counts = [5, 1]
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1 + i), 1, "error",
                         0.0, "{}"))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    out = {r["day"].isoformat(): (r["n"], r["cusum"])
           for r in TS.cusum_days(events).collect()}
    assert out["2024-01-01"] == (5, 2)
    assert out["2024-01-02"] == (1, 0)


def test_time_to_convert_semantics(spark):
    """Only purchases AT/AFTER the user's first click convert; a
    purchase-before-any-click user and a click-only user don't count;
    delta is floor seconds of the exact micros difference."""
    import datetime as dt

    from spark_streaming_spark.operators import conversions as CV

    t = (lambda s, us=0: dt.datetime(2024, 1, 1)
         + dt.timedelta(seconds=s, microseconds=us))
    rows = [
        # user 1: click t0, purchase t60.5 -> 60s (floor of micros)
        (1, t(0), 1, "click", 0.0, "{}"),
        (2, t(60, 500000), 1, "purchase", 0.0, "{}"),
        # user 2: purchase BEFORE its only click -> not converted
        (3, t(0), 2, "purchase", 0.0, "{}"),
        (4, t(10), 2, "click", 0.0, "{}"),
        # user 3: click only
        (5, t(0), 3, "click", 0.0, "{}"),
        # user 4: click t0, purchases at t100 and t400 -> first wins
        (6, t(0), 4, "click", 0.0, "{}"),
        (7, t(100), 4, "purchase", 0.0, "{}"),
        (8, t(400), 4, "purchase", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    r = CV.time_to_convert_stats(events).collect()[0]
    assert r["n_converted"] == 2
    assert r["p50_s"] == 60      # rank (2+1)//2 = 1 -> the 60s user
    assert r["p90_s"] == 100     # rank (18+9)//10 = 2


def test_time_to_convert_zero_conversions(spark):
    """No converting user still yields exactly ONE row
    (n_converted=0, NULL percentiles) — the summary row must not be
    erased by joining against empty percentile frames."""
    import datetime as dt

    from spark_streaming_spark.operators import conversions as CV

    rows = [(1, dt.datetime(2024, 1, 1), 1, "click", 0.0, "{}"),
            (2, dt.datetime(2024, 1, 2), 2, "view", 0.0, "{}")]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    got = CV.time_to_convert_stats(events).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_converted"] == 0
    assert r["p50_s"] is None and r["p90_s"] is None
