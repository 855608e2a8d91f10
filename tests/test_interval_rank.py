"""Kendall tau-b and sweep-line interval-concurrency tier: semantic
pins on hand-computed cases plus oracle parity at the test SF."""

from __future__ import annotations

import datetime

from spark_streaming_spark.operators import timeseries as TS


def _daily(spark, rows):
    return spark.createDataFrame(
        [(datetime.date(2024, 1, d), x, y) for d, x, y in rows],
        "day DATE, x BIGINT, y BIGINT")


def test_kendall_no_ties_hand_case(spark):
    """x = (1,2,3,4), y = (1,3,2,4): 6 pairs, one discordant
    ((2,3) vs (3,2)) -> tau = (5-1)/6 = 2/3, no ties anywhere."""
    r = TS.kendall_from_daily(_daily(
        spark, [(1, 1, 1), (2, 2, 3), (3, 3, 2), (4, 4, 4)])).collect()[0]
    assert r.n_days == 4
    assert (r.nc, r.nd, r.ties_x, r.ties_y) == (5, 1, 0, 0)
    assert abs(r.tau_b - 4.0 / 6.0) < 1e-12


def test_kendall_tie_correction_hand_case(spark):
    """x = (1,1,2), y = (1,2,2): one x-tie pair, one y-tie pair, one
    concordant -> tau_b = 1 / (sqrt(3-1)*sqrt(3-1)) = 0.5."""
    r = TS.kendall_from_daily(_daily(
        spark, [(1, 1, 1), (2, 1, 2), (3, 2, 2)])).collect()[0]
    assert (r.nc, r.nd, r.ties_x, r.ties_y) == (1, 0, 1, 1)
    assert abs(r.tau_b - 0.5) < 1e-12


def test_kendall_pair_accounting_identity(spark):
    """nc + nd + ties never exceeds n0 and every pair lands in some
    bucket: nc + nd + (x-ties) + (y-only-ties) = n0. With the sign
    encoding, a both-tied pair is counted in BOTH tie columns, so
    nc + nd + ties_x + ties_y - both = n0; probe with a both-tie."""
    r = TS.kendall_from_daily(_daily(
        spark, [(1, 1, 1), (2, 1, 1), (3, 2, 2)])).collect()[0]
    # pairs: (1,2) both-tied, (1,3) concordant, (2,3) concordant
    assert (r.nc, r.nd, r.ties_x, r.ties_y) == (2, 0, 1, 1)


def test_kendall_degenerate_single_day(spark):
    """One day -> zero pairs -> tau undefined (NULL), counts NULL/0 —
    must not raise on either engine."""
    rows = TS.kendall_from_daily(_daily(spark, [(1, 5, 7)])).collect()
    assert len(rows) == 1
    assert rows[0].n_days == 1 and rows[0].tau_b is None


def _deltas(spark, rows):
    return spark.createDataFrame(
        [(datetime.date(2024, 1, d) if m == 1
          else datetime.date(2024, 2, d), v) for m, d, v in rows],
        "day DATE, delta BIGINT")


def test_transit_peak_hand_case(spark):
    """Intervals A=[j1,j2], B=[j1,j3], C=[feb1,feb1] as deltas:
    +2 at j1, -1 at j3(=A ends j2 -> -1 at j3? A:[1,2] -> -1 at j3),
    B ends j3 -> -1 at j4; C: +1 feb1, -1 feb2. Concurrency:
    j1..j2 = 2, j3 = 1, j4..jan31 = 0, feb1 = 1, feb2 = 0.
    January peak = 2 first attained j1; February peak = 1 at feb1."""
    deltas = _deltas(spark, [
        (1, 1, 2), (1, 3, -1), (1, 4, -1), (2, 1, 1), (2, 2, -1)])
    rows = {r.month: r
            for r in TS.transit_peaks_from_deltas(deltas).collect()}
    jan, feb = datetime.date(2024, 1, 1), datetime.date(2024, 2, 1)
    assert rows[jan].peak_open == 2
    assert rows[jan].peak_day == datetime.date(2024, 1, 1)
    assert rows[feb].peak_open == 1
    assert rows[feb].peak_day == datetime.date(2024, 2, 1)


def test_transit_quiet_month_carries_running_level(spark):
    """A gap month with NO boundary deltas must still report the
    carried-over concurrency level (the spine gap-fill is what makes
    the monthly peak exact): open interval spans all of February ->
    February's peak is 1 even though no delta row lands in it."""
    deltas = spark.createDataFrame(
        [(datetime.date(2024, 1, 10), 1), (datetime.date(2024, 3, 5), -1)],
        "day DATE, delta BIGINT")
    rows = {r.month: r
            for r in TS.transit_peaks_from_deltas(deltas).collect()}
    feb = datetime.date(2024, 2, 1)
    assert rows[feb].peak_open == 1
    assert rows[feb].peak_day == datetime.date(2024, 2, 1)


def test_transit_deltas_additive_under_partition(spark):
    """The fold contract: delta tables of two disjoint lineitem halves
    sum cell-wise to the one-shot table (what counts_fold_sink keeps
    for the streamed twin)."""
    from tests.conftest import SF_DIR
    from spark_streaming_spark.sources.batch import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    whole = {r.day: r.delta
             for r in TS.transit_daily_deltas(li, od).collect()}
    h1 = li.filter(li.l_orderkey % 2 == 0)
    h2 = li.filter(li.l_orderkey % 2 == 1)
    folded: dict = {}
    for half in (h1, h2):
        for r in TS.transit_daily_deltas(half, od).collect():
            folded[r.day] = folded.get(r.day, 0) + r.delta
    folded = {d: v for d, v in folded.items() if v != 0}
    whole = {d: v for d, v in whole.items() if v != 0}
    assert folded == whole


def test_fano_hand_case(spark):
    """Counts (2, 4) over two days: mean 3, population variance 1 ->
    Fano = 1/3 -> 333333 ppm (floor DIV contract)."""
    import datetime as _dt

    daily = spark.createDataFrame(
        [(_dt.date(2024, 1, 1), 10, 2), (_dt.date(2024, 1, 2), 20, 4)],
        "day DATE, x BIGINT, y BIGINT")
    r = TS.fano_from_daily(daily).collect()[0]
    assert (r.n_days, r.sum_events) == (2, 6)
    # 1e6 * (2*20 - 36) div (2*6) = 4e6 div 12
    assert r.fano_ppm == 333333


def test_fano_constant_series_is_zero(spark):
    import datetime as _dt

    daily = spark.createDataFrame(
        [(_dt.date(2024, 1, d), 0, 5) for d in (1, 2, 3)],
        "day DATE, x BIGINT, y BIGINT")
    assert TS.fano_from_daily(daily).collect()[0].fano_ppm == 0
