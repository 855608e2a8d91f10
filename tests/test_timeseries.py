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
