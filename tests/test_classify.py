"""Linear quality classifier: the inline-expression weights and the
broadcast weight-table join must be row-identical (the docstring's
production-swap claim, made checkable)."""

from __future__ import annotations

from spark_streaming_spark.operators import classify as CLF
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_weight_join_equals_expression(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = CLF.quality_logits(docs)
    b = CLF.quality_logits_join(docs, CLF.weight_table(spark))
    assert a.columns == b.columns
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_weight_join_broadcasts_small_side(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = CLF.quality_logits_join(
        docs, CLF.weight_table(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_calibration_table_structure_and_oracle(spark, duck):
    """10 deciles whose sizes differ by at most 1 and sum to the corpus,
    integer-ppm pass rates, non-overlapping logit ranges in bin order,
    exact oracle match — and the global rank must NOT plan a
    single-partition exchange for the data-sized window (the 1-row
    ntile scalar and the tiny offsets table are allowed)."""
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = CLF.calibration_table(docs)
    # plan asserts on the pre-execution plan (a collected df reports the
    # AQE final plan, whose materialized stages hide inner exchanges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SinglePartition") <= 2, plan
    assert "rangepartitioning" in plan.lower()
    rows = sorted(out.collect(), key=lambda r: r.bin)
    assert [r.bin for r in rows] == list(range(1, 11))
    n = docs.count()
    assert sum(r.n_docs for r in rows) == n
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    assert all(0 <= r.keep_ppm <= 1_000_000 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a.hi_logit <= b.lo_logit
    assert_matches_oracle(CLF.calibration_table(docs), duck,
                          E.oracle_sql()["classifier_calibration"])


def test_auc_hand_cases(spark):
    from spark_streaming_spark.operators.profile import (
        auc_from_value_counts)

    # perfect separation: all positives score above all negatives
    perfect = spark.createDataFrame(
        [(1.0, 0, 5), (2.0, 5, 0)], "v DOUBLE, ca LONG, cb LONG")
    r = auc_from_value_counts(perfect).collect()[0]
    assert (r.n_pos, r.n_neg) == (5, 5)
    assert r.auc == 1.0 and r.auc_ppm == 1000000
    # reversed: AUC 0
    rev = spark.createDataFrame(
        [(1.0, 5, 0), (2.0, 0, 5)], "v DOUBLE, ca LONG, cb LONG")
    assert auc_from_value_counts(rev).collect()[0].auc == 0.0
    # all tied: half credit, AUC exactly 0.5
    tied = spark.createDataFrame(
        [(1.0, 5, 5)], "v DOUBLE, ca LONG, cb LONG")
    assert auc_from_value_counts(tied).collect()[0].auc == 0.5


def test_pr_curve_hand_case_and_monotone_recall(spark):
    from spark_streaming_spark.operators.classify import (
        PR_THRESHOLDS, pr_from_value_counts)

    # 3 positives at 0.12, 2 negatives at -0.22: at thr 0.0 -> tp=3,
    # fp=0, fn=0; at thr -0.25 -> tp=3, fp=2
    per_v = spark.createDataFrame(
        [(0.12, 3, 0), (-0.22, 0, 2)], "v DOUBLE, ca LONG, cb LONG")
    rows = {r.thr: r for r in pr_from_value_counts(per_v).collect()}
    assert set(rows) == set(float(t) for t in PR_THRESHOLDS)
    assert (rows[0.0].tp, rows[0.0].fp, rows[0.0].fn) == (3, 0, 0)
    assert rows[0.0].precision_ppm == 1000000
    assert rows[0.0].f1_ppm == 1000000
    assert (rows[-0.25].tp, rows[-0.25].fp) == (3, 2)
    assert rows[-0.25].precision_ppm == 600000
    # no predicted positives above the top threshold: NULL precision
    assert rows[0.15].tp == 0 and rows[0.15].precision_ppm is None
    # recall monotone nonincreasing in the threshold
    rec = [rows[float(t)].recall_ppm for t in PR_THRESHOLDS]
    assert all(a >= b for a, b in zip(rec, rec[1:]))
