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
