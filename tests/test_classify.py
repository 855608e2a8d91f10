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
