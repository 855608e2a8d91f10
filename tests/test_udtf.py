"""Python UDTF surface (operators/udtf_ops.py): run detection semantics,
LATERAL-join plumbing, and the no-shuffle plan shape."""

from __future__ import annotations

from spark_streaming_spark.operators.udtf_ops import token_runs


def test_token_runs_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a b c c c d"),
            (2, "x y z"),          # no runs
            (3, ""),               # empty doc
            (4, "q q q q"),        # one maximal run, not sub-runs
        ],
        "doc_id long, text string",
    )
    rows = {tuple(r) for r in token_runs(docs).collect()}
    assert rows == {
        (1, "a", 1, 2),
        (1, "c", 4, 3),
        (4, "q", 1, 4),
    }


def test_token_runs_plan_is_map_side(spark):
    """The LATERAL UDTF join plans as a per-partition Generate — no
    shuffle, no join exchange (the 'table function' is row-local)."""
    docs = spark.createDataFrame([(1, "a a")], "doc_id long, text string")
    plan = token_runs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
