"""fasttext-shape language-ID head (operators/langid.py): cross-engine
oracles plus the artifact/eval-harness contracts. Honest-fixture note:
the synthetic corpus shares one vocabulary across langs, so ACCURACY is
~chance by construction — what these tests pin is exactness, split
hygiene, and the scorer's determinism, which is what transfers to a
real corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E
from spark_streaming_spark.operators import langid as LID
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def test_langid_scores_match_oracle(spark, duck):
    docs = load_table(spark, SF_DIR, "documents")
    assert_matches_oracle(
        LID.langid_scores(docs), duck, E.oracle_sql()["langid_scores"])


def test_langid_confusion_matches_oracle_and_covers_eval_half(spark, duck):
    docs = load_table(spark, SF_DIR, "documents")
    assert_matches_oracle(
        LID.langid_confusion(docs), duck,
        E.oracle_sql()["langid_confusion"])
    # every held-out doc is scored exactly once (no train leakage, no
    # drops: all fixture docs have at least one word)
    conf = LID.langid_confusion(docs)
    n_eval = docs.filter(F.col("doc_id") % 2 == 1).count()
    assert conf.agg(F.sum("n_docs")).first()[0] == n_eval


def test_langid_weights_are_bounded_broadcast_artifact(spark):
    """The weight table is |langs|·dim rows max with ppm-bounded
    integer weights — broadcastable at ANY corpus size."""
    docs = load_table(spark, SF_DIR, "documents")
    w = LID.langid_train(docs, dim=64).collect()
    langs = {r["lang"] for r in w}
    assert len(w) <= len(langs) * 64
    assert all(0 <= r["w"] <= 1_000_000 for r in w)
    # per-lang weights sum to <= 1e6 (they are DIV-floored ppm shares)
    from collections import defaultdict

    per = defaultdict(int)
    for r in w:
        per[r["lang"]] += r["w"]
    assert all(t <= 1_000_000 for t in per.values())


def test_langid_argmax_tiebreak_is_deterministic(spark):
    """Equal scores resolve (score DESC, lang ASC) — two runs agree
    row-for-row."""
    docs = load_table(spark, SF_DIR, "documents")
    one = sorted(tuple(r) for r in LID.langid_scores(docs).collect())
    two = sorted(tuple(r) for r in LID.langid_scores(docs).collect())
    assert one == two and len(one) > 0
