"""Mandatory-broadcast-hint lint (round-11 VERDICT "Next round" #2).

``F.broadcast()`` is a *mandatory* hint: Catalyst must materialize the
wrapped relation on the driver and ship it to every executor, whatever
its size. That is correct for bounded artifacts — nation/region (≤ 25
rows at any SF), trained weight/centroid tables, 1-row scalar
aggregates — and an OOM, not a slowdown, when the build side scales
with the corpus (orders, customer, part, supplier are all
SF-proportional; at 100 TB each is a multi-billion-row relation).

The engine rule these tests pin: scale-proportional relations NEVER
carry a mandatory broadcast hint. Below ``autoBroadcastJoinThreshold``
Catalyst/AQE still broadcasts them (so small-SF plans — and every
oracle hash — are unchanged); at 100 TB the same code shuffles on the
join key. The reference shows the same discipline: its SQL-over-stream
surface never hints — the planner decides
(``Top3HotProduct.java:85-103``).

Two layers:

* a source lint that extracts every ``F.broadcast(<expr>)`` call site
  across the package and fails if the wrapped expression's root
  identifier names an SF-proportional relation, and
* plan tests that disable auto-broadcast (threshold −1) and assert the
  previously-flagged operators plan with ZERO forced broadcasts (only
  the explicitly bounded nation hint survives where present).
"""

from __future__ import annotations

import glob
import os
import re

from spark_streaming_spark.operators import aggregates as A
from spark_streaming_spark.operators import timeseries as TS
from spark_streaming_spark.operators import topk as T
from spark_streaming_spark.operators import tpch
from spark_streaming_spark.plans import explain
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Root identifiers that denote SF-proportional relations anywhere in the
# package: the raw fact/dim tables that grow with the corpus, plus the
# locals this codebase derives from them (a filter or projection of a
# scale table still scales with SF — filtering one brand of `part` cuts
# a constant fraction, not the growth rate).
SCALE_IDENTIFIERS = {
    "orders", "customer", "customers", "part", "parts",
    "supplier", "suppliers", "lineitem", "events", "documents",
    "embeddings",
    # orders/part/supplier/customer-derived locals used in operators:
    "od", "sized", "named", "snation", "nsupp", "good_supp",
    "brand_parts", "avg_qty", "fam", "branded_lines",
    # vocabulary-derived locals (round-12 VERDICT "Next round" #2):
    # per-term document-frequency and unigram-count tables grow
    # Heaps-sublinearly but UNBOUNDEDLY with the corpus — 10⁸–10⁹
    # distinct noise/typo tokens at 100 TB of web text. bm25's
    # query-filtered variant is named `qdf` (bounded) to stay legal.
    "df_", "uni",
}


def _broadcast_args(src: str):
    """Yield (lineno, argtext) for every F.broadcast(...) call,
    balanced-paren extraction."""
    for m in re.finditer(r"F\.broadcast\(", src):
        start = m.end()
        depth, i = 1, start
        while depth and i < len(src):
            if src[i] == "(":
                depth += 1
            elif src[i] == ")":
                depth -= 1
            i += 1
        yield src[: m.start()].count("\n") + 1, src[start:i - 1]


def test_no_mandatory_broadcast_hint_on_scale_proportional_tables():
    files = sorted(
        glob.glob(os.path.join(REPO, "spark_streaming_spark", "**", "*.py"),
                  recursive=True)
    ) + [os.path.join(REPO, "__spark_entry__.py")]
    bad = []
    for path in files:
        src = open(path).read()
        for lineno, arg in _broadcast_args(src):
            root = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)", arg)
            if root and root.group(1) in SCALE_IDENTIFIERS:
                bad.append(f"{os.path.relpath(path, REPO)}:{lineno} "
                           f"F.broadcast({arg.strip()[:60]}...)")
    assert not bad, (
        "mandatory broadcast hints on SF-proportional relations "
        "(driver OOM at 100 TB — let AQE size-dispatch instead):\n"
        + "\n".join(bad)
    )


def _forced_broadcasts(spark, build, expected: int):
    """With auto-broadcast disabled, only mandatory hints broadcast —
    count BroadcastExchange nodes in the initial physical plan."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = build()
        text = explain.explain_text(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # formatted mode prints each node in the tree AND the numbered
    # detail section — count only the detail entries
    got = len(re.findall(r"\(\d+\) BroadcastExchange", text))
    assert got == expected, (
        f"expected {expected} forced broadcast(s), plan has {got}:\n"
        f"{text[:2000]}"
    )


def test_transit_deltas_no_forced_broadcast(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    _forced_broadcasts(spark, lambda: TS.transit_daily_deltas(li, od), 0)


def test_ship_latency_no_forced_broadcast(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    _forced_broadcasts(
        spark, lambda: TS.ship_latency_percentiles(li, od), 0)
    _forced_broadcasts(spark, lambda: TS.ship_gap_counts(li, od), 0)


def test_market_cents_only_nation_forced(spark):
    cust = load_table(spark, SF_DIR, "customer")
    od = load_table(spark, SF_DIR, "orders")
    nat = load_table(spark, SF_DIR, "nation")
    # exactly ONE forced broadcast: the ≤25-row nation dim
    _forced_broadcasts(spark, lambda: A.market_cents(cust, od, nat), 1)


def test_top3_products_no_forced_broadcast(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part")
    _forced_broadcasts(
        spark, lambda: T.top3_products_per_brand(li, part), 0)


def test_tpch_scale_joins_no_forced_broadcast(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part")
    _forced_broadcasts(spark, lambda: tpch.promo_revenue(li, part), 0)
    _forced_broadcasts(
        spark, lambda: tpch.small_qty_part_revenue(li, part), 0)


def test_dehinted_joins_still_auto_broadcast_at_small_sf(spark):
    """The flip side: at test SF the same joins DO broadcast — via the
    size-conditional auto threshold, not a hint — so plans (and every
    oracle hash) are unchanged by the de-hinting."""
    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    assert explain.has_broadcast_join(TS.ship_gap_counts(li, od))


def test_vocab_scaled_tables_no_forced_broadcast(spark):
    """Round-12 VERDICT "Next round" #2: the three textstats operators
    that used to mandatorily broadcast vocabulary-scaled aggregates
    (term_stats / doc_top_terms: the |vocab|-row df table; bigram_pmi:
    the |vocab|-row unigram table, twice) now plan with ZERO forced
    broadcasts — AQE size-dispatches instead."""
    from spark_streaming_spark.operators import textstats as TX

    docs = load_table(spark, SF_DIR, "documents")
    _forced_broadcasts(spark, lambda: TX.term_stats(docs), 0)
    _forced_broadcasts(spark, lambda: TX.doc_top_terms(docs), 0)
    _forced_broadcasts(spark, lambda: TX.bigram_pmi(docs), 0)
    # and at test SF they still broadcast via the auto threshold, so
    # plans and oracle hashes are unchanged by the de-hinting
    assert explain.has_broadcast_join(TX.term_stats(docs))
