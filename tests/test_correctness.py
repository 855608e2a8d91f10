"""Every queries() entry vs its DuckDB oracle — the driver's check, run
locally at sf0.001 for fast iteration (driver uses sf0.01).

Sweep scope (r15, VERDICT r14 "Next round" #2b): the full 388-entry
parametrized sweep pushed the plain ``pytest tests/ -x -q`` run past
the driver's budget (VERIFY_r14 tests_ok=false with the tail truncated
mid-suite and zero failures shown), so by default this file sweeps the
DRIVER WINDOW (the first 50 queries() slots — which the r15 rotation
points at every recently-optimized entry) plus any oracle-backed entry
with no verification evidence yet in CHECKED_UNION.json (i.e. brand-new
entries). Set ``SPARK_GRAFT_FULL_SWEEP=1`` for the full registry — the
builder's /verify flow and the recorded SWEEPS.json runs do exactly
that; the ratchet in test_checked_union.py enforces that every entry
still gets evidence within the K-round horizon."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from scripts.gen_checked_union import build as _checked_union
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

if os.environ.get("SPARK_GRAFT_FULL_SWEEP"):
    _SWEEP = sorted(QUERIES)
else:
    _evidence = _checked_union()["entries"]
    _SWEEP = sorted(
        set(list(QUERIES)[:50])
        | {n for n in QUERIES
           if n in ORACLES and n not in _evidence}
    )


@pytest.mark.parametrize("name", _SWEEP)
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, ORACLES[name])


def test_oracle_keys_subset():
    assert set(ORACLES) <= set(QUERIES)


# The round-6 window deliberately spends slots on rows-only entries:
# these had NEVER had a driver row (VERDICT r5 #1 — a first signal that
# the entry executes and row-counts beats another oracle refresh), plus
# the two intentional engine-private approx twins. Pinned exactly so an
# ACCIDENTAL oracle-less entry in the window still fails this test.
_INTENDED_ROWS_ONLY = {
    # bpe_segment_stats left this set in r9 (bpe_segment_sql unrolls the
    # training rounds); media_byte_features in r9 too (its integer twin
    # media_byte_entropy_det carries the hash oracle for the family)
    "bpe_train_merges", "knn_ivf", "knn_ivfpq",
    "pq_codes", "pq_search_topk", "media_byte_features",
    "approx_quantity_quantiles", "approx_distinct_users",
}


def test_checked_window_oracle_slots():
    """The driver verifies only the first 50 queries() entries; every
    slot must carry a DuckDB oracle EXCEPT the deliberate first-signal
    rows-only set above."""
    first_50 = list(QUERIES)[:50]
    missing = {n for n in first_50 if n not in ORACLES}
    assert missing == _INTENDED_ROWS_ONLY & missing
    assert missing <= _INTENDED_ROWS_ONLY
    assert len(set(entrymod._CHECK_FIRST)) == len(entrymod._CHECK_FIRST)
    # the list must sit EXACTLY at the window cap: one more append would
    # silently evict a checked entry with every other test still green
    assert len(entrymod._CHECK_FIRST) == 50
    assert first_50 == entrymod._CHECK_FIRST


def test_emb_folds_read_tail_budget():
    """Round-12 VERDICT "Next round" #5: emb_folds carries the suite's
    heaviest streamed read tails — bounded-round power iteration
    (streaming_pca_top2, ~8.5 s at sf0.1) and the Lloyd re-fit at read
    (streaming_kmeans_centroids, ~5.1 s). That cost is acceptable
    BECAUSE the family is small (5 members, 2 heavy tails); this
    ratchet forces an explicit revisit of the per-entry rate before
    the family grows. If you trip it: either the new member must ride
    an existing fold as a cheap ALIAS read, or the family subtotal
    budget in the bench detail needs a recorded re-justification."""
    members = entrymod._emb_fold_members()
    assert len(members) <= 6, (
        "emb_folds grew beyond its budgeted size — re-justify the "
        "read-tail cost (see r12 VERDICT nit) before raising this cap")
    # the two known-heavy read tails, named so a rename resurfaces this
    assert {"pca_top2", "kmeans_centroids"} <= set(members)


def test_doc_folds_membership_budget():
    """Round-13 VERDICT "Next round" #4: doc_folds is the suite's
    largest co-scheduled replay family (20 members / ~17 s at sf0.1 in
    the r13 detail) and absorbs most new streamed twins, so an
    unbudgeted slow member would hide inside leader-attribution noise.
    Rate rationale on record: the family subtotal is ONE shared
    documents-fold replay (~10.5 s, attributed to whichever member the
    bench elects leader — streaming_bpe_fertility in r13) plus
    per-member read tails; every read tail except the two LM entries
    (~1.8 s each, reading the memoized trigram count table) is
    <= ~0.7 s. Budget: <= 22 members (one spare slot past the r14
    streaming_dsir_weights addition). To grow past it, either the new
    member must be a cheap ALIAS read of an existing fold artifact, or
    record a re-justified per-entry rate here and in the round README
    before raising the cap."""
    members = entrymod._doc_fold_members()
    assert len(members) <= 22, (
        "doc_folds grew beyond its budgeted size — re-justify the "
        "per-entry read-tail rate (see r13 VERDICT nit) before "
        "raising this cap")
    # the known-heavy members, named so a rename resurfaces this note:
    # the elected replay leader and the two LM count-table read tails
    assert {"bpe_fertility", "lm_counts", "lm_by_source"} \
        <= set(members)


def test_merge_folds_membership_budget():
    """Round-14 VERDICT "Next round" #7: merge_folds is the other large
    co-scheduled replay family (16 members / ~21-25 s at sf0.1 in the
    r14 driver detail) and the only one without a budget ratchet. Rate
    rationale on record: the subtotal is ONE shared replay over the
    lineitem/orders fold chunks (attributed to the elected leader —
    streaming_transit_peaks in the r14 detail, ~6.9 s) plus read
    tails, of which two are heavy by design: the HITS iteration
    (hits_edges, ~4-5 s — bounded-round |E| joins at read) and the
    fuzzy-linkage verify (fuzzy_linkage, ~3 s). Everything else reads
    a folded summary table in <= ~1 s. Budget: <= 18 members (two
    spare slots). To grow past it, the new member must be a cheap
    ALIAS read of an existing fold, or record a re-justified
    per-entry rate here before raising the cap."""
    members = entrymod._merge_fold_members()
    assert len(members) <= 18, (
        "merge_folds grew beyond its budgeted size — re-justify the "
        "per-entry read-tail rate (r14 VERDICT #7) before raising "
        "this cap")
    # the known-heavy members, named so a rename resurfaces this note
    assert {"hits_edges", "fuzzy_linkage", "transit_deltas"} \
        <= set(members)


def test_bench_summary_line_fits_driver_tail_capture():
    """r15 (VERDICT r14 #2a): the driver parses bench.py's final JSON
    line out of a 2000-char output-tail capture (every BENCH_r*.json
    stores tail=2000; the r1 overflow made parsed:null). bench.py now
    asserts the line at runtime; this pins the budget STATICALLY for
    the current registry — the line's size is dominated by the family
    subtotal map, so a new co-scheduled family shows up here before it
    ever reaches a driver run. The 388-entry per-query map itself
    measures ~10.3 KB and therefore stays in BENCH_DETAIL.json."""
    import json
    import time

    groups = entrymod.cosched_groups()
    fams = sorted(set(groups.values())
                  | set(entrymod.batch_families().values()))
    line = json.dumps({
        "metric": "total_query_wall_sec",
        "value": 99999.9999,
        "run": f"{time.strftime('%Y%m%dT%H%M%SZ', time.gmtime())}-pid99999",
        "unit": "sec",
        "n_queries": len(QUERIES),
        "n_failed": 0,
        "sf": 0.1,
        "streaming_sec": 99999.9999,
        "n_streaming": sum(1 for n in QUERIES
                           if n.startswith("streaming_")),
        "family_subtotals": {g: 99999.9999 for g in fams},
        "cal_py_sec": 99.999,
        "cal_spark_sec": 99.999,
    })
    assert len(line) <= 1900, (
        f"bench summary line budget exceeded ({len(line)} > 1900): a "
        f"new family pushed it toward the driver's 2000-char tail "
        f"capture — move fields to BENCH_DETAIL.json")


def test_cosched_groups_map_is_consistent(spark):
    """The bench-facing entry->group map (entrymod.cosched_groups) must
    name real entries and agree in SIZE with every co-scheduled member
    dict — a member added to a group without a map row would silently
    report an unexplained ~0 bench time. (spark fixture: some member
    factories build Column expressions at definition time.)"""
    groups = entrymod.cosched_groups()
    assert set(groups) <= set(QUERIES)
    from collections import Counter

    sizes = Counter(groups.values())
    assert sizes["attr_modes"] == len(entrymod._ATTR_MEMBERS)
    assert sizes["ord_events"] == len(entrymod._ord_members())
    assert sizes["doc_folds"] == len(entrymod._doc_fold_members())
    assert sizes["event_folds"] == len(entrymod._event_fold_members())
    assert sizes["emb_folds"] == len(entrymod._emb_fold_members())
    assert sizes["rs_events"] == len(entrymod._rs_events_members())
    assert sizes["rs_documents"] == len(entrymod._rs_docs_members())
    assert sizes["merge_folds"] == len(entrymod._merge_fold_members())
    assert sizes["dedup_replays"] == len(entrymod._dedup_replay_members())
    assert sizes["misc_replays"] == len(entrymod._misc_replay_members())
    assert sum(sizes.values()) == len(groups)


def test_batch_families_map_names_real_entries():
    """The batch artifact-family map must name real entries and never
    collide with the co-scheduled replay groups (an entry in both would
    be double-counted in family_subtotals)."""
    bf = entrymod.batch_families()
    assert set(bf) <= set(QUERIES)
    assert not set(bf) & set(entrymod.cosched_groups())


def test_oracle_output_types_spark_representable(duck):
    """Round-4 lesson: DuckDB ``SUM(BIGINT)`` yields HUGEINT (int128 ->
    Arrow decimal128(38,0)) while Spark emits int64, and the driver's
    value-hash distinguishes the serializations even for equal values.
    DESCRIBE every oracle and reject output columns of a type Spark can
    never produce — the systemic guard for every future SUM-over-int
    oracle (same trap class as the e-notation double-literal rule)."""
    bad = {}
    for name, sql in sorted(ORACLES.items()):
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        hit = [(row[0], row[1]) for row in desc if "HUGEINT" in row[1].upper()]
        if hit:
            bad[name] = hit
    assert not bad, (
        f"oracles with non-Spark-representable output columns "
        f"(wrap in CAST(... AS BIGINT)): {bad}"
    )


def test_user_event_sequence_pandas_twin(spark):
    """The applyInPandas spelling is the Arrow-surface check: it must be
    row-identical to the production row_number() path."""
    from spark_streaming_spark.operators import grouped as G
    from spark_streaming_spark.sources.batch import load_table

    events = load_table(spark, SF_DIR, "events")
    a = G.user_event_sequence(events)
    b = G.user_event_sequence_pandas(events)
    assert a.columns == b.columns
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"brand", "product", "click_count", "rank"}


def test_comparator_rejects_decimal_vs_double(spark, duck):
    """r6 regression (`customer_rfm`): a DECIMAL column on the Spark
    side vs the oracle's float64 was green under the old comparator
    (both coerced to float) but red under the driver's hash. The
    comparator now goes through pandas exactly like the driver — this
    pins that a DECIMAL-vs-DOUBLE boundary violation FAILS locally."""
    from pyspark.sql import functions as F
    from tests.conftest import assert_matches_oracle

    dec = spark.range(2).select(
        "id", F.lit("3916451.10").cast("decimal(38,2)").alias("v"))
    oracle = ("SELECT range AS id, CAST(3916451.10 AS DOUBLE) AS v "
              "FROM range(2)")
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches_oracle(dec, duck, oracle)
    # and the house-rule spelling (cast at the boundary) passes
    assert_matches_oracle(
        dec.select("id", F.col("v").cast("double").alias("v")),
        duck, oracle)


def test_comparator_crashes_on_array_cells(spark, duck):
    """r6 regression (`pq_codes`): array<int> output crashed the
    driver's pandas canonicalizer ('unhashable type: list'). The local
    comparator must reproduce that crash class, not silently pass."""
    from pyspark.sql import functions as F
    from tests.conftest import assert_matches_oracle

    df = spark.range(2).select(
        "id", F.array(F.lit(1), F.lit(2)).alias("codes"))
    with pytest.raises(Exception, match="unhashable|not supported"):
        assert_matches_oracle(
            df, duck, "SELECT range AS id, [1, 2] AS codes FROM range(2)")


def test_comparator_handles_embedded_newlines(spark, duck):
    """r7 advice: to_csv quotes a newline-bearing string cell, and a
    splitlines()-based parse sheared it into pseudo-rows that sorted
    independently. The comparator now uses a real csv reader — pin that
    equal newline data matches and a genuine mismatch still fails."""
    from pyspark.sql import functions as F
    from tests.conftest import assert_matches_oracle

    df = spark.range(2).select(
        "id", F.concat(F.lit("a\n"), F.col("id").cast("string")).alias("t"))
    assert_matches_oracle(
        df, duck,
        "SELECT range AS id, 'a' || chr(10) || CAST(range AS VARCHAR) AS t "
        "FROM range(2)")
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches_oracle(
            df, duck,
            "SELECT range AS id, 'b' || chr(10) || CAST(range AS VARCHAR) "
            "AS t FROM range(2)")
