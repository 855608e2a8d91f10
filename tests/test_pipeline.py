"""Training-data pipeline operators (operators/pipeline.py): quality
rules, repetition signals, contamination scan, sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_spark.operators import pipeline as PL
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_quality_filter_both_classes(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = PL.quality_filter(docs)
    assert out.count() == docs.count()
    by_keep = {r.keep: r.n for r in
               out.groupBy("keep").agg(F.count("*").alias("n")).collect()}
    assert by_keep.get(True, 0) > 0 and by_keep.get(False, 0) > 0
    # rule consistency: every kept doc satisfies every rule
    bad = out.filter(
        F.col("keep") & (
            (F.col("n_words") < PL.MIN_WORDS)
            | (F.col("n_words") > PL.MAX_WORDS)
            | (F.col("mean_word_len") < PL.MIN_MEAN_WORD_LEN)
            | (F.col("mean_word_len") > PL.MAX_MEAN_WORD_LEN)
            | (F.col("n_stop_distinct") < PL.MIN_DISTINCT_STOPWORDS)
            | (F.col("dup_word_frac") > PL.MAX_DUP_WORD_FRACTION)
        )
    ).count()
    assert bad == 0


def test_repetition_signals_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = PL.repetition_signals(docs)
    n_toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_t"))
    joined = out.join(n_toks, "doc_id")
    # per-doc bigram total is exactly n_tokens - 1
    assert joined.filter(F.col("n_bigrams") != F.col("n_t") - 1).count() == 0
    assert out.filter(
        (F.col("top_bigram_frac") <= 0) | (F.col("top_bigram_frac") > 1)
    ).count() == 0
    assert out.filter(F.col("top_bigram_count") > F.col("n_bigrams")).count() == 0


def test_contamination_check_semantics(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = PL.contamination_check(docs)
    rows = out.collect()
    assert rows, "fixture must show contamination at 3-grams"
    # benchmark docs never flag themselves
    assert all(r.doc_id % PL.BENCH_MOD != 0 for r in rows)
    # spot-verify: a flagged doc really shares a 3-gram with the benchmark
    from spark_streaming_spark.operators.dedup import _shingle_sets

    grams = _shingle_sets(docs, 3)
    bench_shs = {
        r.sh for r in grams.filter(
            (F.col("doc_id") % PL.BENCH_MOD) == 0).collect()
    }
    some = rows[0]
    doc_shs = {r.sh for r in
               grams.filter(F.col("doc_id") == some.doc_id).collect()}
    assert len(doc_shs & bench_shs) == some.n_shared_ngrams


def test_pack_sequences_equals_naive_global_window(spark):
    """The two-level prefix sum must equal the naive single-partition
    global window bit-for-bit (that naive spelling IS the DuckDB
    oracle; here we pin the Spark twin too)."""
    docs = load_table(spark, SF_DIR, "documents")
    fast = PL.pack_sequences(docs)

    n = F.size(F.split("text", " ")).cast("long")
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    d = docs.select("doc_id", n.alias("n_tokens"))
    end = F.sum("n_tokens").over(w)
    start = end - F.col("n_tokens")
    naive = d.select(
        "doc_id", "n_tokens",
        start.alias("tok_start"),
        F.floor(start / PL.SEQ_LEN).alias("seq_first"),
        F.floor((end - 1) / PL.SEQ_LEN).alias("seq_last"),
        (start % PL.SEQ_LEN).alias("offset_in_seq"),
    )
    assert fast.columns == naive.columns
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


def test_pack_sequences_tape_is_contiguous(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rows = sorted(PL.pack_sequences(docs).collect(), key=lambda r: r.doc_id)
    off = 0
    for r in rows:
        assert r.tok_start == off
        assert r.seq_first == off // PL.SEQ_LEN
        assert r.seq_last == (off + r.n_tokens - 1) // PL.SEQ_LEN
        assert r.offset_in_seq == off % PL.SEQ_LEN
        off += r.n_tokens


def test_pack_sequences_no_single_partition_exchange(spark):
    """The scale property itself: the packing plan must not shuffle the
    corpus through a single partition — only the tiny per-bucket totals
    may use the unpartitioned window."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = PL.pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    # the corpus-side window is partitioned by bkt; a naive global window
    # over the full docs relation would show 'Window [...]' preceded by a
    # SinglePartition exchange fed by the parquet scan. Count
    # SinglePartition exchanges: exactly one (bucket totals), not two.
    assert plan.count("SinglePartition") <= 1, plan


def test_lm_bigram_scores_semantics(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = PL.lm_bigram_scores(docs)
    n_toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_t"))
    joined = out.join(n_toks, "doc_id")
    # per-doc bigram count is n_tokens - 1; <2-token docs are absent
    assert joined.filter(F.col("n_bigrams") != F.col("n_t") - 1).count() == 0
    assert out.count() == docs.filter(
        F.size(F.split("text", " ")) >= 2).count()
    # MLE conditional probabilities are in (0, 1]
    assert out.filter(
        (F.col("avg_condp") <= 0) | (F.col("avg_condp") > 1)
    ).count() == 0
    # a doc whose every bigram is unique among its first words scores
    # lower than a doc made of the corpus' dominant bigrams; sanity:
    # scores are not all identical
    assert out.select("avg_condp").distinct().count() > 1


def test_lm_bigram_scores_partition_independent(spark):
    docs = load_table(spark, SF_DIR, "documents")
    base = {(r.doc_id, r.n_bigrams, r.avg_condp)
            for r in PL.lm_bigram_scores(docs).collect()}
    reparted = {(r.doc_id, r.n_bigrams, r.avg_condp)
                for r in PL.lm_bigram_scores(docs.repartition(13)).collect()}
    assert base == reparted


def test_repetition_signals_twins_equal(spark):
    docs = load_table(spark, SF_DIR, "documents")
    prod = {tuple(r) for r in PL.repetition_signals(docs).collect()}
    mapo = {tuple(r) for r in PL.repetition_signals_maponly(docs).collect()}
    assert prod == mapo


def test_cdc_chunks_cover_and_partition(spark):
    """Chunks PARTITION each document: token counts sum to the doc's
    token count, first_pos values are the running sums, chunk_idx is
    dense from 0."""
    docs = load_table(spark, SF_DIR, "documents")
    ch = PL.cdc_chunks(docs)
    totals = (
        ch.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("s"), F.max("chunk_idx").alias("mx"),
             F.count("*").alias("n"))
        .join(docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("nt")), "doc_id")
    )
    assert totals.filter("s != nt OR mx != n - 1").count() == 0


def test_cdc_boundaries_survive_prefix_edit(spark):
    """The content-defined property fixed-stride chunking lacks: after a
    prefix insertion, every chunk past the first post-edit boundary is
    byte-identical (same n_tokens + signature), so a dedup store reuses
    them. Fixed-stride chunk_documents would shift every chunk."""
    docs = load_table(spark, SF_DIR, "documents")
    row = (
        PL.cdc_chunks(docs).groupBy("doc_id").count().filter("count >= 3")
        .orderBy("doc_id").limit(1).collect()
    )[0]
    text = docs.filter(F.col("doc_id") == row.doc_id).collect()[0].text
    pair = spark.createDataFrame(
        [(0, text), (1, "inserted prefix tokens " + text)],
        ["doc_id", "text"])
    ch = PL.cdc_chunks(pair).collect()
    sigs = {0: set(), 1: set()}
    for r in ch:
        sigs[r.doc_id].add((r.n_tokens, str(r.chunk_sig)))
    n_orig = sum(1 for r in ch if r.doc_id == 0)
    shared = len(sigs[0] & sigs[1])
    # all original chunks except those touching the edit region survive
    assert shared >= n_orig - 2, (n_orig, shared)


def test_cdc_chunks_match_oracle(spark, duck):
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    assert_matches_oracle(
        PL.cdc_chunks(docs), duck, E.oracle_sql()["cdc_chunks"])
    assert_matches_oracle(
        PL.cdc_dup_chunks(docs), duck, E.oracle_sql()["cdc_dup_chunks"])


def test_source_quality_report_consistency(spark, duck):
    """Per-source doc counts sum to the corpus; every ppm in [0, 1e6];
    mean quality within the score range; dup attribution never exceeds
    the source's docs; exact oracle match."""
    import __spark_entry__ as E
    from spark_streaming_spark.operators.pipeline import source_quality_report
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = source_quality_report(docs)
    rows = out.collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.pass_ppm <= 1_000_000
        assert 0 <= r.dup_doc_ppm <= 1_000_000
        assert 0.0 <= r.mean_quality <= 1.0
    assert_matches_oracle(out, duck,
                          E.oracle_sql()["source_quality_report"])


def test_corr_matrix_matches_numpy_and_oracle(spark, duck):
    """The one-pass exact-sum correlation agrees with numpy's corrcoef
    to float tolerance AND hash-checks against the generated twin."""
    import numpy as np

    import __spark_entry__ as E
    from spark_streaming_spark.operators import profile as PF
    from spark_streaming_spark.sources.batch import load_table
    from tests.conftest import SF_DIR, assert_matches_oracle

    li = load_table(spark, SF_DIR, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in PF.corr_matrix(li, cols).collect()}
    pdf = li.select(*cols).toPandas()
    ref = np.corrcoef(pdf.to_numpy(dtype="float64").T)
    for i, a in enumerate(cols):
        for j in range(i + 1, len(cols)):
            assert abs(out[(a, cols[j])] - ref[i][j]) < 1e-6, (a, cols[j])
    assert_matches_oracle(
        PF.corr_matrix(li, cols), duck,
        E.oracle_sql()["lineitem_corr_matrix"])


def test_benford_audit_hand_distribution(spark):
    """Hand distribution: 3 amounts starting with '1', 1 with '9',
    zero amounts excluded; expectation constants sum to exactly 1e6
    and zero-count digits still appear (spine join)."""
    from spark_streaming_spark.operators import profile as PF

    df = spark.createDataFrame(
        [(1.00,), (12.34,), (199.99,), (9.50,), (0.0,)], "amt double")
    out = {r["digit"]: r for r in PF.benford_audit(df, "amt").collect()}
    assert len(out) == 9
    assert out[1]["n_rows"] == 3 and out[9]["n_rows"] == 1
    assert out[1]["observed_ppm"] == 750000
    assert out[2]["n_rows"] == 0 and out[2]["observed_ppm"] == 0
    assert out[2]["delta_ppm"] == -176091
    assert sum(PF.BENFORD_PPM.values()) == 1000000
    assert sum(r["expected_ppm"] for r in out.values()) == 1000000


def test_mad_anomalies_hampel_fence(spark):
    """Hand series: median 5.00, MAD 1.00 -> only the 100.00 point
    clears the 5-MAD fence; the mean/stddev gate would have had its
    fence dragged by that same point (the breakdown argument)."""
    import datetime as dt

    from spark_streaming_spark.operators import profile as PF

    t = dt.datetime(2024, 1, 1)
    vals = [4.0, 5.0, 5.0, 6.0, 100.0]
    events = spark.createDataFrame(
        [(i, t, i, "view", v, "{}") for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    rows = PF.mad_anomalies(events).collect()
    assert [r["event_id"] for r in rows] == [4]
    assert rows[0]["med_cents"] == 500 and rows[0]["mad_cents"] == 100


def test_referential_audit_orphans_and_childless(spark):
    """Child rows [1,1,2,7] vs parents {1,2,3}: the single key-7 row
    is an orphan; parent 3 is childless; n_child counts ROWS (4), the
    others count KEYS."""
    from spark_streaming_spark.operators import profile as PF

    child = spark.createDataFrame([(1,), (1,), (2,), (7,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    r = PF.referential_audit(
        [("child.k->parent", child, "k", parent, "p")]).collect()[0]
    assert r["n_child"] == 4 and r["n_orphans"] == 1
    assert r["n_parents"] == 3 and r["n_childless"] == 1


def test_bloom_prune_equals_plain_semi_join_and_prunes(spark):
    """The two contract halves: (a) prune-then-exact-join EQUALS the
    plain semi join (no false negatives, FPs removed); (b) the Bloom
    actually prunes — the candidate set is well under the fact table
    when the key set is selective."""
    from spark_streaming_spark.operators import pipeline as PL

    li = load_table(spark, SF_DIR, "lineitem")
    keys = load_table(spark, SF_DIR, "part").filter(
        F.col("p_retailprice") > 990)
    got = PL.bloom_pruned_semi_join(li, "l_partkey", keys, "p_partkey")
    plain = li.join(
        keys.select("p_partkey").distinct(),
        li["l_partkey"] == F.col("p_partkey"), "left_semi")
    assert got.count() == plain.count()
    assert sorted(r["l_orderkey"] for r in got.collect()) == \
        sorted(r["l_orderkey"] for r in plain.collect())
    # pruning is real: candidates (pre exact-join) << fact rows
    kd = keys.select(F.col("p_partkey").cast("string").alias("_bk")) \
        .distinct()
    arr = PL.bloom_bits_of(kd, "_bk")
    probe = li.withColumn("_bk", F.col("l_partkey").cast("string")) \
        .crossJoin(F.broadcast(arr))
    probe, cond = PL.bloom_probe_cond(probe, "_bk")
    n_cand, n_all = probe.filter(cond).count(), li.count()
    assert n_cand < n_all * 0.5
    assert n_cand >= got.count()


def test_value_drift_bins_detects_shift(spark):
    """Identical halves -> zero drift everywhere; a current half
    shifted above the reference max -> all current mass lands in the
    top bin (diff 900000 there, since ref has ~1/10 per bin)."""
    import datetime as dt

    from spark_streaming_spark.operators import profile as PF

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")

    d0, d1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 20)
    same = mk([(i, d0, 1, "v", float(i), "{}") for i in range(100)]
              + [(100 + i, d1, 1, "v", float(i), "{}")
                 for i in range(100)])
    out = {r["bin"]: r for r in PF.value_drift_bins(same).collect()}
    assert all(r["diff_ppm"] == 0 for r in out.values())
    shifted = mk([(i, d0, 1, "v", float(i), "{}") for i in range(100)]
                 + [(100 + i, d1, 1, "v", 1000.0 + i, "{}")
                    for i in range(100)])
    out2 = {r["bin"]: r for r in PF.value_drift_bins(shifted).collect()}
    assert out2[9]["cur_ppm"] == 1000000
    assert out2[0]["n_cur"] == 0


def test_value_drift_bins_tiny_reference(spark):
    """Degenerate reference windows: n_ref < 10 collides decile ranks
    — the 9 edges must be materialized WITH duplicates (one per decile
    index, matching the SQL twin's per-i edge rows), and n_ref == 0
    must not blow up on a malformed empty array (everything bins 0)."""
    import datetime as dt

    from spark_streaming_spark.operators import profile as PF

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")

    d0, d1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 20)
    # n_ref = 2 (values 1.00, 2.00): edge ranks collide to [1]*5+[2]*4
    # -> edges [100]*5 + [200]*4; cur value 150 sits above 5 edges.
    tiny = mk([(1, d0, 1, "v", 1.0, "{}"), (2, d0, 1, "v", 2.0, "{}"),
               (3, d1, 1, "v", 1.5, "{}")])
    out = {r["bin"]: r for r in PF.value_drift_bins(tiny).collect()}
    # ref 1.00 beats no edge (bin 0); ref 2.00 and cur 1.50 beat
    # exactly the five 100-cent edges (bin 5) — a dedup'd edge list
    # would misplace them in bin 1.
    assert out[0]["n_ref"] == 1
    assert out[5]["n_ref"] == 1 and out[5]["n_cur"] == 1
    # n_ref = 0: all events on/after the pivot -> single-day span puts
    # the lone day in the current half... use 2 days, both current-half
    empty_ref = mk([(1, d1, 1, "v", 7.0, "{}")])
    out0 = {r["bin"]: r for r in PF.value_drift_bins(empty_ref).collect()}
    assert len(out0) == 10  # runs without a malformed array() error


def test_user_value_outliers_personalized(spark):
    """The personalization claim: the same 50.00 value flags for the
    low-spend user and does NOT flag for the whale whose own spread
    covers it; min_events gates noisy users out; algebra cross-check
    vs float mean/std on the flagged user."""
    import datetime as dt
    import statistics

    from spark_streaming_spark.operators import profile as PF

    t = dt.datetime(2024, 1, 1)
    # population z including the point is bounded by (n-1)/sqrt(n), so
    # a 3-sigma flag needs n >= 11 baseline points — 15 here
    low = [1.0, 1.2, 0.9, 1.1, 1.0] * 3 + [50.0]
    whale = [40.0, 60.0, 45.0, 55.0, 38.0] * 3 + [50.0]
    rows = [(i, t, 1, "v", v, "{}") for i, v in enumerate(low)]
    rows += [(200 + i, t, 2, "v", v, "{}") for i, v in enumerate(whale)]
    rows += [(900, t, 3, "v", 999.0, "{}")]  # n < min_events
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    out = {r["event_id"]: r for r in
           PF.user_value_outliers(events).collect()}
    spike_id = len(low) - 1
    assert spike_id in out and out[spike_id]["cents"] == 5000
    assert all(r["user_id"] == 1 for r in out.values())
    # float cross-check (population sigma) on user 1's 50.00
    cents = [round(v * 100) for v in low]
    mu = statistics.fmean(cents)
    sigma = statistics.pstdev(cents)
    assert abs(5000 - mu) > 3 * sigma


def test_padding_waste_sorted_beats_arrival(spark):
    """Length-sorted batching must never pad MORE than arrival-order
    batching, and the hand-counted case pins the integer math: batch
    size 2, lengths [1, 9, 1, 9] by doc_id — arrival pads each mixed
    batch to 9 (padded 36, real 20), sorted groups like lengths
    (padded 20, zero waste)."""
    from spark_streaming_spark.operators import pipeline as PL

    mk = lambda n: " ".join("w" for _ in range(n))
    rows = [(1, mk(1), "en", "s", 1), (2, mk(9), "en", "s", 1),
            (3, mk(1), "en", "s", 1), (4, mk(9), "en", "s", 1)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = {r["policy"]: r
           for r in PL.padding_waste_report(docs, batch_size=2).collect()}
    a, s = out["arrival"], out["sorted"]
    assert a["real_tokens"] == s["real_tokens"] == 20
    assert a["padded_tokens"] == 36 and s["padded_tokens"] == 20
    assert s["waste_ppm"] == 0
    assert a["waste_ppm"] == (1000000 * 16) // 36


def test_shard_plan_partitions_and_balances(spark):
    """Shards partition the corpus exactly (doc counts and chars sum to
    the corpus totals) and every FULL shard's chars land within one
    document of the target (concatenate-and-cut: a shard closes only
    when the tape passes the boundary)."""
    docs = load_table(spark, SF_DIR, "documents")
    rows = sorted(PL.shard_plan(docs).collect(), key=lambda r: r.shard)
    assert sum(r.n_docs for r in rows) == docs.count()
    assert (sum(r.n_chars for r in rows)
            == docs.agg(F.sum("n_chars")).first()[0])
    # shard ids are dense from 0
    assert [r.shard for r in rows] == list(range(len(rows)))
    # cut semantics: re-derive the tape and pin one boundary by hand
    tape = sorted(docs.select("doc_id", "n_chars").collect(),
                  key=lambda r: r.doc_id)
    off, by_shard = 0, {}
    for r in tape:
        sh = off // PL.SHARD_CHARS
        by_shard[sh] = by_shard.get(sh, 0) + 1
        off += r.n_chars
    assert by_shard == {r.shard: r.n_docs for r in rows}


def test_shard_plan_no_single_partition_corpus_exchange(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = PL.shard_plan(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("SinglePartition") <= 1, plan
