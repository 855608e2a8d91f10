"""Distributed BPE trainer (operators/bpe.py) pinned against a pure-
Python reference implementation (same algorithm, same tie-break) on the
real sf0.001 corpus — the oracle for an iterative fixpoint no SQL can
express."""

from __future__ import annotations

from collections import Counter

from spark_streaming_spark.operators import bpe
from spark_streaming_spark.operators import bpe as BPE
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Classic word-level BPE: count adjacent symbol pairs weighted by
    word freq, merge the argmax (count desc, pair lexicographic asc),
    leftmost-greedy replace. Returns [(step, left, right, count)]."""
    words = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in words.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, cnt))
        for w, syms in words.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            words[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = [
        (r.step, r.left, r.right, r.pair_count)
        for r in bpe.bpe_train(docs, n_merges=8).orderBy("step").collect()
    ]
    wf = {
        r.word: r.freq for r in bpe.word_freqs(docs).collect()
    }
    want = _reference_bpe(wf, 8)
    assert got == want


def test_bpe_segment_compresses_with_merges(spark):
    docs = load_table(spark, SF_DIR, "documents")
    merges = [
        (r.left, r.right)
        for r in bpe.bpe_train(docs, n_merges=6).orderBy("step").collect()
    ]
    seg0 = {r.doc_id: r.n_subwords
            for r in bpe.bpe_segment(docs, []).collect()}
    seg6 = {r.doc_id: (r.n_words, r.n_subwords)
            for r in bpe.bpe_segment(docs, merges).collect()}
    assert seg0.keys() == seg6.keys()
    total0 = sum(seg0.values())
    total6 = sum(v[1] for v in seg6.values())
    assert total6 < total0  # merges strictly compress this corpus
    # subwords can never undercut the word count
    assert all(n_sub >= n_words for n_words, n_sub in seg6.values())


def test_bpe_train_cache_prefix_stable(spark):
    """Greedy BPE is prefix-stable: slicing a cached longer train must
    equal a fresh shorter train (the contract the merge cache relies on)."""
    docs = load_table(spark, SF_DIR, "documents")
    key = f"test-bpe-{SF_DIR}"
    bpe._MERGE_CACHE.pop(key, None)
    full = [
        (r.step, r.left, r.right, r.pair_count)
        for r in bpe.bpe_train(docs, n_merges=8, cache_key=key)
        .orderBy("step").collect()
    ]
    assert len(bpe._MERGE_CACHE[key]) == 8
    sliced = [
        (r.step, r.left, r.right, r.pair_count)
        for r in bpe.bpe_train(docs, n_merges=5, cache_key=key)
        .orderBy("step").collect()
    ]
    fresh = [
        (r.step, r.left, r.right, r.pair_count)
        for r in bpe.bpe_train(docs, n_merges=5).orderBy("step").collect()
    ]
    assert sliced == fresh == full[:5]
    bpe._MERGE_CACHE.pop(key, None)


def test_bpe_segment_matches_unrolled_sql_oracle(spark, duck):
    """The unrolled-rounds DuckDB twin (bpe_segment_sql) reproduces
    train(6)+segment bit-for-bit — the contract that moved
    bpe_segment_stats out of the rows-only set (VERDICT r8 #5)."""
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    merges = [(r.left, r.right) for r in
              BPE.bpe_train(docs, n_merges=6).orderBy("step").collect()]
    assert_matches_oracle(
        BPE.bpe_segment(docs, merges), duck, BPE.bpe_segment_sql(6))


def test_bpe_sql_exhausted_rounds_are_noops(spark, duck):
    """When the corpus runs out of mergeable pairs before n_merges, the
    engine's bpe_train simply stops early; the unrolled oracle's extra
    rounds must become NO-OPS (the never-matching sentinel pair), not
    empty the vocabulary into a silent zero-row mismatch."""
    from pyspark.sql import Row

    from tests.conftest import assert_matches_oracle

    # 'ab' fully merges after 1 round; 'c' has no pairs at all — any
    # n_merges >= 2 exhausts
    rows = [Row(doc_id=1, text="ab ab c"), Row(doc_id=2, text="c ab")]
    docs = spark.createDataFrame(rows)
    duck.execute("CREATE OR REPLACE TEMP TABLE tiny_docs AS "
                 "SELECT 1 AS doc_id, 'ab ab c' AS text "
                 "UNION ALL SELECT 2, 'c ab'")
    merges = [(r.left, r.right) for r in
              BPE.bpe_train(docs, n_merges=4).orderBy("step").collect()]
    assert len(merges) < 4               # genuinely exhausted
    assert_matches_oracle(
        BPE.bpe_segment(docs, merges), duck,
        BPE.bpe_segment_sql(4, table="tiny_docs"))


def test_fertility_by_lang_bounds_and_consistency(spark):
    """Fertility is >= 1e6 ppm (every word is at least one subword) and
    equals the per-doc segment stats aggregated by hand."""
    from spark_streaming_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [(1, "aa ab aa", "en", "s", 8), (2, "ba ba", "fr", "s", 5)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    merges = [(r.left, r.right) for r in
              BPE.bpe_train(docs, n_merges=2).orderBy("step").collect()]
    fert = {r["lang"]: r for r in
            BPE.bpe_fertility_by_lang(docs, merges).collect()}
    seg = {r["doc_id"]: r for r in
           BPE.bpe_segment(docs, merges).collect()}
    for lang, doc_id in (("en", 1), ("fr", 2)):
        assert fert[lang]["n_words"] == seg[doc_id]["n_words"]
        assert fert[lang]["n_subwords"] == seg[doc_id]["n_subwords"]
        assert fert[lang]["fertility_ppm"] >= 1000000
