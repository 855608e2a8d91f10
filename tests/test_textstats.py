"""Text-analysis semantics: language-ID heuristic quality and fingerprint
clustering behavior (beyond the oracle hash checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_spark.operators import textstats as TX
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_lang_guess_behavior(spark):
    """The driver's synthetic corpus draws text and the `lang` label
    independently (verified: per-language word distributions are
    identical), so accuracy against the label is meaningless here. Assert
    the operator's *behavior*: total coverage, closed label set, and
    monotonicity — guessed-'en' docs have stopword ratios strictly above
    guessed-'other' docs on average."""
    docs = load_table(spark, SF_DIR, "documents")
    g = TX.lang_guess(docs)
    assert g.count() == docs.count()
    labels = {r.lang_guess for r in g.select("lang_guess").distinct().collect()}
    assert labels <= {"en", "other"}
    from spark_streaming_spark.functions.text import stopword_ratio
    joined = g.join(docs.select("doc_id", "text"), "doc_id").select(
        "lang_guess", stopword_ratio("text").alias("sr")
    )
    means = {
        r.lang_guess: r.m
        for r in joined.groupBy("lang_guess").agg(F.avg("sr").alias("m")).collect()
    }
    if {"en", "other"} <= set(means):
        assert means["en"] > means["other"]


def test_fingerprint_clusters_exact_dupes(spark):
    """Identical texts must always share a fingerprint."""
    docs = load_table(spark, SF_DIR, "documents")
    per_text = (
        TX.doc_fingerprints(docs)
        .join(docs.select("doc_id", "text"), "doc_id")
        .groupBy("text")
        .agg(F.countDistinct("fp").alias("nfp"))
    )
    assert per_text.filter(F.col("nfp") > 1).count() == 0


def test_winnow_guarantee(spark):
    """The winnowing guarantee (Schleimer et al. 2003 Thm: any shared
    substring of ≥ w + k - 1 tokens yields a shared selected
    fingerprint): two docs sharing a 10-token run must share ≥ 1 fp
    value; two docs with disjoint vocabularies must share none."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "x1 y1 z1 " + shared + " q1 r1"),
        (2, shared + " mm nn oo pp"),
        (3, "aa bb cc dd ee ff gg hh ii jj kk ll"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = TX.winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 10-token run must share a fp"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnow_density_and_coverage(spark, duck):
    """Every document keeps ≥1 fingerprint; selection is sparse (well
    under the full shingle set — the point of winnowing); exact vs the
    DuckDB window-spelling oracle (map-only array plan vs window plan)."""
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = TX.winnow_fingerprints(docs)
    n_docs = docs.count()
    assert out.select("doc_id").distinct().count() == n_docs
    n_shingles = docs.select(
        F.explode(F.split("text", " ")).alias("t")).count()
    assert out.count() < 0.6 * n_shingles
    assert_matches_oracle(out, duck, E.oracle_sql()["winnow_fingerprints"])
    assert_matches_oracle(
        TX.winnow_overlap(docs), duck, E.oracle_sql()["winnow_overlap"])


def test_bpe_token_stats(spark, duck):
    """BPE-ish regex token counts: ≥ whitespace counts (punctuation
    splits off) and exact vs the DuckDB regex oracle."""
    import __spark_entry__ as E
    from spark_streaming_spark.operators.textstats import bpe_token_stats
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = bpe_token_stats(docs)
    assert out.filter("n_bpe_tokens < n_ws_tokens").count() == 0
    assert_matches_oracle(out, duck, E.oracle_sql()["bpe_token_stats"])


def test_vocab_build_coverage_curve(spark):
    from spark_streaming_spark.operators.textstats import vocab_build
    from spark_streaming_spark.plans import explain

    docs = load_table(spark, SF_DIR, "documents")
    out = vocab_build(docs, n=20).collect()
    assert len(out) == 20
    # ranks are 1..50, counts non-increasing, coverage strictly increasing
    by_rank = sorted(out, key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == list(range(1, 21))
    cnts = [r.cnt for r in by_rank]
    assert cnts == sorted(cnts, reverse=True)
    covs = [r.cum_coverage for r in by_rank]
    assert all(b > a for a, b in zip(covs, covs[1:]))
    assert 0 < covs[-1] <= 1.0
    # scale posture: top-n is TakeOrderedAndProject, count partial-aggs
    df = vocab_build(docs)
    assert explain.has_take_ordered(df)
    assert explain.has_partial_aggregate(df)


def test_token_drift_hand_case(spark):
    """TV drift on a 2-doc corpus, checked against the hand-computed
    exact value: A = {a:2, b:1} (tot 3), B = {a:1, b:3} (tot 4) →
    TV = ½(|2/3−1/4| + |1/3−3/4|) = 10/24 → 416666 ppm (floor)."""
    from spark_streaming_spark.operators.textstats import (
        token_drift_tv, top_drift_tokens)

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a b b b")], ["doc_id", "text"])
    row = token_drift_tv(docs).collect()[0]
    assert (row.tot_a, row.tot_b, row.n_tokens, row.tv_ppm) == \
        (3, 4, 2, 416666)
    top = sorted(top_drift_tokens(docs).collect(), key=lambda r: r.rank)
    # equal numerators (5 and 5) tie-break on the token string
    assert [(r.token, r.cnt_a, r.cnt_b, r.drift_ppm, r.rank)
            for r in top] == [("a", 2, 1, 416666, 1),
                              ("b", 1, 3, 416666, 2)]
    # identical shards → zero drift
    same = spark.createDataFrame(
        [(0, "x y"), (1, "x y")], ["doc_id", "text"])
    assert token_drift_tv(same).collect()[0].tv_ppm == 0


def test_token_drift_oracle(spark, duck):
    import __spark_entry__ as E
    from spark_streaming_spark.operators.textstats import (
        token_drift_tv, top_drift_tokens)
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    row = token_drift_tv(docs).collect()[0]
    assert 0 <= row.tv_ppm <= 1_000_000
    assert_matches_oracle(token_drift_tv(docs), duck,
                          E.oracle_sql()["token_drift_tv"])
    assert_matches_oracle(top_drift_tokens(docs), duck,
                          E.oracle_sql()["top_drift_tokens"])


def test_phrase_search_matches_bruteforce(spark, duck):
    """Every reported (doc_id, pos) is a true occurrence, and no true
    occurrence is missed — checked against a driver-side scan; repeated
    tokens inside the phrase must not confuse the positional joins."""
    import __spark_entry__ as E
    from spark_streaming_spark.operators.textstats import phrase_search
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    texts = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    phrase = "slow hash batch".split(" ")
    truth = {(did, i) for did, toks in texts.items()
             for i in range(len(toks) - 2)
             if toks[i:i + 3] == phrase}
    got = {(r.doc_id, r.pos) for r in phrase_search(docs).collect()}
    assert got == truth
    assert_matches_oracle(phrase_search(docs), duck,
                          E.oracle_sql()["phrase_search"])
    # duplicated-token phrase on a crafted corpus
    tiny = spark.createDataFrame(
        [(1, "a a b a a b a"), (2, "a b a a")], ["doc_id", "text"])
    got2 = {(r.doc_id, r.pos)
            for r in phrase_search(tiny, "a a b").collect()}
    assert got2 == {(1, 0), (1, 3)}


def test_counts_fold_sink_additive_and_replay_idempotent(spark, tmp_path):
    """The drift count table folds additively: two half-corpus batches
    reproduce the one-shot table; replaying an epoch rewrites the same
    version (the sketch sinks' exactly-once argument)."""
    from spark_streaming_spark.operators.textstats import (
        drift_token_counts, token_drift_tv)
    from spark_streaming_spark.streaming.pipelines import counts_fold_sink

    docs = load_table(spark, SF_DIR, "documents")
    sink = counts_fold_sink(spark, drift_token_counts, ["token"],
                            ["cnt_a", "cnt_b"], str(tmp_path))
    sink(docs.filter("doc_id % 3 = 0"), 0)
    sink(docs.filter("doc_id % 3 <> 0"), 1)
    v1 = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "v1")).collect()))
    sink(docs.filter("doc_id % 3 <> 0"), 1)  # epoch replay
    assert sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "v1")).collect())) == v1
    assert v1 == sorted(map(tuple, drift_token_counts(docs).collect()))
    folded = spark.read.parquet(str(tmp_path / "v1"))
    assert token_drift_tv(None, counts=folded).collect() == \
        token_drift_tv(docs).collect()


def test_proximity_search_matches_oracle_and_bounds(spark, duck):
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = TX.proximity_search(docs, "slow", "hash", slop=3)
    assert_matches_oracle(out, duck, E.oracle_sql()["proximity_search"])
    rows = out.collect()
    assert rows
    for r in rows:
        assert 1 <= r["gap"] <= 3 and r["pos_b"] == r["pos_a"] + r["gap"]
    # proximity is monotone in slop: the tighter window is a subset
    tight = {(r["doc_id"], r["pos_a"]) for r in
             TX.proximity_search(docs, "slow", "hash", slop=1).collect()}
    loose = {(r["doc_id"], r["pos_a"]) for r in rows}
    assert tight <= loose


def test_doc_top_terms_matches_oracle_and_ranks(spark, duck):
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = TX.doc_top_terms(docs, k=3)
    assert_matches_oracle(out, duck, E.oracle_sql()["doc_top_terms"])
    rows = out.collect()
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r["doc_id"]].append((r["rnk"], r["score"], r["term"]))
    for doc, lst in per.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        for a, b in zip(lst, lst[1:]):
            # rank order follows (score DESC, term ASC)
            assert a[1] > b[1] or (a[1] == b[1] and a[2] < b[2])


def test_bigram_pmi_matches_oracle_and_semantics(spark, duck):
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = TX.bigram_pmi(docs, min_count=5, k=20)
    assert_matches_oracle(out, duck, E.oracle_sql()["bigram_pmi"])
    rows = out.collect()
    assert 0 < len(rows) <= 20
    assert all(r["c_ab"] >= 5 for r in rows)
    # pmi_ppm really is the integer ratio of brute-forced Python counts
    from collections import Counter

    texts = [r["text"] for r in docs.collect()]
    uni: Counter = Counter()
    big: Counter = Counter()
    for t in texts:
        ws = [w for w in t.split(" ") if w != ""]
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n = sum(big.values())
    for r in rows[:5]:
        want = (n * 1_000_000 * big[(r["w_a"], r["w_b"])]) \
            // (uni[r["w_a"]] * uni[r["w_b"]])
        assert r["pmi_ppm"] == want, (r, want)


def test_lang_diversity_matches_oracle_and_brute_force(spark, duck):
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = TX.lang_diversity(docs)
    assert_matches_oracle(out, duck, E.oracle_sql()["lang_diversity"])
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for r in docs.collect():
        per[r["lang"]].update(w for w in r["text"].split(" ") if w)
    for r in out.collect():
        c = per[r["lang"]]
        n = sum(c.values())
        assert r["n_tokens"] == n and r["n_types"] == len(c)
        coll = sum(v * (v - 1) for v in c.values())
        assert r["collision_ppm"] == (1_000_000 * coll) // (n * (n - 1))


def test_chi2_terms_matches_oracle_and_scipy_shape(spark, duck):
    """chi2 ranking: oracle bit-match and each reported statistic equals
    the brute-force 2x|langs| contingency chi-square to quantizer
    tolerance (7dp per cell)."""
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    out = TX.chi2_terms(docs, k=20)
    assert_matches_oracle(out, duck, E.oracle_sql()["chi2_terms"])
    rows = docs.collect()
    n = len(rows)
    from collections import Counter, defaultdict

    cc = Counter(r["lang"] for r in rows)
    pres = defaultdict(Counter)   # term -> lang -> docs containing
    for r in rows:
        for w in set(x for x in r["text"].split(" ") if x):
            pres[w][r["lang"]] += 1
    for r in out.collect():
        t = r["term"]
        rt = sum(pres[t].values())
        assert r["df"] == rt
        want = 0.0
        for lang, c in cc.items():
            o = pres[t].get(lang, 0)
            e = rt * c / n
            if e > 0:
                want += round((o - e) ** 2 / e, 7)
            e2 = (n - rt) * c / n
            if e2 > 0:
                want += round(((c - o) - e2) ** 2 / e2, 7)
        assert abs(r["chi2"] - want) < 1e-6, (t, r["chi2"], want)


def test_vocab_coverage_oov_rule(spark):
    """The vocab is (cnt DESC, token ASC) top-k: with vocab_size=2 on
    'a a a b b c' the vocab is {a, b}; doc 2's lone 'c' is 100% OOV."""
    from spark_streaming_spark.operators import textstats as TX

    docs = spark.createDataFrame(
        [(1, "a a a b b"), (2, "c"), (3, "a c b a")],
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in TX.vocab_coverage(docs, vocab_size=2).collect()}
    assert out[1]["n_oov"] == 0 and out[1]["oov_ppm"] == 0
    assert out[2]["n_oov"] == 1 and out[2]["oov_ppm"] == 1000000
    assert out[3]["n_tokens"] == 4 and out[3]["n_oov"] == 1
    assert out[3]["oov_ppm"] == 250000


def test_textrank_numpy_pin(spark):
    """Independent numpy reconstruction of the quantized power
    iteration on a hand corpus — pins edge build (window 2, min_w,
    symmetric) and the rank arithmetic against a non-Spark
    implementation. The connective hub 'spark' must out-rank the
    fringe words."""
    import numpy as np

    from spark_streaming_spark.operators import textstats as TX

    docs = spark.createDataFrame(
        [(1, "spark fast spark fast spark join"),
         (2, "join spark fast spark"),
         (3, "slow spark slow spark")], "doc_id long, text string")
    got = {r["term"]: r["rank"]
           for r in TX.textrank_keywords(docs, k=10).collect()}

    # numpy twin: build the same edges
    from collections import Counter
    edges = Counter()
    for t in ["spark fast spark fast spark join",
              "join spark fast spark", "slow spark slow spark"]:
        w = t.split()
        for a, b in zip(w, w[1:]):
            edges[(a, b)] += 1
            edges[(b, a)] += 1
    edges = {e: c for e, c in edges.items() if c >= 2}
    nodes = sorted({a for a, _ in edges})
    outw = {a: sum(c for (x, _), c in edges.items() if x == a)
            for a in nodes}
    r = {a: 1.0 / len(nodes) for a in nodes}
    for _ in range(3):
        s = {a: 0.0 for a in nodes}
        for (a, b), c in edges.items():
            s[b] += float(np.round(r[a] * c / outw[a], 7))
        r = {a: (1.0 - 0.85) / len(nodes) + 0.85 * s[a] for a in nodes}
    for a in nodes:
        assert got[a] == r[a], (a, got[a], r[a])
    assert max(got, key=got.get) == "spark"


def test_gopher_repetition_hand_cases(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a a a a a b c"),      # 8/10 top token: gated
         (2, "a b c d e f g h i j"),      # all distinct: kept
         (3, "a b a b a b a b a b"),      # looped bigrams: gated
         (4, "x"),                        # single token: bigram ppm 1e6
         (5, "ab c a bc")],               # separator collision probe
        "doc_id LONG, text STRING")
    rows = {r.doc_id: r for r in
            TX.gopher_repetition_report(docs).collect()}
    assert (rows[1].top1_cnt, rows[1].top_token_ppm, rows[1].keep) \
        == (8, 800_000, 0)
    # doc 2: distinct bigrams 9/9, top token 1/10
    assert (rows[2].distinct_bigram_ppm, rows[2].top_token_ppm,
            rows[2].keep) == (1_000_000, 100_000, 1)
    # doc 3: 9 bigrams, only {ab, ba} distinct -> 222222 ppm, and the
    # top token holds 5/10 -> both rules gate it
    assert (rows[3].n_bigrams, rows[3].distinct_bigrams,
            rows[3].distinct_bigram_ppm, rows[3].keep) \
        == (9, 2, 222_222, 0)
    # single-token doc: zero bigrams, ratio pinned to 1e6, top 100%
    assert (rows[4].n_bigrams, rows[4].distinct_bigram_ppm,
            rows[4].top_token_ppm, rows[4].keep) == (0, 1_000_000,
                                                     1_000_000, 0)
    # collision probe: ("ab","c") and ("a","bc") must stay DISTINCT
    # bigrams — a separator-less concat would collide them (2 not 3)
    assert (rows[5].n_bigrams, rows[5].distinct_bigrams) == (3, 3)


def test_gopher_bigram_separator_no_collision_duckdb(spark, duck):
    """The chr(1) separator must keep ("ab","c") apart from
    ("a","bc") in BOTH engines — and no raw \\x01 byte may appear in
    source (it is invisible and editor-fragile)."""
    import re
    import pathlib
    src = pathlib.Path(TX.__file__).read_bytes()
    assert b"\x01" not in src
    duck.execute("CREATE OR REPLACE TABLE _coll(doc_id BIGINT,"
                 " text VARCHAR)")
    duck.execute("INSERT INTO _coll VALUES (5, 'ab c a bc')")
    sql = re.sub(r"\bdocuments\b", "_coll", TX.GOPHER_REPETITION_SQL)
    (doc_id, n_tok, top1, _, n_bg, dist_bg, _, _) = \
        duck.execute(sql).fetchall()[0]
    assert (doc_id, n_bg, dist_bg) == (5, 3, 3)
    duck.execute("DROP TABLE _coll")


def test_gopher_repetition_matches_duckdb_twin(spark, duck):
    from spark_streaming_spark.sources.batch import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    got = sorted(tuple(r) for r in
                 TX.gopher_repetition_report(docs).collect())
    want = sorted(map(tuple,
                      duck.execute(TX.GOPHER_REPETITION_SQL).fetchall()))
    assert got == want
