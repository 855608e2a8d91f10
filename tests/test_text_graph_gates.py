"""Readability / clustering-coefficient / assortativity / SymSpell
fuzzy-join tier: semantic pins on hand-computed cases."""

from __future__ import annotations

from pyspark.sql import functions as F
from spark_streaming_spark.operators import basket as BK
from spark_streaming_spark.operators import dedup as DD
from spark_streaming_spark.operators import textstats as TX


def test_readability_hand_counts(spark):
    """'The cat sat. The dog ran!' -> 6 words, 2 sentence runs,
    6 vowel runs; FK = (39*36 + 1180*12 - 1559*12) / 1200."""
    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!", "en")],
        "doc_id LONG, text STRING, lang STRING")
    r = TX.readability_by_lang(docs).collect()[0]
    assert (r.n_docs, r.n_words, r.n_sentences, r.n_syllables) \
        == (1, 6, 2, 6)
    expected = (39 * 36 + 1180 * 12 - 1559 * 12) / 1200.0
    assert abs(r.fk_grade - expected) < 1e-12


def test_readability_punctuation_free_floors_sentences(spark):
    """The synthetic corpus has no sentence marks: each doc still
    counts as one sentence, keeping the grade defined."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en"), (2, "delta", "en")],
        "doc_id LONG, text STRING, lang STRING")
    r = TX.readability_by_lang(docs).collect()[0]
    assert r.n_sentences == 2 and r.n_docs == 2 and r.n_words == 4


def test_clustering_coefficient_triangle_plus_pendant(spark):
    """Triangle {1,2,3} with pendant 4-3: cc(1)=cc(2)=1.0,
    cc(3)=1/3, node 4 (degree 1) excluded."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "part_a LONG, part_b LONG")
    rows = {r.part_id: r
            for r in BK.clustering_coefficients(edges).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].cc == 1.0 and rows[2].cc == 1.0
    assert abs(rows[3].cc - 1.0 / 3.0) < 1e-12
    assert rows[3].degree == 3 and rows[3].n_triangles == 1


def test_assortativity_star_is_minus_one(spark):
    """K_{1,3}: every edge joins the hub (deg 3) to a leaf (deg 1) —
    perfectly disassortative, r = -1."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "part_a LONG, part_b LONG")
    r = BK.degree_assortativity(edges).collect()[0]
    assert r.n_edges == 3
    assert abs(r.r - (-1.0)) < 1e-12


def test_assortativity_regular_graph_degenerate_null(spark):
    """A cycle is degree-regular: zero degree variance -> r NULL (the
    zero-denominator guard on both engines)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "part_a LONG, part_b LONG")
    r = BK.degree_assortativity(edges).collect()[0]
    assert r.r is None


def _brute_pairs(names):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]
    return {(a, b) for a in names for b in names
            if a < b and lev(a, b) <= 1}


def test_fuzzy_pairs_match_bruteforce(spark):
    """The SymSpell variant join must find EXACTLY the brute-force
    distance-1 pairs: substitutions, insertions and deletions."""
    names = ["abc", "abd", "ab", "xyz", "abcd", "qq"]
    t = spark.createDataFrame([(n,) for n in names], "c_name STRING")
    got = {(r.name_a, r.name_b)
           for r in DD.fuzzy_name_pairs(t, "c_name").collect()}
    assert got == _brute_pairs(names)
    assert ("abc", "abd") in got and ("ab", "abc") in got
    assert ("abc", "abcd") in got


def test_fuzzy_pairs_variant_join_has_no_cartesian(spark):
    """The blocked plan must be an equi-join on the variant — never a
    cartesian/BNLJ (the property that makes it scale)."""
    t = spark.createDataFrame([("aa",), ("ab",)], "c_name STRING")
    plan = DD.fuzzy_name_pairs(t, "c_name")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cf_map_bounded_by_hitrate(spark):
    """AP@k <= 1 with equality only on a perfect ranking, and AP = 0 on
    a miss — so MAP <= HitRate always, and the hit-user counts of the
    two evals must agree exactly (same split, same recs)."""
    from tests.conftest import SF_DIR
    from spark_streaming_spark.sources.batch import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    rank = BK.cf_ranking_eval(li, od, cache_key="t#cf").collect()[0]
    m = BK.cf_map_eval(li, od, cache_key="t#cf").collect()[0]
    assert m.n_eval == rank.n_eval
    assert m.n_hit_users == rank.n_hits
    assert 0 <= m.map_ppm <= rank.hit_rate_ppm


def test_record_linkage_weights_hand_case(spark):
    """Two distance-1 names with full attribute agreement score
    40+20+15+10 = 85 (match); full disagreement scores 40-10-5 = 25
    (non_match); nation-only agreement 40+20-5+0 = 55 (possible)."""
    cust = spark.createDataFrame(
        [("aa", 1, "AUTO", 10.0), ("ab", 1, "AUTO", 10.5),
         ("zz", 2, "BIKE", 5000.0), ("zy", 3, "AUTO", 1.0),
         ("mm", 7, "SHIP", 100.0), ("mn", 7, "RAIL", 900.0)],
        "c_name STRING, c_nationkey INT, c_mktsegment STRING,"
        " c_acctbal DOUBLE")
    rows = {(r.name_a, r.name_b): r
            for r in DD.record_linkage_scores(cust).collect()}
    assert rows[("aa", "ab")].score == 85
    assert rows[("aa", "ab")].decision == "match"
    assert rows[("zy", "zz")].score == 25
    assert rows[("zy", "zz")].decision == "non_match"
    assert rows[("mm", "mn")].score == 55
    assert rows[("mm", "mn")].decision == "possible"


def test_cf_ndcg_hit_agreement_and_range(spark):
    """NDCG@3 rides the same split artifact as HitRate/MAP: the set of
    users with any hit agrees across the three evals, and the mean
    ndcg_ppm sits in (0, 1e6]-range with the pinned literals."""
    from spark_streaming_spark.operators import basket as BK
    from spark_streaming_spark.sources.batch import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    rank = BK.cf_ranking_eval(li, od, cache_key="t#ndcg").collect()[0]
    ndcg = BK.cf_ndcg_eval(li, od, cache_key="t#ndcg").collect()[0]
    assert ndcg.n_eval == rank.n_eval
    assert ndcg.n_hit_users == rank.n_hits
    assert 0 <= ndcg.ndcg_ppm <= 1000000
    if ndcg.n_hit_users > 0:
        assert ndcg.ndcg_ppm > 0 or ndcg.n_eval > 1000000 * ndcg.n_hit_users
