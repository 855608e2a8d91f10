"""Deterministic sampling invariants: stability under repartitioning
(the property df.sample(seed) does NOT have), salt independence, and
stratum rate targeting."""

from __future__ import annotations

from spark_streaming_spark.operators import sampling as SMP
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_sample_stable_under_repartitioning(spark):
    docs = load_table(spark, SF_DIR, "documents")
    base = _ids(SMP.deterministic_sample(docs, permille=200))
    shuffled = _ids(SMP.deterministic_sample(docs.repartition(7), permille=200))
    assert base == shuffled
    coalesced = _ids(SMP.deterministic_sample(docs.coalesce(1), permille=200))
    assert base == coalesced


def test_sample_monotone_in_rate_and_salted(spark):
    docs = load_table(spark, SF_DIR, "documents")
    small = _ids(SMP.deterministic_sample(docs, permille=100))
    big = _ids(SMP.deterministic_sample(docs, permille=300))
    assert small <= big  # growing the rate only ADDS rows (stable expansion)
    other_salt = _ids(SMP.deterministic_sample(docs, permille=100, salt="s2"))
    assert other_salt != small  # a new salt draws an independent sample


def test_stratified_rates_targeted(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = SMP.stratified_sample(
        docs, permille={"en": 0, "fr": 1000}, default_permille=500
    )
    rows = out.groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in rows}
    n_fr = docs.filter("lang = 'fr'").count()
    assert "en" not in got           # rate 0 drops the stratum entirely
    assert got.get("fr") == n_fr     # rate 1000 keeps it entirely


def test_mixture_rebalance_hits_target_shares(spark):
    """Derived rates must realize the target mixture (up to hash
    granularity) and never oversample a stratum beyond its supply."""
    from pyspark.sql import functions as F

    from spark_streaming_spark.operators.sampling import mixture_rebalance
    from spark_streaming_spark.sources.batch import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    target = {"en": 400000, "de": 150000, "es": 150000,
              "fr": 150000, "zh": 150000}
    out = mixture_rebalance(docs, target)
    got = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(got.values())
    assert total > 0
    assert set(got) <= set(target)
    for lang, n in got.items():
        share = n / total
        want = target[lang] / 1e6
        # permille quantization + hash variance on small strata: generous
        # but directional — en must dominate, minors must be comparable
        assert abs(share - want) <= 0.15, (lang, share, want)
    # determinism under repartitioning
    re = mixture_rebalance(docs.repartition(13), target)
    assert out.exceptAll(re).count() == 0 and re.exceptAll(out).count() == 0
    # subset of input
    assert out.join(docs, "doc_id", "left_anti").count() == 0


def test_weighted_systematic_sample_pps_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = SMP.weighted_systematic_sample(docs, n_target=50)
    rows = out.collect()
    total_w = docs.agg({"n_chars": "sum"}).collect()[0][0]
    stride = max(1, total_w // 50)
    # total picks = floor(total/stride): within one of the target
    assert sum(r.n_picks for r in rows) == total_w // stride
    for r in rows:  # interval (cum-w, cum] spans each claimed boundary
        assert r.n_picks == r.cum // stride - (r.cum - r.w) // stride
        assert r.n_picks >= 1
    # partitioning invariance: the layout-independence df.sample lacks
    re = SMP.weighted_systematic_sample(docs.repartition(13), n_target=50)
    assert out.exceptAll(re).count() == 0 and re.exceptAll(out).count() == 0


def test_stratum_allocation_largest_remainder(spark):
    """Hamilton hand cases. Strata 5/3/1 rows, budget 7: quotas
    35/9, 21/9, 7/9 -> floors 3/2/0, remainders 8/3/7, leftover 2
    seats go to the two largest remainders (a, c) -> 4/2/1. Strata
    4/3/3, budget 10: exact quotas, no leftovers. Sum == budget."""
    from spark_streaming_spark.operators.sampling import (
        stratum_allocation)

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "lang string")
    out = {r["stratum"]: r["alloc"]
           for r in stratum_allocation(df, "lang", budget=7).collect()}
    assert out == {"a": 4, "b": 2, "c": 1}
    assert sum(out.values()) == 7

    even = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 3 + [("c",)] * 3, "lang string")
    out2 = {r["stratum"]: r["alloc"]
            for r in stratum_allocation(even, "lang", budget=10).collect()}
    assert out2 == {"a": 4, "b": 3, "c": 3}


def test_temperature_mixture_flattens_and_sums_exact(spark):
    """Tempered shares must (a) sum to EXACTLY the ppm budget (Hamilton
    invariant), (b) upweight the scarce stratum relative to its raw
    share and downweight the dominant one — the alpha=0.5 flattening
    contract."""
    from spark_streaming_spark.operators import sampling as SMP

    rows = ([(i, "t", "en", "s", 1) for i in range(90)]
            + [(100 + i, "t", "sw", "s", 1) for i in range(10)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = {r["stratum"]: r
           for r in SMP.temperature_mixture(docs).collect()}
    assert sum(r["raw_ppm"] for r in out.values()) == 1000000
    assert sum(r["temp_ppm"] for r in out.values()) == 1000000
    assert out["sw"]["temp_ppm"] > out["sw"]["raw_ppm"]
    assert out["en"]["temp_ppm"] < out["en"]["raw_ppm"]
    # sqrt weights 3:1 -> tempered shares 750000 / 250000 exactly
    assert out["en"]["temp_ppm"] == 750000
    assert out["sw"]["temp_ppm"] == 250000
