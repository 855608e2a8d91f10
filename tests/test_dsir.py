"""DSIR importance weighting (operators/dsir.py): pinned log-table
validity, hand-checked bucket/weight arithmetic, negative-mean DIV
parity, and the DuckDB twin on a fixture."""
from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from spark_streaming_spark.operators import dsir as DS


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")


def _bucket(feature: str, dim: int = DS.DSIR_BUCKETS) -> int:
    return int(hashlib.md5(feature.encode()).hexdigest()[:8], 16) % dim


def _L(x: int) -> int:
    e = x.bit_length() - 1
    j = (x * 32) // (2 ** e) - 32
    return 1_000_000 * e + DS._LOG2_MANT_PPM[j]


def test_pinned_log_table_matches_math_log2():
    # the 32 literals must be exactly floor(1e6*(log2(32+j)-5)) — the
    # pinned-literal discipline's revalidation hook
    for j, v in enumerate(DS._LOG2_MANT_PPM):
        assert v == math.floor(1e6 * (math.log2(32 + j) - 5)), j
    assert len(DS._LOG2_MANT_PPM) == 32


def test_log2_ppm_sql_exact_in_spark_and_duckdb(spark, duck):
    probes = [1, 2, 3, 5, 31, 32, 33, 63, 64, 1000, 999_983,
              2 ** 40 + 12_345, 2 ** 56 + 7]
    sdf = spark.range(1).selectExpr(
        *[f"CAST({DS.log2_ppm_sql(str(x))} AS BIGINT) AS v{i}"
          for i, x in enumerate(probes)])
    srow = sdf.collect()[0]
    drow = duck.execute(
        "SELECT " + ", ".join(DS.log2_ppm_sql(str(x), "//")
                              for x in probes)).fetchone()
    for i, x in enumerate(probes):
        assert srow[i] == drow[i] == _L(x), x


def test_doc_bucket_counts_features(spark):
    # "a b" → features {a, b, a\x01b}; counts per (doc, bucket)
    docs = _docs(spark, [(1, "a b", "en"), (2, "", "en")])
    rows = DS.doc_bucket_counts(docs).collect()
    got = {(r.doc_id, r.bucket): r.cnt for r in rows}
    want: dict = {}
    for f in ["a", "b", "a" + chr(1) + "b"]:
        k = (1, _bucket(f))
        want[k] = want.get(k, 0) + 1
    assert got == want  # empty doc emits nothing


def test_weights_hand_case(spark):
    # one en doc "a a" (target), one fr doc "b b" (source-only):
    # features en = {a:2, a^Aa:1}, fr = {b:2, b^Ab:1}
    docs = _docs(spark, [(1, "a a", "en"), (2, "b b", "fr")])
    tot = {r.bucket: (r.tgt_c, r.src_c)
           for r in DS.bucket_totals(docs).collect()}
    n_t = sum(t for t, _ in tot.values())
    n_s = sum(s for _, s in tot.values())
    assert (n_t, n_s) == (3, 6)
    B = DS.DSIR_BUCKETS
    w = {r.bucket: r.lw_ppm for r in DS.bucket_log_ratios(
        DS.bucket_totals(docs)).collect()}
    for b, (tc, sc) in tot.items():
        expect = (_L(tc + 1) - _L(n_t + B)) - (_L(sc + 1) - _L(n_s + B))
        assert w[b] == expect, b
    out = {r.doc_id: r for r in DS.dsir_importance_weights(docs).collect()}
    # en doc scores strictly above the fr doc (its features are in-target)
    assert out[1].mean_lw_ppm > out[2].mean_lw_ppm
    # fr features have tgt_c=0 -> ratio < 1 -> negative log weight
    assert out[2].lw_sum_ppm < 0
    # mean must FLOOR consistently on the negative side (offset trick):
    for r in out.values():
        off = DS._MEAN_OFFSET_PPM
        assert r.mean_lw_ppm == \
            (r.lw_sum_ppm + off * r.n_feats) // r.n_feats - off
    # acceptance clamps into [0, 1e6] and the draw is the md5 rule
    for r in out.values():
        assert 0 <= r.accept_ppm <= 1_000_000
        h = int(hashlib.md5(f"dsir#{r.doc_id}".encode())
                .hexdigest()[:15], 16) % 1_000_000
        assert r.sampled == int(h < r.accept_ppm)


def test_matches_duckdb_twin_on_fixture(spark, tmp_path):
    import duckdb

    docs = _docs(spark, [
        (1, "the quick brown fox jumps", "en"),
        (2, "the the the the", "en"),
        (3, "le renard brun rapide", "fr"),
        (4, "the brown dog sleeps", "en"),
        (5, "renard le le brun", "fr"),
        (6, "", "de"),
        (7, "x", "zh"),
    ])
    pq = str(tmp_path / "documents.parquet")
    docs.write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    want = sorted(map(tuple, con.execute(DS.dsir_sql()).fetchall()))
    got = sorted(tuple(r) for r in DS.dsir_importance_weights(docs)
                 .collect())
    assert got == want
