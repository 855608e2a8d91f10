"""Multimodal plumbing: Arrow feature extraction matches a local Python
reference, fake-decode preserves schema/shape, real decode is cleanly
gated on the missing library."""

from __future__ import annotations

import math

import pytest

from spark_streaming_spark.operators import multimodal as MM
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_byte_features_match_python_reference(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = MM.to_media_table(docs)
    got = {r.media_id: r for r in MM.byte_features(media).collect()}
    for row in docs.collect():
        b = row.text.encode()
        n = len(b)
        counts: dict[int, int] = {}
        for x in b:
            counts[x] = counts.get(x, 0) + 1
        ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
        r = got[row.doc_id]
        assert r.n_bytes == n
        assert abs(r.mean_byte - sum(b) / n) < 1e-9
        assert abs(r.byte_entropy - ent) < 1e-9


def test_fake_decode_shape(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(10)
    out = MM.fake_decode_meta(MM.to_media_table(docs))
    rows = out.collect()
    assert len(rows) == 10
    assert set(out.columns) == {"media_id", "width", "height", "format"}
    assert all(r.format == "FAKE" and r.width >= 64 for r in rows)


def test_decode_image_gated(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(1)
    if MM._HAS_PIL:
        pytest.skip("PIL present; decode path live")
    with pytest.raises(NotImplementedError):
        MM.decode_image(MM.to_media_table(docs))


def test_fake_resize_binary_roundtrip(spark):
    """Binary-in/binary-out Arrow plumbing: the fake resize keeps every
    4th payload byte; output binary and lengths must match exactly."""
    from spark_streaming_spark.operators import multimodal as MM

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = MM.to_media_table(docs)
    out = {r.media_id: r for r in MM.fake_resize(media).collect()}
    for row in docs.collect():
        b = row.text.encode("utf-8")
        r = out[row.doc_id]
        assert bytes(r.payload_out) == b[::4]
        assert r.n_bytes_in == len(b)
        assert r.n_bytes_out == len(b[::4])


def test_audio_windows_framing_identity(spark):
    docs = load_table(spark, SF_DIR, "documents")
    media = MM.to_media_table(docs)
    out = MM.audio_windows(media)
    rows = out.collect()
    assert rows, "fixture must contain audio payloads >= one window"
    sizes = {r.media_id: r.n_bytes for r in media.collect()}
    import collections
    per = collections.Counter(r.media_id for r in rows)
    for mid, n_wins in per.items():
        n = sizes[mid]
        # framing identity: floor((n - win) / hop) + 1
        assert n_wins == (n - 200) // 80 + 1
    for r in rows:
        # windows start on hop boundaries and fit the payload fully
        # (win_no <= (n - win) // hop guarantees no overrun)
        assert r.byte_start % 80 == 0
        assert r.byte_start + r.byte_len <= sizes[r.media_id]


def test_byte_features_det_matches_oracle_and_float_twin(spark, duck):
    """The integer twin hash-checks cross-engine AND agrees with the
    float entry's derivable statistics (mean = byte_sum/n_bytes), plus
    the ASCII precondition the oracle depends on."""
    from spark_streaming_spark.operators import multimodal as MM
    from spark_streaming_spark.sources.batch import load_table
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR, assert_matches_oracle
    import __spark_entry__ as E

    docs = load_table(spark, SF_DIR, "documents")
    media = MM.to_media_table(docs)
    assert_matches_oracle(
        MM.byte_features_det(media), duck,
        E.oracle_sql()["media_byte_features_det"])
    # ASCII precondition: byte length == char length for every doc
    bad = docs.filter(
        F.length(F.col("text").cast("binary")) != F.length("text")).count()
    assert bad == 0
    det = {r["media_id"]: r for r in MM.byte_features_det(media).collect()}
    flo = {r["media_id"]: r for r in MM.byte_features(media).collect()}
    assert set(det) == set(flo)
    for mid, d in det.items():
        f = flo[mid]
        assert d["n_bytes"] == f["n_bytes"]
        if d["n_bytes"]:
            assert abs(d["byte_sum"] / d["n_bytes"] - f["mean_byte"]) < 1e-9
