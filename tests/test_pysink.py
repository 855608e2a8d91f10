"""Custom Python DataSource writer (sources/pysink.py): round-trip
fidelity and the two-phase commit protocol's visibility guarantees."""

from __future__ import annotations

import os

from spark_streaming_spark.sources import pysink
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_jsonl_sink_roundtrip_lossless(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text")
    out = str(tmp_path / "sink")
    pysink.write_jsonl(docs, out)
    files = [os.path.join(out, f) for f in pysink.manifest_files(out)]
    assert files and all(os.path.exists(f) for f in files)
    back = spark.read.schema("doc_id bigint, lang string, text string").json(
        files)
    orig = {tuple(r) for r in docs.collect()}
    rt = {tuple(r) for r in back.collect()}
    assert rt == orig


def test_manifest_lists_only_committed_files(spark, tmp_path):
    """No .tmp file may ever appear in the manifest, and every manifest
    entry must exist — a manifest-honoring reader can't see a partial
    write."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    out = str(tmp_path / "sink2")
    pysink.write_jsonl(docs, out)
    files = pysink.manifest_files(out)
    assert files
    assert all(not f.endswith(".tmp") for f in files)
    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert set(files) == on_disk


def test_abort_removes_temporaries(tmp_path):
    """Driver-side protocol check without a Spark job: write() leaves a
    .tmp, abort() removes it, and nothing was ever published."""
    out = str(tmp_path / "sink3")

    class _Row:
        def __init__(self, d):
            self._d = d

        def asDict(self):
            return self._d

    w = pysink._JsonlWriter({"path": out})
    msg = w.write(iter([_Row({"a": 1}), _Row({"a": 2})]))
    assert os.path.exists(os.path.join(out, msg.tmp_name))
    w.abort([msg])
    assert not os.path.exists(os.path.join(out, msg.tmp_name))
    assert not os.path.exists(os.path.join(out, "_MANIFEST"))


def test_second_append_merges_manifest(spark, tmp_path):
    """Append twice: the manifest accumulates BOTH jobs' file sets
    (round-5 VERDICT #1 — 'append' must not drop prior commits from the
    committed set), and every listed file exists."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id").limit(10)
    out = str(tmp_path / "sink4")
    pysink.write_jsonl(docs, out)
    first = set(pysink.manifest_files(out))
    pysink.write_jsonl(docs, out)
    second = set(pysink.manifest_files(out))
    assert first and first < second
    assert len(second) == 2 * len(first)
    assert all(os.path.exists(os.path.join(out, f)) for f in second)


def test_overwrite_replaces_and_cleans(spark, tmp_path):
    """Overwrite publishes only the new job's files and removes the
    superseded data files (publish-then-clean)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id").limit(10)
    out = str(tmp_path / "sink5")
    pysink.write_jsonl(docs, out)
    first = set(pysink.manifest_files(out))
    pysink.write_jsonl(docs, out, mode="overwrite")
    second = set(pysink.manifest_files(out))
    assert second and first.isdisjoint(second)
    assert all(not os.path.exists(os.path.join(out, f)) for f in first)
    assert all(os.path.exists(os.path.join(out, f)) for f in second)


def test_epoch_commit_is_idempotent(spark, tmp_path):
    """A replayed epoch (same epoch_id delivered twice — recovery after
    a failure that postdated the sink commit) must not duplicate rows:
    the second delivery sees its prefix in the manifest and is a no-op."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id").limit(10)
    out = str(tmp_path / "sink6")
    handler = pysink.foreach_batch_jsonl(out)
    handler(docs, 7)
    first = set(pysink.manifest_files(out))
    handler(docs, 7)  # replay
    assert set(pysink.manifest_files(out)) == first
    handler(docs, 8)  # next epoch appends
    second = set(pysink.manifest_files(out))
    assert first < second
    assert all(f.startswith("epoch-") for f in second)


def test_stream_jsonl_equals_batch(spark, tmp_path):
    """The streamed spelling commits every micro-batch's rows exactly
    once: reading back the manifest set equals the batch table."""
    from spark_streaming_spark.streaming import replay

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang").limit(50)
    src = replay.chunk_to_dir(docs, 3)
    out = str(tmp_path / "sink7")
    try:
        pysink.stream_jsonl(replay.stream_from_dir(spark, src), out)
    finally:
        replay.cleanup(src)
    files = [os.path.join(out, f) for f in pysink.manifest_files(out)]
    back = spark.read.schema("doc_id bigint, lang string").json(files)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in docs.collect()}


def test_write_jsonl_guards_non_local_master(spark, tmp_path):
    """The two-phase commit renames executor files on the driver — only
    valid with a shared filesystem; a non-local master must be refused."""
    import pytest

    class _FakeConf:
        def get(self, key, default=None):
            return "spark://cluster:7077" if key == "spark.master" else default

    class _FakeSession:
        conf = _FakeConf()

    with pytest.raises(RuntimeError, match="shared"):
        pysink._require_shared_fs(_FakeSession())
