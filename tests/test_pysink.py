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


def test_second_append_publishes_new_manifest(spark, tmp_path):
    """Append twice: the manifest is atomically REPLACED with the second
    job's file set (each job publishes what it committed; a reader bound
    to a manifest snapshot sees a consistent set either way)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id").limit(10)
    out = str(tmp_path / "sink4")
    pysink.write_jsonl(docs, out)
    first = set(pysink.manifest_files(out))
    pysink.write_jsonl(docs, out)
    second = set(pysink.manifest_files(out))
    assert first and second and first.isdisjoint(second)
