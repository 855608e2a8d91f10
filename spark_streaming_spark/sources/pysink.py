"""Custom Python DataSource WRITER (PySpark 4 ``pyspark.sql.datasource``
write API): a partitioned JSON-lines sink with a two-phase atomic
commit — the engine's counterpart of the reference's hand-rolled output
path (``PersistWordCount.java:76-97`` wrote rows to MySQL with per-batch
JDBC inserts and no atomicity; ``/root/reference/README.md:629-681``
discusses exactly the redeliver-on-failure gap this protocol closes).

Protocol (the standard distributed-commit shape, same discipline as
``streaming/pipelines.idempotent_parquet_sink``):

* ``write(iterator)`` runs ON EACH EXECUTOR for its partition and
  writes rows to a UNIQUE ``part-<uuid>.jsonl.tmp`` — no coordination,
  no driver traffic beyond the commit message;
* ``commit(messages)`` runs once on the driver AFTER every partition
  succeeded: it renames each ``.tmp`` to its final name and then
  atomically publishes a ``_MANIFEST`` listing exactly the committed
  files — a reader that honors the manifest can never observe a
  partial write;
* ``abort(messages)`` removes the orphan temporaries, so failed jobs
  leave nothing a manifest-honoring reader would see.

At 100 TB this is the object-store writer pattern (task files +
manifest publish); the local rename stands in for the store's atomic
metadata operation.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _FileCommit(WriterCommitMessage):
    def __init__(self, tmp_name: str, final_name: str):
        self.tmp_name = tmp_name
        self.final_name = final_name


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        stem = f"part-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, stem + ".tmp")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(stem + ".tmp", stem)

    def commit(self, messages):
        final_names = []
        for m in messages:
            if m is None:
                continue
            os.rename(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, m.final_name),
            )
            final_names.append(m.final_name)
        manifest_tmp = os.path.join(self.path, "_MANIFEST.tmp")
        with open(manifest_tmp, "w") as fh:
            fh.write("\n".join(sorted(final_names)))
        os.rename(manifest_tmp, os.path.join(self.path, "_MANIFEST"))

    def abort(self, messages):
        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()`` after
    ``spark.dataSource.register(JsonlSinkDataSource)``."""

    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(JsonlSinkDataSource)


def manifest_files(path: str) -> list[str]:
    """The committed file set — readers that honor the manifest can
    never observe a partial or aborted write."""
    with open(os.path.join(path, "_MANIFEST")) as fh:
        return [ln for ln in fh.read().splitlines() if ln]


def write_jsonl(df, path: str) -> None:
    register(df.sparkSession)
    df.write.format("jsonl_sink").option("path", path).mode("append").save()
