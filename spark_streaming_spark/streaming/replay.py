"""Deterministic bounded-stream replay.

The reference was tested by hand-feeding netcat lines and eyeballing
console output (``/root/reference/README.md:93-95``); Structured
Streaming's stream/batch equivalence lets us do it properly: chunk a
batch DataFrame into k files, stream them back one file per trigger with
``trigger(availableNow=True)``, and assert the streamed result equals the
batch result. Every streaming pipeline in this package is checked that
way — including by the driver's DuckDB oracle, since the streamed output
of a correct pipeline IS the batch answer.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def chunk_to_dir(df: DataFrame, n_chunks: int, base_dir: str | None = None) -> str:
    """Write ``df`` as ``n_chunks`` parquet files; returns the directory.
    ``repartition(n)`` round-robins rows so chunks are balanced — each
    chunk becomes one micro-batch under ``maxFilesPerTrigger=1``."""
    out = os.path.join(
        base_dir or tempfile.gettempdir(), f"spark_replay_{uuid.uuid4().hex}"
    )
    df.repartition(n_chunks).write.mode("overwrite").parquet(out)
    return out


def stream_from_dir(spark: SparkSession, path: str,
                    files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a chunked directory (schema inferred from
    the parquet footers at plan time)."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def run_to_memory(stream_df: DataFrame, output_mode: str = "complete",
                  timeout_sec: int = 300) -> DataFrame:
    """Run a (transformed) streaming DataFrame to completion with
    availableNow, into a memory sink; return the result as a batch
    DataFrame. Checkpoint is a throwaway temp dir (tests recreate state
    from scratch; production pipelines pass a durable checkpoint via
    ``writeStream`` directly)."""
    name = f"mem_{uuid.uuid4().hex}"
    ckpt = tempfile.mkdtemp(prefix="spark_ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return stream_df.sparkSession.table(name)


def cleanup(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
