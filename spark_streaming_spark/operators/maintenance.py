"""Table-layout maintenance: day-partitioned writes and small-file
compaction — the housekeeping a 100 TB table needs to stay scannable
(out of scope for the reference, which only ever appends to MySQL:
``/root/reference/src/main/java/com/soto/PersistWordCount.java``).

Why it matters at scale: a streaming sink or a skewed shuffle leaves
thousands of KB-sized files per partition; every downstream scan then
pays one task + one open per file. Compaction rewrites each day
partition into ~``target_rows_per_file``-row files. The rewrite is
per-partition parallel (``repartitionByRange`` on the partition column
+ ``maxRecordsPerFile``) and idempotent via dynamic partition overwrite
— re-running it, or compacting while yesterday's job half-finished,
never clobbers untouched partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_day_partitioned(df: DataFrame, path: str,
                          ts_col: str = "ts") -> None:
    """Write ``df`` partitioned by day(ts) — the layout every time-range
    query prunes on (`WHERE day = ...` never opens other days' files)."""
    (
        df.withColumn("day", F.to_date(ts_col))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def compact_partitions(spark: SparkSession, path: str,
                       target_rows_per_file: int = 100_000) -> None:
    """Rewrite a day-partitioned parquet table into few, bounded files
    per partition. Reads with partition discovery, range-partitions on
    ``day`` so each output task writes one day's rows contiguously, and
    bounds file size with ``maxRecordsPerFile`` (Spark splits a task's
    output at the cap, so one hot day still produces multiple
    right-sized files rather than one giant one). Dynamic partition
    overwrite keeps the rewrite idempotent and partition-local."""
    df = spark.read.parquet(path)
    n_days = max(df.select("day").distinct().count(), 1)
    (
        df.repartitionByRange(n_days, F.col("day"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy("day")
        .parquet(path)
    )


def layout_stats(spark: SparkSession, path: str) -> DataFrame:
    """File-layout audit of a day-partitioned table: files and bytes per
    partition — the metric compaction is judged by. Driver-side
    directory listing (metadata only, no data read); on a real
    deployment this is the table format's manifest query.
    Columns: day, n_files, total_bytes."""
    rows = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("day="):
            continue
        pdir = os.path.join(path, entry)
        files = [
            os.path.join(pdir, f) for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
        rows.append((
            entry.split("=", 1)[1],
            len(files),
            sum(os.path.getsize(f) for f in files),
        ))
    return spark.createDataFrame(rows, "day string, n_files int, total_bytes long")
