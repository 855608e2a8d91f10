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


def _zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """Bit-interleaved Morton (Z-order) key of two non-negative integer
    columns, as ONE arithmetic expression string shared by Spark SQL and
    DuckDB (both support ``&``, ``shiftright``? no — only operators both
    dialects share: ``&``, ``*``, ``+``, and integer division by powers
    of two, which is exact on non-negatives). Bit k of x lands at
    position 2k, bit k of y at 2k+1."""
    terms = []
    for k in range(bits):
        p = 1 << k
        terms.append(f"((({x}) // {p}) & 1) * {1 << (2 * k)}")
        terms.append(f"((({y}) // {p}) & 1) * {1 << (2 * k + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_key(x: str, y: str, bits: int = 16) -> F.Column:
    """Morton key as a Column (Spark spelling: `div` for integer
    division). Pure codegen arithmetic — no UDF."""
    expr = _zorder_sql(x, y, bits).replace("//", " div ")
    return F.expr(expr).cast("long")


def zorder_layout(df: DataFrame, x: str, y: str, n_files: int,
                  bits: int = 16) -> DataFrame:
    """Cluster rows along the Z-curve of (x, y): range-partition on the
    Morton key, sort within partitions, drop the key. Each output file
    then covers a contiguous z-curve segment — a bounded union of
    rectangles in (x, y) — so parquet min/max stats are tight on BOTH
    columns and data skipping prunes files for predicates on EITHER
    column. A plain ``orderBy(x)`` gives tight stats on x only; y spans
    the whole domain in every file. This is the open spelling of
    Delta/Iceberg OPTIMIZE ZORDER BY (public technique: Morton 1966).

    Scale: one range-partitioned shuffle (the same cost as any global
    sort) that is paid ONCE at write time and repaid on every
    subsequent scan's file pruning."""
    keyed = df.withColumn("_z", zorder_key(x, y, bits))
    return (
        keyed.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
