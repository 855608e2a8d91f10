"""Batch scans over the driver's parquet tables.

The reference's only bounded source is a driver-local collection
(``/root/reference/src/main/java/com/soto/TransformBlacklist.java:30-32``);
ours is a real columnar scan: ``spark.read.parquet`` gives Catalyst column
pruning + predicate pushdown for free — at 100 TB the scan is the dominant
cost, so every query should show ``PushedFilters``/narrow ``ReadSchema`` in
``.explain("formatted")`` (asserted in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver parquet stores TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as long via the
# legacy conf (runtime-settable) and rebuild timestamps at microsecond
# precision — truncation, exactly what DuckDB does when it reads the same
# files, so oracle comparisons stay bitwise-equal.
_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. No .cache() here: let each query prune/push down."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _TS_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            # integer DIV: `/` would go through double and lose precision
            # on 1e18-magnitude nano values (> 2^53)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype == "timestamp_ntz":
            # Depending on parquet logical-type annotations the same column
            # can arrive as TIMESTAMP_NTZ, which unix_micros()/withWatermark
            # reject. The driver data carries no zone, so reinterpreting the
            # wall-clock instant as UTC TIMESTAMP is lossless and matches
            # what DuckDB reports for the same files.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def widen(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition IF the input has fewer partitions than the
    session's parallelism — the pre-amplification guard for operators
    whose per-row cost explodes (shingle explode ~50×/doc, per-vector
    arithmetic over array columns, Arrow UDF batches).

    Why: a parquet file is split at ROW-GROUP granularity, so a
    single-row-group file scans as ONE task no matter what
    ``maxPartitionBytes`` says — and every map chained onto it runs on
    one core while the rest of the cluster idles. Shuffling the small
    pre-amplification rows once (cheap) unlocks full-width execution of
    the expensive downstream map. On a real 100 TB table the scan
    already has thousands of splits, so the guard makes this a no-op —
    the repartition only fires when the input is narrower than the
    session's parallelism.

    The partition-count probe builds the RDD plan but runs no job.
    Streaming DataFrames pass through untouched (no RDD to probe; a
    micro-batch's parallelism is the source's concern)."""
    if df.isStreaming:
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so spark.sql() mirrors the DuckDB
    oracle environment (same view names, same data)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
