"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a big-big equi-join (e.g. orders ⋈
lineitem on orderkey) is shuffling both fact tables. Writing both sides
bucketed by the join key with the same bucket count makes the join
shuffle-free forever after: each task reads matching bucket files from
both sides (Spark's bucketed scan reports the hash partitioning, so the
planner drops the Exchange on both sides). The reference tunes shuffle
behavior by hand (``/root/reference/README.md:970-997``); bucketing
removes the shuffle instead of tuning it.

tests/test_plans.py asserts the no-Exchange property on the actual plan.

Scale guidance: pick bucket count ≈ cluster cores × small multiple and
keep it FIXED across tables that join together (mismatched counts
reintroduce a shuffle on one side — Spark can only avoid both Exchanges
when the bucket specs line up). Sorting within buckets additionally
enables merge-join without a per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    parquet table registered in the session catalog at ``path``."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — plans
    with zero Exchange (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on)
