"""Skew-aware aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (a viral product, the empty-string word)
can pin a whole aggregation on one reducer. AQE's skew-join splitting
(on in session.py) handles joins; for aggregations the classic fix is
salting: shard each key across ``n_salts`` partial groups, aggregate,
then combine the partials — two small shuffles instead of one skewed one.

For algebraic aggregates (count/sum/min/max) the result is exactly equal
to the unsalted groupBy, which is what tests/test_skew.py asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_counts(df: DataFrame, key_col: str, n_salts: int = 16,
                  row_fingerprint: Column | None = None) -> DataFrame:
    """COUNT(*) per key, skew-sharded. ``row_fingerprint`` (any column
    expression that varies within a key; defaults to a hash of all
    columns) spreads a hot key's rows across ``n_salts`` partial groups.
    Columns: <key_col>, cnt."""
    fp = row_fingerprint if row_fingerprint is not None else F.xxhash64(*df.columns)
    partial = (
        df.withColumn("_salt", F.pmod(fp, F.lit(n_salts)))
        .groupBy(key_col, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(key_col).agg(F.sum("_partial").alias("cnt"))


def salted_decimal_sum(df: DataFrame, key_col: str, value_col: str,
                       n_salts: int = 16, scale: int = 2) -> DataFrame:
    """Decimal-stable SUM per key, skew-sharded: because addends are
    quantized to decimals, the salted two-phase sum is bitwise-equal to
    the one-phase sum regardless of how rows shard. Columns: <key_col>,
    sum_value."""
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(value_col), F.lit(n_salts)))
        .groupBy(key_col, "_salt")
        .agg(F.sum(F.col(value_col).cast(f"decimal(38,{scale})")).alias("_p"))
    )
    return partial.groupBy(key_col).agg(
        F.sum("_p").cast("double").alias("sum_value")
    )


def salted_join(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str, n_salts: int = 16,
                salt_source: str | None = None) -> DataFrame:
    """Skew-sharded equi-join: the big side salts each row into one of
    ``n_salts`` shards (deterministically, from ``salt_source`` — any
    column that varies within a key, e.g. the row id); the small side is
    REPLICATED once per shard. The join key becomes (key, salt), so a
    hot key's probe rows spread across n_salts tasks instead of pinning
    one. Semantics are identical to the plain join; cost is n_salts× the
    small side (why small must be small — for big-big skew use AQE's
    skew-join splitting instead, enabled in session.py).

    Returns big ⋈ small with both key columns retained.
    """
    fp = F.xxhash64(salt_source) if salt_source else F.xxhash64(*big.columns)
    salted_big = big.withColumn("_salt", F.pmod(fp, F.lit(n_salts)))
    salted_small = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return (
        salted_big.join(
            salted_small,
            (F.col(big_key) == F.col(small_key))
            & (salted_big["_salt"] == salted_small["_salt"]),
        )
        .drop("_salt")
    )
