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


def key_skew_report(tagged: list[tuple[str, DataFrame, str]]) -> DataFrame:
    """The diagnostic you run BEFORE keying a 100 TB shuffle on a
    column: per candidate key, cardinality, the hottest key's share,
    and the Gini concentration of the key-count distribution — the
    numbers that decide between a plain groupBy, salting
    (:func:`salted_counts`), and a broadcast. Gini via the rank
    formula G = (2·Σ i·c_i − (k+1)·Σc) / (k·Σc) over counts sorted
    ascending (Chebyshev's sum inequality keeps the numerator ≥ 0, so
    integer floor-DIV is tie-safe); both ratios integer-exact ppm.

    ``tagged`` is [(label, df, key_col)]. Columns: key_col (the
    label), n_rows, n_keys, max_cnt, top1_share_ppm, gini_ppm.

    Scale shape: per candidate ONE partial-agged groupBy to the
    |keys|-row count table, ranks via the two-phase range-partitioned
    global rank (ranking.with_global_rank — never an
    Exchange SinglePartition; rank ties among equal counts can't move
    Σ i·c_i, so the tie-break only serves rank determinism); all
    accumulators DECIMAL(38,0) so Σ i·c_i survives 1e9 keys × 1e12
    rows without overflow. Each candidate's summary is ONE row; the
    report is their union."""
    from spark_streaming_spark.operators.ranking import with_global_rank

    outs = []
    for label, df, key in tagged:
        counts = (df.groupBy(F.col(key).cast("string").alias("k"))
                  .agg(F.count("*").cast("long").alias("cnt")))
        ranked = with_global_rank(counts, ["cnt", "k"], rank_col="i")
        outs.append(ranked.agg(
            F.lit(label).alias("key_col"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("cnt").cast("long").alias("max_cnt"),
            F.expr("CAST(SUM(CAST(i AS DECIMAL(38,0)) * cnt)"
                   " AS DECIMAL(38,0))").alias("sic"),
        ).select(
            "key_col", "n_rows", "n_keys", "max_cnt",
            F.expr("CAST((1000000 * max_cnt) DIV n_rows AS BIGINT)")
            .alias("top1_share_ppm"),
            F.expr(
                "CAST((1000000 * (2 * sic - (n_keys + 1)"
                " * CAST(n_rows AS DECIMAL(38,0))))"
                " DIV (CAST(n_keys AS DECIMAL(38,0)) * n_rows)"
                " AS BIGINT)").alias("gini_ppm"),
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
