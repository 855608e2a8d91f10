"""Count-Min sketch as a distributed DataFrame aggregation — the "novel
sketch" custom-operator tier (SURVEY.md §4.3(4)); the reference has no
sketches at all (its only aggregate is the integer sum,
``/root/reference/src/main/java/com/soto/WordCount.java:48-53``).

A CM sketch is a (depth × width) counter grid; item x increments cell
(d, hash_d(x) mod width) for each row d; the frequency estimate is the
MIN over the d cells — always ≥ the true count, with overestimate bounded
by ~2N/width at 1-(1/2)^depth confidence.

Why it matters at 100 TB: the full per-key frequency table of a
high-cardinality column (users, URLs) can be too large to materialize or
broadcast, but the sketch is a FIXED-SIZE (depth×width rows) summary
built in one pass — a groupBy over derived hash columns, mergeable
across partitions/streams by cell-wise addition (partial aggregation IS
the merge). Estimation joins a small key set against the sketch.

Hashes are md5-derived (like operators/dedup.simhash) so the DuckDB
oracle reproduces the grid bit-for-bit — the sketch is deterministic,
only its error is probabilistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 256


def _bucket(col: F.Column, d: int, width: int) -> F.Column:
    """Row-d bucket: md5(value ⊕ seed_d) → 60-bit int → mod width.
    Deterministic and engine-portable (DuckDB spells the same)."""
    h = F.conv(F.substring(F.md5(F.concat(col, F.lit(f"#{d}"))), 1, 15), 16, 10)
    return (h.cast("long") % width).cast("int")


def _cells(col: F.Column, depth: int, width: int) -> F.Column:
    """The depth (d, bucket) cells of a value — the ONE definition both
    build and estimate must share (a drift between them silently breaks
    the upper-bound guarantee)."""
    return F.array(*[
        F.struct(F.lit(d).alias("d"), _bucket(col, d, width).alias("bucket"))
        for d in range(depth)
    ])


def countmin_build(df: DataFrame, col: str, depth: int = DEPTH,
                   width: int = WIDTH) -> DataFrame:
    """Build the sketch grid: one row per non-empty cell.
    Columns: d, bucket, cnt. Exactly ``depth`` shuffled groupBy keys per
    input row (explode), partial aggregation merges partition-local grids
    map-side — the distributed CM merge for free."""
    v = F.col(col).cast("string")
    return (
        df.select(F.explode(_cells(v, depth, width)).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                      depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """Point-estimate frequencies for ``keys`` from a sketch grid: min
    over the key's depth cells, where an EMPTY cell counts as 0 — a key
    with any empty cell therefore estimates 0 (never inserted / no
    collision mass), and never-seen keys stay in the output instead of
    being dropped. Left join from the probes; the grid is fixed-size
    (≤ depth×width rows) so it broadcasts.
    Columns: <key_col>, est (upper bound on the true count)."""
    v = F.col(key_col).cast("string")
    probes = keys.select(
        key_col, F.explode(_cells(v, depth, width)).alias("c")
    ).select(key_col, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
