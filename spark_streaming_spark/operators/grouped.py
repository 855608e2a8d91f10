"""Grouped-map / vectorized-UDF surface (SURVEY.md §2.11).

The reference's "UDFs" are Java anonymous classes that compile away to
column expressions (``/root/reference/src/main/java/com/soto/
WordCount.java:32-53``); this module exercises the two Python UDF tiers
the engine exposes for logic that genuinely needs Python:

* ``applyInPandas`` — grouped map, one pandas DataFrame per key group
  (Arrow batches, no row-at-a-time pickling);
* ``pandas_udf`` — vectorized scalar, one Arrow column batch at a time.

Both examples produce INTEGER-exact output so the DuckDB oracle hashes
match bitwise — demonstrating that the UDF path, not just built-ins,
can be held to the exact-parity bar.

Scale notes: applyInPandas shuffles once on the grouping key, then each
group is processed in a single Python worker — per-group memory must fit
one group (user_id groups are small and uniform here; a skewed key would
need salting first). The scalar pandas_udf is map-only: it pipelines
inside the stage with zero shuffle, and Arrow transfer is the only cost
over a built-in expression (which is why built-ins still win when they
can express the logic — see token_stats for the column-expression twin).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_SEQ_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("seq", IntegerType()),
])


def user_event_sequence(events: DataFrame) -> DataFrame:
    """Per-user event sequence numbers — the PRODUCTION path: built-in
    ``row_number()`` over (user_id | ts, event_id). Whole-stage codegen,
    one shuffle on user_id, no Python in the loop; ~5× faster than the
    grouped-map twin below at sf0.1. Columns: user_id, event_id, ts, seq."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id", "event_id", "ts",
        F.row_number().over(w).alias("seq"),
    )


def user_event_sequence_pandas(events: DataFrame) -> DataFrame:
    """The SAME semantics via grouped-map ``applyInPandas`` — kept solely
    as the Arrow grouped-UDF surface check (tests assert it equals the
    built-in row_number path); not wired to the driver/bench entries.
    Columns: user_id, event_id, ts, seq."""

    def number(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        g["seq"] = (g.index + 1).astype("int32")
        return g[["user_id", "event_id", "ts", "seq"]]

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(number, schema=_SEQ_SCHEMA)
    )


def pandas_token_counts(docs: DataFrame) -> DataFrame:
    """Token counts via a vectorized scalar ``pandas_udf`` (Arrow batch
    in, Arrow batch out; no shuffle). Split on single spaces — exactly
    the oracle's ``string_split(text, ' ')`` semantics, so counts are
    integer-identical. Columns: doc_id, n_tokens."""

    @F.pandas_udf(IntegerType())
    def n_tokens(text: pd.Series) -> pd.Series:
        return text.str.split(" ").str.len().astype("int32")

    return docs.select("doc_id", n_tokens(F.col("text")).alias("n_tokens"))


def arrow_token_counts(docs: DataFrame) -> DataFrame:
    """Token counts via ``mapInArrow`` — the Arrow-NATIVE batch UDF
    surface (pyarrow RecordBatch in/out, no pandas materialization):
    where ``mapInPandas`` pays an Arrow→pandas→Arrow conversion per
    batch, this path computes directly on Arrow buffers with
    ``pyarrow.compute`` kernels (C++-vectorized), the cheapest Python
    surface Spark offers. Exact twin of :func:`pandas_token_counts`:
    ``count_substring(text, ' ') + 1`` equals ``len(split(' '))`` on
    every string including empties and doubled separators, so the entry
    shares its oracle. Columns: doc_id, n_tokens."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def count(batches):
        for b in batches:
            n = pc.cast(
                pc.add(pc.count_substring(b.column("text"), " "), 1),
                pa.int32(),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), n], ["doc_id", "n_tokens"]
            )

    return docs.select("doc_id", "text").mapInArrow(
        count, "doc_id bigint, n_tokens int"
    )


def grouped_agg_token_totals(docs: DataFrame) -> DataFrame:
    """Per-language corpus token totals via a GROUPED-AGG ``pandas_udf``
    — the one Arrow UDF surface the other entries don't exercise (scalar
    → pandas_token_counts, grouped map → user_event_sequence_pandas,
    stateful → streaming/stateful.py, mapInPandas → multimodal.py).
    The aggregation body is an integer sum, so the result is exact and
    partition-independent (Spark merges per-partition calls by re-
    invoking the UDF over concatenated groups — only associative-exact
    bodies belong here; float means do NOT). Columns: lang, total_tokens.
    """

    @F.pandas_udf("long")
    def tok_sum(n: pd.Series) -> int:
        return int(n.sum())

    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        docs.select("lang", n_tokens.alias("n"))
        .groupBy("lang")
        .agg(tok_sum(F.col("n")).alias("total_tokens"))
    )


def daily_user_journeys(events: DataFrame) -> DataFrame:
    """Per (user, day): the ordered array of event types — the nested-
    array aggregation surface (collect_list is non-deterministic in
    arrival order, so the list is built from (ts, event_id)-sorted
    structs to pin a canonical order at any parallelism).
    Columns: user_id, day, journey (array<string>), n_steps."""
    step = F.struct(
        F.col("ts"), F.col("event_id"), F.col("event_type")
    )
    journey = F.expr("transform(array_sort(collect_list(step)), s -> s.event_type)")
    return (
        events.select(
            "user_id",
            F.date_trunc("day", "ts").alias("day"),
            step.alias("step"),
        )
        .groupBy("user_id", "day")
        .agg(
            journey.alias("journey"),
            F.count("*").alias("n_steps"),
        )
    )
